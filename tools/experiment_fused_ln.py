"""Kernel-level A/B for the token-tiled fused kernels (ops/fused_ln.py,
window_attention_relpos) vs their XLA formulations, at flagship geometry
(B=32, 512px, ViT-B dims). Each variant times ITERS applications inside
ONE jitted scan (tunnel-RTT-proof); variants run in the same process so
device drift cancels. Sweeps the token tile size to expose whether
grid-invariant weight blocks are re-fetched per program.

Usage: python tools/experiment_fused_ln.py [ln_dense|ln_mlp|wattn|all]
"""

import json
import sys
import time

import numpy as np


def main(which="all"):
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.models.vit import _get_rel_pos_table, fold_rel_pos_qk
    from sam_road_tpu.ops.attention import fused_attention
    from sam_road_tpu.ops.fused_block import window_attention_relpos
    from sam_road_tpu.ops.fused_ln import ln_dense, ln_mlp_residual

    DT = jnp.bfloat16
    M, C = 32 * 1024, 768  # 32 patches x 1024 tokens
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, C)) * 0.5, DT)
    results = {}
    ITERS = 10

    runners = []  # (label, run, args) — timed interleaved at the end

    def timed(label, fn, *args):
        # compile + warm here; timing happens round-robin across ALL
        # variants afterwards (the shared device swings ~10x on minute
        # scales; sequential timing attributes weather to code).
        try:
            @jax.jit
            def run(*a):
                def step(c, _):
                    out = fn(a[0] + c, *a[1:])
                    s = jnp.abs(out.astype(jnp.float32)).sum()
                    return (s * 1e-30).astype(a[0].dtype), s
                _, ss = jax.lax.scan(step, jnp.zeros((), a[0].dtype), None,
                                     length=ITERS)
                return ss

            l1 = float(run(*args)[0])
            results[label + "_l1"] = round(l1, 1)
            runners.append((label, run, args))
            print(f"# {label}: compiled", flush=True)
        except Exception as e:
            results[label + "_ms"] = f"FAIL: {str(e)[:120]}"
            print(f"# {label}: {results[label + '_ms']}", flush=True)

    def run_interleaved(rounds=4):
        times = {lb: [] for lb, _, _ in runners}
        for r in range(rounds):
            for lb, run, args in runners:
                t0 = time.time()
                float(run(*args)[0])
                times[lb].append((time.time() - t0) / ITERS)
        for lb, ts in times.items():
            results[lb + "_ms"] = round(min(ts) * 1e3, 2)
            print(f"# {lb}: {results[lb + '_ms']} ms", flush=True)

    # ---- ln_dense (qkv shape: C -> 3C) ----
    if which in ("all", "ln_dense"):
        s = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, DT)

        def xla_ln_dense(xx, s, b, w):
            xf = xx.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * s + b
            return h.astype(xx.dtype) @ w

        timed("xla_ln_dense", xla_ln_dense, x, s, b, w)
        for tile in (256, 512, 1024):
            timed(f"pl_ln_dense_t{tile}",
                  lambda xx, s, b, w, t=tile: ln_dense(xx, s, b, w, tile=t),
                  x, s, b, w)

    # ---- ln_mlp_residual ----
    if which in ("all", "ln_mlp"):
        s = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, DT)
        b1 = jnp.asarray(rng.normal(size=(4 * C,)), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, DT)
        b2 = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

        def xla_mlp(xx, s, b, w1, b1, w2, b2):
            xf = xx.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            h = (((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * s + b).astype(xx.dtype)
            mid = h @ w1 + b1.astype(DT)
            mid = jax.nn.gelu(mid, approximate=False)
            return xx + (mid @ w2 + b2.astype(DT))

        timed("xla_ln_mlp", xla_mlp, x, s, b, w1, b1, w2, b2)
        for tile, chunks in ((256, 4), (512, 4), (1024, 8)):
            timed(f"pl_ln_mlp_t{tile}_c{chunks}",
                  lambda xx, *a, t=tile, c=chunks: ln_mlp_residual(
                      xx, *a, tile=t, chunks=c),
                  x, s, b, w1, b1, w2, b2)

    # ---- window attention: 288*32 windows analog (B=32 x 9 windows) ----
    if which in ("all", "wattn"):
        win, heads = 14, 12
        nW = 32 * 9
        N = win * win
        hd = C // heads
        qkv = jnp.asarray(rng.normal(size=(nW, N, 3 * C)) * 0.5, DT)
        rh = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.02, jnp.float32)
        rw = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.02, jnp.float32)

        def xla_fold_attn(qkv, rh, rw):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            def heads_split(t):
                return t.reshape(nW, N, heads, hd).transpose(0, 2, 1, 3)
            qh, kh, vh = map(heads_split, (q, k, v))
            Rh = _get_rel_pos_table(win, rh).astype(DT)
            Rw = _get_rel_pos_table(win, rw).astype(DT)
            q_aug, k_aug = fold_rel_pos_qk(qh, kh, Rh, Rw, (win, win),
                                           hd ** -0.5)
            out = fused_attention(q_aug, k_aug, vh, False)
            return out.transpose(0, 2, 1, 3).reshape(nW, N, C)

        timed("xla_fold_attn", xla_fold_attn, qkv, rh, rw)

        def pl_wattn(qkv, rh, rw, group=1):
            return window_attention_relpos(qkv, rh, rw, win, heads,
                                           group=group)

        timed("pl_window_attn", pl_wattn, qkv, rh, rw)

        def heads_split(t):
            return t.reshape(nW, N, heads, hd).transpose(0, 2, 1, 3)

        # production kernel: precomputed bias rows (XLA einsum) + in-kernel
        # selector spread; sweep windows-per-program
        from sam_road_tpu.ops.fused_block import window_attention_rows
        from sam_road_tpu.models.vit import _get_rel_pos_table as _grt

        def pl_rows(qkv, rh, rw, group=1):
            q = qkv[..., :C].reshape(nW, win, win, heads, hd)
            Rh = jnp.asarray(rh)[np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1].astype(DT)
            Rw = jnp.asarray(rw)[np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1].astype(DT)
            bh = jnp.einsum("wijhc,iac->whija", q.astype(DT), Rh).reshape(nW, heads, N, win)
            bw = jnp.einsum("wijhc,jac->whija", q.astype(DT), Rw).reshape(nW, heads, N, win)
            return window_attention_rows(qkv, bh, bw, win, heads, group=group)

        for g in (1, 2, 4):
            timed(f"pl_rows_g{g}",
                  lambda qkv, rh, rw, gg=g: pl_rows(qkv, rh, rw, group=gg),
                  qkv, rh, rw)

        def xla_textbook(qkv, rh, rw):
            # textbook decomposed rel-pos: bias einsums + 6D broadcast add,
            # plain XLA softmax (no pallas) — reference formulation
            q, k, v = jnp.split(qkv, 3, axis=-1)
            qh, kh, vh = map(heads_split, (q, k, v))
            Rh = _get_rel_pos_table(win, rh).astype(DT)
            Rw = _get_rel_pos_table(win, rw).astype(DT)
            s = jnp.einsum("bhnd,bhmd->bhnm", qh * (hd ** -0.5), kh,
                           preferred_element_type=jnp.float32)
            r_q = qh.reshape(nW, heads, win, win, hd)
            relh = jnp.einsum("bhiwc,iac->bhiwa", r_q, Rh.astype(qh.dtype))
            relw = jnp.einsum("bhiwc,wac->bhiwa", r_q, Rw.astype(qh.dtype))
            s = s.reshape(nW, heads, win, win, win, win)
            s = s + relh[..., :, None].astype(jnp.float32)
            s = s + relw[..., None, :].astype(jnp.float32)
            s = s.reshape(nW, heads, N, N)
            p = jax.nn.softmax(s, axis=-1).astype(DT)
            out = jnp.einsum("bhnm,bhmd->bhnd", p, vh)
            return out.transpose(0, 2, 1, 3).reshape(nW, N, C)

        timed("xla_textbook_attn", xla_textbook, qkv, rh, rw)

    run_interleaved()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
