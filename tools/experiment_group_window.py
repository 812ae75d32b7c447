"""Grouped block-diagonal windowed attention vs the production rows kernel.

The production kernel (ops/fused_block.py window_attention_rows) is
LATENCY-bound: 288 programs x 12 unrolled head chains of small matmuls
(~5.5-6.8 ms/block given qkv at flagship geometry, vs ~1 ms of roofline).
Earlier grouped variants unrolled g windows x 12 heads (op count grew with
g) and crashed the AOT helper at g=4; the batched-dot formulation crashes
at any g (tools/repro_aot_crash.py); and in-kernel (g, N, C) -> (g*N, C)
merge reshapes are rejected by this Mosaic version (tools/probe_mosaic.py,
round-1 finding — the first version of THIS experiment crashed on exactly
that).

This version folds g windows into the M DIMENSION with all reshapes done
OUTSIDE the kernel: per head, q/k of g windows arrive stacked as
(g*196, 64), ONE dot gives (g*196, g*196) scores, cross-window blocks are
masked block-diagonally via 2D iota compares, and the rel-pos bias rows
(spread against the static selector) are tiled across column blocks by a
g-way concat — harmless off the diagonal because those blocks are -inf
masked. Op count per program is near-CONSTANT in g (12 head chains, same
as the compiling g=1 kernel, plus a g-way concat); only shapes grow. The
serial small-op count per block drops g-fold; the cost is g x wasted
score FLOPs + exp.

Usage: python tools/experiment_group_window.py [g1,g2,...]
"""

import functools
import json
import sys
import time

import numpy as np


def main(groups=(2, 4, 8)):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.ops.fused_block import window_attention_rows

    DT = jnp.bfloat16
    B, WIN, C, H = 32, 14, 768, 12
    N = WIN * WIN
    NW = B * 9  # 288 windows at grid 32 -> padded 42
    HD = C // H
    SCALE = HD ** -0.5

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(NW, N, 3 * C)) * 0.3, DT)
    bh = jnp.asarray(rng.normal(size=(NW, H, N, WIN)) * 0.3, DT)
    bw = jnp.asarray(rng.normal(size=(NW, H, N, WIN)) * 0.3, DT)

    # ---- grouped block-diagonal kernel (no in-kernel reshapes) ----
    def _diag_kernel(g, qkv_ref, bhw_ref, o_ref):
        # qkv_ref: (1, gN, 3C); bhw_ref: (1, H, gN, 2*WIN); o: (1, gN, C)
        gN = g * N
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, N), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, N), 1)
        sel_h = (k_idx // WIN == a_idx).astype(jnp.float32)
        sel_w = (k_idx % WIN == a_idx - WIN).astype(jnp.float32)
        sel = jnp.where(a_idx < WIN, sel_h, sel_w)  # (2*WIN, N) stacked
        rw = jax.lax.broadcasted_iota(jnp.int32, (gN, gN), 0) // N
        cw = jax.lax.broadcasted_iota(jnp.int32, (gN, gN), 1) // N
        same = rw == cw

        qkv_g = qkv_ref[0]  # (gN, 3C)
        head_outs = []
        for h in range(H):
            q = qkv_g[:, h * HD:(h + 1) * HD]
            k = qkv_g[:, C + h * HD: C + (h + 1) * HD]
            v = qkv_g[:, 2 * C + h * HD: 2 * C + (h + 1) * HD]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * SCALE
            bias = jnp.dot(bhw_ref[0, h].astype(jnp.float32), sel,
                           preferred_element_type=jnp.float32)  # (gN, N)
            bias_t = jnp.concatenate([bias] * g, axis=1)  # (gN, gN)
            s = jnp.where(same, s + bias_t, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            head_outs.append(
                jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            )
        o_ref[0] = jnp.concatenate(head_outs, axis=-1).astype(o_ref.dtype)

    def diag_attn(qkv_w, bh, bw, g):
        # all layout work OUTSIDE the kernel (XLA handles it at full HBM bw)
        gN = g * N
        nG = NW // g
        qkv_g = qkv_w.reshape(nG, gN, 3 * C)
        bhw = jnp.concatenate([bh, bw], axis=-1)            # (NW, H, N, 2W)
        bhw = bhw.reshape(nG, g, H, N, 2 * WIN)
        bhw = bhw.transpose(0, 2, 1, 3, 4).reshape(nG, H, gN, 2 * WIN)
        blk = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_diag_kernel, g),
            out_shape=jax.ShapeDtypeStruct((nG, gN, C), qkv_w.dtype),
            grid=(nG,),
            in_specs=[blk((gN, 3 * C)), blk((H, gN, 2 * WIN))],
            out_specs=blk((gN, C)),
        )(qkv_g, bhw.astype(qkv_w.dtype))
        return out.reshape(NW, N, C)

    results = {}
    ITERS = 10
    runners = []

    ref = window_attention_rows(qkv, bh, bw, WIN, H)
    ref_abs = float(jnp.abs(ref.astype(jnp.float32)).sum())

    def check_and_stage(label, fn):
        try:
            out = fn(qkv, bh, bw)
            dsum = float(
                jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).sum()
            )
            rel = dsum / max(ref_abs, 1e-9)
            results[label + "_reldiff"] = round(rel, 8)
            if rel > 1e-2:
                results[label + "_ms"] = f"WRONG (rel {rel:.2e})"
                print(f"# {label}: WRONG rel {rel:.2e}", flush=True)
                return

            @jax.jit
            def run(a, b2, b3):
                def step(c, _):
                    out = fn(a + c, b2, b3)
                    s = jnp.abs(out.astype(jnp.float32)).sum()
                    return (s * 1e-30).astype(a.dtype), s
                _, ss = jax.lax.scan(step, jnp.zeros((), a.dtype), None,
                                     length=ITERS)
                return ss

            float(run(qkv, bh, bw)[0])
            runners.append((label, run))
            print(f"# {label}: compiled, rel {rel:.2e}", flush=True)
        except Exception as e:
            results[label + "_ms"] = f"FAIL: {str(e)[:140]}"
            print(f"# {label}: {results[label + '_ms']}", flush=True)

    check_and_stage("prod_rows",
                    lambda a, b2, b3: window_attention_rows(a, b2, b3, WIN, H))
    for g in groups:
        check_and_stage(f"diag_g{g}",
                        lambda a, b2, b3, g=g: diag_attn(a, b2, b3, g))

    for r in range(4):
        for lb, run in runners:
            t0 = time.time()
            float(run(qkv, bh, bw)[0])
            dt = (time.time() - t0) / ITERS
            results.setdefault(lb + "_all", []).append(round(dt * 1e3, 2))
    for lb, run in runners:
        results[lb + "_ms"] = min(results[lb + "_all"])

    sys.path.insert(0, "tools")
    from device_canary import measure as canary
    results["canary"] = canary(reps=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    gs = tuple(int(x) for x in sys.argv[1].split(",")) if len(sys.argv) > 1 \
        else (2, 4, 8)
    main(gs)
