"""Fused-encoder variants on the real TPU (ViT-B, 512px, B=32, bf16).

Compares the flax encoder against the token-tiled fused encoder (v3 —
the only kernel generation kept; v1/v2 per-window whole-block kernels
were removed in round 3). Variants compile first, then time interleaved;
each checks numerical agreement with the flax output via an L1 norm.
"""

import json
import sys
import time

import numpy as np


def main(only=None):
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sam_road_tpu.models.fast_encoder import encoder_forward_fused
    from sam_road_tpu.models.vit import ImageEncoderViT

    B, DIM = 32, 768
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.float32)

    enc = ImageEncoderViT(img_size=512, embed_dim=DIM, depth=12, num_heads=12,
                          window_size=14, global_attn_indexes=(2, 5, 8, 11),
                          dtype=jnp.bfloat16)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(1).normal(
            size=p.shape).astype(p.dtype),
        jax.tree.map(np.asarray, params),
    )
    # CRITICAL: params must be DEVICE arrays. jit does not cache numpy
    # inputs — every timed call would re-upload the full fp32 tree
    # (~356 MB, 5-10 s on this link), swamping the compute deltas the
    # A/B exists to measure (bug found 2026-08-18; earlier ratios from
    # this tool were diluted toward 1.0 by exactly this).
    params = jax.device_put(params)
    x = jax.device_put(x)

    results = {}

    ITERS = 5
    ROUNDS = 5
    runners = {}  # label -> compiled scan runner

    def timed(fn, label):
        # Each variant is ITERS applications INSIDE one jitted scan so the
        # tunnel's per-call dispatch RTT (28 ms healthy, multi-second
        # degraded) amortizes. The carry perturbs the input by a data-
        # dependent epsilon so XLA cannot CSE the iterations. Fetch is one
        # SCALAR (an L1 norm — cancellation-resistant agreement check).
        # Variants are only COMPILED + WARMED here; timing happens later,
        # INTERLEAVED round-robin across all variants, because the shared
        # device swings ~10x on minute scales — sequential per-variant
        # timing attributes device weather to code changes.
        try:
            @jax.jit
            def run(p, xx):
                def step(c, _):
                    out = fn(p, xx + c)
                    s = jnp.abs(out.astype(jnp.float32)).sum()
                    return (s * 1e-30).astype(xx.dtype), s
                _, ss = jax.lax.scan(
                    step, jnp.zeros((), xx.dtype), None, length=ITERS
                )
                return ss

            out = float(run(params, x)[0])  # compile + warmup
            results[label + "_l1"] = out
            runners[label] = run
            print(f"# {label}: compiled, l1={out:.1f}", flush=True)
            return out
        except Exception as e:
            results[label + "_ms"] = f"FAIL: {str(e)[:140]}"
            print(f"# {label}: {results[label + '_ms']}", flush=True)
            return None

    def run_interleaved():
        times = {lb: [] for lb in runners}
        for r in range(ROUNDS):
            for lb, run in runners.items():
                t0 = time.time()
                float(run(params, x)[0])
                times[lb].append((time.time() - t0) / ITERS)
            print("# round %d: %s" % (
                r, " ".join(f"{lb}={times[lb][-1]*1e3:.0f}ms"
                            for lb in runners)), flush=True)
        for lb, ts in times.items():
            results[lb + "_ms"] = round(min(ts) * 1e3, 1)
            results[lb + "_ms_rounds"] = [round(t * 1e3, 1) for t in ts]
        if "flax" in times:
            for lb in times:
                if lb == "flax":
                    continue
                ratios = [a / b for a, b in zip(times["flax"], times[lb])]
                results[lb + "_paired_speedup_median"] = round(
                    float(np.median(ratios)), 3)

    wanted = None if only is None else set(only.split(","))
    ref = None
    if wanted is None or "flax" in wanted:
        ref = timed(lambda p, x: enc.apply({"params": p}, x), "flax")

    def fused():
        def fn(p, x):
            return encoder_forward_fused(
                p, x, sam_version="vit_b", img_size=512, window_size=14,
                dtype=jnp.bfloat16,
            )
        return fn

    def fused_xla_tail():
        # XLA-op post-attention tail vs the token-tiled Pallas tail kernel:
        # flip the trace-time flag while tracing this variant only
        def fn(p, x):
            from sam_road_tpu.models import fast_encoder as _fe
            old = _fe.XLA_TAIL
            _fe.XLA_TAIL = True
            try:
                return encoder_forward_fused(
                    p, x, sam_version="vit_b", img_size=512, window_size=14,
                    dtype=jnp.bfloat16,
                )
            finally:
                _fe.XLA_TAIL = old
        return fn

    def fused_padded():
        # round-3 data path: XLA jnp.pad feeds the window kernel and the
        # tail reads the unpad slice — for paired A/B vs the round-4
        # pad-free path (PAD_FREE=True is the production default)
        def fn(p, x):
            from sam_road_tpu.models import fast_encoder as _fe
            old = _fe.PAD_FREE
            _fe.PAD_FREE = False
            try:
                return encoder_forward_fused(
                    p, x, sam_version="vit_b", img_size=512, window_size=14,
                    dtype=jnp.bfloat16,
                )
            finally:
                _fe.PAD_FREE = old
        return fn

    def fused_flag(**flags):
        # generic trace-time flag flip on the fast_encoder module
        def fn(p, x):
            from sam_road_tpu.models import fast_encoder as _fe
            old = {k: getattr(_fe, k) for k in flags}
            for k, v in flags.items():
                setattr(_fe, k, v)
            try:
                return encoder_forward_fused(
                    p, x, sam_version="vit_b", img_size=512, window_size=14,
                    dtype=jnp.bfloat16,
                )
            finally:
                for k, v in old.items():
                    setattr(_fe, k, v)
        return fn

    for label, fn in [
        ("v3", fused()),
        ("v3xt", fused_xla_tail()),
        ("v3pad", fused_padded()),
        ("v3padfree", fused_flag(PAD_FREE=True)),
        ("v3rj", fused_flag(WIN_ROLLED_ROWS=True)),
        ("v3g4", fused_flag(WIN_GROUP_BATCH=4)),
        ("v3g8", fused_flag(WIN_GROUP_BATCH=8)),
        ("v3g16", fused_flag(WIN_GROUP_BATCH=16)),
        ("v3g32", fused_flag(WIN_GROUP_BATCH=32)),
    ]:
        if wanted is not None and label not in wanted:
            continue
        out = timed(fn, label)
        if out is not None and ref is not None:
            results[label + "_sumdiff"] = float(abs(out - ref))

    run_interleaved()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
