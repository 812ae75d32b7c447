"""TPU capability microbenchmark: what does THIS chip actually give?

Measures bf16 matmul throughput at several shapes with the loop inside one
jitted program (lax.scan) so per-call host-link overhead (~28 ms on the
tunneled chip) is amortized away, plus HBM copy bandwidth. Timing is by
fetching a dependent scalar (block_until_ready is unreliable on the axon
platform). Establishes the realistic encoder-speed ceiling for DESIGN.md
MFU claims.

Run (never concurrently with another TPU process):
  python tools/tpu_microbench.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    results = {}

    def timed(fn, *args, reps=3):
        # warmup + compile
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fn(*args))
            ts.append(time.time() - t0)
        return min(ts)

    # ---- bf16 matmul throughput, n_iter matmuls inside one program ----
    for m, k, n, iters in [
        (4096, 4096, 4096, 64),
        (8192, 8192, 8192, 16),
        (1764, 768, 2304, 512),   # ViT-B windowed qkv shape
        (1024, 768, 3072, 512),   # ViT-B mlp lin1 (global grid)
        (196, 64, 196, 4096),     # per-window attention score shape
    ]:
        a = jnp.asarray(np.random.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(np.random.randn(k, n), jnp.bfloat16)

        @jax.jit
        def run(a, b, iters=iters):
            def step(carry, _):
                # feed the result back (bf16) so iterations are dependent and
                # cannot be CSE'd away
                c = (carry @ b)
                return c[:, : a.shape[1]].astype(jnp.bfloat16), ()

            out, _ = jax.lax.scan(step, a, None, length=iters)
            return out.astype(jnp.float32).sum()

        if k != n:
            # dependent feedback needs square-ish chaining; fall back to
            # independent matmuls consumed into the carry sum
            @jax.jit
            def run(a, b, iters=iters):
                def step(s, i):
                    c = ((a + s * 0.0) @ b).astype(jnp.float32).mean()
                    return s + c, ()

                out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(iters))
                return out

        dt = timed(run, a, b)
        tflops = 2 * m * k * n * iters / dt / 1e12
        results[f"matmul_{m}x{k}x{n}_x{iters}"] = {
            "s": round(dt, 4), "tflops": round(tflops, 1),
        }

    # ---- HBM bandwidth: big elementwise copy-add inside one program ----
    x = jnp.asarray(np.random.randn(512, 1024, 1024), jnp.float32)  # 2 GB rw

    @jax.jit
    def bw(x):
        def step(c, _):
            return c * 1.000001 + 1.0, ()

        out, _ = jax.lax.scan(step, x, None, length=8)
        return out.sum()

    dt = timed(bw, x)
    gb = x.size * 4 * 2 * 8 / 1e9
    results["hbm_rw_gbps"] = round(gb / dt, 1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
