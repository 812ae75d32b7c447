"""Device-health canary: times a fixed 8192^2 bf16 matmul chain (scanned
in-jit, ~2.2 TFLOP) and reports effective TFLOP/s. The shared tunneled v5e
swings ~10x on minute scales (multi-tenant weather); perf experiments are
only comparable when the canary reads healthy (>= ~100 TFLOP/s; degraded
state reads ~10-30). Run before/after any timing session; bench.py
numbers recorded in a degraded window understate the machine by up to 8x.
"""

import json
import time

import numpy as np


def measure(reps: int = 3):
    import jax
    import jax.numpy as jnp

    N, ITERS = 8192, 4
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, N)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(N, N)) * 0.02, jnp.bfloat16)

    @jax.jit
    def run(a, b):
        def step(c, _):
            out = jnp.dot(a + c, b, preferred_element_type=jnp.float32)
            s = jnp.abs(out).sum()
            return (s * 1e-36).astype(a.dtype), s
        _, ss = jax.lax.scan(step, jnp.zeros((), a.dtype), None, length=ITERS)
        return ss

    float(run(a, b)[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(run(a, b)[0])
        ts.append(time.time() - t0)
    per_app = min(ts) / ITERS
    tflops = 2 * N * N * N / per_app / 1e12
    return {"matmul_ms": round(per_app * 1e3, 1),
            "effective_tflops": round(tflops, 1),
            "healthy": tflops >= 100.0}


if __name__ == "__main__":
    print(json.dumps(measure()))
