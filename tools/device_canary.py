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

    # Link health is a SEPARATE axis of device weather: the tunnel's
    # dispatch RTT (healthy ~28 ms, degraded multi-second) and H2D
    # bandwidth (healthy ~100 MB/s) can degrade while matmul throughput
    # reads fine — region inference pays both (upload + per-dispatch
    # RTTs), so a bench number needs both axes recorded.
    # Pure transfers only — NO new jitted programs (a fresh tiny program
    # costs a remote compile, minutes on a bad day, which would make the
    # canary as flaky as what it measures).
    tiny_buf = np.zeros((8,), np.float32)
    rtts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.device_put(tiny_buf))  # H2D + D2H round-trip pair
        rtts.append(time.time() - t0)
    buf = np.zeros((4 * 1024 * 1024,), np.uint8)
    bws = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.device_put(buf))  # 4 MB up + 4 MB down
        bws.append(time.time() - t0)
    rtt_ms = min(rtts) * 1e3 / 2.0  # one-way estimate from the up+down pair
    h2d_mbps = 2 * len(buf) / 1e6 / min(bws)  # combined both-direction rate
    return {"matmul_ms": round(per_app * 1e3, 1),
            "effective_tflops": round(tflops, 1),
            "link_rtt_ms": round(rtt_ms, 1),
            "h2d_mbps": round(h2d_mbps, 1),
            "link_ok": rtt_ms < 150.0,
            "healthy": tflops >= 100.0}


if __name__ == "__main__":
    print(json.dumps(measure()))
