"""Headline benchmark: iLQR backward-pass timesteps/sec on the default device.

BASELINE.json metric: "Riccati backward-pass timesteps/sec/chip; iLQR iters/sec at
horizon 1000".  The reference publishes no numbers (BASELINE.md), so the denominator
is *measured*: the same backward pass as single-thread -O3 -march=native C++ on this
host's CPU (native/baseline.cpp — the role the reference's Armadillo/OpenBLAS kernel
plays, which itself is explicitly single-threaded, README.md:20).

The device side exercises the two TPU levers the reference lacks:
  * batching — a vmapped batch of independent backward passes (MPC farms / GPS
    rollout fitting are batched in practice), and
  * parallel-in-time — the associative-scan Riccati (core/pscan_lqr.py).
The better of sequential-scan and parallel-scan throughput is reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _problem(T, dx, du, batch, dtype=None):
    """dtype=None returns plain numpy float64 (for the native baseline)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def spd(d, n):
        M = rng.standard_normal((n, d, d))
        return np.einsum("nij,nkj->nik", M, M) + d * np.eye(d)

    A = 0.97 * (np.eye(dx) + 0.05 * rng.standard_normal((T, dx, dx)))
    B = 0.1 * rng.standard_normal((T, dx, du))
    p = dict(
        Cxx=spd(dx, T + 1),
        cx=rng.standard_normal((T + 1, dx)),
        Cuu=spd(du, T + 1),
        cu=rng.standard_normal((T + 1, du)),
        Cxu=0.1 * rng.standard_normal((T + 1, dx, du)),
        c0=np.zeros(T + 1),
        A=A,
        B=B,
    )
    if batch:
        p = {k: np.broadcast_to(v, (batch,) + v.shape).copy() for k, v in p.items()}
        # decorrelate instances slightly so XLA can't fold the batch
        p["cx"] = p["cx"] + 0.01 * rng.standard_normal(p["cx"].shape)
    if dtype is None:
        return p
    return {k: jnp.asarray(v, dtype) for k, v in p.items()}


def main():
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.pscan_lqr import pilqr_backward
    from trajopt_tpu.core.scan_lqr import ilqr_backward
    from trajopt_tpu.core.types import QuadraticCost
    from trajopt_tpu.utils.native import bench_backward_native

    T, dx, du = 1000, 4, 2
    BATCH = 128
    dtype = jnp.float32
    dev = jax.devices()[0]

    p = _problem(T, dx, du, BATCH, dtype)
    cost = QuadraticCost(
        Cxx=p["Cxx"], cx=p["cx"], Cuu=p["Cuu"], cu=p["cu"], Cxu=p["Cxu"], c0=p["c0"]
    )

    seq = jax.jit(
        jax.vmap(lambda c, A, B: ilqr_backward(c, A, B, 0.0, 1)[0])
    )
    par = jax.jit(jax.vmap(lambda c, A, B: pilqr_backward(c, A, B)[0]))

    def timeit(fn, reps=5):
        out = fn(cost, p["A"], p["B"])  # compile + warm
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(reps):
            out = fn(cost, p["A"], p["B"])
        jax.block_until_ready(out)
        return (time.perf_counter() - start) / reps

    t_seq = timeit(seq)
    t_par = timeit(par)
    t_dev = min(t_seq, t_par)
    dev_tps = BATCH * T / t_dev

    # CPU C++ baseline on the identical single-instance problem (per-timestep cost is
    # batch-independent for the sequential loop; scale by the batch for parity)
    single = _problem(T, dx, du, 0)
    reps = 20
    t_cpu = bench_backward_native(
        single["Cxx"], single["cx"], single["Cuu"], single["cu"],
        single["Cxu"], single["A"], single["B"], 0.0, reps=reps,
    )
    cpu_tps = reps * T / t_cpu

    result = {
        "metric": "ilqr_backward_timesteps_per_sec",
        "value": round(dev_tps, 1),
        "unit": f"timesteps/s ({dev.platform}, batch={BATCH}, T={T}, dx={dx}, du={du}, "
                f"best of seq-scan {BATCH*T/t_seq:.3g} / assoc-scan {BATCH*T/t_par:.3g})",
        "vs_baseline": round(dev_tps / cpu_tps, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
