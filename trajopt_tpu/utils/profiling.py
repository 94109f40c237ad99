"""Profiling, honest device timing, and roofline accounting.

The reference has no tracing/profiling at all (SURVEY.md §5); this module provides
the three tools the TPU build needs:

* :func:`trace` — a context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace (per-kernel timelines, XLA op breakdown).
* :func:`chained_seconds_per_call` — wall-clock per call measured with an on-device
  dependency-chained loop + a host fetch of a scalar.  Required because naive
  ``block_until_ready`` timing is WRONG on transports that acknowledge before
  remote execution finishes (observed >1000x overstatement through a remote-TPU
  tunnel); a data dependency between iterations plus an actual device→host read
  cannot be faked.
* :func:`backward_roofline` — achieved timesteps/s, HBM bandwidth, and FLOP rate
  for the LQR backward pass against configurable chip peaks, so kernel work can be
  judged against the memory-bound ceiling rather than against other code.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/jax-trace"):`` — profile the enclosed device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_seconds_per_call(
    fn: Callable,
    fold: Callable,
    args: tuple,
    reps: int = 10,
) -> float:
    """Seconds per ``fn(*args)`` call, timed as one on-device chained loop.

    ``fold(args, out) -> args`` must inject a numerically-inert data dependency of
    ``out`` into the next iteration's inputs (e.g. add ``1e-30 * jnp.sum(out)`` to
    one input — exact zero in f32, but the scheduler cannot reorder across it).

    The per-call time is obtained by DIFFERENCING two runs of one executable at
    trip counts ``reps`` and ``2·reps`` (the trip count is a traced fori_loop
    bound): remote-TPU transports add a ~50 ms CONSTANT to every host fetch
    (xprof: a 50×24 µs chained loop showed 1.3 ms device time inside a 49 ms
    wall fetch), which would otherwise swamp short kernels.  Size ``reps`` so
    ``reps × per-call`` comfortably exceeds the transport jitter (~5 ms).
    """
    import jax.numpy as jnp

    def chained(n, *a):
        def body(_, a):
            return fold(a, fn(*a))

        a = lax.fori_loop(0, n, body, a)
        # the fetched scalar must depend on EVERY leaf — if it misses the one the
        # fold perturbs, XLA dead-code-eliminates the entire loop and the timing
        # silently measures nothing
        return sum(leaf.ravel()[0].astype("float32") for leaf in jax.tree.leaves(a))

    f = jax.jit(chained)
    float(f(jnp.int32(reps), *args))  # compile + warm; the fetch forces completion

    def run(n):
        start = time.perf_counter()
        float(f(jnp.int32(n), *args))
        return time.perf_counter() - start

    t1 = min(run(reps) for _ in range(2))
    t2 = min(run(2 * reps) for _ in range(2))
    return max((t2 - t1) / reps, 1e-12)


def backward_roofline(
    seconds_per_call: float,
    batch: int,
    T: int,
    dx: int,
    du: int,
    *,
    dtype_bytes: int = 4,
    hbm_peak_gbs: float = 819.0,   # TPU v5e
    vpu_peak_tflops: float = 7.7,  # f32 VPU estimate, v5e
) -> dict:
    """Achieved rates for one regularized iLQR backward pass vs chip ceilings.

    Bytes: every per-timestep block (Cxx, cx, Cuu, cu, Cxu, A, B) is streamed from
    HBM once and (K, kff) written once.  FLOPs: the ~10 small matmuls + Cholesky +
    two triangular solves per timestep, ≈ 2·(6·dx³-ish) — an estimate for ranking,
    not accounting.
    """
    in_entries = dx * dx * 2 + dx * du * 2 + du * du + dx + du
    out_entries = du * dx + du
    bytes_per_ts = (in_entries + out_entries) * dtype_bytes
    flops_per_ts = 2 * (4 * dx**3 + 4 * dx * dx * du + 2 * dx * du * du + du**3)

    ts_per_s = batch * T / seconds_per_call
    gbs = ts_per_s * bytes_per_ts / 1e9
    tflops = ts_per_s * flops_per_ts / 1e12
    return {
        "timesteps_per_s": ts_per_s,
        "achieved_GB_s": gbs,
        "hbm_fraction": gbs / hbm_peak_gbs,
        "achieved_TFLOP_s": tflops,
        "vpu_fraction": tflops / vpu_peak_tflops,
    }
