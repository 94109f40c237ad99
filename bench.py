"""Headline benchmark: iLQR iterations/sec at horizon 1000 + per-config extras.

BASELINE.json metric: "Riccati backward-pass timesteps/sec/chip; iLQR iters/sec at
horizon 1000".  The reference publishes no numbers (BASELINE.md), so the baseline is
*measured*: the identical backward pass as single-thread -O3 -march=native C++ on
this host's CPU (native/baseline.cpp — the role the reference's Armadillo/OpenBLAS
kernel plays, which itself is explicitly single-threaded, README.md:20).

Headline: **full iLQR iterations/sec at horizon 1000** (cartpole swing-up, dx=4) —
each iteration is the complete linearize → λ-escalated backward pass → vmapped
α-grid line search → accept/reject of ilqr/ilqr.py:136-237, compiled as one device
program with the batch axis primal (parallel/mpc.make_ilqr_solver_batched) and the
backward pass running as the packed lane-major Pallas kernel on its native layout
(core/pallas_lqr.py; pack once per iteration, λ-loop on packed operands).
``vs_baseline`` is CONSERVATIVE: the CPU denominator is the C++ *backward pass
alone* at T=1000 (one per iteration) — the reference's real iteration adds per-t
autograd linearization and Python rollout loops on top, so the true ratio is larger.

Extras cover the remaining BASELINE.md configs, all with the same chained
methodology: the packed backward-kernel timesteps/s, Riccati LQR at horizon 100,
eLQR cartpole iterations/s, BSP-iLQR light-dark MPC steps/s, and the batched GPS
dual-evaluation chain.

Timing methodology: REPS calls are chained on-device inside one jitted
``lax.fori_loop`` whose carry perturbs an input by ``1e-30 * <output scalar>`` (an
exact no-op in f32 that still forces a data dependency between iterations), and the
result is fetched to the host.  This measures true device compute even on transports
whose ``block_until_ready`` acks before remote execution finishes (naive
dispatch-loop timing overstates throughput by >1000x on such links).  The perturbed
scalar reads a SLICE of an output (e.g. the final time chunk of kff — which depends
on the whole recursion) so the chain itself adds no avoidable HBM re-reads.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

from __future__ import annotations

import json
import sys
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
        c=0.01 * rng.standard_normal((T, dx)),
    )
    if batch:
        p = {k: np.broadcast_to(v, (batch,) + v.shape).copy() for k, v in p.items()}
        # decorrelate instances slightly so XLA can't fold the batch
        p["cx"] = p["cx"] + 0.01 * rng.standard_normal(p["cx"].shape)
    if dtype is None:
        return p
    return {k: jnp.asarray(v, dtype) for k, v in p.items()}


SPREADS = {}  # row name -> (lo, hi) from repeated _chain measurements


def _record_spread(name, rate_from_sec, spread_sec):
    """Store a row's (lo, hi) rate spread (rate is 1/sec-monotone: hi maps lo)."""
    lo_sec, hi_sec = spread_sec
    SPREADS[name] = (round(rate_from_sec(hi_sec), 1), round(rate_from_sec(lo_sec), 1))


def _chain(fn, args, perturb, reps, const_args=(), repeats=1):
    """Seconds per call: on-device fori_loop chaining ``fn`` via ``perturb``.

    ``fn(*args) -> out``; ``perturb(args, out) -> args`` must inject a
    ``1e-30``-scaled dependency of (a slice of) ``out`` into one input leaf.
    The fetched scalar touches every carry leaf so XLA cannot DCE the loop.

    The remote-TPU transport adds a ~50 ms CONSTANT to every host fetch
    (measured via xprof: a 50×24 µs chained loop showed 1.3 ms device time
    inside a 49 ms wall fetch), so the per-call time is obtained by
    DIFFERENCING two runs of the same compiled program at trip counts
    ``reps`` and ``2·reps`` — the constant cancels, the dependency-chain
    honesty is preserved.  The trip count is a traced ``fori_loop`` bound, so
    both runs share one executable.

    ``const_args`` are loop-invariant operands passed to ``fn`` AFTER the
    carried ``args``.  They enter through the jit boundary as real arguments —
    closing over large device arrays instead would bake them into the
    executable as multi-GB constants and ship them through the remote-compile
    path (observed: a 3.5 GB captured-constants lowering that wedged the
    remote terminal)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n_carry = len(args)

    def chained(n, *all_args):
        a, c = all_args[:n_carry], all_args[n_carry:]

        def body(_, a):
            return perturb(a, fn(*a, *c))

        a = lax.fori_loop(0, n, body, a)
        return sum(leaf.ravel()[0].astype("float32") for leaf in jax.tree.leaves(a))

    f = jax.jit(chained)
    float(f(jnp.int32(reps), *args, *const_args))  # compile + warm

    def run(n):
        start = time.perf_counter()
        float(f(jnp.int32(n), *args, *const_args))
        return time.perf_counter() - start

    # best-of-2 per trip count to shave transport jitter.  The difference must
    # clear the MEASURED jitter floor: under host-side noise t2−t1 can come out
    # ~0 or negative, and a bare max(…, eps) clamp then reports a physically
    # impossible rate (observed: 1e17 ts/s for an HBM-bound kernel).  Retry
    # with doubled trip counts — the device time scales with n while the
    # transport constant and its jitter do not — until the signal dominates.
    def once():
        n = reps
        for _ in range(4):
            r1 = [run(n) for _ in range(2)]
            r2 = [run(2 * n) for _ in range(2)]
            t1, t2 = min(r1), min(r2)
            jitter = 0.5 * (abs(r1[0] - r1[1]) + abs(r2[0] - r2[1]))
            d = t2 - t1
            if d > max(3.0 * jitter, 1e-4):
                return d / n
            n *= 2
        if d > 0:
            return d / n
        # non-differenced upper bound: includes the ~50 ms fetch constant, so
        # it UNDERSTATES fast kernels — but it can never explode
        return t1 / n

    if repeats == 1:
        return once()
    # repeats > 1: one executable, several full differenced measurements —
    # run-to-run spread on the remote-TPU transport is real (VERDICT r4
    # weak #5), so key rows report the median and the observed spread
    vals = sorted(once() for _ in range(repeats))
    return vals[len(vals) // 2], (vals[0], vals[-1])


def bench_ilqr_iters(on_tpu):
    """Headline: full iLQR iterations/sec at horizon 1000 (batched cartpole).

    Engine fallback chain (pallas/pallas → pallas/scan → scan/scan): the
    headline must always emit a number, so a Mosaic regression in one engine
    degrades the measurement instead of killing the whole bench line.  Returns
    (instance-iters/s, sec per batch-iter, engine tag)."""
    import jax
    import jax.numpy as jnp

    import trajopt_tpu
    from trajopt_tpu.parallel.mpc import make_ilqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    # CPU fallback shrinks the config: the full 2048×1000×10 headline takes
    # hours on the single-core host and the fallback's job is to EMIT a line,
    # not to compete — the unit string records platform and config
    T, N, nb_iter, reps = (1000, 2048, 10, 2) if on_tpu else (100, 64, 3, 2)

    x0 = jnp.zeros((N, env.dm_state), jnp.float32)
    x0 = x0.at[:, 0].add(0.01 * jnp.arange(N, dtype=jnp.float32))

    def perturb(args, state):
        (x0s,) = args
        return (x0s + 1e-30 * jnp.sum(state.uref[:, 0], axis=-1, keepdims=True),)

    engines = (
        [("pallas-fused", "pallas"), ("pallas", "pallas"),
         ("pallas", "scan"), ("scan", "scan")]
        if on_tpu else [("scan", "scan")]
    )
    last_err = None
    for backward, rollout in engines:
        try:
            solve = make_ilqr_solver_batched(
                env, T, nb_iter=nb_iter,
                backward=backward, time_chunk=8, rollout=rollout,
            )

            def fn(x0s):
                state, _ = solve(x0s)
                return state

            sec, spread = _chain(fn, (x0,), perturb, reps, repeats=3)
            _record_spread("headline", lambda sc: N * nb_iter / sc, spread)
            return (N * nb_iter / sec, sec / nb_iter,
                    f"backward={backward},rollout={rollout}", T, N)
        except Exception as e:  # pragma: no cover - defensive fallback
            last_err = e
            print(f"headline engine {backward}/{rollout} failed: {e!r}",
                  file=sys.stderr)
    raise last_err


def bench_backward_packed(T, dx, du, batch, reps=20):
    """Packed lane-major Pallas backward kernel on its native operands.

    The batch is broadcast + decorrelated ON DEVICE from a single-instance host
    problem — shipping (batch, T, …) operands through the remote-TPU tunnel
    would otherwise dominate the bench wall-clock (~2 GB at batch 16384)."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.pallas_lqr import pack_lanes, pallas_ilqr_backward_packed
    from trajopt_tpu.core.types import QuadraticCost

    one = {k: jnp.asarray(v, jnp.float32) for k, v in _problem(T, dx, du, 0).items()}
    lam = jnp.zeros(batch, jnp.float32)

    def build_and_pack(one):
        b = {k: jnp.broadcast_to(v, (batch,) + v.shape) for k, v in one.items()}
        cx = b["cx"] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), b["cx"].shape, jnp.float32
        )  # decorrelate instances so XLA can't fold the batch
        cost = QuadraticCost(
            Cxx=b["Cxx"], cx=cx, Cuu=b["Cuu"], cu=b["cu"], Cxu=b["Cxu"], c0=b["c0"]
        )
        return pack_lanes(cost, b["A"], b["B"], lam, time_chunk=8)

    packed = jax.block_until_ready(jax.jit(build_and_pack)(one))

    def fn(cx, pk):
        pk = dict(pk)
        pk["cx"] = cx
        _, kff, _, _ = pallas_ilqr_backward_packed(pk, dx, du, 1, time_chunk=8)
        return kff

    def perturb(args, kff):
        # kff[0] is the FINAL chunk of the backward recursion — it depends on every
        # input, and reading one chunk adds no measurable HBM traffic to the chain
        return (args[0] + 1e-30 * jnp.sum(kff[0]),)

    sec = _chain(fn, (packed["cx"],), perturb, reps, const_args=(packed,))
    return batch * T / sec


def bench_pscan_latency(T=1000, dx=4, du=2, reps=800):
    """Batch-1 backward-pass LATENCY (µs/call) of the Pallas parallel-in-time
    kernel (core/pallas_pscan.py — whole log-depth tree in VMEM, time on lanes)
    vs the lane-major XLA associative scan it replaces.  Returns
    (pallas_us, assoc_us)."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.pallas_pscan import pallas_pilqr_backward
    from trajopt_tpu.core.pscan_lqr import pilqr_backward_lanes
    from trajopt_tpu.core.types import QuadraticCost

    p = _problem(T, dx, du, 0)
    cost = QuadraticCost(*[
        jnp.asarray(p[k], jnp.float32)
        for k in ["Cxx", "cx", "Cuu", "cu", "Cxu", "c0"]
    ])
    A = jnp.asarray(p["A"], jnp.float32)
    B = jnp.asarray(p["B"], jnp.float32)

    def perturb(args, pol):
        return (args[0]._replace(cx=args[0].cx + 1e-30 * jnp.sum(pol.kff)),)

    t_pallas = _chain(
        lambda c: pallas_pilqr_backward(c, A, B)[0], (cost,), perturb, reps
    )
    t_assoc = _chain(
        lambda c: pilqr_backward_lanes(c, A, B)[0], (cost,), perturb, reps
    )
    return t_pallas * 1e6, t_assoc * 1e6


def bench_mpc_batch1_latency(T=100, nb_iter=3, reps=50, backward="pallas-pscan"):
    """Single-problem MPC replan latency (ms): one full compiled iLQR solve
    (linearize → λ-loop backward → α-grid line search × nb_iter) at batch 1 —
    the real-time-control number, with the parallel-in-time Pallas backward
    (core/pallas_pscan.py) collapsing the O(T) recursion to O(log T) depth.
    The reference's per-replan cost is its Python iteration loop
    (ilqr/ilqr.py:136-237) — seconds at this horizon."""
    import jax.numpy as jnp

    import trajopt_tpu
    from trajopt_tpu.parallel.mpc import make_ilqr_solver

    env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05)
    solve = make_ilqr_solver(env, T, nb_iter=nb_iter, backward=backward)
    x0 = jnp.asarray(np.array(env.x0), jnp.float32)

    def fn(x0):
        state, _ = solve(x0)
        return state

    def perturb(args, state):
        return (args[0] + 1e-30 * jnp.sum(state.uref[0]),)

    sec = _chain(fn, (x0,), perturb, reps)
    return sec * 1e3


def bench_riccati(T=100, batch=4096, on_tpu=True, reps=400):
    """Riccati LQR recursion (BASELINE config #1): exact backward pass + gains at
    T=100 — on TPU, the packed Pallas kernel via the homogeneous-coordinate
    reduction (core/pallas_lqr.pallas_riccati_backward); elsewhere the vmapped
    scan kernel."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.types import LinearDynamics, QuadraticCost

    dx, du = 2, 1
    one = {k: jnp.asarray(v, jnp.float32) for k, v in _problem(T, dx, du, 0).items()}

    def build(one):
        b = {k: jnp.broadcast_to(v, (batch,) + v.shape) for k, v in one.items()}
        cx = b["cx"] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), b["cx"].shape, jnp.float32
        )
        cost = QuadraticCost(
            Cxx=b["Cxx"], cx=cx, Cuu=b["Cuu"], cu=b["cu"], Cxu=b["Cxu"], c0=b["c0"]
        )
        return cost, b["A"], b["B"], b["c"]

    cost, A, B, c = jax.block_until_ready(jax.jit(build)(one))

    if on_tpu:
        from trajopt_tpu.core.pallas_lqr import (
            _augment_riccati,
            pack_lanes,
            pallas_ilqr_backward_packed,
        )

        cost_aug, A_aug, B_aug = jax.block_until_ready(
            jax.jit(_augment_riccati)(cost, A, B, c)
        )
        lam = jnp.zeros(batch, jnp.float32)
        packed = jax.block_until_ready(
            jax.jit(lambda ca, aa, ba: pack_lanes(ca, aa, ba, lam, time_chunk=4))(
                cost_aug, A_aug, B_aug
            )
        )

        def fn(cxx, pk):
            pk = dict(pk)
            pk["cxx"] = cxx
            K, _, _, _ = pallas_ilqr_backward_packed(
                pk, dx + 1, du, 1, time_chunk=4
            )
            return K

        def perturb(args, K):
            return (args[0] + 1e-30 * jnp.sum(K[0]),)

        sec = _chain(fn, (packed["cxx"],), perturb, reps, const_args=(packed,))
        return batch * T / sec

    from trajopt_tpu.core.scan_lqr import riccati_backward

    reps = min(reps, 3)
    dyn = LinearDynamics(A=A, B=B, c=c)

    def fn(cost, dyn):
        ctl, _ = jax.vmap(riccati_backward)(cost, dyn)
        return ctl.kff

    def perturb(args, kff):
        cost, dyn = args
        return (cost._replace(cx=cost.cx + 1e-30 * jnp.sum(kff[:, 0])), dyn)

    sec = _chain(fn, (cost, dyn), perturb, reps)
    return batch * T / sec


def bench_elqr(T=100, batch=64, nb_iter=10, reps=3, engine="auto"):
    """eLQR cartpole swing-up (BASELINE config #3): iterations/sec.

    Runs the *default-engine* batched solver (engine='auto' resolves to the
    single-launch whole-solve kernel for batches ≤ 128 lanes, the streamed
    Pallas sweeps beyond, the vmapped scan solver on CPU), so the BASELINE
    row measures what a user actually gets (VERDICT r3 weak #4)."""
    import jax
    import jax.numpy as jnp

    import trajopt_tpu
    from trajopt_tpu.parallel.elqr import make_elqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    solve = make_elqr_solver_batched(env, T, nb_iter=nb_iter, engine=engine)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    x0s = jnp.zeros((batch, env.dm_state), jnp.float32)
    x0s = x0s.at[:, 1].add(0.001 * jnp.arange(batch, dtype=jnp.float32))

    def fn(x0s):
        _, _, us, _ = solve(keys, x0s)
        return us

    def perturb(args, us):
        return (args[0] + 1e-30 * jnp.sum(us[:, 0], axis=-1, keepdims=True),)

    sec = _chain(fn, (x0s,), perturb, reps)
    return batch * nb_iter / sec


def bench_elqr_pallas(T=100, batch=1024, nb_iter=10, reps=3):
    """eLQR cartpole with the fused Pallas sweep engine
    (core/pallas_elqr.py): three lane-major launches per iteration for the
    whole batch instead of `batch` vmapped scan chains.  iterations/sec."""
    import jax
    import jax.numpy as jnp

    import trajopt_tpu
    from trajopt_tpu.parallel.elqr import make_elqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    solve = make_elqr_solver_batched(env, T, nb_iter=nb_iter, engine="pallas")
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    x0s = jnp.zeros((batch, env.dm_state), jnp.float32)
    x0s = x0s.at[:, 1].add(0.001 * jnp.arange(batch, dtype=jnp.float32))

    def fn(x0s):
        _, _, us, _ = solve(keys, x0s)
        return us

    def perturb(args, us):
        return (args[0] + 1e-30 * jnp.sum(us[:, 0], axis=-1, keepdims=True),)

    sec = _chain(fn, (x0s,), perturb, reps)
    return batch * nb_iter / sec


def bench_bsp(horizon=25, nb_steps=50, nb_iter=10, reps=10, engine="auto"):
    """BSP-iLQR light-dark MPC (BASELINE config #4): control steps/sec (replan +
    act + EKF update per step — the examples/bspilqr/lightdark.py loop).

    ``engine='auto'`` resolves to the single-launch episode kernel
    (core/pallas_bsp.py) on TPU — the whole 50-step control loop is ONE Pallas
    launch; ``'scan'`` is the per-step compiled-solver loop."""
    import jax
    import jax.numpy as jnp

    import trajopt_tpu
    from trajopt_tpu.parallel.bsp import make_bsp_mpc_runner

    env = trajopt_tpu.make("LightDark-TO-v0")
    run = make_bsp_mpc_runner(env, horizon, nb_steps, nb_iter=nb_iter,
                              engine=engine)
    mu0, _ = env.init()
    x0 = jnp.asarray(np.array(mu0), jnp.float32)
    key = jax.random.PRNGKey(1)

    def fn(x0):
        _, _, _, us, _ = run(key, x0)
        return us

    def perturb(args, us):
        return (args[0] + 1e-30 * jnp.sum(us[0]),)

    sec = _chain(fn, (x0,), perturb, reps)
    return nb_steps / sec


def _belief_problem(T, rng, b=2, a=2):
    """One random lightdark-dim belief problem (cost expansion + dynamics
    expansion, numpy float64) — shared by the device bench and the native CPU
    denominator so both time the exact same problem class."""
    from trajopt_tpu.core.belief import (
        BeliefCostExpansion,
        BeliefDynamicsExpansion,
    )

    def spd(d, n, s=1.0):
        M = rng.standard_normal((n, d, d))
        return s * np.einsum("nij,nkj->nik", M, M) + d * np.eye(d)

    cost = BeliefCostExpansion(
        Q=spd(b, T + 1), q=rng.standard_normal((T + 1, b)),
        R=spd(a, T + 1, 0.5), r=rng.standard_normal((T + 1, a)),
        P=0.1 * rng.standard_normal((T + 1, b, a)),
        p=rng.standard_normal((T + 1, b * b)),
    )
    dyn = BeliefDynamicsExpansion(
        F=np.broadcast_to(np.eye(b), (T, b, b))
          + 0.05 * rng.standard_normal((T, b, b)),
        G=0.1 * rng.standard_normal((T, b, a)),
        X=0.01 * rng.standard_normal((T, b * b, b)),
        Y=0.01 * rng.standard_normal((T, b * b, b * b)),
        Z=0.01 * rng.standard_normal((T, b * b, a)),
        T=0.01 * rng.standard_normal((T, b * b, b)),
        U=0.01 * rng.standard_normal((T, b * b, b * b)),
        V=0.01 * rng.standard_normal((T, b * b, a)),
    )
    return cost, dyn


def bench_bsp_backward_batched(T=25, batch=4096, reps=50, engine="scan"):
    """Batched belief-value backward recursion (vec-channel Riccati) — the
    BASELINE protocol's backward-pass ts/s for the bspilqr config over a batch
    of lightdark-dim problems (b=2, a=2).  ``engine='scan'`` vmaps the scan
    kernel; ``engine='pallas'`` runs the lane-major packed kernel
    (core/pallas_belief.py, TPU only)."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.belief import bsp_backward
    from trajopt_tpu.core.pallas_belief import pallas_bsp_backward

    one_cost, one_dyn = _belief_problem(T, np.random.default_rng(5))
    one = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), (one_cost, one_dyn))

    def build(one):
        cost, dyn = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
        )
        q = cost.q + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), cost.q.shape, jnp.float32
        )  # decorrelate instances so XLA can't fold the batch
        return cost._replace(q=q), dyn

    cost, dyn = jax.block_until_ready(jax.jit(build)(one))
    lmbda = jnp.float32(0.1)

    lam_b = jnp.full((batch,), lmbda, jnp.float32)

    def fn(q, cost, dyn):
        cost = cost._replace(q=q)
        if engine == "pallas":
            lc, *_ = pallas_bsp_backward(cost, dyn, lam_b, 1)
        else:
            lc, *_ = jax.vmap(lambda c, d: bsp_backward(c, d, lmbda, 1))(
                cost, dyn
            )
        return lc.kff

    def perturb(args, kff):
        return (args[0] + 1e-30 * jnp.sum(kff[:, 0]),)

    sec = _chain(fn, (cost.q,), perturb, reps, const_args=(cost, dyn))
    return batch * T / sec


def _gps_dual_operands(T, dx, du, batch):
    """Batch-leading GPS dual operands, built ON DEVICE from one host instance."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.types import (
        LinearGaussianDynamics,
        LinearGaussianPolicy,
        QuadraticCost,
    )

    one = {k: jnp.asarray(v, jnp.float32) for k, v in _problem(T, dx, du, 0).items()}

    def build(one):
        b = {k: jnp.broadcast_to(v, (batch,) + v.shape) for k, v in one.items()}
        cx = b["cx"] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), b["cx"].shape, jnp.float32
        )
        cost = QuadraticCost(
            Cxx=b["Cxx"], cx=cx, Cuu=b["Cuu"], cu=b["cu"], Cxu=b["Cxu"], c0=b["c0"]
        )
        dyn = LinearGaussianDynamics(
            A=b["A"], B=b["B"], c=b["c"],
            sigma=jnp.broadcast_to(1e-4 * jnp.eye(dx), (batch, T, dx, dx)).astype(
                jnp.float32
            ),
        )
        pol = LinearGaussianPolicy(
            K=0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, T, du, dx), jnp.float32),
            kff=0.1 * jax.random.normal(jax.random.PRNGKey(2), (batch, T, du), jnp.float32),
            sigma=jnp.broadcast_to(jnp.eye(du), (batch, T, du, du)).astype(
                jnp.float32
            ),
        )
        mu0 = jnp.zeros((batch, dx), jnp.float32)
        sig0 = jnp.broadcast_to(0.1 * jnp.eye(dx), (batch, dx, dx)).astype(jnp.float32)
        return cost, dyn, pol, mu0, sig0

    return jax.jit(build)(one)


def bench_gps_dual(T=1000, batch=4096, on_tpu=True, reps=25):
    """Batched GPS dual-evaluation chain (BASELINE config #5): KL-augment + soft
    backward, then Gaussian forward + KL — on TPU, TWO packed lane-major Pallas
    launches on pre-packed operands (core/pallas_gps.py), the layout the compiled
    solver's bisection loop runs; elsewhere the vmapped lax.scan chain."""
    import jax
    import jax.numpy as jnp

    dx, du = 4, 2
    cost, dyn, pol, mu0, sig0 = _gps_dual_operands(T, dx, du, batch)
    alpha = jnp.full((batch, T), 10.0, jnp.float32)

    if on_tpu:
        from trajopt_tpu.core.pallas_gps import (
            pack_gps_alpha,
            pack_gps_lanes,
            pallas_gps_backward_packed,
            pallas_gps_forward_kl_packed,
        )

        packed = jax.block_until_ready(
            jax.jit(
                lambda c, d, p, m, s: pack_gps_lanes(c, d, p, m, s, time_chunk=8)
            )(cost, dyn, pol, mu0, sig0)
        )
        alpha_l = jax.block_until_ready(
            jax.jit(lambda a: pack_gps_alpha(a, time_chunk=8))(alpha)
        )

        def fn(cx, pk, al):
            pk = dict(pk)
            pk["cx"] = cx
            K_l, kff_l, sigc_l, _, _, _, _ = pallas_gps_backward_packed(
                pk, al, dx, du, time_chunk=8
            )
            kl_l, _, _ = pallas_gps_forward_kl_packed(
                pk, K_l, kff_l, sigc_l, dx, du, time_chunk=8
            )
            return kl_l

        def perturb(args, kl_l):
            return (args[0] + 1e-30 * jnp.sum(kl_l),)

        sec = _chain(fn, (packed["cx"],), perturb, reps,
                     const_args=(packed, alpha_l))
        return batch * T / sec

    from trajopt_tpu.core.scan_lqr import (
        augment_cost_kl,
        gaussian_forward,
        gps_backward,
        policy_kl,
    )

    def dual_one(cost, dyn, pol, alpha, mu0, sig0):
        ag = augment_cost_kl(cost, pol, alpha)
        lgc, value, _, _ = gps_backward(ag, dyn, alpha)
        xdist, _, _ = gaussian_forward(dyn, lgc, mu0, sig0)
        kl = policy_kl(lgc, pol, jax.tree.map(lambda x: x[:-1], xdist))
        return jnp.sum(kl)

    def fn(cost):
        return jax.vmap(dual_one)(cost, dyn, pol, alpha, mu0, sig0)

    def perturb(args, kl):
        cost = args[0]
        return (cost._replace(cx=cost.cx + 1e-30 * jnp.sum(kl)),)

    sec = _chain(fn, (cost,), perturb, reps)
    return batch * T / sec


def bench_rgps_fixed_point(T=100, batch=8, reps=5, engine="scan"):
    """RGPS adversary fixed-point trip (SURVEY §3.4, the reference's deepest hot
    path): one `parameter_backward_pass` (Kronecker-lifted MatrixNormal solve,
    rgps/src/util.cpp:626-798) + one `cubature_forward_pass` (util.cpp:232-361)
    + KL damping, vmapped over a batch of problems.  Returns timesteps/s.

    ``engine='pallas'`` runs the trip as the two lane-major Pallas launches of
    core/pallas_rgps.py (the default fixed-point path of the compiled solver on
    TPU) — the trip additionally evaluates the geodesic damping in-kernel,
    which the scan trip's XLA program DCEs away, so the comparison is
    conservative for the Pallas row."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.core.cubature import (
        cubature_forward_pass,
        parameter_augment_cost,
        parameter_backward_pass,
    )
    from trajopt_tpu.core.scan_lqr import gaussian_interp_kl, gaussian_kl
    from trajopt_tpu.core.types import (
        LinearGaussianPolicy,
        MatrixNormalParams,
        QuadraticCost,
    )

    dx, du = 4, 2
    p1 = dx + du + 1
    pdim = dx * p1
    one = {k: jnp.asarray(v, jnp.float32) for k, v in _problem(T, dx, du, 0).items()}

    def build(one):
        b = {k: jnp.broadcast_to(v, (batch,) + v.shape) for k, v in one.items()}
        cost = QuadraticCost(
            Cxx=b["Cxx"],
            cx=b["cx"] + 0.01 * jax.random.normal(
                jax.random.PRNGKey(0), b["cx"].shape, jnp.float32
            ),
            Cuu=b["Cuu"], cu=b["cu"], Cxu=b["Cxu"], c0=b["c0"],
        )
        # nominal parameter distribution around the true (A, B, c)
        theta = jnp.concatenate(
            [jnp.swapaxes(b["A"], -1, -2).reshape(batch, T, dx * dx),
             jnp.swapaxes(b["B"], -1, -2).reshape(batch, T, du * dx),
             b["c"]], axis=-1,
        )
        nominal = MatrixNormalParams(
            mu=theta,
            sigma=jnp.broadcast_to(
                1e-4 * jnp.eye(pdim), (batch, T, pdim, pdim)
            ).astype(jnp.float32),
        )
        ctl = LinearGaussianPolicy(
            K=0.05 * jax.random.normal(jax.random.PRNGKey(1), (batch, T, du, dx), jnp.float32),
            kff=0.05 * jax.random.normal(jax.random.PRNGKey(2), (batch, T, du), jnp.float32),
            sigma=jnp.broadcast_to(jnp.eye(du), (batch, T, du, du)).astype(
                jnp.float32
            ),
        )
        noise = jnp.broadcast_to(1e-4 * jnp.eye(dx), (batch, T, dx, dx)).astype(
            jnp.float32
        )
        mu0 = jnp.zeros((batch, dx), jnp.float32)
        sigma0 = jnp.broadcast_to(0.01 * jnp.eye(dx), (batch, dx, dx)).astype(
            jnp.float32
        )

        def prep(cost_i, nom_i, ctl_i, noise_i, mu0_i, sigma0_i):
            agCpp, agcp, _ = parameter_augment_cost(nom_i, jnp.float32(100.0))
            xdist0, _, _ = cubature_forward_pass(
                mu0_i, sigma0_i, nom_i, noise_i, ctl_i
            )
            return agCpp, agcp, xdist0

        agCpp, agcp, xdist0 = jax.vmap(prep)(cost, nominal, ctl, noise, mu0, sigma0)
        return cost, ctl, noise, mu0, sigma0, agCpp, agcp, xdist0

    cost, ctl, noise, mu0, sigma0, agCpp, agcp, xdist0 = jax.block_until_ready(
        jax.jit(build)(one)
    )
    beta = jnp.full((), 200.0, jnp.float32)

    if engine == "pallas":
        from trajopt_tpu.core.pallas_rgps import (
            _pad_geom,
            pack_rgps_problem,
            pack_rgps_xdist,
            rgps_cubature_kl_packed,
            rgps_param_backward_packed,
        )
        from trajopt_tpu.core.pallas_lqr import _to_lanes
        from trajopt_tpu.core.types import GaussianSequence

        n_pad, _, _, _ = _pad_geom(batch)

        def pack_all(cost, ctl, noise, agCpp, agcp, q, mu0, sigma0):
            packed = pack_rgps_problem(
                cost, ctl, noise, agCpp, agcp,
                jnp.full((batch,), 200.0, jnp.float32),
            )
            qmu_l, qsig_l, qmuT, qsigT = pack_rgps_xdist(q, n_pad)
            mu0_l = _to_lanes(mu0[:, None], n_pad)[0]
            sig0_l = _to_lanes(sigma0[:, None], n_pad)[0]
            return packed, qmu_l, qsig_l, qmuT, qsigT, mu0_l, sig0_l

        q_seq = GaussianSequence(mu=xdist0.mu, sigma=xdist0.sigma)
        packed, qmu_l, qsig_l, qmuT, qsigT, mu0_l, sig0_l = (
            jax.block_until_ready(
                jax.jit(pack_all)(
                    cost, ctl, noise, agCpp, agcp, q_seq, mu0, sigma0
                )
            )
        )

        def trip_p(cx_l, packed, qmu_l, qsig_l, qmuT, qsigT, mu0_l, sig0_l):
            pk = dict(packed)
            pk["cx"] = cx_l
            muopt, sigopt, _ = rgps_param_backward_packed(
                pk, qmu_l, qsig_l, dx, du
            )
            kl_l, _, _, klT, _, _ = rgps_cubature_kl_packed(
                pk, muopt, sigopt, qmu_l, qsig_l, qmuT, qsigT,
                mu0_l, sig0_l, dx, du,
            )
            return jnp.sum(kl_l) + jnp.sum(klT)

        def perturb_p(args, kl):
            return (args[0] + 1e-30 * kl,)

        sec, spread = _chain(
            trip_p, (packed["cx"],), perturb_p, reps,
            const_args=(packed, qmu_l, qsig_l, qmuT, qsigT, mu0_l, sig0_l),
            repeats=3,
        )
        _record_spread(f"rgps_fixed_point_tps@{batch}",
                       lambda sc: batch * T / sc, spread)
        return batch * T / sec

    def trip(cx, cost, ctl, noise, mu0, sigma0, agCpp, agcp, q):
        cost = cost._replace(cx=cx)

        def one_i(cost_i, ctl_i, noise_i, mu0_i, sigma0_i, aC, ac, q_i):
            param, _, _ = parameter_backward_pass(
                q_i, ctl_i, noise_i, cost_i, aC, ac, beta
            )
            p_xdist, _, _ = cubature_forward_pass(
                mu0_i, sigma0_i, param, noise_i, ctl_i
            )
            q_new = gaussian_interp_kl(q_i, p_xdist, 1e-1)
            return jnp.sum(gaussian_kl(p_xdist, q_i)), q_new

        kl, _ = jax.vmap(one_i)(cost, ctl, noise, mu0, sigma0, agCpp, agcp, q)
        return kl

    def perturb(args, kl):
        return (args[0] + 1e-30 * jnp.sum(kl),)

    sec = _chain(
        trip, (cost.cx,), perturb, reps,
        const_args=(cost, ctl, noise, mu0, sigma0, agCpp, agcp, xdist0),
    )
    return batch * T / sec


def bench_rgps_solve(T=60, nb_iter=2, reps=2, beta_search="bisect"):
    """Full compiled robust-GPS solve (LQR-TO-v1, lr variant): outer
    iterations/sec.  The adversary dual dominates the solve; ``bisect`` runs
    the host's ~50 sequential fixed-point evaluations per outer iteration,
    ``parallel`` the round-4 vmapped grid search (beta_rounds=3 walls) —
    VERDICT r3 item 3's solver-level lever."""
    import jax
    import jax.numpy as jnp

    import trajopt_tpu
    from trajopt_tpu.parallel.rgps import make_rgps_solver

    env = trajopt_tpu.make("LQR-TO-v1")
    solve = make_rgps_solver(
        env, variant="lr", nb_steps=T, nb_iter=nb_iter,
        init_action_sigma=10.0, policy_kl_bound=0.25,
        param_nominal_kl_bound=50.0, nominal_variance=1e-8,
        beta_search=beta_search, alpha_search=beta_search,
    )
    mu0, sigma0 = env.init()
    mu0 = jnp.asarray(np.array(mu0), jnp.float32)
    sigma0 = jnp.asarray(np.array(sigma0), jnp.float32)

    def fn(mu0, sigma0):
        state, trace = solve(mu0, sigma0)
        return trace

    def perturb(args, trace):
        return (args[0] + 1e-30 * jnp.sum(trace), args[1])

    sec = _chain(fn, (mu0, sigma0), perturb, reps)
    return nb_iter / sec


def _cpu_denominators(T_gps):
    """Measured single-thread C++ denominators for every BASELINE config
    (native/baseline.cpp; parity-pinned against the JAX kernels in
    tests/test_utils.py and tests/test_bspilqr.py).  Each is a KERNEL-ONLY
    lower bound on the reference's per-iteration cost — its real iterations
    add per-t autograd linearization and Python loops on top — so every
    derived vs-CPU ratio is conservative.  Returns a dict of rates.

    Configs (BASELINE.md protocol):
      riccati:  the exact backward recursion at T=100 on the homogeneous-
                coordinate dims the TPU kernel runs (dx=3, du=1) -> ts/s.
      elqr:     2 value recursions (forward LQR + backward LQR) per iteration
                at cartpole dims (dx=4, du=1, T=100) -> iters/s.
      bsp:      nb_iter=10 belief-value backward passes (b=2, a=2, vec-channel
                4, T=25) per MPC step -> steps/s.
      gps:      the full dual-evaluation chain at dx=4, du=2 -> ts/s.
      rgps:     one adversary fixed-point trip (parameter backward + cubature
                forward + KL/damping) at dx=4, du=2, T=100 -> ts/s.
    """
    from trajopt_tpu.utils.native import (
        bench_backward_native,
        bench_bsp_backward_native,
        bench_gps_dual_chain_native,
        bench_rgps_fixed_point_native,
    )

    rng = np.random.default_rng(1)
    den = {}

    # riccati: T=100, homogeneous dims (dx+1=3, du=1)
    p = _problem(100, 3, 1, 0)
    reps = 200
    t = min(bench_backward_native(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["A"], p["B"],
        0.0, reps=reps) for _ in range(3))
    den["riccati_cpu_tps"] = 100 * reps / t

    # elqr: 2 value recursions per iteration at cartpole dims
    p = _problem(100, 4, 1, 0)
    t = min(bench_backward_native(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["A"], p["B"],
        0.0, reps=reps) for _ in range(3))
    den["elqr_cpu_iters_per_s"] = reps / (2.0 * t)

    # bsp: (a) the full per-control-step chain (FD expansion + λ backward +
    # 11-α rollouts + accept, ×10, + EKF update) — the honest apples-to-apples
    # denominator for the MPC steps/s row; (b) the 10-backward-passes-only
    # figure kept as the über-conservative variant (a strict lower bound on
    # the reference's per-step cost)
    from trajopt_tpu.utils.native import bench_bsp_mpc_step_native

    T_b = 25
    reps_m = 400
    t = min(bench_bsp_mpc_step_native(T=T_b, nb_iter=10, reps=reps_m)
            for _ in range(3))
    den["bsp_cpu_steps_per_s"] = reps_m / t
    bcost, bdyn = _belief_problem(T_b, rng)
    reps_b = 2000
    t = min(bench_bsp_backward_native(bcost, bdyn, 0.1, 1, reps=reps_b)
            for _ in range(3))
    den["bsp_cpu_steps_per_s_backward_only"] = reps_b / (10.0 * t)
    den["bsp_cpu_tps"] = T_b * reps_b / t

    # gps: full dual-evaluation chain, dims 4/2
    dx, du = 4, 2
    p = _problem(T_gps, dx, du, 0)
    K = 0.1 * rng.standard_normal((T_gps, du, dx))
    kffs = 0.1 * rng.standard_normal((T_gps, du))
    Sctl = np.broadcast_to(np.eye(du), (T_gps, du, du)).copy()
    Sdyn = np.broadcast_to(1e-4 * np.eye(dx), (T_gps, dx, dx)).copy()
    alpha = np.full(T_gps, 10.0)
    mu0 = np.zeros(dx)
    sig0 = 0.1 * np.eye(dx)
    reps_g = max(2, 2000 // T_gps)
    t = min(bench_gps_dual_chain_native(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["c0"],
        p["A"], p["B"], p["c"], Sdyn, K, kffs, Sctl, alpha, mu0, sig0,
        reps=reps_g) for _ in range(3))
    den["gps_cpu_tps"] = T_gps * reps_g / t

    # rgps: one adversary fixed-point trip at T=100, dims 4/2
    T_r = 100
    p = _problem(T_r, dx, du, 0)
    p1 = dx + du + 1
    pdim = dx * p1
    theta = np.concatenate(
        [np.swapaxes(p["A"], -1, -2).reshape(T_r, dx * dx),
         np.swapaxes(p["B"], -1, -2).reshape(T_r, du * dx), p["c"]], axis=-1,
    )
    lam_nom = 1e4  # (1e-4 I)^-1
    scale = 100.0
    agCpp = np.broadcast_to(0.5 * scale * lam_nom * np.eye(pdim),
                            (T_r, pdim, pdim)).copy()
    agcp = -scale * lam_nom * theta
    K = 0.05 * rng.standard_normal((T_r, du, dx))
    kffs = 0.05 * rng.standard_normal((T_r, du))
    Sctl = np.broadcast_to(np.eye(du), (T_r, du, du)).copy()
    Sdyn = np.broadcast_to(1e-4 * np.eye(dx), (T_r, dx, dx)).copy()
    qmu = np.zeros((T_r + 1, dx))
    qsig = np.broadcast_to(0.05 * np.eye(dx), (T_r + 1, dx, dx)).copy()
    reps_r = 5
    t = min(bench_rgps_fixed_point_native(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["c0"],
        K, kffs, Sctl, Sdyn, agCpp, agcp, 200.0, qmu, qsig,
        np.zeros(dx), 0.01 * np.eye(dx), reps=reps_r) for _ in range(3))
    den["rgps_cpu_tps"] = T_r * reps_r / t

    return den


def _try_bench(extras, failed_rows, name, fn):
    """Run one bench row; success lands in ``extras``, failure in
    ``failed_rows`` — a flagship row silently vanishing from the emitted JSON
    with rc=0 (round 4's bsp_lightdark_mpc_steps_per_s) must be impossible:
    the failure travels in the JSON line itself, not just stderr.  Covered by
    tests/test_utils.py::test_bench_failed_rows_land_in_json."""
    try:
        extras[name] = round(fn(), 1)
    except Exception as e:
        failed_rows[name] = f"{type(e).__name__}: {e}"[:300]
        print(f"bench {name} failed: {e!r}", file=sys.stderr)


def main():
    import os

    import jax

    from trajopt_tpu.utils.native import bench_backward_native

    # The accelerator plugin hijacks jax's backend selection (sitecustomize
    # wraps _get_backend_uncached), so the JAX_PLATFORMS env var CANNOT steer
    # the platform here — only the config API can (same reason tests/conftest
    # uses jax.config.update).  The fallback therefore re-execs with a private
    # flag and applies the config API before the first backend touch.
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    try:
        dev = jax.devices()[0]
    except RuntimeError as e:
        # The remote-TPU backend can be transiently unavailable (a wedged
        # session claim blocks init and then raises UNAVAILABLE).  The bench
        # must always emit its JSON line, so re-exec on the CPU backend
        # instead of dying; the platform is recorded in the unit string.
        if os.environ.get("BENCH_FORCE_CPU") != "1":
            print(
                f"device backend unavailable ({e!r}); re-running bench on CPU",
                file=sys.stderr,
            )
            sys.stderr.flush()
            env = dict(os.environ, BENCH_FORCE_CPU="1")
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        raise
    on_tpu = dev.platform != "cpu"
    T, dx, du = 1000, 4, 2

    extras = {}
    failed_rows = {}

    def try_bench(name, fn):
        _try_bench(extras, failed_rows, name, fn)

    # headline: full iLQR iterations/sec at horizon 1000
    iters_per_s, sec_per_batch_iter, engine_tag, hl_T, hl_N = bench_ilqr_iters(
        on_tpu
    )

    if on_tpu:  # Mosaic kernel paths: TPU only (tests cover interpreter mode)
        try_bench("ilqr_backward_packed_tps@16384", lambda: bench_backward_packed(T, dx, du, 16384))

        def pscan_pair():
            us_pallas, us_assoc = bench_pscan_latency()
            extras["pscan_batch1_assoc_us"] = round(us_assoc, 1)
            return us_pallas

        try_bench("pscan_batch1_pallas_us", pscan_pair)
        try_bench("mpc_batch1_replan_ms", bench_mpc_batch1_latency)
    try_bench(
        "riccati_T100_tps@4096",
        lambda: bench_riccati(on_tpu=on_tpu),
    )
    try_bench("elqr_cartpole_iters_per_s@64", bench_elqr)
    if on_tpu:
        try_bench("elqr_pallas_iters_per_s@1024", bench_elqr_pallas)
        try_bench("elqr_scan_iters_per_s@64",
                  lambda: bench_elqr(engine="scan"))
        try_bench("elqr_batch1_iters_per_s",
                  lambda: bench_elqr(batch=1, reps=10))
    try_bench("bsp_lightdark_mpc_steps_per_s", bench_bsp)
    if on_tpu:
        try_bench("bsp_mpc_scan_steps_per_s",
                  lambda: bench_bsp(engine="scan"))
    # CPU fallback runs measure a smaller batch with the scan engine — name
    # the extras key accordingly so cross-platform JSON lines stay comparable
    bsp_batch = 4096 if on_tpu else 256
    bsp_key = f"bsp_backward_tps@{bsp_batch}" + ("" if on_tpu else "_scan")
    try_bench(
        bsp_key,
        lambda: bench_bsp_backward_batched(
            batch=bsp_batch,
            reps=50 if on_tpu else 3,
            engine="pallas" if on_tpu else "scan",
        ),
    )
    gps_batch = 4096 if on_tpu else 512
    gps_key = f"gps_dual_eval_tps@{gps_batch}"
    try_bench(
        gps_key,
        lambda: bench_gps_dual(
            T=1000 if on_tpu else 100,
            batch=gps_batch,
            on_tpu=on_tpu,
        ),
    )
    try_bench(
        "rgps_fixed_point_tps@8",
        lambda: bench_rgps_fixed_point(
            engine="pallas" if on_tpu else "scan"
        ),
    )
    if on_tpu:
        try_bench("rgps_fixed_point_scan_tps@8", bench_rgps_fixed_point)
        try_bench(
            "rgps_fixed_point_tps@64",
            lambda: bench_rgps_fixed_point(batch=64, engine="pallas"),
        )
        try_bench(
            "rgps_fixed_point_scan_tps@64",
            lambda: bench_rgps_fixed_point(batch=64),
        )
        try_bench("rgps_solve_iters_per_s_bisect", bench_rgps_solve)
        try_bench(
            "rgps_solve_iters_per_s_parallel",
            lambda: bench_rgps_solve(beta_search="parallel"),
        )

    # per-config CPU denominators (native/baseline.cpp) -> conservative vs-CPU
    # ratios for every BASELINE config
    try:
        den = _cpu_denominators(T_gps=1000 if on_tpu else 100)
        ratios = [
            ("riccati_T100_tps@4096", "riccati_cpu_tps", "riccati_vs_cpu"),
            ("elqr_cartpole_iters_per_s@64", "elqr_cpu_iters_per_s",
             "elqr_vs_cpu"),
            ("bsp_lightdark_mpc_steps_per_s", "bsp_cpu_steps_per_s",
             "bsp_mpc_vs_cpu"),
            ("bsp_lightdark_mpc_steps_per_s",
             "bsp_cpu_steps_per_s_backward_only",
             "bsp_mpc_vs_cpu_backward_only"),
            (bsp_key, "bsp_cpu_tps", "bsp_vs_cpu"),
            (gps_key, "gps_cpu_tps", "gps_vs_cpu"),
            ("rgps_fixed_point_tps@8", "rgps_cpu_tps", "rgps_vs_cpu"),
            ("rgps_fixed_point_tps@64", "rgps_cpu_tps", "rgps_vs_cpu@64"),
            ("rgps_fixed_point_scan_tps@8", "rgps_cpu_tps",
             "rgps_scan_vs_cpu"),
            ("elqr_pallas_iters_per_s@1024", "elqr_cpu_iters_per_s",
             "elqr_pallas_vs_cpu"),
            ("elqr_scan_iters_per_s@64", "elqr_cpu_iters_per_s",
             "elqr_scan_vs_cpu"),
            ("elqr_batch1_iters_per_s", "elqr_cpu_iters_per_s",
             "elqr_batch1_vs_cpu"),
        ]
        for tpu_key, cpu_key, ratio_key in ratios:
            if tpu_key in extras:
                extras[ratio_key] = round(extras[tpu_key] / den[cpu_key], 2)
    except Exception as e:  # pragma: no cover - defensive: report, keep going
        print(f"cpu denominators failed: {e!r}", file=sys.stderr)

    # CPU C++ baseline: the backward pass alone at T=1000 (a strict LOWER bound on
    # the reference's per-iteration cost — its iteration adds per-t autograd
    # linearization and Python rollout loops).  Best of 3 blocks: the single-core
    # host is shared and a contended run would inflate vs_baseline.
    single = _problem(hl_T, dx, du, 0)
    reps = 20
    t_cpu = min(
        bench_backward_native(
            single["Cxx"], single["cx"], single["Cuu"], single["cu"],
            single["Cxu"], single["A"], single["B"], 0.0, reps=reps,
        )
        for _ in range(3)
    )
    cpu_iters_upper_bound = reps / t_cpu  # iterations/s if an iteration were ONLY the backward pass

    result = {
        "metric": f"ilqr_iters_per_sec_T{hl_T}",
        "value": round(iters_per_s, 1),
        "unit": (
            f"instance-iterations/s ({dev.platform}, cartpole dx=4, T={hl_T}, batch {hl_N}, {engine_tag}, "
            f"full linearize+backward+linesearch iteration = {sec_per_batch_iter * 1e3:.1f} ms/batch-iter; "
            f"chained on-device timing; vs_baseline is conservative: CPU denominator is the "
            f"C++ backward pass alone, {cpu_iters_upper_bound:.1f} it/s upper bound)"
        ),
        "vs_baseline": round(iters_per_s / cpu_iters_upper_bound, 2),
        "extras": extras,
    }
    for name, (lo, hi) in SPREADS.items():
        extras[f"{name}_spread"] = [lo, hi]
    if failed_rows:
        result["failed_rows"] = failed_rows
    print(json.dumps(result))


if __name__ == "__main__":
    main()
