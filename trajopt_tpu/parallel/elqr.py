"""Fully-compiled extended LQR.

The host class (solvers/elqr.eLQR) runs the reference's outer loop
(elqr/elqr.py:179-201) on the host, dispatching three jitted sweeps per iteration.
Here the whole ``run`` — forward cost-to-come sweep (inverse-dynamics
linearization), backward cost-to-go sweep, evaluation rollout — is one ``lax.scan``
over iterations: a single XLA program, vmappable over initial states/seeds (the
reference has no batched eLQR story at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array, lax

from ..core.types import LinearPolicy, QuadraticValue
from ..solvers.elqr import elqr_backward_lqr, elqr_forward_lqr, elqr_rollout


def make_elqr_solver(env, nb_steps: int, nb_iter: int = 10):
    """Build ``solve(key, x0) -> (ctl, xref, uref, trace)`` with the exact
    iteration semantics (and controller initialization) of the host class."""
    T = nb_steps
    dx, du = env.dm_state, env.dm_act

    def solve(key: Array, x0: Array):
        k1, _ = jax.random.split(key)
        ctl0 = LinearPolicy(
            K=jnp.zeros((T, du, dx), x0.dtype),
            kff=jax.random.normal(k1, (T, du), x0.dtype),
        )
        gocost0 = QuadraticValue(
            V=jnp.zeros((T + 1, dx, dx), x0.dtype).at[0].add(
                1e-16 * jnp.eye(dx, dtype=x0.dtype)
            ),
            v=jnp.zeros((T + 1, dx), x0.dtype),
            v0=jnp.zeros(T + 1, x0.dtype),
        )

        _, _, cs0 = elqr_rollout(env, ctl0, x0)
        ret0 = jnp.sum(cs0)

        def iteration(carry, _):
            state, ctl, gocost = carry
            state, ictl, comecost = elqr_forward_lqr(
                env, state, ctl, gocost.V, gocost.v
            )
            state, ctl, gocost = elqr_backward_lqr(
                env, state, ictl, comecost.V, comecost.v, comecost.v0
            )
            _, _, cs = elqr_rollout(env, ctl, x0)
            return (state, ctl, gocost), jnp.sum(cs)

        (state, ctl, gocost), trace = lax.scan(
            iteration, (x0, ctl0, gocost0), None, length=nb_iter
        )
        xs, us, _ = elqr_rollout(env, ctl, x0)
        return ctl, xs, us, jnp.concatenate([ret0[None], trace])

    return solve


def make_elqr_solver_batched(
    env,
    nb_steps: int,
    nb_iter: int = 10,
    engine: str = "auto",
    time_chunk: int | None = None,
    interpret: bool = False,
    mesh=None,
    axis_name: str = "dp",
):
    """Batch-of-problems eLQR: ``solve(keys (N,2), x0s (N, dx)) ->
    (ctl, xs, us, trace (N, nb_iter+1))``, iteration semantics identical to
    :func:`make_elqr_solver`.

    ``engine='scan'`` vmaps the per-instance compiled solver (N sequential-scan
    chains).  ``engine='pallas'`` runs each sweep as ONE lane-major Pallas
    launch with in-kernel linearization (core/pallas_elqr.py) — three launches
    per iteration for the whole batch, the eLQR analogue of the packed iLQR/GPS
    engines.  ``engine='pallas-fused'`` runs the ENTIRE solve (nb_iter ×
    forward/backward/rollout, plus the final trajectory rollout) as ONE Pallas
    launch per 128-lane batch block — the latency engine for batch ≤ 128,
    where the streamed engine's ~3·nb_iter launch boundaries dominate.  Both
    need a tile-protocol env.  ``engine='auto'`` (default) picks a Pallas
    engine whenever it applies — tile-protocol env, no slew-rate cost, and a
    TPU backend (or ``interpret=True``) — fused for batches that fit one lane
    block, streamed beyond, and falls back to scan otherwise, so the fast path
    is the default rather than an opt-in (VERDICT r3 item 2).

    ``mesh`` block-shards the problem axis: each device runs its own sweep
    launches on its shard (the dp axis of SURVEY §2.4; the reference has no
    batched eLQR at all)."""
    if engine == "auto":
        tile_ok = (
            getattr(env, "supports_tile_quadratization", False)
            and not getattr(env, "slew_rate", False)
        )
        backend_ok = interpret or jax.default_backend() == "tpu"
        if tile_ok and backend_ok:
            # dispatch on the (static) batch size at call time: one lane
            # block → the single-launch fused solve, beyond → streamed sweeps
            from ..core.pallas_elqr import LANES as _LANES

            streamed = make_elqr_solver_batched(
                env, nb_steps, nb_iter, engine="pallas",
                time_chunk=time_chunk, interpret=interpret,
                mesh=mesh, axis_name=axis_name,
            )
            fused = make_elqr_solver_batched(
                env, nb_steps, nb_iter, engine="pallas-fused",
                interpret=interpret, mesh=mesh, axis_name=axis_name,
            )

            def solve_auto(keys, x0s):
                pick = fused if x0s.shape[0] <= _LANES else streamed
                return pick(keys, x0s)

            return solve_auto
        engine = "scan"
    def _maybe_shard(solve):
        if mesh is None:
            return solve
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        return shard_map(
            solve, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
            # fresh zero carries inside the solver are replicated and only
            # combine with per-shard data (same relaxation as run_mpc_batch)
            check_vma=False,
        )

    if engine == "scan":
        base = make_elqr_solver(env, nb_steps, nb_iter)

        def solve_scan(keys: Array, x0s: Array):
            return jax.vmap(base)(keys, x0s)

        return _maybe_shard(solve_scan)

    if engine not in ("pallas", "pallas-fused"):
        raise ValueError(f"unknown engine {engine!r}")
    if not getattr(env, "supports_tile_quadratization", False):
        raise ValueError(
            f"engine={engine!r} needs a tile-protocol env (_ode_parts) with "
            "the base feature-goal cost (the in-kernel quadratizer hardcodes "
            f"it); {type(env).__name__} does not qualify"
        )
    if getattr(env, "slew_rate", False):
        raise ValueError(f"engine={engine!r} does not support slew-rate costs")

    if engine == "pallas-fused":
        from ..core.pallas_elqr import elqr_solve_fused_pallas
        from ..core.pallas_lqr import _from_lanes, _to_lanes, lane_pad

        T = nb_steps
        dx, du = env.dm_state, env.dm_act

        def solve_fused(keys: Array, x0s: Array):
            N = x0s.shape[0]
            dtype = x0s.dtype

            def init_kff(key):
                k1, _ = jax.random.split(key)
                return jax.random.normal(k1, (T, du), dtype)

            kff0 = jax.vmap(init_kff)(keys)
            n_pad = lane_pad(N)
            kff0_l = _to_lanes(kff0, n_pad)
            x0_l = _to_lanes(x0s[:, None, :], n_pad)[0]
            K_l, kff_l, xs_l, us_l, rets = elqr_solve_fused_pallas(
                env, kff0_l, x0_l, nb_iter, interpret=interpret
            )
            ctl = LinearPolicy(
                K=_from_lanes(K_l, N, (du, dx)),
                kff=_from_lanes(kff_l, N, (du,)),
            )
            xs = _from_lanes(xs_l, N, (dx,))
            us = _from_lanes(us_l, N, (du,))
            trace = jnp.moveaxis(rets.reshape(nb_iter + 1, -1)[:, :N], 0, 1)
            return ctl, xs, us, trace

        return _maybe_shard(solve_fused)

    from ..core.pallas_elqr import (
        LANES,
        elqr_backward_pallas,
        elqr_forward_pallas,
        elqr_rollout_pallas,
        pack_elqr,
    )

    T = nb_steps
    dx, du = env.dm_state, env.dm_act

    def solve(keys: Array, x0s: Array):
        N = x0s.shape[0]
        dtype = x0s.dtype

        def init_kff(key):
            k1, _ = jax.random.split(key)
            return jax.random.normal(k1, (T, du), dtype)

        kff0 = jax.vmap(init_kff)(keys)
        K0 = jnp.zeros((N, T, du, dx), dtype)
        K_l, kff_l, x0_l = pack_elqr(K0, kff0, x0s)
        nsub = K_l.shape[2]

        zV_row = jnp.zeros((1, dx * dx, nsub, LANES), dtype)
        zv_row = jnp.zeros((1, dx, nsub, LANES), dtype)
        # comeV_0 = 1e-16·I (solvers/elqr.py:96)
        eye_flat = (1e-16 * jnp.eye(dx, dtype=dtype)).reshape(dx * dx)
        initV_row = jnp.broadcast_to(
            eye_flat[None, :, None, None], (1, dx * dx, nsub, LANES)
        )

        ret0 = elqr_rollout_pallas(
            env, K_l, kff_l, x0_l, time_chunk=time_chunk, interpret=interpret
        )

        def iteration(carry, _):
            K_l, kff_l, goVn_l, govn_l, state_l = carry
            iK_l, ikff_l, comeV_l, comev_l, _, x_mid = elqr_forward_pallas(
                env, K_l, kff_l, goVn_l, govn_l, state_l,
                time_chunk=time_chunk, interpret=interpret,
            )
            # forward rows hold come values at t+1; backward wants rows at t
            comeV_in = jnp.concatenate([initV_row, comeV_l[:-1]], axis=0)
            comev_in = jnp.concatenate([zv_row, comev_l[:-1]], axis=0)
            (K2_l, kff2_l, goV_l, gov_l, _, goVT, govT, _, x_out) = (
                elqr_backward_pallas(
                    env, iK_l, ikff_l, comeV_in, comev_in,
                    comeV_l[-1], comev_l[-1], x_mid,
                    time_chunk=time_chunk, interpret=interpret,
                )
            )
            # next forward wants go values at t+1
            goVn_next = jnp.concatenate([goV_l[1:], goVT[None]], axis=0)
            govn_next = jnp.concatenate([gov_l[1:], govT[None]], axis=0)
            ret = elqr_rollout_pallas(
                env, K2_l, kff2_l, x0_l, time_chunk=time_chunk,
                interpret=interpret,
            )
            return (K2_l, kff2_l, goVn_next, govn_next, x_out), ret

        goVn0 = jnp.broadcast_to(zV_row, (T, dx * dx, nsub, LANES))
        govn0 = jnp.broadcast_to(zv_row, (T, dx, nsub, LANES))
        (K_l, kff_l, *_), rets = lax.scan(
            iteration, (K_l, kff_l, goVn0, govn0, x0_l), None, length=nb_iter
        )

        from ..core.pallas_lqr import _from_lanes

        ctl = LinearPolicy(
            K=_from_lanes(K_l, N, (du, dx)), kff=_from_lanes(kff_l, N, (du,))
        )
        trace = jnp.concatenate(
            [ret0.reshape(-1)[:N][:, None],
             jnp.moveaxis(rets.reshape(nb_iter, -1)[:, :N], 0, 1)],
            axis=1,
        )
        xs, us, _ = jax.vmap(lambda c, x0: elqr_rollout(env, c, x0))(ctl, x0s)
        return ctl, xs, us, trace

    return _maybe_shard(solve)
