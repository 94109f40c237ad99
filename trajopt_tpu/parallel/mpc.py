"""Fully-compiled iLQR and batched MPC.

The reference parallelizes MPC by farming whole episodes to joblib worker processes
(examples/ilqr/mpc/pendulum_parallel.py:6-48) and re-instantiates a Python solver at
every control step (examples/ilqr/mpc/pendulum.py:23-29).  Here the *entire* solve —
linearize → λ-escalated backward scan → vmapped α-grid line search → accept/reject —
is one jitted device program (:func:`make_ilqr_solver`), the MPC loop is a
``lax.scan`` over control steps (:func:`make_mpc_runner`), and a batch of MPC
episodes is a ``vmap`` whose batch axis shards across a device mesh
(:func:`run_mpc_batch`) — the data-parallel axis of SURVEY.md §2.4.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from ..core.diff import linearize_dynamics_delta, quadratize_cost_delta
from ..core.scan_lqr import ilqr_backward
from ..core.types import LinearPolicy
from ..solvers.common import DEFAULT_ALPHAS, make_weighting, rollout_tracking


class ILQRState(NamedTuple):
    xref: Array         # (T+1, dx)
    uref: Array         # (T, du)
    K: Array            # (T, du, dx)
    kff: Array          # (T, du)
    lmbda: Array        # ()
    dlmbda: Array       # ()
    last_return: Array  # ()
    done: Array         # () bool


def make_ilqr_solver(
    env,
    nb_steps: int,
    nb_iter: int = 10,
    activation: dict | None = None,
    alphas=DEFAULT_ALPHAS,
    lmbda: float = 1.0,
    min_lmbda: float = 1e-6,
    max_lmbda: float = 1e6,
    mult_lmbda: float = 1.6,
    tolfun: float = 1e-6,
    tolgrad: float = 1e-4,
    min_imp: float = 0.0,
    reg: int = 1,
):
    """Build ``solve(x0, uref_init) -> (state, actions, return)`` — the iLQR outer
    loop of ilqr/ilqr.py:136-237 as pure ``lax`` control flow.

    Semantics preserved: λ escalation with bail-out above ``max_lmbda``, first-accept
    backtracking over the α-grid (evaluated in parallel), gradient-norm + tolfun
    termination, λ-zeroing below ``min_lmbda``.
    """
    weighting = make_weighting(nb_steps, activation)
    alphas = jnp.asarray(alphas)
    T = nb_steps

    def expand(xref, uref):
        A, B = linearize_dynamics_delta(env.dynamics, xref[:T], uref)
        cost = quadratize_cost_delta(env.cost, xref, uref, weighting)
        return A, B, cost

    def forward_all(K, kff, xref, uref):
        ctl = LinearPolicy(K=K, kff=kff)
        return jax.vmap(
            lambda a: rollout_tracking(env, ctl, a, xref[0], xref, uref, weighting)
        )(alphas)

    def backward_with_lm(cost, A, B, lmbda0, dlmbda0):
        """λ-escalation loop (ilqr.py:160-173) as a while_loop."""

        def cond(carry):
            _, lmbda, _, diverged, first = carry
            return (first | diverged) & (lmbda <= max_lmbda)

        def body(carry):
            _, lmbda, dlmbda, diverged, first = carry
            out = ilqr_backward(cost, A, B, lmbda, reg)
            new_div = out[4]
            # on divergence, escalate λ for the next trip
            dlmbda_n = jnp.where(new_div, jnp.maximum(dlmbda * mult_lmbda, mult_lmbda), dlmbda)
            lmbda_n = jnp.where(new_div, jnp.maximum(lmbda * dlmbda_n, min_lmbda), lmbda)
            return out, lmbda_n, dlmbda_n, new_div, jnp.asarray(False)

        dummy = ilqr_backward(cost, A, B, lmbda0, reg)
        init = (dummy, lmbda0, dlmbda0, jnp.asarray(False), jnp.asarray(True))
        out, lmbda, dlmbda, diverged, _ = lax.while_loop(cond, body, init)
        return out, lmbda, dlmbda, diverged

    def iteration(state: ILQRState, _):
        def work(state: ILQRState):
            A, B, cost = expand(state.xref, state.uref)

            (ctl, value, qvalue, dV, _), lmbda, dlmbda, diverged = backward_with_lm(
                cost, A, B, state.lmbda, state.dlmbda
            )
            backpass_done = ~diverged

            g_norm = jnp.mean(
                jnp.max(jnp.abs(ctl.kff) / (jnp.abs(state.uref) + 1.0), axis=0)
            )
            grad_done = (g_norm < tolgrad) & (lmbda < 1e-5)

            states_all, actions_all, costs_all = forward_all(
                ctl.K, ctl.kff, state.xref, state.uref
            )
            returns = jnp.sum(costs_all, axis=1)
            dreturns = state.last_return - returns
            expected = -1.0 * alphas * (dV[0] + alphas * dV[1])
            imp = dreturns / expected
            ok = (imp >= min_imp) & backpass_done & jnp.isfinite(returns)
            accepted = jnp.any(ok)
            idx = jnp.argmax(ok)  # first acceptable α in grid order

            # accept (ilqr.py:204-223)
            dlmbda_acc = jnp.minimum(dlmbda / mult_lmbda, 1.0 / mult_lmbda)
            lmbda_acc = lmbda * dlmbda_acc * (lmbda > min_lmbda)
            # reject (ilqr.py:224-231)
            dlmbda_rej = jnp.maximum(dlmbda * mult_lmbda, mult_lmbda)
            lmbda_rej = jnp.maximum(lmbda * dlmbda_rej, min_lmbda)

            take = accepted & ~grad_done
            xref = jnp.where(take, states_all[idx], state.xref)
            uref = jnp.where(take, actions_all[idx], state.uref)
            K = jnp.where(take, ctl.K, state.K)
            kff = jnp.where(take, ctl.kff, state.kff)
            last_return = jnp.where(take, returns[idx], state.last_return)

            new_lmbda = jnp.where(take, lmbda_acc, lmbda_rej)
            new_dlmbda = jnp.where(take, dlmbda_acc, dlmbda_rej)

            done = (
                grad_done
                | (take & (dreturns[idx] < tolfun))
                | (~accepted & (lmbda_rej > max_lmbda))
            )
            return ILQRState(
                xref=xref, uref=uref, K=K, kff=kff,
                lmbda=new_lmbda, dlmbda=new_dlmbda,
                last_return=last_return, done=done,
            )

        state = lax.cond(state.done, lambda s: s, work, state)
        return state, state.last_return

    def solve(x0: Array, kff_init: Array | None = None):
        dx, du = env.dm_state, env.dm_act
        xref0 = jnp.zeros((T + 1, dx), x0.dtype).at[0].set(x0)
        kff0 = jnp.zeros((T, du), x0.dtype) if kff_init is None else kff_init
        K0 = jnp.zeros((T, du, dx), x0.dtype)

        # init trajectory: first finite candidate over the α-grid (ilqr.py:139-148)
        states_all, actions_all, costs_all = forward_all(
            K0, kff0, xref0, jnp.zeros((T, du), x0.dtype)
        )
        finite = jnp.all(states_all < 1e8, axis=(1, 2))
        idx = jnp.argmax(finite)

        state = ILQRState(
            xref=states_all[idx],
            uref=actions_all[idx],
            K=K0,
            kff=kff0,
            lmbda=jnp.asarray(lmbda, x0.dtype),
            dlmbda=jnp.asarray(1.0, x0.dtype),
            last_return=jnp.sum(costs_all[idx]),
            done=jnp.asarray(False),
        )
        state, trace = lax.scan(iteration, state, None, length=nb_iter)
        return state, trace

    return solve


def make_mpc_runner(
    env,
    horizon: int,
    nb_steps: int,
    nb_iter: int = 10,
    **ilqr_kwargs,
):
    """Receding-horizon MPC driver (examples/ilqr/mpc/pendulum.py:18-31) as one
    jitted program: ``run(key, x0) -> (states, actions, costs)``.

    Each control step re-solves iLQR from the current state (warm-started with the
    previous solution's shifted feedforward) and applies the first action on the
    noisy system.
    """
    solve = make_ilqr_solver(env, horizon, nb_iter=nb_iter, **ilqr_kwargs)
    du = env.dm_act

    def run(key: Array, x0: Array):
        keys = jax.random.split(key, nb_steps)

        def step(carry, k):
            x, kff_warm = carry
            state, _ = solve(x, kff_warm)
            u = state.uref[0]
            c = env.cost(x, u, u, 1.0)
            xn = env.step(k, x, u)
            # shift the solution one step for warm starting
            kff_next = jnp.concatenate(
                [state.uref[1:], jnp.zeros((1, du), x.dtype)], axis=0
            )
            return (xn, kff_next), (x, u, c)

        init = (x0, jnp.zeros((horizon, du), x0.dtype))
        (x_T, _), (xs, us, cs) = lax.scan(step, init, keys)
        return jnp.concatenate([xs, x_T[None]], axis=0), us, cs

    return run


def run_mpc_batch(
    env,
    key: Array,
    nb_episodes: int,
    horizon: int,
    nb_steps: int,
    nb_iter: int = 10,
    mesh=None,
    axis_name: str = "dp",
    **ilqr_kwargs,
):
    """Batch of MPC episodes, vmapped and (optionally) sharded over a mesh axis.

    TPU-native replacement for the 50-process joblib farm of
    examples/ilqr/mpc/pendulum_parallel.py:40-45: the episode axis becomes a sharded
    batch dimension on one or many chips.
    """
    run = make_mpc_runner(env, horizon, nb_steps, nb_iter=nb_iter, **ilqr_kwargs)

    keys = jax.random.split(key, nb_episodes)
    x0s = jax.vmap(env.sample_init)(keys)

    batched = jax.jit(jax.vmap(run))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(axis_name))
        keys = jax.device_put(keys, sharding)
        x0s = jax.device_put(x0s, sharding)

    states, actions, costs = batched(keys, x0s)
    return {"x": states, "u": actions, "c": costs}
