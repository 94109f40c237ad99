"""Shared solver machinery: activation weighting, jitted rollouts, line-search helpers.

The reference re-implements these per solver as Python ``for t`` loops over stateful
gym envs (e.g. ilqr/ilqr.py:89-102).  Here every rollout is a single ``lax.scan`` and
the whole backtracking α-grid is evaluated as one ``vmap`` — all candidate line-search
rollouts run in parallel on device instead of sequentially on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from ..core.types import LinearGaussianPolicy, LinearPolicy

DEFAULT_ALPHAS = tuple(np.power(10.0, np.linspace(0, -3, 11)))


def make_weighting(nb_steps: int, activation: dict | None) -> Array:
    """Cost-activation schedule (mbgps.py:76-86 and identical blocks elsewhere):
    ``None`` → ones; {'mult','shift'} → sigmoid ramp; {'discount'} → γ^t."""
    if activation is None:
        return jnp.ones(nb_steps + 1)
    if "mult" in activation and "shift" in activation:
        t = jnp.linspace(0, nb_steps, nb_steps + 1)
        return 1.0 / (1.0 + jnp.exp(-activation["mult"] * (t - activation["shift"])))
    if "discount" in activation:
        w = jnp.ones(nb_steps + 1)
        gamma = activation["discount"] * jnp.ones(nb_steps)
        return w.at[1:].set(jnp.cumprod(gamma))
    raise NotImplementedError(f"unknown activation spec {activation}")


def rollout_tracking(
    env, policy: LinearPolicy, alpha, x0: Array, xref: Array, uref: Array,
    weighting: Array,
) -> tuple[Array, Array, Array]:
    """Deterministic rollout under the tracking controller
    u = uref + α·kff + K (x − xref), clipped to the action limits — the iLQR forward
    pass (ilqr/ilqr.py:89-102; action law ilqr/objects.py:137-139).

    Stage cost uses the *previous* action as ``u_last`` (zero at t = 0).  The reference
    passes the current action (ilqr.py:98), silently disabling any slew-rate penalty
    during optimization — a noted defect we do not replicate (SURVEY.md §2.6).
    Returns (states (T+1,dx), actions (T,du), costs (T+1,)).
    """
    T = policy.horizon

    def step(carry, inp):
        x, u_prev = carry
        K, kff, xr, ur, w = inp
        u = ur + alpha * kff + K @ (x - xr)
        u = jnp.clip(u, -env.ulim, env.ulim)
        c = env.cost(x, u, u_prev, w)
        xn = env.dynamics(x, u)
        return (xn, u), (x, u, c)

    u0 = jnp.zeros(uref.shape[-1], x0.dtype)
    inputs = (policy.K, policy.kff, xref[:T], uref, weighting[:T])
    (x_T, _), (xs, us, cs) = lax.scan(step, (x0, u0), inputs)

    c_T = env.cost(x_T, u0, u0, weighting[T])
    states = jnp.concatenate([xs, x_T[None]], axis=0)
    costs = jnp.concatenate([cs, c_T[None]], axis=0)
    return states, us, costs


def rollout_tracking_all_alphas(
    env, policy: LinearPolicy, alphas: Array, x0: Array, xref: Array, uref: Array,
    weighting: Array,
):
    """All backtracking candidates at once: vmap of :func:`rollout_tracking` over the
    α-grid — replaces the sequential host loop at ilqr/ilqr.py:185-201."""
    return jax.vmap(
        lambda a: rollout_tracking(env, policy, a, x0, xref, uref, weighting)
    )(alphas)


def rollout_feedback(
    env, policy: LinearPolicy, x0: Array, weighting: Array
) -> tuple[Array, Array, Array]:
    """Deterministic rollout under the absolute controller u = kff + K x
    (riccati/objects.py:128-129; riccati/riccati.py:85-98).

    Stage cost uses the previous action as ``u_last`` (riccati.py:93).
    """
    T = policy.horizon

    def step(carry, inp):
        x, u_prev = carry
        K, kff, w = inp
        u = kff + K @ x
        c = env.cost(x, u, u_prev, w)
        xn = env.dynamics(x, u)
        return (xn, u), (x, u, c)

    u0 = jnp.zeros(policy.kff.shape[-1], x0.dtype)
    (x_T, _), (xs, us, cs) = lax.scan(step, (x0, u0), (policy.K, policy.kff, weighting[:T]))
    c_T = env.cost(x_T, u0, u0, weighting[T])
    return (
        jnp.concatenate([xs, x_T[None]], axis=0),
        us,
        jnp.concatenate([cs, c_T[None]], axis=0),
    )


def rollout_stochastic(
    env,
    policy,
    key: Array,
    weighting: Array,
    stoch_policy: bool = True,
    init: Array | None = None,
) -> dict:
    """Single noisy episode under a (linear-Gaussian) policy, mirroring the data
    layout of the reference's ``rollout`` (gps/mbgps.py:92-123): dict with
    x (T,dx), u (T,du), xn (T,dx), c (T+1,).
    """
    T = policy.horizon
    k_init, k_traj = jax.random.split(key)
    x0 = env.sample_init(k_init) if init is None else init
    keys = jax.random.split(k_traj, T)

    gaussian = isinstance(policy, LinearGaussianPolicy)

    def step(carry, inp):
        x, u_prev = carry
        K, kff = inp[0], inp[1]
        k = inp[-2]
        w = inp[-1]
        mu_u = K @ x + kff
        if gaussian and stoch_policy:
            sig = inp[2]
            ku, kx = jax.random.split(k)
            u = jax.random.multivariate_normal(ku, mu_u, sig)
        else:
            kx = k
            u = mu_u
        c = env.cost(x, u, u_prev, w)
        xn = env.step(kx, x, u)
        return (xn, u), (x, u, xn, c)

    if gaussian:
        inputs = (policy.K, policy.kff, policy.sigma, keys, weighting[:T])
    else:
        inputs = (policy.K, policy.kff, keys, weighting[:T])
    (x_T, u_last), (xs, us, xns, cs) = lax.scan(step, (x0, jnp.zeros_like(policy.kff[0])), inputs)

    du = policy.kff.shape[-1]
    c_T = env.cost(x_T, jnp.zeros(du, x0.dtype), jnp.zeros(du, x0.dtype), weighting[T])
    return {
        "x": xs,
        "u": us,
        "xn": xns,
        "c": jnp.concatenate([cs, c_T[None]], axis=0),
    }


def rollout_batch(env, policy, key: Array, weighting: Array, nb_episodes: int,
                  stoch_policy: bool = True, init: Array | None = None) -> dict:
    """Batch of noisy episodes — vmapped over episode keys (the DP axis).

    Reference equivalent: the Python episode loop at gps/mbgps.py:105-121.  The batch
    axis is the natural axis to shard across devices with ``jax.sharding``.
    """
    keys = jax.random.split(key, nb_episodes)
    return jax.vmap(
        lambda k: rollout_stochastic(env, policy, k, weighting, stoch_policy, init)
    )(keys)
