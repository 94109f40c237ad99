"""Parity of the fused linearize+quadratize+backward kernel
(core/pallas_fused.py) against the scan path.

Kernel-level comparisons call the interpret-mode kernel DIRECTLY (the solver's
λ while_loop would trace the unrolled interpret body into an XLA-CPU compile
that takes tens of minutes — the CLAUDE.md interpreter invariant); the
solver-level glue (packed handoff, λ loop) is pinned on device in
tests/test_tpu.py::test_batched_ilqr_fused_backward_matches_scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu
from trajopt_tpu.core.diff import (
    linearize_dynamics_delta,
    quadratize_cost_delta,
)
from trajopt_tpu.core.pallas_fused import pallas_ilqr_backward_fused
from trajopt_tpu.core.pallas_lqr import (
    _to_lanes,
    lane_pad,
    pack_scalar,
    unpack_lanes,
)
from trajopt_tpu.core.scan_lqr import ilqr_backward
from trajopt_tpu.solvers.common import make_weighting


def _problem(env, N, T, seed=0, spread=0.3):
    rng = np.random.default_rng(seed)
    x0 = np.asarray(env.x0, dtype=np.float64)
    xs = [jnp.asarray(x0 + 0.0)]
    us = jnp.asarray(0.3 * rng.standard_normal((N, T, env.dm_act)))
    x = jnp.tile(jnp.asarray(x0), (N, 1)) + spread * jnp.asarray(
        rng.standard_normal((N, env.dm_state))
    )
    xs = [x]
    for t in range(T):
        x = jax.vmap(env.dynamics)(x, us[:, t])
        xs.append(x)
    return jnp.stack(xs, axis=1), us  # (N, T+1, dx), (N, T, du)


def _scan_reference(env, xref, uref, weighting, lam, reg):
    def one(xr, ur, l):
        A, B = linearize_dynamics_delta(env.dynamics, xr[:-1], ur)
        cost = quadratize_cost_delta(env.cost, xr, ur, weighting)
        pol, _, _, dV, div = ilqr_backward(cost, A, B, l, reg)
        return pol.K, pol.kff, dV, div

    return jax.vmap(one)(xref, uref, lam)


def _fused(env, xref, uref, weighting, lam, reg, time_chunk=4):
    N, Tp1 = xref.shape[0], xref.shape[1]
    T = Tp1 - 1
    n_pad = lane_pad(N)
    ulast = jnp.concatenate(
        [jnp.zeros_like(uref[:, :1]), uref[:, :-1]], axis=1
    )
    Kl, kffl, dVl, badl = pallas_ilqr_backward_fused(
        env,
        _to_lanes(xref[:, :T], n_pad),
        _to_lanes(uref, n_pad),
        _to_lanes(ulast, n_pad),
        _to_lanes(xref[:, T][:, None], n_pad)[0],
        weighting,
        pack_scalar(lam, n_pad),
        reg,
        time_chunk=time_chunk,
        interpret=True,
    )
    pol, dV, div = unpack_lanes(
        Kl, kffl, dVl, badl, N, T, env.dm_state, env.dm_act
    )
    return pol.K, pol.kff, dV, div


@pytest.mark.parametrize(
    "name,reg,lmbda,env_kw",
    [
        ("Pendulum-TO-v0", 1, 0.0, {}),
        ("Pendulum-TO-v0", 1, 2.3, {}),
        ("Pendulum-TO-v0", 2, 0.7, {}),
        ("Cartpole-TO-v0", 1, 0.5, {}),
        ("Pendulum-TO-v0", 1, 0.5, {"slew_rate": True}),
    ],
)
def test_fused_kernel_matches_scan_backward(name, reg, lmbda, env_kw):
    env = trajopt_tpu.make(name, dt=0.05, **env_kw) if "Pendulum" in name \
        else trajopt_tpu.make(name, **env_kw)
    N, T = 4, 8
    xref, uref = _problem(env, N, T)
    weighting = jnp.ones(T + 1, jnp.float64)
    lam = jnp.full((N,), lmbda, jnp.float64)

    K_s, kff_s, dV_s, div_s = _scan_reference(env, xref, uref, weighting,
                                              lam, reg)
    K_f, kff_f, dV_f, div_f = _fused(env, xref, uref, weighting, lam, reg)

    np.testing.assert_array_equal(np.asarray(div_f), np.asarray(div_s))
    np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(kff_f), np.asarray(kff_s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dV_f), np.asarray(dV_s),
                               rtol=1e-8, atol=1e-10)


def test_fused_kernel_activation_weighting():
    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T = 3, 8
    xref, uref = _problem(env, N, T, seed=1, spread=0.05)
    weighting = make_weighting(T, {"mult": 0.5, "shift": 4.0})
    lam = jnp.full((N,), 0.1, jnp.float64)

    K_s, kff_s, dV_s, div_s = _scan_reference(env, xref, uref, weighting,
                                              lam, 1)
    K_f, kff_f, dV_f, div_f = _fused(env, xref, uref, weighting, lam, 1)
    np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(kff_f), np.asarray(kff_s),
                               rtol=1e-8, atol=1e-10)


def test_fused_gate_rejects_non_tile_env():
    from trajopt_tpu.parallel.mpc import make_ilqr_solver_batched

    env = trajopt_tpu.make("Robot-TO-v0")  # cost_parts twin, but non-base cost
    with pytest.raises(ValueError, match="pallas-fused"):
        make_ilqr_solver_batched(env, 16, backward="pallas-fused")
