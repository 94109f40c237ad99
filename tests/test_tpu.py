"""Device-only engine parity tests — run on a real TPU, auto-skip on CPU.

The suite's conftest pins the CPU backend, so these tests re-check the platform
at runtime and skip unless a TPU is attached (run them directly with
``JAX_PLATFORMS= python -m pytest tests/test_tpu.py`` on a TPU host, outside the
conftest's platform override — or rely on the recorded manual validations in
CLAUDE.md "Measured v5e state").  They cover the Mosaic-only code paths the CPU
suite can only exercise through interpreter/jnp-equivalent forms:

* batched iLQR solver ``backward='pallas'`` (packed λ-loop) == ``'scan'``
* batched GPS solver ``engine='pallas'`` (packed bisection) == ``'scan'``
* per-instance iLQR solver ``backward='pallas-pscan'`` == ``'pscan'``
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform in ("cpu",),
    reason="Mosaic engines need a TPU device",
)


@requires_tpu
def test_batched_ilqr_pallas_engine_matches_scan():
    from trajopt_tpu.parallel.mpc import make_ilqr_solver_batched

    env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05).replace(uw=(1e-5,))
    N, T = 256, 60
    x0 = jnp.asarray(np.array(env.x0), jnp.float32)
    x0s = jnp.tile(x0, (N, 1)) + 0.01 * jnp.arange(N, dtype=jnp.float32)[:, None]

    sp = jax.jit(make_ilqr_solver_batched(env, T, nb_iter=5, backward="pallas"))
    ss = jax.jit(make_ilqr_solver_batched(env, T, nb_iter=5, backward="scan"))
    rp = np.asarray(sp(x0s)[0].last_return)
    rs = np.asarray(ss(x0s)[0].last_return)
    np.testing.assert_allclose(rp, rs, rtol=1e-5)


@requires_tpu
def test_batched_gps_pallas_engine_matches_scan():
    from trajopt_tpu.parallel.gps import make_mbgps_solver_batched

    env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05).replace(uw=(1e-5,))
    N, T = 64, 60
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    mu0s = jnp.tile(jnp.asarray(np.array(env.x0), jnp.float32), (N, 1))
    sigma0s = jnp.tile(0.01 * jnp.eye(2, dtype=jnp.float32), (N, 1, 1))

    out = {}
    for eng in ("scan", "pallas"):
        solve = jax.jit(make_mbgps_solver_batched(
            env, T, nb_iter=3, kl_bound=2.0, engine=eng
        ))
        _, tr = solve(keys, mu0s, sigma0s)
        out[eng] = np.asarray(tr)
    np.testing.assert_allclose(out["pallas"], out["scan"], rtol=1e-4, atol=1e-4)


@requires_tpu
def test_ilqr_pallas_pscan_engine_matches_pscan():
    from trajopt_tpu.parallel.mpc import make_ilqr_solver

    env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05).replace(uw=(1e-5,))
    x0 = jnp.asarray(np.array(env.x0), jnp.float32)
    s1 = jax.jit(make_ilqr_solver(env, nb_steps=100, nb_iter=6, backward="pscan"))
    s2 = jax.jit(make_ilqr_solver(env, nb_steps=100, nb_iter=6,
                                  backward="pallas-pscan"))
    r1 = float(s1(x0)[0].last_return)
    r2 = float(s2(x0)[0].last_return)
    np.testing.assert_allclose(r2, r1, rtol=1e-4)


@requires_tpu
def test_batched_ilqr_pallas_rollout_matches_scan():
    """rollout='pallas' (fused line-search kernels, core/pallas_rollout.py) must
    reproduce the scan line search through the full solver, with both backward
    engines (packed-gain handoff path and repack path)."""
    from trajopt_tpu.parallel.mpc import make_ilqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T = 256, 64
    x0 = jnp.asarray(np.array(env.x0), jnp.float32)
    x0s = jnp.tile(x0, (N, 1)) + 0.01 * jnp.arange(N, dtype=jnp.float32)[:, None]

    ss = jax.jit(make_ilqr_solver_batched(env, T, nb_iter=5, backward="scan"))
    rs = np.asarray(ss(x0s)[0].last_return)
    for bwd in ("pallas", "scan"):
        sp = jax.jit(make_ilqr_solver_batched(
            env, T, nb_iter=5, backward=bwd, rollout="pallas"
        ))
        rp = np.asarray(sp(x0s)[0].last_return)
        np.testing.assert_allclose(rp, rs, rtol=1e-4)
