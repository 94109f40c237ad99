"""Parity of the fused Pallas eLQR sweeps (interpreter mode) vs the scan
solver.  The Pallas engine must reproduce the host-class iteration semantics
exactly: same controller init, same sweep order, same re-chosen states."""

import jax
import jax.numpy as jnp
import numpy as np

import trajopt_tpu
from trajopt_tpu.parallel.elqr import make_elqr_solver_batched


def _run(engine, env, keys, x0s, T, nb_iter, **kw):
    solve = make_elqr_solver_batched(env, T, nb_iter, engine=engine, **kw)
    return solve(keys, x0s)


def test_pallas_elqr_matches_scan_cartpole():
    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T, nb_iter = 3, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    x0s = jnp.tile(jnp.asarray(np.array(env.x0)), (N, 1)) \
        + 0.02 * jnp.arange(N, dtype=jnp.float64)[:, None]

    ctl_s, xs_s, us_s, tr_s = _run("scan", env, keys, x0s, T, nb_iter)
    ctl_p, xs_p, us_p, tr_p = _run(
        "pallas", env, keys, x0s, T, nb_iter, interpret=True
    )

    np.testing.assert_allclose(tr_p, tr_s, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ctl_p.K, ctl_s.K, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(ctl_p.kff, ctl_s.kff, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(xs_p, xs_s, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(us_p, us_s, rtol=1e-7, atol=1e-8)


def test_pallas_elqr_matches_scan_pendulum_periodic():
    """Pendulum exercises the periodic wrap + feature-Jacobian path of the
    in-kernel quadratization."""
    env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05)
    N, T, nb_iter = 2, 6, 2
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    x0s = jnp.tile(jnp.asarray(np.array(env.x0)), (N, 1)) \
        + 0.01 * jnp.arange(N, dtype=jnp.float64)[:, None]

    ctl_s, _, _, tr_s = _run("scan", env, keys, x0s, T, nb_iter)
    ctl_p, _, _, tr_p = _run(
        "pallas", env, keys, x0s, T, nb_iter, interpret=True
    )

    np.testing.assert_allclose(tr_p, tr_s, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ctl_p.K, ctl_s.K, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(ctl_p.kff, ctl_s.kff, rtol=1e-7, atol=1e-8)


def test_elqr_batched_sharded_matches_unsharded():
    """mesh= block-shards the eLQR problem axis (8-device virtual CPU mesh)."""
    from trajopt_tpu.parallel.mesh import make_mesh

    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T, nb_iter = 8, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    x0s = jnp.tile(jnp.asarray(np.array(env.x0)), (N, 1)) \
        + 0.02 * jnp.arange(N, dtype=jnp.float64)[:, None]

    base = jax.jit(make_elqr_solver_batched(env, T, nb_iter, engine="scan"))
    mesh = make_mesh(("dp",))
    sharded = jax.jit(make_elqr_solver_batched(
        env, T, nb_iter, engine="scan", mesh=mesh
    ))
    _, _, _, tr_ref = base(keys, x0s)
    _, _, _, tr_sh = sharded(keys, x0s)
    np.testing.assert_allclose(np.asarray(tr_sh), np.asarray(tr_ref),
                               rtol=1e-9, atol=1e-9)


def test_pallas_fused_solve_matches_scan_cartpole():
    """The single-launch whole-solve kernel (engine='pallas-fused') must match
    the scan engine on controller, trajectories, AND the in-kernel-emitted
    xs/us (the streamed engine computes those on the host)."""
    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T, nb_iter = 3, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    x0s = jnp.tile(jnp.asarray(np.array(env.x0)), (N, 1)) \
        + 0.02 * jnp.arange(N, dtype=jnp.float64)[:, None]

    ctl_s, xs_s, us_s, tr_s = _run("scan", env, keys, x0s, T, nb_iter)
    ctl_f, xs_f, us_f, tr_f = _run(
        "pallas-fused", env, keys, x0s, T, nb_iter, interpret=True
    )

    np.testing.assert_allclose(tr_f, tr_s, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ctl_f.K, ctl_s.K, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(ctl_f.kff, ctl_s.kff, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(xs_f, xs_s, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(us_f, us_s, rtol=1e-7, atol=1e-8)


def test_pallas_fused_solve_matches_scan_pendulum_periodic():
    env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05)
    N, T, nb_iter = 2, 6, 2
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    x0s = jnp.tile(jnp.asarray(np.array(env.x0)), (N, 1)) \
        + 0.01 * jnp.arange(N, dtype=jnp.float64)[:, None]

    ctl_s, _, _, tr_s = _run("scan", env, keys, x0s, T, nb_iter)
    ctl_f, _, _, tr_f = _run(
        "pallas-fused", env, keys, x0s, T, nb_iter, interpret=True
    )

    np.testing.assert_allclose(tr_f, tr_s, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ctl_f.K, ctl_s.K, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(ctl_f.kff, ctl_s.kff, rtol=1e-7, atol=1e-8)


def test_elqr_auto_engine_dispatches_fused_below_one_lane_block():
    """engine='auto' (interpret) must route a ≤128 batch to the fused solve
    and still reproduce the scan trace."""
    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T, nb_iter = 2, 8, 2
    keys = jax.random.split(jax.random.PRNGKey(3), N)
    x0s = jnp.tile(jnp.asarray(np.array(env.x0)), (N, 1)) \
        + 0.02 * jnp.arange(N, dtype=jnp.float64)[:, None]

    _, _, _, tr_s = _run("scan", env, keys, x0s, T, nb_iter)
    _, _, _, tr_a = _run("auto", env, keys, x0s, T, nb_iter, interpret=True)
    np.testing.assert_allclose(tr_a, tr_s, rtol=1e-8, atol=1e-8)
