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

from functools import partial

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
@pytest.mark.parametrize("T", [60, 333, 1000])
def test_pallas_pscan_kernel_matches_sequential_on_device(T):
    """The Mosaic time-tiled parallel-in-time backward (core/pallas_pscan.py)
    against the sequential scan kernel, element-wise — catches (8, C) layout /
    sublane-roll bugs that solver-level return comparisons could mask."""
    from trajopt_tpu.core.pallas_pscan import pallas_pilqr_backward
    from trajopt_tpu.core.pscan_lqr import pilqr_backward
    from trajopt_tpu.core.types import QuadraticCost

    dx, du = 4, 2
    rng = np.random.default_rng(0)

    def spd(d, n, s):
        M = rng.standard_normal((n, d, d))
        return jnp.asarray(
            s * np.einsum("nij,nkj->nik", M, M) + d * np.eye(d), jnp.float32
        )

    cost = QuadraticCost(
        Cxx=spd(dx, T + 1, 0.1),
        cx=jnp.asarray(rng.standard_normal((T + 1, dx)), jnp.float32),
        Cuu=spd(du, T, 1.0),
        cu=jnp.asarray(rng.standard_normal((T, du)), jnp.float32),
        Cxu=jnp.asarray(0.01 * rng.standard_normal((T, dx, du)), jnp.float32),
        c0=jnp.zeros(T + 1, jnp.float32),
    )
    A = jnp.asarray(
        np.eye(dx) + 0.01 * rng.standard_normal((T, dx, dx)), jnp.float32
    )
    B = jnp.asarray(0.1 * rng.standard_normal((T, dx, du)), jnp.float32)

    ctl_p, val_p, dV_p = jax.block_until_ready(pallas_pilqr_backward(cost, A, B))
    ctl_s, val_s, dV_s = jax.block_until_ready(jax.jit(pilqr_backward)(cost, A, B))
    np.testing.assert_allclose(ctl_p.K, ctl_s.K, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ctl_p.kff, ctl_s.kff, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(val_p.V, val_s.V, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(dV_p, dV_s, rtol=2e-3, atol=2e-3)


@requires_tpu
def test_batched_elqr_pallas_engine_matches_scan_on_device():
    """Mosaic eLQR sweeps (core/pallas_elqr.py) vs the vmapped scan solver."""
    from trajopt_tpu.parallel.elqr import make_elqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T, nb_iter = 64, 32, 4
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    x0s = jnp.zeros((N, env.dm_state), jnp.float32).at[:, 1].add(
        0.2 + 0.01 * jnp.arange(N, dtype=jnp.float32)
    )

    _, _, _, tr_s = jax.jit(
        make_elqr_solver_batched(env, T, nb_iter, engine="scan")
    )(keys, x0s)
    _, _, _, tr_p = jax.jit(
        make_elqr_solver_batched(env, T, nb_iter, engine="pallas")
    )(keys, x0s)
    np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_s),
                               rtol=5e-3, atol=1e-5)


@requires_tpu
def test_pallas_belief_backward_on_device():
    """Mosaic packed belief backward vs the vmapped scan kernel."""
    from belief_fixtures import random_belief_problem

    from trajopt_tpu.core.belief import bsp_backward
    from trajopt_tpu.core.pallas_belief import pallas_bsp_backward

    N, T = 256, 25
    cost, dyn = random_belief_problem(11, N, T, dtype=jnp.float32)
    lam = jnp.full((N,), 0.5, jnp.float32)
    ref = jax.block_until_ready(
        jax.jit(jax.vmap(lambda c, d, l: bsp_backward(c, d, l, 1)))(
            cost, dyn, lam
        )
    )
    out = jax.block_until_ready(
        jax.jit(partial(pallas_bsp_backward, reg=1))(cost, dyn, lam)
    )
    np.testing.assert_allclose(out[0].K, ref[0].K, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(out[1], ref[1], rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out[5]), np.asarray(ref[5]))


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


@requires_tpu
def test_pallas_bsp_solve_kernel_on_device():
    """Single-launch BSP solve kernel (core/pallas_bsp.py) vs the plane-math
    twin (whose scan-solver parity is pinned on CPU in tests/test_pallas_bsp)."""
    from trajopt_tpu.core.pallas_bsp import (
        pallas_bsp_solve,
        run_bsp_solve_planes,
    )

    env = trajopt_tpu.make("LightDark-TO-v0")
    T, it = 15, 5
    mu0, sigma0 = env.init()
    mu0 = jnp.asarray(np.array(mu0), jnp.float32)
    sigma0 = jnp.asarray(np.array(sigma0), jnp.float32)

    st_r, tr_r = jax.jit(run_bsp_solve_planes(env, T, nb_iter=it))(
        mu0, sigma0
    )
    st_k, tr_k = jax.jit(pallas_bsp_solve(env, T, nb_iter=it))(mu0, sigma0)
    np.testing.assert_allclose(
        np.asarray(tr_k), np.asarray(tr_r), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_k.uref), np.asarray(st_r.uref), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_k.bref_mu), np.asarray(st_r.bref_mu), rtol=1e-3,
        atol=1e-4,
    )


@requires_tpu
def test_pallas_bsp_episode_kernel_on_device():
    """Single-launch belief-MPC episode kernel vs the plane-math twin."""
    from trajopt_tpu.core.pallas_bsp import (
        pallas_bsp_episode,
        run_bsp_episode_planes,
    )

    env = trajopt_tpu.make("LightDark-TO-v0")
    T, nsteps, it = 10, 6, 3
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(np.array(env.reset_state()), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal(env.obs_dim), jnp.float32)
    eps_dyn = jnp.asarray(
        rng.standard_normal((nsteps, env.state_dim)), jnp.float32
    )
    eps_obs = jnp.asarray(
        rng.standard_normal((nsteps, env.obs_dim)), jnp.float32
    )

    ref = jax.jit(run_bsp_episode_planes(env, T, nsteps, nb_iter=it))(
        x0, eps0, eps_dyn, eps_obs
    )
    got = jax.jit(pallas_bsp_episode(env, T, nsteps, nb_iter=it))(
        x0, eps0, eps_dyn, eps_obs
    )
    for name, a, b in zip(["xs", "mus", "sigmas", "us", "cs"], ref, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3, err_msg=name
        )


@requires_tpu
def test_pallas_bsp_episode_kernel_at_bench_shape():
    """Mosaic lowering guard at EXACTLY the bench_bsp config (bench.py:
    horizon=25, nb_steps=50, nb_iter=10).  Round 4 shipped a kernel that
    passed the small-shape parity test above but failed to compile at this
    shape on the official bench run — Mosaic lowering is shape-dependent, so
    the bench shape itself must be device-tested.  Numerical parity vs the
    plane-math twin is pinned at the small shape (the twin's XLA compile at
    this shape is prohibitively slow); here we require compile + run + sane
    finite outputs."""
    from trajopt_tpu.core.pallas_bsp import pallas_bsp_episode

    env = trajopt_tpu.make("LightDark-TO-v0")
    T, nsteps, it = 25, 50, 10
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(np.array(env.reset_state()), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal(env.obs_dim), jnp.float32)
    eps_dyn = jnp.asarray(
        rng.standard_normal((nsteps, env.state_dim)), jnp.float32
    )
    eps_obs = jnp.asarray(
        rng.standard_normal((nsteps, env.obs_dim)), jnp.float32
    )

    xs, mus, sigmas, us, cs = jax.jit(
        pallas_bsp_episode(env, T, nsteps, nb_iter=it)
    )(x0, eps0, eps_dyn, eps_obs)
    for name, arr in [("xs", xs), ("mus", mus), ("sigmas", sigmas),
                      ("us", us), ("cs", cs)]:
        arr = np.asarray(arr)
        assert np.all(np.isfinite(arr)), name
    # the light-dark controller must actually control: the belief tracks the
    # true state and the EKF covariance contracts from its 5.0·I prior
    assert np.linalg.norm(np.asarray(mus)[-1] - np.asarray(xs)[-1]) < 1.0
    assert np.trace(np.asarray(sigmas)[-1]) < np.trace(np.asarray(sigmas)[0])


@requires_tpu
def test_batched_ilqr_fused_backward_matches_scan():
    """backward='pallas-fused' (in-kernel linearize+quadratize+recursion,
    core/pallas_fused.py) through the full solver, both rollout engines."""
    from trajopt_tpu.parallel.mpc import make_ilqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T = 256, 64
    x0 = jnp.asarray(np.array(env.x0), jnp.float32)
    x0s = jnp.tile(x0, (N, 1)) + 0.01 * jnp.arange(N, dtype=jnp.float32)[:, None]

    ss = jax.jit(make_ilqr_solver_batched(env, T, nb_iter=5, backward="scan"))
    rs = np.asarray(ss(x0s)[0].last_return)
    for rollout in ("scan", "pallas"):
        sf = jax.jit(make_ilqr_solver_batched(
            env, T, nb_iter=5, backward="pallas-fused", rollout=rollout
        ))
        rf = np.asarray(sf(x0s)[0].last_return)
        np.testing.assert_allclose(rf, rs, rtol=1e-4)


@requires_tpu
def test_rgps_pallas_fixed_point_on_device():
    """Lane-major adversary fixed point (core/pallas_rgps.py) at the protocol
    dims (dx=4, du=2 → p=28) vs the vmapped scan fixed point, f32 on device.
    Few trips bound the f32 rounding drift between the two op orderings."""
    from test_pallas_rgps import _ref_fixed_point
    from trajopt_tpu.core.cubature import (
        cubature_forward_pass,
        parameter_augment_cost,
    )
    from trajopt_tpu.core.pallas_rgps import pallas_rgps_fixed_point
    from trajopt_tpu.core.types import (
        LinearGaussianPolicy,
        MatrixNormalParams,
        QuadraticCost,
        vec_from_matrices,
    )

    N, T, dx, du = 8, 50, 4, 2
    p = dx * (dx + du + 1)
    ks = jax.random.split(jax.random.PRNGKey(0), 12)

    def spd(k, d, n, scale=1.0):
        M = jax.random.normal(k, (N, n, d, d), jnp.float32)
        return scale * (jnp.einsum("bnij,bnkj->bnik", M, M) + d * jnp.eye(d))

    cost = QuadraticCost(
        Cxx=spd(ks[0], dx, T + 1),
        cx=jax.random.normal(ks[1], (N, T + 1, dx), jnp.float32),
        Cuu=spd(ks[2], du, T + 1),
        cu=jax.random.normal(ks[3], (N, T + 1, du), jnp.float32),
        Cxu=0.1 * jax.random.normal(ks[4], (N, T + 1, dx, du), jnp.float32),
        c0=0.1 * jax.random.normal(ks[5], (N, T + 1), jnp.float32),
    )
    A = 0.9 * (jnp.eye(dx) + 0.1 * jax.random.normal(ks[6], (N, T, dx, dx), jnp.float32))
    B = 0.5 * jax.random.normal(ks[7], (N, T, dx, du), jnp.float32)
    c = 0.1 * jax.random.normal(ks[8], (N, T, dx), jnp.float32)
    theta = jax.vmap(jax.vmap(vec_from_matrices))(A, B, c)
    nominal = MatrixNormalParams(
        mu=theta,
        sigma=jnp.broadcast_to(1e-4 * jnp.eye(p), (N, T, p, p)).astype(jnp.float32),
    )
    ctl = LinearGaussianPolicy(
        K=0.05 * jax.random.normal(ks[9], (N, T, du, dx), jnp.float32),
        kff=0.05 * jax.random.normal(ks[10], (N, T, du), jnp.float32),
        sigma=jnp.broadcast_to(jnp.eye(du), (N, T, du, du)).astype(jnp.float32),
    )
    noise = jnp.broadcast_to(1e-4 * jnp.eye(dx), (N, T, dx, dx)).astype(jnp.float32)
    mu0 = 0.3 * jax.random.normal(ks[11], (N, dx), jnp.float32)
    sigma0 = jnp.broadcast_to(0.01 * jnp.eye(dx), (N, dx, dx)).astype(jnp.float32)
    betas = jnp.full((N,), 200.0, jnp.float32)

    def prep(nom_i, b_i, ctl_i, noise_i, mu0_i, sigma0_i):
        agCpp, agcp, _ = parameter_augment_cost(nom_i, b_i)
        xdist0, _, _ = cubature_forward_pass(mu0_i, sigma0_i, nom_i, noise_i, ctl_i)
        return agCpp, agcp, xdist0

    agCpp, agcp, xdist0 = jax.jit(jax.vmap(prep))(
        nominal, betas, ctl, noise, mu0, sigma0
    )

    q_ref, param_ref, div_ref, _ = jax.jit(
        lambda *a: _ref_fixed_point(*a, fp_iters=3)
    )(agCpp, agcp, ctl, cost, xdist0, betas, mu0, sigma0, noise)
    q, param, div = jax.jit(
        lambda *a: pallas_rgps_fixed_point(*a, fp_iters=3)
    )(agCpp, agcp, ctl, cost, xdist0, betas, mu0, sigma0, noise)

    np.testing.assert_array_equal(np.asarray(div), np.asarray(div_ref))
    np.testing.assert_allclose(q.mu, q_ref.mu, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(q.sigma, q_ref.sigma, rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(param.mu, param_ref.mu, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(param.sigma, param_ref.sigma, rtol=5e-3, atol=1e-5)


@requires_tpu
def test_rgps_solver_pallas_fixed_point_on_device():
    """Full compiled LRGPS solve with fp_engine='pallas' (the TPU default) vs
    'scan' — the adversary duals must land on the same β* and returns."""
    from trajopt_tpu.parallel.rgps import make_rgps_solver

    env = trajopt_tpu.make("LQR-TO-v1")
    mu0, sigma0 = env.init()
    kw = dict(
        nb_steps=20, variant="lr", nb_iter=2, init_action_sigma=10.0,
        policy_kl_bound=0.25, param_nominal_kl_bound=50.0,
        nominal_variance=1e-8, beta_search="parallel",
    )
    out = {}
    for eng in ("scan", "pallas"):
        solve = jax.jit(make_rgps_solver(env, fp_engine=eng, **kw))
        state, trace = solve(jnp.asarray(mu0), jnp.asarray(sigma0))
        out[eng] = (np.asarray(state.last_return), float(state.beta),
                    np.asarray(trace))
    np.testing.assert_allclose(out["pallas"][0], out["scan"][0], rtol=1e-3)
    np.testing.assert_allclose(out["pallas"][1], out["scan"][1], rtol=0.35)
    np.testing.assert_allclose(out["pallas"][2], out["scan"][2], rtol=1e-3)


@requires_tpu
def test_elqr_fused_solve_matches_scan_on_device():
    """Mosaic whole-solve eLQR kernel (engine='pallas-fused': one launch per
    batch block, fori_loop time + dynamic-row VMEM indexing) vs the vmapped
    scan solver."""
    from trajopt_tpu.parallel.elqr import make_elqr_solver_batched

    env = trajopt_tpu.make("Cartpole-TO-v0")
    N, T, nb_iter = 16, 32, 4
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    x0s = jnp.zeros((N, env.dm_state), jnp.float32).at[:, 1].add(
        0.2 + 0.01 * jnp.arange(N, dtype=jnp.float32)
    )

    ctl_s, xs_s, us_s, tr_s = jax.jit(
        make_elqr_solver_batched(env, T, nb_iter, engine="scan")
    )(keys, x0s)
    ctl_f, xs_f, us_f, tr_f = jax.jit(
        make_elqr_solver_batched(env, T, nb_iter, engine="pallas-fused")
    )(keys, x0s)
    np.testing.assert_allclose(np.asarray(tr_f), np.asarray(tr_s),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctl_f.K), np.asarray(ctl_s.K),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_s),
                               rtol=5e-3, atol=5e-3)
