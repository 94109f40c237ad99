"""Parity of the single-launch belief-MPC plane math (core/pallas_bsp.py).

The Pallas kernels and the plain-jnp twins share every line of plane math, so
these CPU tests pin the twins against the scan-solver semantics
(parallel/bsp.make_bsp_solver and the EKF episode loop); device execution of
the actual kernels is pinned in tests/test_tpu.py (the pallas_pscan recipe —
interpreter mode is pathological on bodies this size).

Small horizons keep the unrolled-body XLA-CPU compile tolerable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu
from trajopt_tpu.core.belief import (
    belief_cost_expansion,
    belief_dynamics_expansion,
)
from trajopt_tpu.core.ekf import EKF, belief_ekf_step
from trajopt_tpu.core.pallas_bsp import (
    run_bsp_episode_planes,
    run_bsp_solve_planes,
    tile_belief_cost_expansion,
    tile_belief_ekf_step,
    tile_belief_expansion,
)
from trajopt_tpu.parallel.bsp import make_bsp_solver


def _env(name):
    return trajopt_tpu.make(name)


def _rand_belief(rng, b):
    mu = jnp.asarray(rng.standard_normal(b))
    A = rng.standard_normal((b, b))
    sig = jnp.asarray(A @ A.T + 0.5 * np.eye(b))
    return mu, sig


@pytest.mark.parametrize("name", ["LightDark-TO-v0", "Car-TO-v0"])
def test_tile_ekf_step_matches_array_path(name):
    env = _env(name)
    assert env.supports_belief_tiles
    b, a = env.belief_dim, env.act_dim
    rng = np.random.default_rng(0)
    mu, sig = _rand_belief(rng, b)
    u = jnp.asarray(rng.standard_normal(a))

    f_ref, W_ref, phi_ref = belief_ekf_step(env, mu, sig, u)

    mu_t = [mu[i].reshape(1, 1) for i in range(b)]
    sig_t = [sig[i, j].reshape(1, 1) for i in range(b) for j in range(b)]
    u_t = [u[j].reshape(1, 1) for j in range(a)]
    f, W, phi = tile_belief_ekf_step(env, mu_t, sig_t, u_t, mu.dtype)

    np.testing.assert_allclose(
        np.asarray([v[0, 0] for v in f]), np.asarray(f_ref), rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray([v[0, 0] for v in W]).reshape(b, b), np.asarray(W_ref),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray([v[0, 0] for v in phi]).reshape(b, b), np.asarray(phi_ref),
        rtol=1e-9, atol=1e-12,
    )


def test_tile_expansions_match_array_path():
    env = _env("LightDark-TO-v0")
    b, a = env.belief_dim, env.act_dim
    bb = b * b
    T = 6
    rng = np.random.default_rng(1)
    mus = jnp.asarray(rng.standard_normal((T + 1, b)))
    As = rng.standard_normal((T + 1, b, b))
    sigs = jnp.asarray(np.einsum("tij,tkj->tik", As, As) + 0.5 * np.eye(b))
    us = jnp.asarray(rng.standard_normal((T, a)))

    dyn_ref = belief_dynamics_expansion(env, mus[:T], sigs[:T], us)
    cost_ref = belief_cost_expansion(env, mus, sigs, us)

    # lanes = t planes
    pad = 128 - (T + 1)
    mu_pl = [jnp.pad(mus[:, i], (0, pad)).reshape(1, -1) for i in range(b)]
    sig_pl = [
        jnp.pad(sigs[:, i, j], (0, pad)).reshape(1, -1)
        for i in range(b) for j in range(b)
    ]
    u_pl = [
        jnp.pad(us[:, j], (0, 128 - T)).reshape(1, -1) for j in range(a)
    ]
    F, G, X, Y, Z, T_, U, V = tile_belief_expansion(
        env, mu_pl, sig_pl, u_pl, mus.dtype
    )
    Q, q, R, r, P, p = tile_belief_cost_expansion(env, mu_pl, sig_pl, u_pl)

    def gather(M, rows, cols, n):
        return np.stack(
            [np.asarray([[M[i][j][0, t] for j in range(cols)]
                         for i in range(rows)]) for t in range(n)]
        )

    def gatherv(v, rows, n):
        return np.stack(
            [np.asarray([v[i][0, t] for i in range(rows)]) for t in range(n)]
        )

    for got, want, nm in [
        (gather(F, b, b, T), dyn_ref.F, "F"),
        (gather(G, b, a, T), dyn_ref.G, "G"),
        (gather(X, bb, b, T), dyn_ref.X, "X"),
        (gather(Y, bb, bb, T), dyn_ref.Y, "Y"),
        (gather(Z, bb, a, T), dyn_ref.Z, "Z"),
        (gather(T_, bb, b, T), dyn_ref.T, "T"),
        (gather(U, bb, bb, T), dyn_ref.U, "U"),
        (gather(V, bb, a, T), dyn_ref.V, "V"),
        (gather(Q, b, b, T + 1), cost_ref.Q, "Q"),
        (gatherv(q, b, T + 1), cost_ref.q, "q"),
        (gather(R, a, a, T + 1), cost_ref.R, "R"),
        (gatherv(r, a, T + 1), cost_ref.r, "r"),
        (gather(P, b, a, T + 1), cost_ref.P, "P"),
        (gatherv(p, bb, T + 1), cost_ref.p, "p"),
    ]:
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10,
                                   err_msg=nm)


@pytest.mark.parametrize(
    "name,kw",
    [
        ("LightDark-TO-v0", {}),
        ("LightDark-TO-v0", {"reg": 2}),
        # negative goal weights give an indefinite value recursion: exercises
        # the λ-escalation ladder against the sequential while-loop
        ("LightDark-TO-v0", {"mu_w": (-2.0, -2.0)}),
    ],
)
def test_solve_planes_matches_scan_solver(name, kw):
    env = _env(name)
    env_kw = {k: kw.pop(k) for k in list(kw) if k in ("mu_w",)}
    if env_kw:
        env = env.replace(**env_kw)
    T, it = 10, 5
    mu0, sigma0 = env.init()
    mu0 = jnp.asarray(mu0, jnp.float64)
    sigma0 = jnp.asarray(sigma0, jnp.float64)

    st_r, tr_r = jax.jit(make_bsp_solver(env, T, nb_iter=it, **kw))(
        mu0, sigma0
    )
    st_n, tr_n = jax.jit(run_bsp_solve_planes(env, T, nb_iter=it, **kw))(
        mu0, sigma0
    )

    np.testing.assert_allclose(np.asarray(tr_n), np.asarray(tr_r), rtol=1e-9)
    for f in ("bref_mu", "bref_sigma", "uref", "K", "kff"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_n, f)), np.asarray(getattr(st_r, f)),
            rtol=1e-8, atol=1e-10, err_msg=f,
        )
    for f in ("lmbda", "dlmbda", "last_return"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_n, f)), np.asarray(getattr(st_r, f)),
            rtol=1e-9, err_msg=f,
        )
    assert bool(st_n.done) == bool(st_r.done)


def test_episode_planes_matches_reference_loop():
    env = _env("LightDark-TO-v0")
    T, nsteps, it = 8, 5, 3
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(env.reset_state(), jnp.float64)
    eps0 = jnp.asarray(rng.standard_normal(env.obs_dim))
    eps_dyn = jnp.asarray(rng.standard_normal((nsteps, env.state_dim)))
    eps_obs = jnp.asarray(rng.standard_normal((nsteps, env.obs_dim)))

    # the scan runner's loop with the multivariate-normal draws replaced by
    # mean + chol(cov)·ε (the kernel's sampling transform)
    solve = jax.jit(make_bsp_solver(env, T, nb_iter=it))
    filt = EKF(env)

    def chol_draw(mean, cov, eps):
        return mean + jnp.linalg.cholesky(cov) @ eps

    mu0, sigma0 = env.init()
    mu_b, cov_b = filt.innovate(
        jnp.asarray(mu0, jnp.float64), jnp.asarray(sigma0, jnp.float64),
        chol_draw(env.observe(x0), env.obs_noise(x0), eps0),
    )
    x = x0
    xs, mus, sigs, us, cs = [], [], [], [], []
    for s in range(nsteps):
        st, _ = solve(mu_b, cov_b)
        u = st.uref[0]
        c = env.cost(mu_b, cov_b, u)
        xn = chol_draw(env.dynamics(x, u), env.dyn_noise(x, u), eps_dyn[s])
        obs = chol_draw(env.observe(xn), env.obs_noise(xn), eps_obs[s])
        xs.append(x); mus.append(mu_b); sigs.append(cov_b)
        us.append(u); cs.append(c)
        mu_b, cov_b = filt.inference(mu_b, cov_b, u, obs)
        x = xn
    xs.append(x); mus.append(mu_b); sigs.append(cov_b)
    ref = (jnp.stack(xs), jnp.stack(mus), jnp.stack(sigs), jnp.stack(us),
           jnp.stack(cs))

    run = jax.jit(run_bsp_episode_planes(env, T, nsteps, nb_iter=it))
    new = run(x0, eps0, eps_dyn, eps_obs)
    for name, a, b in zip(["xs", "mus", "sigmas", "us", "cs"], ref, new):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-7, atol=1e-9, err_msg=name
        )


def test_mpc_runner_pallas_engine_interpret_smoke():
    """make_bsp_mpc_runner(engine='pallas') wires the episode kernel; a tiny
    interpret-mode run checks the pallas_call plumbing end-to-end on CPU."""
    from trajopt_tpu.parallel.bsp import make_bsp_mpc_runner

    env = _env("LightDark-TO-v0")
    run = make_bsp_mpc_runner(
        env, horizon=4, nb_steps=2, nb_iter=1, engine="pallas", interpret=True
    )
    x0 = jnp.asarray(env.reset_state(), jnp.float64)
    xs, mus, sigmas, us, cs = run(jax.random.PRNGKey(0), x0)
    assert xs.shape == (3, 2) and us.shape == (2, 2)
    assert bool(jnp.all(jnp.isfinite(us)))
