"""Parity tests for the Pallas RGPS adversary fixed-point kernels
(core/pallas_rgps.py) against the scan kernels (core/cubature.py), which are
oracle-tested against NumPy replicas of the reference C++ in tests/test_rgps.py.

Interpreter mode on the CPU backend (float64); small dims (p = dx·(dx+du+1) = 8)
keep the eager unrolled body affordable — the protocol dims (p = 28) run
compiled on TPU via tests/test_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.core.cubature import (
    cubature_forward_pass,
    parameter_augment_cost,
    parameter_backward_pass,
)
from trajopt_tpu.core.pallas_rgps import (
    _pad_geom,
    pack_rgps_problem,
    pack_rgps_xdist,
    pallas_rgps_fixed_point,
    rgps_cubature_kl_packed,
    rgps_param_backward_packed,
    unpack_rgps_xdist,
)
from trajopt_tpu.core.scan_lqr import gaussian_interp_kl, gaussian_kl
from trajopt_tpu.core.types import (
    GaussianSequence,
    LinearGaussianPolicy,
    MatrixNormalParams,
    QuadraticCost,
    vec_from_matrices,
)
from trajopt_tpu.core.pallas_lqr import _from_lanes

DX, DU = 2, 1
P1 = DX + DU + 1
P = DX * P1


def _problem(key, N, T, beta=200.0):
    ks = jax.random.split(key, 12)

    def spd(k, d, n, scale=1.0):
        M = jax.random.normal(k, (N, n, d, d))
        return scale * (jnp.einsum("bnij,bnkj->bnik", M, M) + d * jnp.eye(d))

    cost = QuadraticCost(
        Cxx=spd(ks[0], DX, T + 1),
        cx=jax.random.normal(ks[1], (N, T + 1, DX)),
        Cuu=spd(ks[2], DU, T + 1),
        cu=jax.random.normal(ks[3], (N, T + 1, DU)),
        Cxu=0.1 * jax.random.normal(ks[4], (N, T + 1, DX, DU)),
        c0=0.1 * jax.random.normal(ks[5], (N, T + 1)),
    )
    A = 0.9 * (jnp.eye(DX) + 0.1 * jax.random.normal(ks[6], (N, T, DX, DX)))
    B = 0.5 * jax.random.normal(ks[7], (N, T, DX, DU))
    c = 0.1 * jax.random.normal(ks[8], (N, T, DX))
    theta = jax.vmap(jax.vmap(vec_from_matrices))(A, B, c)
    nominal = MatrixNormalParams(
        mu=theta,
        sigma=jnp.broadcast_to(1e-4 * jnp.eye(P), (N, T, P, P)),
    )
    ctl = LinearGaussianPolicy(
        K=0.1 * jax.random.normal(ks[9], (N, T, DU, DX)),
        kff=0.1 * jax.random.normal(ks[10], (N, T, DU)),
        sigma=jnp.broadcast_to(jnp.eye(DU), (N, T, DU, DU)) * 1.0,
    )
    noise = jnp.broadcast_to(1e-4 * jnp.eye(DX), (N, T, DX, DX)) * 1.0
    mu0 = 0.3 * jax.random.normal(ks[11], (N, DX))
    sigma0 = jnp.broadcast_to(0.01 * jnp.eye(DX), (N, DX, DX)) * 1.0
    betas = jnp.full((N,), beta)

    def prep(nom_i, b_i, ctl_i, noise_i, mu0_i, sigma0_i):
        agCpp, agcp, _ = parameter_augment_cost(nom_i, b_i)
        xdist0, _, _ = cubature_forward_pass(mu0_i, sigma0_i, nom_i, noise_i, ctl_i)
        return agCpp, agcp, xdist0

    agCpp, agcp, xdist0 = jax.vmap(prep)(nominal, betas, ctl, noise, mu0, sigma0)
    return cost, ctl, noise, agCpp, agcp, xdist0, betas, mu0, sigma0


def _ref_backward(xdist, ctl, noise, cost, agCpp, agcp, betas):
    return jax.vmap(parameter_backward_pass)(
        xdist, ctl, noise, cost, agCpp, agcp, betas
    )


def test_param_backward_matches_scan():
    N, T = 3, 5
    cost, ctl, noise, agCpp, agcp, xdist0, betas, _, _ = _problem(
        jax.random.PRNGKey(0), N, T
    )
    param_ref, _, div_ref = _ref_backward(
        xdist0, ctl, noise, cost, agCpp, agcp, betas
    )

    n_pad, _, _, _ = _pad_geom(N)
    packed = pack_rgps_problem(cost, ctl, noise, agCpp, agcp, betas)
    qmu_l, qsig_l, _, _ = pack_rgps_xdist(xdist0, n_pad)
    muopt_l, sigopt_l, bad = rgps_param_backward_packed(
        packed, qmu_l, qsig_l, DX, DU, interpret=True
    )
    mu = _from_lanes(muopt_l, N, (P,))
    sig = _from_lanes(sigopt_l, N, (P, P))

    np.testing.assert_allclose(mu, param_ref.mu, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(sig, param_ref.sigma, rtol=1e-9, atol=1e-13)
    np.testing.assert_array_equal(
        np.asarray(bad.reshape(-1)[:N] > 0), np.asarray(div_ref)
    )


def test_param_backward_flags_nonpd():
    """A collapsed penalty (β ≫ scale of agCpp with an indefinite V push) must
    flag divergence exactly where the scan path does."""
    N, T = 2, 4
    cost, ctl, noise, agCpp, agcp, xdist0, betas, _, _ = _problem(
        jax.random.PRNGKey(3), N, T
    )
    # shrink the KL anchor: W ≈ 2·kron(Mz, V')/β is indefinite when V' is,
    # and the maximizer's V' = -Cxx at the terminal step is negative definite
    agCpp = 1e-12 * agCpp
    agcp = 1e-12 * agcp
    _, _, div_ref = _ref_backward(xdist0, ctl, noise, cost, agCpp, agcp, betas)
    assert bool(jnp.all(div_ref)), "intended non-PD setup no longer diverges"

    n_pad, _, _, _ = _pad_geom(N)
    packed = pack_rgps_problem(cost, ctl, noise, agCpp, agcp, betas)
    qmu_l, qsig_l, _, _ = pack_rgps_xdist(xdist0, n_pad)
    _, _, bad = rgps_param_backward_packed(
        packed, qmu_l, qsig_l, DX, DU, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(bad.reshape(-1)[:N] > 0), np.asarray(div_ref)
    )


def test_cubature_kl_matches_scan():
    N, T = 3, 5
    cost, ctl, noise, agCpp, agcp, xdist0, betas, mu0, sigma0 = _problem(
        jax.random.PRNGKey(1), N, T
    )
    param, _, _ = _ref_backward(xdist0, ctl, noise, cost, agCpp, agcp, betas)

    def one(ctl_i, param_i, mu0_i, sigma0_i, noise_i, q_i):
        p_xdist, _, _ = cubature_forward_pass(
            mu0_i, sigma0_i, param_i, noise_i, ctl_i
        )
        kl = gaussian_kl(p_xdist, q_i)
        q_new = gaussian_interp_kl(q_i, p_xdist, 1e-1)
        return kl, q_new

    kl_ref, qnew_ref = jax.vmap(one)(ctl, param, mu0, sigma0, noise, xdist0)

    n_pad, _, _, _ = _pad_geom(N)
    packed = pack_rgps_problem(cost, ctl, noise, agCpp, agcp, betas)
    qmu_l, qsig_l, qmuT, qsigT = pack_rgps_xdist(xdist0, n_pad)
    muopt_l, sigopt_l, _ = rgps_param_backward_packed(
        packed, qmu_l, qsig_l, DX, DU, interpret=True
    )
    kl_l, qnmu, qnsig, klT, qnmuT, qnsigT = rgps_cubature_kl_packed(
        packed, muopt_l, sigopt_l, qmu_l, qsig_l, qmuT, qsigT,
        qmu_l[0], qsig_l[0], DX, DU, interpret=True,
    )
    kl = jnp.concatenate(
        [
            _from_lanes(kl_l, N, (1,))[:, :, 0],
            jnp.transpose(klT.reshape(1, -1), (1, 0))[:N],
        ],
        axis=1,
    )
    q_new = unpack_rgps_xdist(qnmu, qnsig, qnmuT, qnsigT, N, DX)

    np.testing.assert_allclose(kl, kl_ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(q_new.mu, qnew_ref.mu, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(q_new.sigma, qnew_ref.sigma, rtol=1e-9, atol=1e-14)


def _ref_fixed_point(agCpp, agcp, ctl, cost, xdist0, beta, mu0, sigma0, noise,
                     fp_iters=100, tol=1e-3):
    """The per-instance damped fixed point of parallel/rgps.py:173-217
    (non-differentiable branch), vmapped — the semantics the Pallas path must
    reproduce, per-lane freezes included."""
    T, p = agCpp.shape[1], agCpp.shape[2]

    def one(agCpp, agcp, ctl, cost, xdist0, beta, mu0, sigma0, noise):
        dummy = MatrixNormalParams(
            mu=jnp.zeros((T, p), mu0.dtype),
            sigma=jnp.tile(jnp.eye(p, dtype=mu0.dtype), (T, 1, 1)),
        )

        def cond(state):
            q, param, kl, diverged, it = state
            return (jnp.any(kl > tol)) & (~diverged) & (it < fp_iters)

        def body(state):
            q, _, _, _, it = state
            param, _, diverged = parameter_backward_pass(
                q, ctl, noise, cost, agCpp, agcp, beta
            )
            p_xdist, _, _ = cubature_forward_pass(
                mu0, sigma0, param, noise, ctl
            )
            kl = gaussian_kl(p_xdist, q)
            q_new = gaussian_interp_kl(q, p_xdist, 1e-1)
            return (q_new, param, kl, diverged, it + 1)

        init = (
            xdist0, dummy,
            jnp.full(T + 1, jnp.inf, mu0.dtype),
            jnp.asarray(False), jnp.asarray(0),
        )
        q, param, _, diverged, it = jax.lax.while_loop(cond, body, init)
        return q, param, diverged, it

    return jax.vmap(one)(
        agCpp, agcp, ctl, cost, xdist0, beta, mu0, sigma0, noise
    )


def test_fixed_point_matches_vmapped_while():
    """Full damped fixed point: per-lane convergence at different trip counts
    must freeze q exactly like jax.vmap of the per-instance while_loop."""
    N, T = 3, 4
    cost, ctl, noise, agCpp, agcp, xdist0, betas, mu0, sigma0 = _problem(
        jax.random.PRNGKey(2), N, T
    )
    # stagger convergence: start each lane's marginal a different distance from
    # the fixed point so the damped interpolation needs a different trip count
    kick = jnp.asarray([0.0, 0.5, 2.0])[:, None, None]
    xdist0 = GaussianSequence(
        mu=xdist0.mu + kick * 0.3,
        sigma=xdist0.sigma * (1.0 + kick[..., None]),
    )
    agCpp_b = agCpp / 200.0 * betas[:, None, None, None]
    agcp_b = agcp / 200.0 * betas[:, None, None]

    q_ref, param_ref, div_ref, it_ref = _ref_fixed_point(
        agCpp_b, agcp_b, ctl, cost, xdist0, betas, mu0, sigma0, noise,
        fp_iters=12,
    )
    assert len(set(np.asarray(it_ref).tolist())) > 1, (
        "test should exercise per-lane freezes (all lanes converged in the "
        "same trip count)"
    )

    q, param, div = pallas_rgps_fixed_point(
        agCpp_b, agcp_b, ctl, cost, xdist0, betas, mu0, sigma0, noise,
        fp_iters=12, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(div), np.asarray(div_ref))
    np.testing.assert_allclose(q.mu, q_ref.mu, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(q.sigma, q_ref.sigma, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(param.mu, param_ref.mu, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        param.sigma, param_ref.sigma, rtol=1e-7, atol=1e-12
    )
