"""Parity tests for the Pallas GPS dual-chain kernels (core/pallas_gps.py) against
the lax.scan kernels (core/scan_lqr.py), which are oracle-tested against NumPy
replicas of the reference C++ in tests/test_gps_kernels.py.

Interpreter mode on the CPU backend (float64); small dims keep the eager unrolled
body affordable — larger dims run compiled on TPU via the batched GPS dual.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.core.pallas_gps import pallas_gps_backward, pallas_gps_forward_kl
from trajopt_tpu.core.scan_lqr import (
    augment_cost_kl,
    gaussian_forward,
    gps_backward,
    policy_kl,
)
from trajopt_tpu.core.types import (
    LinearGaussianDynamics,
    LinearGaussianPolicy,
    QuadraticCost,
)

DX, DU = 2, 1


def _problem(key, N, T):
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
    dyn = LinearGaussianDynamics(
        A=0.9 * (jnp.eye(DX) + 0.1 * jax.random.normal(ks[6], (N, T, DX, DX))),
        B=0.5 * jax.random.normal(ks[7], (N, T, DX, DU)),
        c=0.1 * jax.random.normal(ks[8], (N, T, DX)),
        sigma=spd(ks[9], DX, T, scale=0.01),
    )
    old = LinearGaussianPolicy(
        K=0.1 * jax.random.normal(ks[10], (N, T, DU, DX)),
        kff=0.1 * jax.random.normal(ks[11], (N, T, DU)),
        sigma=jnp.tile(0.5 * jnp.eye(DU), (N, T, 1, 1)),
    )
    alpha = jnp.exp(jax.random.normal(ks[0], (N, T)))
    return cost, dyn, old, alpha


def _ref_backward(cost, dyn, old, alpha):
    def one(c, d, o, a):
        ag = augment_cost_kl(c, o, a)
        lgc, xvalue, _, div = gps_backward(ag, d, a)
        return lgc, xvalue.V[0], xvalue.v[0], xvalue.v0[0], div

    return jax.vmap(one)(cost, dyn, old, alpha)


def test_backward_matches_scan_chain():
    N, T = 3, 7  # not multiples of the lane/time tiles
    cost, dyn, old, alpha = _problem(jax.random.PRNGKey(0), N, T)

    ref_pol, V0_r, v0_r, c0_r, div_r = _ref_backward(cost, dyn, old, alpha)
    pol, V0, v0, c0, div = pallas_gps_backward(
        cost, dyn, old, alpha, time_chunk=4, interpret=True
    )

    assert not np.any(div_r) and not np.any(div)
    np.testing.assert_allclose(pol.K, ref_pol.K, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(pol.kff, ref_pol.kff, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(pol.sigma, ref_pol.sigma, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(V0, V0_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(v0, v0_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(c0, c0_r, rtol=1e-8, atol=1e-8)


def test_forward_kl_matches_scan_chain():
    N, T = 3, 7
    cost, dyn, old, alpha = _problem(jax.random.PRNGKey(1), N, T)
    new, *_ = _ref_backward(cost, dyn, old, alpha)

    mu0 = jax.random.normal(jax.random.PRNGKey(2), (N, DX))
    sigma0 = jnp.tile(0.3 * jnp.eye(DX), (N, 1, 1))

    def one(d, n, o, m0, s0):
        xdist, _, _ = gaussian_forward(d, n, m0, s0)
        return jnp.sum(policy_kl(n, o, xdist)), xdist.mu[T], xdist.sigma[T]

    kl_r, muT_r, sigT_r = jax.vmap(one)(dyn, new, old, mu0, sigma0)
    kl, muT, sigT = pallas_gps_forward_kl(
        dyn, new, old, mu0, sigma0, time_chunk=4, interpret=True
    )

    np.testing.assert_allclose(kl, kl_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(muT, muT_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sigT, sigT_r, rtol=1e-8, atol=1e-10)


def test_backward_divergence_flag():
    N, T = 2, 5
    cost, dyn, old, alpha = _problem(jax.random.PRNGKey(3), N, T)
    # a hugely negative Cuu at one step of instance 1 makes −Quu indefinite there
    cost = cost._replace(Cuu=cost.Cuu.at[1, 2].set(-50.0 * jnp.eye(DU)))
    *_, div = pallas_gps_backward(cost, dyn, old, alpha, interpret=True)
    assert bool(div[1]) and not bool(div[0])


def test_packed_dual_chain_bit_exact_vs_oneshot():
    """The packed path (pack once, two launches, lane-major hand-off) must be
    BIT-exact vs the one-shot wrappers, and match the scan dual chain."""
    from trajopt_tpu.core.pallas_gps import (
        pack_gps_alpha,
        pack_gps_lanes,
        pallas_gps_backward_packed,
        pallas_gps_forward_kl_packed,
        quad_expectation_lanes,
        unpack_gps_policy,
        unpack_gps_scalar,
    )
    from trajopt_tpu.core.scan_lqr import quad_expectation

    N, T = 3, 7
    cost, dyn, old, alpha = _problem(jax.random.PRNGKey(5), N, T)
    mu0 = jax.random.normal(jax.random.PRNGKey(6), (N, DX))
    sigma0 = jnp.tile(0.3 * jnp.eye(DX), (N, 1, 1))

    packed = pack_gps_lanes(cost, dyn, old, mu0, sigma0, time_chunk=4)
    alpha_l = pack_gps_alpha(alpha, time_chunk=4)
    K_l, kff_l, sigc_l, V0_l, vv0_l, c0_l, bad = pallas_gps_backward_packed(
        packed, alpha_l, DX, DU, time_chunk=4, interpret=True
    )
    kl_l, muT_l, sigT_l = pallas_gps_forward_kl_packed(
        packed, K_l, kff_l, sigc_l, DX, DU, time_chunk=4, interpret=True
    )
    pol = unpack_gps_policy(K_l, kff_l, sigc_l, N, T, DX, DU)
    kl = unpack_gps_scalar(kl_l, N)

    # bit-exact vs the one-shot wrappers (same kernels, same operand layout)
    pol_w, V0_w, v0_w, c0_w, div_w = pallas_gps_backward(
        cost, dyn, old, alpha, time_chunk=4, interpret=True
    )
    kl_w, muT_w, sigT_w = pallas_gps_forward_kl(
        dyn, pol_w, old, mu0, sigma0, time_chunk=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pol.K), np.asarray(pol_w.K))
    np.testing.assert_array_equal(np.asarray(pol.kff), np.asarray(pol_w.kff))
    np.testing.assert_array_equal(np.asarray(pol.sigma), np.asarray(pol_w.sigma))
    np.testing.assert_array_equal(np.asarray(kl), np.asarray(kl_w))

    # ... and correct vs the scan chain
    ref_pol, V0_r, v0_r, c0_r, _ = _ref_backward(cost, dyn, old, alpha)
    np.testing.assert_allclose(pol.K, ref_pol.K, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(kl_w, kl, rtol=1e-8, atol=1e-10)

    # lane-major quadratic expectation == scan quad_expectation at t=0
    qe_l = quad_expectation_lanes(
        V0_l, vv0_l, c0_l, packed["mu0"], packed["sig0"], DX
    )
    qe = unpack_gps_scalar(qe_l, N)
    qe_r = jax.vmap(quad_expectation)(mu0, sigma0, V0_r, v0_r, c0_r)
    np.testing.assert_allclose(qe, qe_r, rtol=1e-8, atol=1e-8)


def test_solver_level_pallas_engine_matches_scan_interpreted():
    """The FULL batched MBGPS solve with engine='pallas' (interpreter mode) vs
    the scan engine — covers the solver-level glue the kernel tests can't:
    the pack-once-per-dual layout reuse, per-instance bracket lockstep, and
    acceptance masking (otherwise device-only, test_tpu.py)."""
    import trajopt_tpu
    from trajopt_tpu.parallel.gps import make_mbgps_solver_batched

    env = trajopt_tpu.make("LQR-TO-v0", sigma_scale=1e-4)
    N, T = 3, 10
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    mu0, sigma0 = env.init()
    mu0s = jnp.tile(jnp.asarray(mu0), (N, 1)) + 0.05 * jnp.arange(
        N, dtype=jnp.float64
    )[:, None]
    sigma0s = jnp.tile(jnp.asarray(sigma0), (N, 1, 1))

    # bisect_iters kept small: each bisection step in interpreter mode is two
    # Python-interpreted kernel walks; parity is exact at ANY iteration count
    # because both engines run the same bracket sequence
    _, tr_s = jax.jit(make_mbgps_solver_batched(
        env, T, nb_iter=2, kl_bound=2.0, bisect_iters=8, engine="scan"
    ))(keys, mu0s, sigma0s)
    # interpreter-mode Pallas: call UNJITTED (CLAUDE.md invariant)
    _, tr_p = make_mbgps_solver_batched(
        env, T, nb_iter=2, kl_bound=2.0, bisect_iters=8, engine="pallas",
        interpret=True,
    )(keys, mu0s, sigma0s)

    np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_s), rtol=1e-7)
