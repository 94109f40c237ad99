"""Batched per-timestep Bayesian linear-Gaussian regression.

Replaces the undeclared ``mimo`` dependency of the reference (gps/objects.py:4-8,
rgps/objects.py:5-9) with closed-form conjugate updates in jnp, **vmapped over the
horizon** instead of the reference's per-timestep Python loop
(gps/objects.py:225-236).  The episode axis is a pure reduction (XᵀX, XᵀY Gram
matrices), so sharding rollouts across devices turns these fits into ``psum``-able
data-parallel updates (see parallel/mesh.py).

Model per timestep t:   xn = M [x; u; 1] + ε,  ε ~ N(0, Σ)
Prior:                  M | Σ ~ MN(M0, Σ, K0⁻¹),  Σ ~ IW(Ψ0, ν0)
Posterior (standard conjugate algebra):
    K_n = K0 + XᵀX
    M_n = (M0 K0 + YᵀX) K_n⁻¹
    Ψ_n = Ψ0 + YᵀY + M0 K0 M0ᵀ − M_n K_n M_nᵀ
    ν_n = ν0 + N
MAP noise: Σ = Ψ_n / (ν_n + d + 1)  (inverse-Wishart mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..core.types import LinearGaussianDynamics, MatrixNormalParams


def _design(x: Array, u: Array) -> Array:
    """Stack inputs with an affine column: (N, dx + du + 1)."""
    N = x.shape[0]
    return jnp.concatenate([x, u, jnp.ones((N, 1), x.dtype)], axis=1)


def _mniw_posterior_from_stats(
    XtX: Array, YtX: Array, YtY: Array, N, prior: dict, dx: int
):
    """Posterior from the episode-summed Gram statistics — the form that makes
    the fit data-parallel: shards contribute (XᵀX, YᵀX, YᵀY, N) partial sums,
    a ``psum`` combines them, and this closed form finishes the update."""
    q = XtX.shape[-1]
    K0 = prior["K"] * jnp.eye(q, dtype=XtX.dtype)
    M0 = jnp.zeros((dx, q), XtX.dtype)
    psi0 = prior.get("psi", 1e-8) * jnp.eye(dx, dtype=XtX.dtype)
    nu0 = dx + prior.get("nu", 0.1)

    K_n = K0 + XtX
    M_n = jnp.linalg.solve(K_n.T, (M0 @ K0 + YtX).T).T
    psi_n = psi0 + YtY + M0 @ K0 @ M0.T - M_n @ K_n @ M_n.T
    nu_n = nu0 + N
    return M_n, K_n, psi_n, nu_n


def _mniw_posterior(X: Array, Y: Array, prior: dict, dx: int):
    return _mniw_posterior_from_stats(
        X.T @ X, Y.T @ X, Y.T @ Y, X.shape[0], prior, dx
    )


def _gram_stats(xs: Array, us: Array, xns: Array):
    """Per-timestep episode-summed Gram statistics from (E, T, d) rollouts."""
    E = xs.shape[0]
    X = jnp.concatenate([xs, us, jnp.ones(xs.shape[:2] + (1,), xs.dtype)], axis=-1)
    XtX = jnp.einsum("etq,etp->tqp", X, X)
    YtX = jnp.einsum("etd,etq->tdq", xns, X)
    YtY = jnp.einsum("etd,etf->tdf", xns, xns)
    return XtX, YtX, YtY, E


def _dyn_from_stats(XtX, YtX, YtY, N, prior, dx):
    def fit_t(xtx, ytx, yty):
        M_n, K_n, psi_n, nu_n = _mniw_posterior_from_stats(
            xtx, ytx, yty, N, prior, dx
        )
        A = M_n[:, :dx]
        B = M_n[:, dx:-1]
        c = M_n[:, -1]
        sigma = psi_n / (nu_n + dx + 1.0)
        return A, B, c, 0.5 * (sigma + sigma.T)

    A, B, c, sigma = jax.vmap(fit_t)(XtX, YtX, YtY)
    return LinearGaussianDynamics(A=A, B=B, c=c, sigma=sigma)


def mniw_map_regression_sharded(
    xs: Array, us: Array, xns: Array, prior: dict, axis_name: str = "dp"
) -> LinearGaussianDynamics:
    """Data-parallel MAP fit for use INSIDE ``shard_map``: ``xs/us/xns`` are this
    device's episode shard; the Gram statistics are ``psum``-ed over
    ``axis_name`` and every device finishes the identical posterior — the
    sharded-rollout regression SURVEY.md §2.4/§5 names (replaces the reference's
    per-timestep ``mimo`` loop over a joblib-gathered batch)."""
    dx = xs.shape[-1]
    XtX, YtX, YtY, E = _gram_stats(xs, us, xns)
    XtX = jax.lax.psum(XtX, axis_name)
    YtX = jax.lax.psum(YtX, axis_name)
    YtY = jax.lax.psum(YtY, axis_name)
    N = jax.lax.psum(E, axis_name)
    return _dyn_from_stats(XtX, YtX, YtY, N, prior, dx)


def mniw_map_regression(
    xs: Array, us: Array, xns: Array, prior: dict
) -> LinearGaussianDynamics:
    """MAP time-varying linear-Gaussian dynamics from rollouts.

    xs/us/xns: (episodes, T, d) stacked rollout data (layout of
    ``MFGPS.rollout``, mfgps.py:95-120).  Equivalent of
    ``LearnedLinearGaussianDynamics.learn`` (gps/objects.py:225-236).
    """
    dx = xs.shape[-1]

    def fit_t(x_t, u_t, xn_t):
        X = _design(x_t, u_t)
        Y = xn_t
        M_n, K_n, psi_n, nu_n = _mniw_posterior(X, Y, prior, dx)
        A = M_n[:, :dx]
        B = M_n[:, dx:-1]
        c = M_n[:, -1]
        sigma = psi_n / (nu_n + dx + 1.0)
        return A, B, c, 0.5 * (sigma + sigma.T)

    # move time axis leading for the vmap: (T, episodes, d)
    A, B, c, sigma = jax.vmap(fit_t)(
        jnp.swapaxes(xs, 0, 1), jnp.swapaxes(us, 0, 1), jnp.swapaxes(xns, 0, 1)
    )
    return LinearGaussianDynamics(A=A, B=B, c=c, sigma=sigma)


def mniw_meanfield_params(
    xs: Array, us: Array, xns: Array, prior: dict
) -> tuple[MatrixNormalParams, Array]:
    """Posterior MatrixNormal over θ = vec([A B c]) plus MAP noise, for the
    model-free RGPS nominal (rgps/objects.py:265-288).

    Returns (MatrixNormalParams over (T, p), noise (T, dx, dx)).  The parameter
    covariance is the MatrixNormal Kronecker form Σθ = kron(K_n⁻¹, Σ_mode)
    (column-major vec convention, matching rgps/objects.py:285).
    """
    dx = xs.shape[-1]

    def fit_t(x_t, u_t, xn_t):
        X = _design(x_t, u_t)
        M_n, K_n, psi_n, nu_n = _mniw_posterior(X, xn_t, prior, dx)
        q = X.shape[-1]
        # vec is column-major over M (dx × q): mu = vec_F(M_n)
        mu = M_n.T.reshape(-1)
        noise = psi_n / (nu_n + dx + 1.0)
        K_inv = jnp.linalg.inv(K_n)
        sigma_theta = jnp.kron(K_inv, noise)
        return mu, sigma_theta, 0.5 * (noise + noise.T)

    mu, sigma_theta, noise = jax.vmap(fit_t)(
        jnp.swapaxes(xs, 0, 1), jnp.swapaxes(us, 0, 1), jnp.swapaxes(xns, 0, 1)
    )
    return MatrixNormalParams(mu=mu, sigma=sigma_theta), noise
