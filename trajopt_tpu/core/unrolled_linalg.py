"""Statically-unrolled small-matrix Cholesky factorization and solves.

XLA's ``cholesky`` / ``triangular_solve`` lower to blocked algorithms built on
``while`` loops with dynamic slices — fine for large matrices, but inside a
T-sequential ``lax.scan`` over small operands (the RGPS adversary's 28-dim
MatrixNormal solve, rgps/src/util.cpp:626-798; the cubature propagation's
per-point dx-dim factors, util.cpp:232-361) the loop overhead dominates and
makes each scan step latency-bound and batch-size independent.

These variants unroll the factorization/substitution over the (static) matrix
dimension into a short chain of fused batched ops — one masked matvec +
rsqrt-scale per column/row — that XLA schedules without loops, so throughput
scales with the batch axis instead of being pinned at the per-op latency
floor.  The math is EXACTLY the textbook algorithm jnp.linalg.cholesky
implements, so results match to roundoff and non-PD inputs still surface as
NaNs for the solvers' ``diverge`` flags.

Intended for n ≲ 32; leading batch dimensions broadcast elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def chol_unrolled(M: Array) -> Array:
    """Lower Cholesky factor of (..., n, n) SPD M, unrolled over columns.

    Non-PD inputs yield NaNs (sqrt of a negative pivot), matching
    ``jnp.linalg.cholesky`` failure semantics.
    """
    n = M.shape[-1]
    dt = M.dtype
    L = jnp.zeros_like(M)
    idx = jnp.arange(n)
    for j in range(n):
        r = M[..., :, j]
        if j:
            # subtract L[:, :j] @ L[j, :j]; columns >= j of L are still zero
            r = r - jnp.einsum("...ik,...k->...i", L, L[..., j, :])
        d = jnp.sqrt(r[..., j])
        col = jnp.where(idx >= j, r / d[..., None], jnp.zeros((), dt))
        L = L.at[..., :, j].set(col)
    return L


def solve_tri_lower_unrolled(L: Array, B: Array) -> Array:
    """Solve L X = B for lower-triangular (..., n, n) L, B (..., n, m)."""
    n = L.shape[-1]
    X = jnp.zeros_like(B)
    for i in range(n):
        xi = B[..., i, :]
        if i:
            xi = xi - jnp.einsum("...k,...km->...m", L[..., i, :], X)
        X = X.at[..., i, :].set(xi / L[..., i, i, None])
    return X


def solve_tri_upper_from_lower_unrolled(L: Array, B: Array) -> Array:
    """Solve Lᵀ X = B for lower-triangular (..., n, n) L, B (..., n, m)."""
    n = L.shape[-1]
    X = jnp.zeros_like(B)
    for i in range(n - 1, -1, -1):
        xi = B[..., i, :]
        if i < n - 1:
            xi = xi - jnp.einsum("...k,...km->...m", L[..., :, i], X)
        X = X.at[..., i, :].set(xi / L[..., i, i, None])
    return X


def chol_solve_unrolled(L: Array, B: Array) -> Array:
    """Solve (L Lᵀ) X = B given the lower factor; B (..., n, m) or (..., n)."""
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    X = solve_tri_upper_from_lower_unrolled(L, solve_tri_lower_unrolled(L, B))
    return X[..., 0] if vec else X


def inv_psd_unrolled(M: Array) -> Array:
    """Inverse of small SPD M via the unrolled factor/substitutions."""
    L = chol_unrolled(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    return chol_solve_unrolled(L, eye)


def logdet_from_chol(L: Array) -> Array:
    """log det (L Lᵀ) from the lower factor."""
    return 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
