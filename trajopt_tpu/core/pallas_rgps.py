"""Lane-major Pallas TPU kernels for the RGPS adversary fixed point.

The reference's deepest hot path is the adversary's parameter fixed point
(rgps/mbrgps.py:386-408): alternate the optimal MatrixNormal backward pass
(rgps/src/util.cpp:626-798) with cubature propagation of the state marginal
(util.cpp:232-361) until the propagated marginal stops moving.  The scan-path
kernels (core/cubature.py) are throughput-optimal at large batch but latency-bound
at the reference's own operating point (batch ≤ 8): each timestep of the reverse
scan factorizes and inverts a p×p matrix (p = dx·(dx+du+1) = 28 for the
LQR-TO-v1 protocol config), and the ~28-column dependency chains of those
unrolled Cholesky/solve ops leave the VPU idle between tiny fused ops —
measured 2.46× single-thread C++ at batch 8 (BENCH_r03/r04), far off the ≥10×
bar every other family clears.

These kernels collapse ONE fixed-point trip to TWO Pallas launches in the
lane-major layout of core/pallas_lqr.py (problem instances — and, in the
parallel β-search, β-candidates — on the 128 lanes; matrix entries unrolled as
straight-line VPU code; the horizon walked by the grid):

* :func:`rgps_param_backward_packed` — the adversary's optimal per-timestep
  MatrixNormal (util.cpp:626-798): joint (x,u,1) moments, the Kronecker-lifted
  precision W = 2(agCpp + kron(Mz, V'))/(β+η), its p-dim in-kernel Cholesky,
  entrywise NaN-sanitize (mirroring core/cubature.py:317-321), the p×p inverse
  via L⁻¹ᵀL⁻¹, and the maximizing player's value recursion through the closed
  loop A + BK — one grid step per timestep, one kernel launch per sweep.
* :func:`rgps_cubature_kl_packed` — cubature propagation of the state marginal
  through the uncertain dynamics (util.cpp:232-361) FUSED with the fixed point's
  per-step convergence KL and the precision-weighted (KL-geodesic) interpolation
  q ← interp(q, p; 0.1) (util.cpp:125-152, 188-215; mbrgps.py:403-406).  The
  2·daug cubature points are never materialized: the quadratic forms
  z Σθ zᵀ are expanded around the central point (z = μ_z ± √d·chol-columns), so
  the per-point 784-term contraction is paid once, not 22 times.

:func:`pallas_rgps_fixed_point` runs the full damped fixed point
(mbrgps.py:386-408) over a batch of N problem instances with EXACTLY the
per-lane freeze semantics of ``jax.vmap`` over the per-instance
``lax.while_loop`` (JAX's batched-while rule: iterate while any lane's
condition holds, select per-lane between body output and carried state).
Because the backward pass is a deterministic function of the carried marginal
q, frozen lanes recompute bit-identical parameters — only q itself and the
per-lane trip counter need masking.

Numerical contract: non-PD precisions produce NaNs exactly where the scan path
does (unguarded Cholesky mirroring core/unrolled_linalg.chol_unrolled), the
entrywise identity-sanitize of the backward factor matches
core/cubature.py:317-321, and zero-weight cubature points inject NaN through a
0·(row-sum of their Cholesky factor) term — IEEE 0·NaN = NaN — matching the
reference's ``chol_covs @ 0`` propagation.
"""

from __future__ import annotations

import math
from functools import partial, reduce

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lqr import (
    LANES,
    _add,
    _dot,
    _load_mat,
    _load_vec,
    _mm,
    _mm_tn,
    _mv,
    _mv_tn,
    _sym,
    _t,
    _to_lanes,
    _from_lanes,
    sub_block,
)
from .types import (
    GaussianSequence,
    LinearGaussianPolicy,
    MatrixNormalParams,
    QuadraticCost,
)


# --------------------------------------------------------------------------------------
# Plane-level linear algebra (NaN-propagating, mirroring unrolled_linalg semantics)
# --------------------------------------------------------------------------------------


def _chol_nan(A):
    """Unguarded plane Cholesky: NaN on non-PD pivots, zeros above the diagonal
    (the contract of core/unrolled_linalg.chol_unrolled)."""
    n = len(A)
    zero = jnp.zeros_like(A[0][0])
    L = [[zero for _ in range(n)] for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = A[j][j] - sum(L[j][k] * L[j][k] for k in range(j))
        d = jnp.sqrt(s)
        inv_d[j] = 1.0 / d
        L[j][j] = d
        for i in range(j + 1, n):
            L[i][j] = (A[i][j] - sum(L[i][k] * L[j][k] for k in range(j))) * inv_d[j]
    return L, inv_d


def _tri_inv_lower(L, inv_d):
    """M = L⁻¹ for unit-accessible lower-triangular plane matrix L."""
    n = len(L)
    zero = jnp.zeros_like(L[0][0])
    M = [[zero for _ in range(n)] for _ in range(n)]
    for j in range(n):
        M[j][j] = inv_d[j]
        for i in range(j + 1, n):
            M[i][j] = -(sum(L[i][k] * M[k][j] for k in range(j, i))) * inv_d[i]
    return M


def _inv_from_chol(L, inv_d):
    """(L Lᵀ)⁻¹ = MᵀM with M = L⁻¹ — exactly symmetric by construction."""
    n = len(L)
    M = _tri_inv_lower(L, inv_d)
    S = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            v = sum(M[k][i] * M[k][j] for k in range(j, n))
            S[i][j] = v
            S[j][i] = v
    return S


def _logdet_from_chol(L):
    return 2.0 * sum(jnp.log(L[j][j]) for j in range(len(L)))


def _all_finite_lower(L):
    """AND-reduction of isfinite over the lower triangle (zeros above are
    always finite, so this equals the reference's whole-matrix check)."""
    checks = [
        jnp.isfinite(L[i][j]) for i in range(len(L)) for j in range(i + 1)
    ]
    return reduce(lambda a, b: a & b, checks)


# --------------------------------------------------------------------------------------
# Kernel 1: adversary MatrixNormal backward pass (rgps/src/util.cpp:626-798)
# --------------------------------------------------------------------------------------


def _rgps_param_backward_kernel(
    cxx_ref, cx_ref, cuu_ref, cu_ref, cxu_ref, c0_ref, cuun_ref,
    acpp_ref, acp_ref, sigd_ref,
    k_ref, kff_ref, sigc_ref,
    qmu_ref, qsig_ref,
    bpe_ref, vT_ref, vvT_ref, v0T_ref,
    # outputs
    muopt_ref, sigopt_ref, bad_ref,
    # scratch
    v_s, vv_s, v0_s,
    *, dx: int, du: int, time_chunk: int,
):
    i = pl.program_id(1)
    p1 = dx + du + 1
    p = dx * p1

    @pl.when(i == 0)
    def _():
        v_s[...] = vT_ref[...]
        vv_s[...] = vvT_ref[...]
        v0_s[...] = v0T_ref[...]
        bad_ref[...] = jnp.zeros_like(bad_ref)

    V = [[v_s[a * dx + b] for b in range(dx)] for a in range(dx)]
    v = [vv_s[a] for a in range(dx)]
    v0 = v0_s[0]
    bad = bad_ref[...] > 0
    inv_bpe = 1.0 / bpe_ref[0]

    for tloc in reversed(range(time_chunk)):
        Cxx = _load_mat(cxx_ref, tloc, dx, dx)
        cx = _load_vec(cx_ref, tloc, dx)
        Cuu = _load_mat(cuu_ref, tloc, du, du)
        cu = _load_vec(cu_ref, tloc, du)
        Cxu = _load_mat(cxu_ref, tloc, dx, du)
        c0 = c0_ref[tloc, 0]
        Cuun = _load_mat(cuun_ref, tloc, du, du)
        sigd = _load_mat(sigd_ref, tloc, dx, dx)
        K = _load_mat(k_ref, tloc, du, dx)
        kff = _load_vec(kff_ref, tloc, du)
        Sc = _load_mat(sigc_ref, tloc, du, du)
        mu_x = _load_vec(qmu_ref, tloc, dx)
        Sx = _load_mat(qsig_ref, tloc, dx, dx)

        # ---- joint (x, u, 1) moment under the carried marginal (util.cpp:661-686)
        one = jnp.ones_like(mu_x[0])
        mu_u = [_dot(K[a], mu_x) + kff[a] for a in range(du)]
        KS = _mm(K, Sx)
        Su = _sym(_add(Sc, _mm(KS, _t(K))))
        Su = [[Su[a][b] + (1e-8 if a == b else 0.0) for b in range(du)]
              for a in range(du)]
        cross = _mm(Sx, _t(K))                           # (dx, du)
        zero = jnp.zeros_like(mu_x[0])
        Sz = [[zero for _ in range(p1)] for _ in range(p1)]
        for a in range(dx):
            for b in range(dx):
                Sz[a][b] = Sx[a][b]
            for b in range(du):
                Sz[a][dx + b] = cross[a][b]
                Sz[dx + b][a] = cross[a][b]
        for a in range(du):
            for b in range(du):
                Sz[dx + a][dx + b] = Su[a][b]
        Sz = _sym(Sz)
        Sz = [[Sz[a][b] + (1e-8 if a == b else 0.0) for b in range(p1)]
              for a in range(p1)]
        mu_z = mu_x + mu_u + [one]
        Mz = [[mu_z[a] * mu_z[b] + Sz[a][b] for b in range(p1)]
              for a in range(p1)]

        # ---- Kronecker-lifted precision W, linear term w (util.cpp:688-716) ------
        # X[(a,i),(b,j)] = 2(agCpp + kron(Mz, V'))/(β+η); W = ½(X + Xᵀ)
        X = [[None] * p for _ in range(p)]
        for a in range(p1):
            for b in range(p1):
                MzV = Mz[a][b]
                for ii in range(dx):
                    r = a * dx + ii
                    for jj in range(dx):
                        c = b * dx + jj
                        X[r][c] = 2.0 * (
                            acpp_ref[tloc, r * p + c] + MzV * V[ii][jj]
                        ) * inv_bpe
        W = [[0.5 * (X[r][c] + X[c][r]) for c in range(p)] for r in range(p)]
        w = [
            -(acp_ref[tloc, a * dx + ii] + mu_z[a] * v[ii]) * inv_bpe
            for a in range(p1)
            for ii in range(dx)
        ]

        # ---- factorize, sanitize entrywise (cubature.py:317-321), invert ---------
        L, _ = _chol_nan(W)
        step_bad = ~_all_finite_lower(L)
        Ls = [
            [
                jnp.where(jnp.isfinite(L[r][c]), L[r][c], 1.0 if r == c else 0.0)
                if c <= r
                else jnp.zeros_like(L[0][0])
                for c in range(p)
            ]
            for r in range(p)
        ]
        inv_ds = [1.0 / Ls[j][j] for j in range(p)]
        Sig = _inv_from_chol(Ls, inv_ds)                 # Σθ* = W⁻¹, (p, p)
        mu_opt = [
            sum(Sig[r][c] * w[c] for c in range(p)) for r in range(p)
        ]

        # ---- unpack θ*, correction blocks P (util.cpp:718-768) -------------------
        A = [[mu_opt[a * dx + ii] for a in range(dx)] for ii in range(dx)]
        B = [[mu_opt[(dx + b) * dx + ii] for b in range(du)] for ii in range(dx)]
        cvec = [mu_opt[(dx + du) * dx + ii] for ii in range(dx)]

        P = [
            [
                sum(
                    Sig[a * dx + ii][b * dx + jj] * V[jj][ii]
                    for ii in range(dx)
                    for jj in range(dx)
                )
                for b in range(p1)
            ]
            for a in range(p1)
        ]
        Pxx = [[P[a][b] for b in range(dx)] for a in range(dx)]
        Puu = [[P[dx + a][dx + b] for b in range(du)] for a in range(du)]
        Pxu = [[P[a][dx + b] for b in range(du)] for a in range(dx)]
        px = [P[a][p1 - 1] for a in range(dx)]
        pu = [P[dx + a][p1 - 1] for a in range(du)]
        p00 = P[p1 - 1][p1 - 1]

        # ---- maximizer value recursion through A + BK (util.cpp:719-798) ---------
        A_cl = _add(A, _mm(B, K))
        c_cl = [cvec[ii] + _dot(B[ii], kff) for ii in range(dx)]

        # kron(σ_block, V') contractions without materializing the Kronecker:
        # σ_block is zero except the control block (intended form of util.cpp:771)
        blk = [[mu_opt[(dx + b) * dx + ii] for ii in range(dx)] for b in range(du)]
        Vblk = [_mv(V, blk[b]) for b in range(du)]
        mu_kv = sum(
            Sc[a][b] * _dot(blk[a], Vblk[b])
            for a in range(du)
            for b in range(du)
        )
        tr_kv = sum(
            Sc[a][b]
            * sum(
                V[ii][jj] * Sig[(dx + b) * dx + jj][(dx + a) * dx + ii]
                for ii in range(dx)
                for jj in range(dx)
            )
            for a in range(du)
            for b in range(du)
        )

        mCuuP = [[-Cuu[a][b] + Puu[a][b] for b in range(du)] for a in range(du)]
        mCxuP = [[-Cxu[a][b] + Pxu[a][b] for b in range(du)] for a in range(dx)]
        KtmC = _mm_tn(K, mCuuP)                          # Kᵀ(-Cuu+Puu), (dx, du)
        VAcl = _mm(V, A_cl)
        Vn = _sym(
            [
                [
                    (-Cxx[a][b] + Pxx[a][b])
                    + _dot(KtmC[a], [K[q][b] for q in range(du)])
                    + sum(A_cl[q][a] * VAcl[q][b] for q in range(dx))
                    + 2.0 * _dot(mCxuP[a], [K[q][b] for q in range(du)])
                    for b in range(dx)
                ]
                for a in range(dx)
            ]
        )
        Vc_cl = _mv(V, c_cl)
        vn = [
            (-cx[a] + 2.0 * px[a])
            + 2.0 * _dot(KtmC[a], kff)
            + 2.0 * _dot(mCxuP[a], kff)
            + sum(K[q][a] * (-cu[q] + 2.0 * pu[q]) for q in range(du))
            + 2.0 * sum(A_cl[q][a] * Vc_cl[q] for q in range(dx))
            + sum(A_cl[q][a] * v[q] for q in range(dx))
            for a in range(dx)
        ]
        v0n = (
            (-c0 + p00)
            + _dot(kff, _mv(mCuuP, kff))
            + _dot(kff, [-cu[q] + 2.0 * pu[q] for q in range(du)])
            - sum(Cuun[a][b] * Sc[b][a] for a in range(du) for b in range(du))
            + v0
            + sum(V[a][b] * sigd[b][a] for a in range(dx) for b in range(dx))
            + mu_kv
            + tr_kv
            + _dot(c_cl, Vc_cl)
            + _dot(c_cl, v)
        )

        V, v, v0 = Vn, vn, v0n
        bad = bad | step_bad

        for r in range(p):
            muopt_ref[tloc, r] = mu_opt[r]
            for c in range(p):
                sigopt_ref[tloc, r * p + c] = Sig[r][c]

    for a in range(dx):
        for b in range(dx):
            v_s[a * dx + b] = V[a][b]
        vv_s[a] = v[a]
    v0_s[0] = v0
    bad_ref[...] = bad.astype(bad_ref.dtype)


# --------------------------------------------------------------------------------------
# Kernel 2: cubature forward fused with the fixed point's KL + geodesic damping
# --------------------------------------------------------------------------------------


def _kl_interp_planes(mu, S, q_mu, q_sig, dx, a_interp):
    """KL(N(mu,S) ‖ N(q_mu,q_sig)) and the precision-weighted interpolation
    interp(q, p; a) (rgps/src/util.cpp:125-152, 188-215)."""
    Lq, inv_dq = _chol_nan(q_sig)
    lam_q = _inv_from_chol(Lq, inv_dq)
    Lp, inv_dp = _chol_nan(S)
    lam_p = _inv_from_chol(Lp, inv_dp)
    diff = [q_mu[i] - mu[i] for i in range(dx)]
    kl = 0.5 * (
        sum(lam_q[i][j] * S[j][i] for i in range(dx) for j in range(dx))
        + _dot(diff, _mv(lam_q, diff))
        + _logdet_from_chol(Lq)
        - _logdet_from_chol(Lp)
        - dx
    )
    M = [
        [a_interp * lam_p[i][j] + (1.0 - a_interp) * lam_q[i][j]
         for j in range(dx)]
        for i in range(dx)
    ]
    Lm, inv_dm = _chol_nan(M)
    Sig_n = _inv_from_chol(Lm, inv_dm)
    rhs = [
        a_interp * _dot(lam_p[i], mu) + (1.0 - a_interp) * _dot(lam_q[i], q_mu)
        for i in range(dx)
    ]
    mu_n = _mv(Sig_n, rhs)
    return kl, mu_n, Sig_n


def _cubature_step_planes(mu, S, th_mu, S4, sigd, K, kff, Sc, dx, du):
    """One cubature propagation step (rgps/src/util.cpp:232-361 / core/cubature.py
    step) on plane values.  The 2·daug points are expanded around the central
    point so the p1²·dx² quadratic-form contraction is paid once."""
    nxu = dx + du
    p1 = nxu + 1
    daug = nxu + 1 + dx
    n_pts = 2 * daug
    s = math.sqrt(float(daug))

    mu_u = [_dot(K[a], mu) + kff[a] for a in range(du)]
    KS = _mm(K, S)
    Su = _sym(_add(Sc, _mm(KS, _t(K))))
    Su = [[Su[a][b] + (1e-8 if a == b else 0.0) for b in range(du)]
          for a in range(du)]
    cross = _mm(S, _t(K))
    Sxu = [[None] * nxu for _ in range(nxu)]
    for a in range(dx):
        for b in range(dx):
            Sxu[a][b] = S[a][b]
        for b in range(du):
            Sxu[a][dx + b] = cross[a][b]
            Sxu[dx + b][a] = cross[a][b]
    for a in range(du):
        for b in range(du):
            Sxu[dx + a][dx + b] = Su[a][b]
    Sxu = _sym(Sxu)
    Sxu = [[Sxu[a][b] + (1e-8 if a == b else 0.0) for b in range(nxu)]
           for a in range(nxu)]
    Lxu, _ = _chol_nan(Sxu)

    one = jnp.ones_like(mu[0])
    mu_z = mu + mu_u + [one]

    A = [[th_mu[a * dx + ii] for a in range(dx)] for ii in range(dx)]
    B = [[th_mu[(dx + b) * dx + ii] for b in range(du)] for ii in range(dx)]
    cvec = [th_mu[(dx + du) * dx + ii] for ii in range(dx)]

    # central quadratic form: Zm[a][i][j] = Σ_b μz_b S4[a,i,b,j] (reused by the
    # bilinear terms of every off-center point)
    Zm = [
        [
            [
                sum(mu_z[b] * S4[a][ii][b][jj] for b in range(p1))
                for jj in range(dx)
            ]
            for ii in range(dx)
        ]
        for a in range(p1)
    ]
    Qmu = [
        [sum(mu_z[a] * Zm[a][ii][jj] for a in range(p1)) for jj in range(dx)]
        for ii in range(dx)
    ]
    covC = _sym([[sigd[ii][jj] + Qmu[ii][jj] for jj in range(dx)]
                 for ii in range(dx)])
    LcC, _ = _chol_nan(covC)
    rowsumC = [sum(LcC[ii][jj] for jj in range(ii + 1)) for ii in range(dx)]

    f_c = [
        _dot(A[ii], mu) + _dot(B[ii], mu_u) + cvec[ii] for ii in range(dx)
    ]

    outs = []
    # 2·(dx+du) xu-block points: z = μz ± √d·Lxu[:, k] (zero weight — NaN rides
    # a 0·row-sum of each point's own Cholesky factor, as in chol_covs @ 0)
    for k in range(nxu):
        ck = [Lxu[r][k] for r in range(k, nxu)]          # nonzero rows only
        rng = range(k, nxu)
        Bk = [
            [
                sum(ck[a - k] * Zm[a][ii][jj] for a in rng)
                for jj in range(dx)
            ]
            for ii in range(dx)
        ]
        Yk = [
            [
                [
                    sum(ck[a - k] * S4[a][ii][b][jj] for a in rng)
                    for jj in range(dx)
                ]
                for ii in range(dx)
            ]
            for b in rng
        ]
        Qk = [
            [
                sum(ck[b - k] * Yk[b - k][ii][jj] for b in rng)
                for jj in range(dx)
            ]
            for ii in range(dx)
        ]
        dfk = [
            sum(A[ii][r] * Lxu[r][k] for r in range(k, min(nxu, dx)))
            + sum(B[ii][r - dx] * Lxu[r][k] for r in range(max(k, dx), nxu))
            for ii in range(dx)
        ]
        for sign in (1.0, -1.0):
            cov = _sym(
                [
                    [
                        sigd[ii][jj] + Qmu[ii][jj] + (s * s) * Qk[ii][jj]
                        + sign * s * (Bk[ii][jj] + Bk[jj][ii])
                        for jj in range(dx)
                    ]
                    for ii in range(dx)
                ]
            )
            Lk, _ = _chol_nan(cov)
            rows = [sum(Lk[ii][jj] for jj in range(ii + 1)) for ii in range(dx)]
            outs.append(
                [f_c[ii] + sign * s * dfk[ii] + 0.0 * rows[ii]
                 for ii in range(dx)]
            )
    # 2 offset-slot points (the chol_aug column of the constant '1' is zero):
    # central z, zero weight → central-cholesky NaN injector
    for _ in range(2):
        outs.append([f_c[ii] + 0.0 * rowsumC[ii] for ii in range(dx)])
    # 2·dx unit-noise points: z central, out = f_c ± √d·LcC[:, j]
    for j in range(dx):
        for sign in (1.0, -1.0):
            outs.append(
                [f_c[ii] + sign * s * (LcC[ii][j] if ii >= j else 0.0 * one)
                 for ii in range(dx)]
            )

    mu_n = [sum(o[ii] for o in outs) * (1.0 / n_pts) for ii in range(dx)]
    cent = [[o[ii] - mu_n[ii] for ii in range(dx)] for o in outs]
    S_n = [[None] * dx for _ in range(dx)]
    for ii in range(dx):
        for jj in range(ii, dx):
            val = sum(c[ii] * c[jj] for c in cent) * (1.0 / n_pts)
            S_n[ii][jj] = val
            S_n[jj][ii] = val
    return mu_n, S_n


def _rgps_cubature_kl_kernel(
    thmu_ref, thsig_ref, sigd_ref, k_ref, kff_ref, sigc_ref,
    qmu_ref, qsig_ref, qmuT_ref, qsigT_ref,
    mu0_ref, sig0_ref,
    # outputs
    kl_ref, qnmu_ref, qnsig_ref, klT_ref, qnmuT_ref, qnsigT_ref,
    # scratch
    mu_s, sig_s,
    *, dx: int, du: int, time_chunk: int, tc: int, a_interp: float,
):
    i = pl.program_id(1)
    p1 = dx + du + 1
    p = dx * p1

    @pl.when(i == 0)
    def _():
        mu_s[...] = mu0_ref[...]
        sig_s[...] = sig0_ref[...]

    mu = [mu_s[a] for a in range(dx)]
    S = [[sig_s[a * dx + b] for b in range(dx)] for a in range(dx)]

    for tloc in range(time_chunk):
        q_mu = _load_vec(qmu_ref, tloc, dx)
        q_sig = _load_mat(qsig_ref, tloc, dx, dx)
        kl_t, qn_mu, qn_sig = _kl_interp_planes(mu, S, q_mu, q_sig, dx, a_interp)
        kl_ref[tloc, 0] = kl_t
        for a in range(dx):
            qnmu_ref[tloc, a] = qn_mu[a]
            for b in range(dx):
                qnsig_ref[tloc, a * dx + b] = qn_sig[a][b]

        th_mu = _load_vec(thmu_ref, tloc, p)
        S4 = [
            [
                [
                    [
                        thsig_ref[tloc, (a * dx + ii) * p + (b * dx + jj)]
                        for jj in range(dx)
                    ]
                    for b in range(p1)
                ]
                for ii in range(dx)
            ]
            for a in range(p1)
        ]
        sigd = _load_mat(sigd_ref, tloc, dx, dx)
        K = _load_mat(k_ref, tloc, du, dx)
        kff = _load_vec(kff_ref, tloc, du)
        Sc = _load_mat(sigc_ref, tloc, du, du)
        mu, S = _cubature_step_planes(mu, S, th_mu, S4, sigd, K, kff, Sc, dx, du)

    for a in range(dx):
        mu_s[a] = mu[a]
        for b in range(dx):
            sig_s[a * dx + b] = S[a][b]

    @pl.when(i == tc - 1)
    def _():
        q_muT = [qmuT_ref[a] for a in range(dx)]
        q_sigT = [[qsigT_ref[a * dx + b] for b in range(dx)] for a in range(dx)]
        kl_T, qn_muT, qn_sigT = _kl_interp_planes(
            mu, S, q_muT, q_sigT, dx, a_interp
        )
        klT_ref[0] = kl_T
        for a in range(dx):
            qnmuT_ref[a] = qn_muT[a]
            for b in range(dx):
                qnsigT_ref[a * dx + b] = qn_sigT[a][b]


# --------------------------------------------------------------------------------------
# Host-side packing and kernel wrappers
# --------------------------------------------------------------------------------------

PackedRGPS = dict


def _pad_geom(N):
    n_pad = max(LANES, -(-N // LANES) * LANES)
    nsub = n_pad // LANES
    sub = sub_block(nsub)
    return n_pad, nsub, sub, nsub // sub


def _pick_time_chunk(T, requested):
    tch = max(1, min(requested, T))
    while T % tch:
        tch -= 1
    return tch


def pack_rgps_problem(
    cost: QuadraticCost,
    ctl: LinearGaussianPolicy,
    noise: Array,
    agCpp: Array,
    agcp: Array,
    beta_plus_eta: Array,
) -> PackedRGPS:
    """Relayout the fixed-point operands (everything except the carried marginal
    q) into the kernels' lane-major layout — once per adversary dual evaluation.

    All args batch-leading: cost blocks ``(N, T+1, ...)``, policy/noise
    ``(N, T, ...)``, ``agCpp (N, T, p, p)``, ``agcp (N, T, p)``,
    ``beta_plus_eta (N,)``.
    """
    N, T = ctl.K.shape[0], ctl.K.shape[1]
    n_pad, _, _, _ = _pad_geom(N)
    return PackedRGPS(
        cxx=_to_lanes(cost.Cxx[:, :T], n_pad),
        cx=_to_lanes(cost.cx[:, :T], n_pad),
        cuu=_to_lanes(cost.Cuu[:, :T], n_pad),
        cu=_to_lanes(cost.cu[:, :T], n_pad),
        cxu=_to_lanes(cost.Cxu[:, :T], n_pad),
        c0=_to_lanes(cost.c0[:, :T, None], n_pad),
        cuun=_to_lanes(cost.Cuu[:, 1 : T + 1], n_pad),
        acpp=_to_lanes(agCpp, n_pad),
        acp=_to_lanes(agcp, n_pad),
        sigd=_to_lanes(noise, n_pad),
        K=_to_lanes(ctl.K, n_pad),
        kff=_to_lanes(ctl.kff, n_pad),
        sigc=_to_lanes(ctl.sigma, n_pad),
        bpe=_to_lanes(beta_plus_eta[:, None, None], n_pad)[0],
        vT=_to_lanes(-cost.Cxx[:, T][:, None], n_pad)[0],
        vvT=_to_lanes(-cost.cx[:, T][:, None], n_pad)[0],
        v0T=_to_lanes(-cost.c0[:, T][:, None, None], n_pad)[0],
    )


def pack_rgps_xdist(q: GaussianSequence, n_pad: int):
    """Carried marginal ``(N, T+1, ...)`` → lane-major body + terminal planes."""
    T = q.mu.shape[1] - 1
    return (
        _to_lanes(q.mu[:, :T], n_pad),
        _to_lanes(q.sigma[:, :T], n_pad),
        _to_lanes(q.mu[:, T][:, None], n_pad)[0],
        _to_lanes(q.sigma[:, T][:, None], n_pad)[0],
    )


def unpack_rgps_xdist(qmu_l, qsig_l, qmuT, qsigT, N, dx) -> GaussianSequence:
    T = qmu_l.shape[0]
    mu = _from_lanes(qmu_l, N, (dx,))
    sig = _from_lanes(qsig_l, N, (dx, dx))
    muT = jnp.transpose(qmuT.reshape(dx, -1), (1, 0))[:N]
    sigT = jnp.transpose(qsigT.reshape(dx * dx, -1), (1, 0))[:N].reshape(N, dx, dx)
    return GaussianSequence(
        mu=jnp.concatenate([mu, muT[:, None]], axis=1),
        sigma=jnp.concatenate([sig, sigT[:, None]], axis=1),
    )


def _tspec(e, sub, time_chunk, reverse, tc):
    if reverse:
        return pl.BlockSpec(
            (time_chunk, e, sub, LANES),
            lambda b, i, tc=tc: (tc - 1 - i, 0, b, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (time_chunk, e, sub, LANES),
        lambda b, i: (i, 0, b, 0),
        memory_space=pltpu.VMEM,
    )


def _cspec(e, sub):
    return pl.BlockSpec(
        (e, sub, LANES), lambda b, i: (0, b, 0), memory_space=pltpu.VMEM
    )


def rgps_param_backward_packed(
    packed: PackedRGPS,
    qmu_l: Array,
    qsig_l: Array,
    dx: int,
    du: int,
    *,
    time_chunk: int = 1,
    interpret: bool = False,
):
    """Adversary MatrixNormal backward sweep on pre-packed lane-major operands.

    Returns lane-major ``(mu_opt (T, p, nsub, LANES), sigma_opt (T, p², ...),
    bad (nsub, LANES))`` — feed the θ* streams straight into
    :func:`rgps_cubature_kl_packed`.
    """
    T, _, nsub, _ = packed["K"].shape
    sub = sub_block(nsub)
    nb = nsub // sub
    dtype = packed["K"].dtype
    p1 = dx + du + 1
    p = dx * p1
    tch = _pick_time_chunk(T, time_chunk)
    tc = T // tch
    ts = partial(_tspec, sub=sub, time_chunk=tch, reverse=True, tc=tc)
    kernel = partial(
        _rgps_param_backward_kernel, dx=dx, du=du, time_chunk=tch
    )
    return pl.pallas_call(
        kernel,
        grid=(nb, tc),
        in_specs=[
            ts(dx * dx), ts(dx), ts(du * du), ts(du), ts(dx * du), ts(1),
            ts(du * du),
            ts(p * p), ts(p), ts(dx * dx),
            ts(du * dx), ts(du), ts(du * du),
            ts(dx), ts(dx * dx),
            _cspec(1, sub), _cspec(dx * dx, sub), _cspec(dx, sub),
            _cspec(1, sub),
        ],
        out_specs=[
            ts(p), ts(p * p),
            pl.BlockSpec((sub, LANES), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, p, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((T, p * p, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((nsub, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((dx * dx, sub, LANES), dtype),
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((1, sub, LANES), dtype),
        ],
        interpret=interpret,
    )(
        packed["cxx"], packed["cx"], packed["cuu"], packed["cu"],
        packed["cxu"], packed["c0"], packed["cuun"],
        packed["acpp"], packed["acp"], packed["sigd"],
        packed["K"], packed["kff"], packed["sigc"],
        qmu_l, qsig_l,
        packed["bpe"], packed["vT"], packed["vvT"], packed["v0T"],
    )


def rgps_cubature_kl_packed(
    packed: PackedRGPS,
    muopt_l: Array,
    sigopt_l: Array,
    qmu_l: Array,
    qsig_l: Array,
    qmuT: Array,
    qsigT: Array,
    mu0_l: Array,
    sig0_l: Array,
    dx: int,
    du: int,
    *,
    time_chunk: int = 1,
    a_interp: float = 1e-1,
    interpret: bool = False,
):
    """Cubature propagation fused with the fixed point's per-step KL and the
    geodesic damping q ← interp(q, p; a).  θ* streams are consumed in the
    backward kernel's native output layout (no relayout between launches).

    Returns lane-major ``(kl (T, 1, nsub, LANES), qn_mu (T, dx, ...),
    qn_sig (T, dx², ...), kl_T (1, nsub, LANES), qn_muT (dx, ...),
    qn_sigT (dx², ...))``.
    """
    T, _, nsub, _ = packed["K"].shape
    sub = sub_block(nsub)
    nb = nsub // sub
    dtype = packed["K"].dtype
    p1 = dx + du + 1
    p = dx * p1
    tch = _pick_time_chunk(T, time_chunk)
    tc = T // tch
    ts = partial(_tspec, sub=sub, time_chunk=tch, reverse=False, tc=tc)
    kernel = partial(
        _rgps_cubature_kl_kernel,
        dx=dx, du=du, time_chunk=tch, tc=tc, a_interp=a_interp,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb, tc),
        in_specs=[
            ts(p), ts(p * p), ts(dx * dx),
            ts(du * dx), ts(du), ts(du * du),
            ts(dx), ts(dx * dx),
            _cspec(dx, sub), _cspec(dx * dx, sub),
            _cspec(dx, sub), _cspec(dx * dx, sub),
        ],
        out_specs=[
            ts(1), ts(dx), ts(dx * dx),
            _cspec(1, sub), _cspec(dx, sub), _cspec(dx * dx, sub),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((T, dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((T, dx * dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((1, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((dx * dx, nsub, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((dx * dx, sub, LANES), dtype),
        ],
        interpret=interpret,
    )(
        muopt_l, sigopt_l, packed["sigd"],
        packed["K"], packed["kff"], packed["sigc"],
        qmu_l, qsig_l, qmuT, qsigT,
        mu0_l, sig0_l,
    )


# --------------------------------------------------------------------------------------
# Full damped fixed point (rgps/mbrgps.py:386-408), batched over lanes
# --------------------------------------------------------------------------------------


def pallas_rgps_fixed_point(
    agCpp: Array,
    agcp: Array,
    ctl: LinearGaussianPolicy,
    cost: QuadraticCost,
    xdist0: GaussianSequence,
    beta_plus_eta: Array,
    mu0: Array,
    sigma0: Array,
    noise: Array,
    *,
    tol: float = 1e-3,
    fp_iters: int = 100,
    a_interp: float = 1e-1,
    time_chunk: int = 1,
    interpret: bool = False,
):
    """Damped adversary fixed point for a batch of N problem instances.

    All args batch-leading (``agCpp (N, T, p, p)``, ``cost (N, T+1, ...)``,
    ``xdist0 (N, T+1, ...)``, ``beta_plus_eta (N,)``...).  Per-lane freeze
    semantics match ``jax.vmap`` of the per-instance ``lax.while_loop``
    (parallel/rgps.py fixed_point): the loop runs while any lane is active;
    a converged/diverged/exhausted lane's marginal q and trip counter freeze.
    The backward pass is a deterministic function of q, so frozen lanes
    recompute bit-identical parameters — only q and the counter are masked.

    Returns ``(q: GaussianSequence (N, T+1, ...), param: MatrixNormalParams
    (mu (N, T, p), sigma (N, T, p, p)), diverged (N,))``.
    """
    N, T = ctl.K.shape[0], ctl.K.shape[1]
    dx = noise.shape[-1]
    du = ctl.kff.shape[-1]
    p = dx * (dx + du + 1)
    n_pad, nsub, _, _ = _pad_geom(N)
    dtype = ctl.K.dtype

    packed = pack_rgps_problem(cost, ctl, noise, agCpp, agcp, beta_plus_eta)
    qmu_l, qsig_l, qmuT, qsigT = pack_rgps_xdist(xdist0, n_pad)
    mu0_l = _to_lanes(mu0[:, None], n_pad)[0]
    sig0_l = _to_lanes(sigma0[:, None], n_pad)[0]

    mu_dummy = jnp.zeros((T, p, nsub, LANES), dtype)
    sig_dummy = jnp.broadcast_to(
        jnp.eye(p, dtype=dtype).reshape(p * p, 1, 1),
        (p * p, nsub, LANES),
    )
    sig_dummy = jnp.broadcast_to(sig_dummy, (T, p * p, nsub, LANES))

    def trip(qmu, qsig, qmT, qsT):
        muopt, sigopt, bad = rgps_param_backward_packed(
            packed, qmu, qsig, dx, du,
            time_chunk=time_chunk, interpret=interpret,
        )
        kl, qnmu, qnsig, klT, qnmuT, qnsigT = rgps_cubature_kl_packed(
            packed, muopt, sigopt, qmu, qsig, qmT, qsT, mu0_l, sig0_l,
            dx, du,
            time_chunk=time_chunk, a_interp=a_interp, interpret=interpret,
        )
        kl_any = jnp.any(kl > tol, axis=(0, 1)) | (klT[0] > tol)
        return muopt, sigopt, bad > 0, kl_any, qnmu, qnsig, qnmuT, qnsigT

    init = (
        qmu_l, qsig_l, qmuT, qsigT,
        mu_dummy, sig_dummy,
        jnp.ones((nsub, LANES), bool),            # kl = inf initially
        jnp.zeros((nsub, LANES), bool),
        jnp.zeros((nsub, LANES), jnp.int32),
    )

    def active_of(state):
        _, _, _, _, _, _, kl_any, div, it = state
        return kl_any & ~div & (it < fp_iters)

    def body(state):
        qmu, qsig, qmT, qsT, _, _, _, _, it = state
        act = active_of(state)
        muopt, sigopt, bad, kl_any, qnmu, qnsig, qnmuT, qnsigT = trip(
            qmu, qsig, qmT, qsT
        )
        # frozen lanes: q masked; param/kl/diverged are recomputed from the
        # frozen q and therefore already equal their carried values
        qmu_n = jnp.where(act, qnmu, qmu)
        qsig_n = jnp.where(act, qnsig, qsig)
        qmT_n = jnp.where(act, qnmuT, qmT)
        qsT_n = jnp.where(act, qnsigT, qsT)
        return (
            qmu_n, qsig_n, qmT_n, qsT_n, muopt, sigopt,
            kl_any, bad, it + act.astype(jnp.int32),
        )

    if interpret:
        state = init
        # the dummy parameter surfaces only if no lane ever runs (fp_iters = 0)
        while bool(jnp.any(active_of(state))):
            state = body(state)
    else:
        state = lax.while_loop(
            lambda s: jnp.any(active_of(s)), body, init
        )

    qmu_l, qsig_l, qmuT, qsigT, muopt_l, sigopt_l, _, div, _ = state
    q = unpack_rgps_xdist(qmu_l, qsig_l, qmuT, qsigT, N, dx)
    param = MatrixNormalParams(
        mu=_from_lanes(muopt_l, N, (p,)),
        sigma=_from_lanes(sigopt_l, N, (p, p)),
    )
    diverged = div.reshape(-1)[:N]
    return q, param, diverged
