"""Batched Pallas TPU kernels for the GPS dual chain.

The hottest path of the reference's MBGPS is the five-kernel dual evaluation
(gps/mbgps.py:173-195): augment_cost → soft-KL backward_pass → forward_pass →
quad_expectation + kl_divergence (gps/src/util.cpp).  The compiled solver
(parallel/gps.py) evaluates that chain ~64× per outer iteration inside the dual
bisection.  These kernels collapse the chain to TWO Pallas calls per evaluation,
batched over problem instances in the lane-major layout of core/pallas_lqr.py:

* :func:`pallas_gps_backward` — fuses the KL-augmentation of the cost
  (gps/src/util.cpp:136-193) INTO the −1/α-scaled soft-Riccati backward pass
  (util.cpp:272-374): one sweep computes the old-policy precision/logdet, augments
  the quadratic blocks, factorizes −Quu, and emits the stochastic controller
  (K, kff, Σ_ctl) plus the t=0 value triplet (V₀, v₀, c₀) — all the dual needs.
* :func:`pallas_gps_forward_kl` — the exact Gaussian propagation of
  (x, u) through the linear-Gaussian loop (util.cpp:195-269) fused with the
  per-step policy KL (util.cpp:83-121), reduced on the fly to Σ_t KL_t.

Together with the initial-state quadratic expectation (three host flops), one dual
evaluation for N instances is two kernel launches instead of 3·T XLA while-loop
steps per instance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lqr import (
    LANES,
    _add,
    _chol,
    _chol_solve_mat,
    _chol_solve_vec,
    _dot,
    _from_lanes,
    _load_mat,
    _load_vec,
    _mm,
    _mm_tn,
    _mv,
    _mv_tn,
    _sym,
    sub_block,
    _t,
    _to_lanes,
)
from .types import LinearGaussianDynamics, LinearGaussianPolicy, QuadraticCost

_LOG_2PI = 1.8378770664093453
_LOG_2 = 0.6931471805599453


def _chol_inv(L, inv_d):
    """(L Lᵀ)⁻¹ via unrolled solves against the identity."""
    n = len(L)
    one = jnp.ones_like(L[0][0])
    zero = jnp.zeros_like(L[0][0])
    eye = [[one if i == j else zero for j in range(n)] for i in range(n)]
    return _chol_solve_mat(L, inv_d, eye)


def _logdet_from_chol(L):
    return 2.0 * sum(jnp.log(L[j][j]) for j in range(len(L)))


def _trace_prod(M, N):
    """tr(M @ N) for symmetric N = Σᵢⱼ Mᵢⱼ Nⱼᵢ."""
    return sum(M[i][j] * N[j][i] for i in range(len(M)) for j in range(len(M[0])))


# --------------------------------------------------------------------------------------
# Kernel 1: fused KL-augment + soft-KL backward pass
# --------------------------------------------------------------------------------------


def _gps_backward_kernel(
    cxx_ref, cx_ref, cuu_ref, cu_ref, cxu_ref, c0_ref,
    a_ref, b_ref, cres_ref, sigd_ref,
    ko_ref, kfo_ref, sigo_ref, alpha_ref,
    vT_ref, vvT_ref, v0T_ref,
    # outputs
    k_ref, kff_ref, sigc_ref, v0out_ref, vv0out_ref, c0out_ref, bad_ref,
    # scratch
    v_s, vv_s, v0_s,
    *, dx: int, du: int, time_chunk: int,
):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        v_s[...] = vT_ref[...]
        vv_s[...] = vvT_ref[...]
        v0_s[...] = v0T_ref[...]
        bad_ref[...] = jnp.zeros_like(bad_ref)

    V = [[v_s[i_ * dx + j_] for j_ in range(dx)] for i_ in range(dx)]
    v = [vv_s[i_] for i_ in range(dx)]
    v0 = v0_s[0]
    bad = bad_ref[...] > 0

    for tloc in reversed(range(time_chunk)):
        Cxx = _load_mat(cxx_ref, tloc, dx, dx)
        cx = _load_vec(cx_ref, tloc, dx)
        Cuu = _load_mat(cuu_ref, tloc, du, du)
        cu = _load_vec(cu_ref, tloc, du)
        Cxu = _load_mat(cxu_ref, tloc, dx, du)
        c0 = c0_ref[tloc, 0]
        A = _load_mat(a_ref, tloc, dx, dx)
        B = _load_mat(b_ref, tloc, dx, du)
        cres = _load_vec(cres_ref, tloc, dx)
        sigd = _load_mat(sigd_ref, tloc, dx, dx)
        Ko = _load_mat(ko_ref, tloc, du, dx)
        ko = _load_vec(kfo_ref, tloc, du)
        sigo = _load_mat(sigo_ref, tloc, du, du)
        a = alpha_ref[tloc, 0]

        # ---- KL augmentation (gps/src/util.cpp:136-193) --------------------------
        Lo, inv_do, bad_o = _chol(_sym(sigo))
        lam = _chol_inv(Lo, inv_do)                     # Λ_old
        logdet_sigo = _logdet_from_chol(Lo)
        lamKo = _mm(lam, Ko)                            # (du, dx)
        lamko = _mv(lam, ko)

        agCxx = [[Cxx[i_][j_] + 0.5 * a * s for j_, s in enumerate(row)]
                 for i_, row in enumerate(_mm_tn(Ko, lamKo))]
        agCuu = [[Cuu[i_][j_] + 0.5 * a * lam[i_][j_] for j_ in range(du)]
                 for i_ in range(du)]
        KotLam = _t(lamKo)                              # Koᵀ Λ, (dx, du)
        agCxu = [[Cxu[i_][j_] - 0.5 * a * KotLam[i_][j_] for j_ in range(du)]
                 for i_ in range(dx)]
        agcx = [cx[i_] + a * s for i_, s in enumerate(_mv_tn(Ko, lamko))]
        agcu = [cu[i_] - a * lamko[i_] for i_ in range(du)]
        agc0 = (c0 + 0.5 * a * (du * _LOG_2PI + logdet_sigo)
                + 0.5 * a * _dot(ko, lamko))

        # ---- −1/α-scaled soft-Riccati step (gps/src/util.cpp:272-374) ------------
        nia = -1.0 / a
        VA = _mm(V, A)
        VB = _mm(V, B)
        Vc = _mv(V, cres)

        Qxx = [[nia * (agCxx[i_][j_] + s) for j_, s in enumerate(row)]
               for i_, row in enumerate(_mm_tn(A, VA))]
        Quu = [[nia * (agCuu[i_][j_] + s) for j_, s in enumerate(row)]
               for i_, row in enumerate(_mm_tn(B, VB))]
        QuxT = [[nia * (agCxu[i_][j_] + s) for j_, s in enumerate(row)]
                for i_, row in enumerate(_mm_tn(A, VB))]   # = Quxᵀ, (dx, du)
        BtVc = _mv_tn(B, Vc)
        Btv = _mv_tn(B, v)
        qu = [nia * (agcu[i_] + 2.0 * BtVc[i_] + Btv[i_]) for i_ in range(du)]
        AtVc = _mv_tn(A, Vc)
        Atv = _mv_tn(A, v)
        qx = [nia * (agcx[i_] + 2.0 * AtVc[i_] + Atv[i_]) for i_ in range(dx)]
        q0 = nia * (agc0 + v0 + _dot(cres, Vc) + _trace_prod(V, sigd)
                    + _dot(v, cres))

        negQuu = [[-e for e in row] for row in Quu]
        Ln, inv_dn, bad_n = _chol(_sym(negQuu))
        bad = bad | bad_o | bad_n

        K = _chol_solve_mat(Ln, inv_dn, _t(QuxT))       # (du, dx)
        kff = [0.5 * e for e in _chol_solve_vec(Ln, inv_dn, qu)]
        sigc = [[0.5 * e for e in row] for row in _chol_inv(Ln, inv_dn)]

        QuxTK = _mm(QuxT, K)                            # Quxᵀ K, (dx, dx)
        Vn = _sym([[-a * (Qxx[i_][j_] + QuxTK[i_][j_]) for j_ in range(dx)]
                   for i_ in range(dx)])
        Quxkff = _mv(QuxT, kff)
        vn = [-a * (qx[i_] + 2.0 * Quxkff[i_]) for i_ in range(dx)]
        logdet_m2Quu = du * _LOG_2 + _logdet_from_chol(Ln)
        v0n = -a * (0.5 * _dot(qu, kff) + q0
                    + 0.5 * (du * _LOG_2PI - logdet_m2Quu))

        V, v, v0 = Vn, vn, v0n

        for i_ in range(du):
            for j_ in range(dx):
                k_ref[tloc, i_ * dx + j_] = K[i_][j_]
            kff_ref[tloc, i_] = kff[i_]
            for j_ in range(du):
                sigc_ref[tloc, i_ * du + j_] = sigc[i_][j_]

    for i_ in range(dx):
        for j_ in range(dx):
            v_s[i_ * dx + j_] = V[i_][j_]
            v0out_ref[i_ * dx + j_] = V[i_][j_]
        vv_s[i_] = v[i_]
        vv0out_ref[i_] = v[i_]
    v0_s[0] = v0
    c0out_ref[0] = v0
    bad_ref[...] = bad.astype(bad_ref.dtype)


# --------------------------------------------------------------------------------------
# Kernel 2: Gaussian forward propagation fused with the policy-KL reduction
# --------------------------------------------------------------------------------------


def _gps_forward_kl_kernel(
    a_ref, b_ref, cres_ref, sigd_ref,
    k_ref, kff_ref, sigc_ref,
    ko_ref, kfo_ref, sigo_ref,
    mu0_ref, sig0_ref,
    # outputs
    kl_ref, muT_ref, sigT_ref,
    # scratch
    mu_s, sig_s,
    *, dx: int, du: int, time_chunk: int,
):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        mu_s[...] = mu0_ref[...]
        sig_s[...] = sig0_ref[...]
        kl_ref[...] = jnp.zeros_like(kl_ref)

    mu = [mu_s[i_] for i_ in range(dx)]
    S = [[sig_s[i_ * dx + j_] for j_ in range(dx)] for i_ in range(dx)]
    kl = kl_ref[0]

    for tloc in range(time_chunk):
        A = _load_mat(a_ref, tloc, dx, dx)
        B = _load_mat(b_ref, tloc, dx, du)
        cres = _load_vec(cres_ref, tloc, dx)
        sigd = _load_mat(sigd_ref, tloc, dx, dx)
        K = _load_mat(k_ref, tloc, du, dx)
        kff = _load_vec(kff_ref, tloc, du)
        sigc = _load_mat(sigc_ref, tloc, du, du)
        Ko = _load_mat(ko_ref, tloc, du, dx)
        ko = _load_vec(kfo_ref, tloc, du)
        sigo = _load_mat(sigo_ref, tloc, du, du)

        # ---- per-step KL(new‖old) under N(mu, S) (gps/src/util.cpp:83-121) -------
        Lo, inv_do, _ = _chol(_sym(sigo))
        lam_q = _chol_inv(Lo, inv_do)
        Lc, inv_dc, _ = _chol(_sym(sigc))
        dK = [[Ko[i_][j_] - K[i_][j_] for j_ in range(dx)] for i_ in range(du)]
        dk = [kff[i_] - ko[i_] for i_ in range(du)]
        lam_dK = _mm(lam_q, dK)                         # (du, dx)
        diff_K = _mm_tn(dK, lam_dK)                     # dKᵀ Λ dK, (dx, dx)
        lam_dk = _mv(lam_q, dk)
        diff_crs = _mv_tn(dK, lam_dk)                   # dKᵀ Λ dk, (dx,)
        kl_t = (
            0.5 * (_logdet_from_chol(Lo) - _logdet_from_chol(Lc))
            + 0.5 * _trace_prod(lam_q, sigc)
            - 0.5 * du
            + 0.5 * _trace_prod(diff_K, S)
            + 0.5 * _dot(mu, _mv(diff_K, mu))
            - _dot(mu, diff_crs)
            + 0.5 * _dot(dk, lam_dk)
        )
        kl = kl + kl_t

        # ---- exact Gaussian propagation (gps/src/util.cpp:195-269) ---------------
        mu_u = [_dot(K[i_], mu) + kff[i_] for i_ in range(du)]
        KS = _mm(K, S)                                  # (du, dx)
        sigma_u = _add(sigc, _mm(KS, _t(K)))
        cross = _t(KS)                                  # Σx Kᵀ = (K Σx)ᵀ, (dx, du)

        mu_n = [
            _dot(A[i_], mu) + _dot(B[i_], mu_u) + cres[i_] for i_ in range(dx)
        ]
        AS = _mm(A, S)
        ASAt = _mm(AS, _t(A))
        Acr = _mm(A, cross)                             # (dx, du)
        AcrBt = _mm(Acr, _t(B))                         # (dx, dx)
        BSu = _mm(B, sigma_u)
        BSuBt = _mm(BSu, _t(B))
        S_n = _sym([[sigd[i_][j_] + ASAt[i_][j_] + AcrBt[i_][j_]
                     + AcrBt[j_][i_] + BSuBt[i_][j_]
                     for j_ in range(dx)] for i_ in range(dx)])
        mu, S = mu_n, S_n

    for i_ in range(dx):
        mu_s[i_] = mu[i_]
        muT_ref[i_] = mu[i_]
        for j_ in range(dx):
            sig_s[i_ * dx + j_] = S[i_][j_]
            sigT_ref[i_ * dx + j_] = S[i_][j_]
    kl_ref[0] = kl


# --------------------------------------------------------------------------------------
# Host-side wrappers
#
# Both kernels share ONE padding convention: instances padded to a LANES multiple
# (replicating instance 0), time padded at the EARLY end with neutral steps.  The
# backward grid walks time in reverse, so its pad steps run LAST and must leave the
# value carry invariant; the forward grid walks time forward, so its pad steps run
# FIRST and must leave the state-distribution carry invariant.  The same neutral
# elements (A = I, B = 0, c = 0, Σdyn = 0, zero cost, K_old = k_old = 0, Σ_old = I,
# α = 1) satisfy both, which is what lets the backward kernel's lane-major policy
# outputs stream STRAIGHT into the forward kernel with no relayout between the two
# launches of a dual evaluation (`PackedGPS`; cf. the 54%-relayout finding on the
# iLQR path, CLAUDE.md).
# --------------------------------------------------------------------------------------

# Lane-major operand dict produced by :func:`pack_gps_lanes`, consumed by the
# ``*_packed`` entry points.  Callers that evaluate the dual repeatedly on the same
# linearization (the bisection loop of parallel/gps.py) pack once and only repack
# the (tiny) α planes per evaluation.
PackedGPS = dict


def _specs(tc, sub, e_list, const_e_list, time_chunk):
    def tspec(e):
        return pl.BlockSpec(
            (time_chunk, e, sub, LANES),
            lambda b, i, tc=tc: (tc - 1 - i, 0, b, 0),
            memory_space=pltpu.VMEM,
        )

    def tspec_fwd(e):
        return pl.BlockSpec(
            (time_chunk, e, sub, LANES),
            lambda b, i: (i, 0, b, 0),
            memory_space=pltpu.VMEM,
        )

    def cspec(e):
        return pl.BlockSpec(
            (e, sub, LANES), lambda b, i: (0, b, 0), memory_space=pltpu.VMEM
        )

    return tspec, tspec_fwd, cspec


def _pad_batch_geom(N, time_chunk, T, sub_tile=8):
    n_pad = max(LANES, -(-N // LANES) * LANES)
    sub = min(sub_tile, n_pad // LANES)
    while (n_pad // LANES) % sub:
        sub -= 1
    nsub = n_pad // LANES
    nb = nsub // sub
    t_pad = -(-T // time_chunk) * time_chunk
    return n_pad, sub, nsub, nb, t_pad


def pallas_gps_backward(
    cost: QuadraticCost,
    dyn: LinearGaussianDynamics,
    old: LinearGaussianPolicy,
    alpha: Array,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
):
    """Fused KL-augment + soft-KL backward pass for a batch of GPS problems.

    Args (batch-leading):
      cost: ``Cxx (N, T+1, dx, dx)`` … absolute convention; slice T = terminal.
      dyn: ``A/B/c/sigma (N, T, ...)``.
      old: previous controller ``K/kff/sigma (N, T, ...)`` (the KL anchor).
      alpha: per-instance per-step dual ``(N, T)``.

    Returns (policy(K, kff, Σ_ctl) each (N, T, ...), V0 (N, dx, dx), v0 (N, dx),
    c0 (N,), diverged (N,)) — the t=0 value triplet is all the dual objective
    needs (quad_expectation at the initial state, mbgps.py:188).
    """
    fn = _pallas_gps_backward if interpret else _pallas_gps_backward_jit
    return fn(cost, dyn, old, alpha, time_chunk=time_chunk, interpret=interpret)


@partial(jax.jit, static_argnames=("time_chunk", "interpret"))
def _pallas_gps_backward_jit(cost, dyn, old, alpha, time_chunk, interpret):
    return _pallas_gps_backward(
        cost, dyn, old, alpha, time_chunk=time_chunk, interpret=False
    )


def _geom_of(packed: PackedGPS):
    t_pad, _, nsub, _ = packed["A"].shape
    sub = sub_block(nsub)
    return t_pad, nsub, sub, nsub // sub


def pack_gps_lanes(
    cost: QuadraticCost,
    dyn: LinearGaussianDynamics,
    old: LinearGaussianPolicy,
    mu0: Array,
    sigma0: Array,
    *,
    time_chunk: int = 4,
) -> PackedGPS:
    """Relayout the dual-evaluation operands (everything except α) into the
    kernels' native lane-major layout — once per linearization."""
    N, T = dyn.A.shape[0], dyn.A.shape[1]
    dx, du = dyn.A.shape[-1], dyn.B.shape[-1]
    dtype = dyn.A.dtype
    n_pad, _, _, _, t_pad = _pad_batch_geom(N, time_chunk, T)
    pad_t = t_pad - T

    def padT(x, neutral):
        if pad_t == 0:
            return x
        p = jnp.broadcast_to(neutral, (x.shape[0], pad_t) + x.shape[2:]).astype(x.dtype)
        return jnp.concatenate([p, x], axis=1)

    eye_u = jnp.eye(du, dtype=dtype)
    return PackedGPS(
        cxx=_to_lanes(padT(cost.Cxx[:, :T], jnp.zeros((dx, dx), dtype)), n_pad),
        cx=_to_lanes(padT(cost.cx[:, :T], jnp.zeros((dx,), dtype)), n_pad),
        cuu=_to_lanes(padT(cost.Cuu[:, :T], jnp.zeros((du, du), dtype)), n_pad),
        cu=_to_lanes(padT(cost.cu[:, :T], jnp.zeros((du,), dtype)), n_pad),
        cxu=_to_lanes(padT(cost.Cxu[:, :T], jnp.zeros((dx, du), dtype)), n_pad),
        c0=_to_lanes(padT(cost.c0[:, :T, None], jnp.zeros((1,), dtype)), n_pad),
        A=_to_lanes(padT(dyn.A, jnp.eye(dx, dtype=dtype)), n_pad),
        B=_to_lanes(padT(dyn.B, jnp.zeros((dx, du), dtype)), n_pad),
        c=_to_lanes(padT(dyn.c, jnp.zeros((dx,), dtype)), n_pad),
        sigd=_to_lanes(padT(dyn.sigma, jnp.zeros((dx, dx), dtype)), n_pad),
        Ko=_to_lanes(padT(old.K, jnp.zeros((du, dx), dtype)), n_pad),
        ko=_to_lanes(padT(old.kff, jnp.zeros((du,), dtype)), n_pad),
        sigo=_to_lanes(padT(old.sigma, eye_u), n_pad),
        vT=_to_lanes(cost.Cxx[:, T][:, None], n_pad)[0],
        vvT=_to_lanes(cost.cx[:, T][:, None], n_pad)[0],
        v0T=_to_lanes(cost.c0[:, T][:, None, None], n_pad)[0],
        mu0=_to_lanes(mu0[:, None], n_pad)[0],
        sig0=_to_lanes(sigma0[:, None], n_pad)[0],
    )


def pack_gps_alpha(alpha: Array, *, time_chunk: int = 4) -> Array:
    """Per-instance per-step dual ``(N, T)`` → lane-major ``(t_pad, 1, nsub, LANES)``
    (the only operand that changes between bisection steps)."""
    N, T = alpha.shape
    n_pad, _, _, _, t_pad = _pad_batch_geom(N, time_chunk, T)
    pad_t = t_pad - T
    x = alpha[..., None]
    if pad_t:
        p = jnp.ones((N, pad_t, 1), alpha.dtype)
        x = jnp.concatenate([p, x], axis=1)
    return _to_lanes(x, n_pad)


def pallas_gps_backward_packed(
    packed: PackedGPS,
    alpha_l: Array,
    dx: int,
    du: int,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
):
    """Fused KL-augment + soft-KL backward pass on pre-packed lane-major operands.

    Returns lane-major ``(K (t_pad, du*dx, nsub, LANES), kff (t_pad, du, ...),
    sigc (t_pad, du*du, ...), V0 (dx*dx, nsub, LANES), vv0 (dx, ...),
    c0 (1, ...), bad (nsub, LANES))`` — feed (K, kff, sigc) straight into
    :func:`pallas_gps_forward_kl_packed`."""
    t_pad, nsub, sub, nb = _geom_of(packed)
    dtype = packed["A"].dtype
    tc = t_pad // time_chunk
    tspec, _, cspec = _specs(tc, sub, None, None, time_chunk)
    kernel = partial(_gps_backward_kernel, dx=dx, du=du, time_chunk=time_chunk)

    return pl.pallas_call(
        kernel,
        grid=(nb, tc),
        in_specs=[
            tspec(dx * dx), tspec(dx), tspec(du * du), tspec(du), tspec(dx * du),
            tspec(1),
            tspec(dx * dx), tspec(dx * du), tspec(dx), tspec(dx * dx),
            tspec(du * dx), tspec(du), tspec(du * du), tspec(1),
            cspec(dx * dx), cspec(dx), cspec(1),
        ],
        out_specs=[
            tspec(du * dx), tspec(du), tspec(du * du),
            cspec(dx * dx), cspec(dx), cspec(1),
            pl.BlockSpec((sub, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, du * dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((t_pad, du, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((t_pad, du * du, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((dx * dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((1, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((nsub, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((dx * dx, sub, LANES), dtype),
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((1, sub, LANES), dtype),
        ],
        interpret=interpret,
    )(
        packed["cxx"], packed["cx"], packed["cuu"], packed["cu"], packed["cxu"],
        packed["c0"], packed["A"], packed["B"], packed["c"], packed["sigd"],
        packed["Ko"], packed["ko"], packed["sigo"], alpha_l,
        packed["vT"], packed["vvT"], packed["v0T"],
    )


def pallas_gps_forward_kl_packed(
    packed: PackedGPS,
    K_l: Array,
    kff_l: Array,
    sigc_l: Array,
    dx: int,
    du: int,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
):
    """Fused Gaussian forward + Σ_t policy-KL on pre-packed operands; the new
    policy ``(K_l, kff_l, sigc_l)`` is consumed in the backward kernel's native
    lane-major output layout (no relayout between the two launches).

    Returns lane-major ``(kl (1, nsub, LANES), muT (dx, ...), sigT (dx*dx, ...))``.
    """
    t_pad, nsub, sub, nb = _geom_of(packed)
    dtype = packed["A"].dtype
    tc = t_pad // time_chunk
    _, tspec_fwd, cspec = _specs(tc, sub, None, None, time_chunk)
    kernel = partial(_gps_forward_kl_kernel, dx=dx, du=du, time_chunk=time_chunk)

    return pl.pallas_call(
        kernel,
        grid=(nb, tc),
        in_specs=[
            tspec_fwd(dx * dx), tspec_fwd(dx * du), tspec_fwd(dx),
            tspec_fwd(dx * dx),
            tspec_fwd(du * dx), tspec_fwd(du), tspec_fwd(du * du),
            tspec_fwd(du * dx), tspec_fwd(du), tspec_fwd(du * du),
            cspec(dx), cspec(dx * dx),
        ],
        out_specs=[cspec(1), cspec(dx), cspec(dx * dx)],
        out_shape=[
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
        packed["A"], packed["B"], packed["c"], packed["sigd"],
        K_l, kff_l, sigc_l,
        packed["Ko"], packed["ko"], packed["sigo"],
        packed["mu0"], packed["sig0"],
    )


def quad_expectation_lanes(
    V0_l: Array, vv0_l: Array, c0_l: Array, mu0_l: Array, sig0_l: Array, dx: int
) -> Array:
    """E[xᵀV₀x + v₀ᵀx + c₀] under N(μ₀, Σ₀) on lane-major planes
    (gps/src/util.cpp:123-134) → ``(nsub, LANES)``."""
    quad = sum(
        (V0_l[i * dx + j] * (mu0_l[i] * mu0_l[j] + sig0_l[i * dx + j]))
        for i in range(dx)
        for j in range(dx)
    )
    lin = sum(vv0_l[i] * mu0_l[i] for i in range(dx))
    return quad + lin + c0_l[0]


def unpack_gps_scalar(x_l: Array, N: int) -> Array:
    """Lane-major per-instance scalar ``(…, nsub, LANES)`` → ``(N,)``."""
    return x_l.reshape(-1)[:N]


def unpack_gps_policy(
    K_l: Array, kff_l: Array, sigc_l: Array, N: int, T: int, dx: int, du: int
) -> LinearGaussianPolicy:
    """Lane-major kernel outputs → batch-leading ``LinearGaussianPolicy``."""
    pad_t = K_l.shape[0] - T
    return LinearGaussianPolicy(
        K=_from_lanes(K_l[pad_t:], N, (du, dx)),
        kff=_from_lanes(kff_l[pad_t:], N, (du,)),
        sigma=_from_lanes(sigc_l[pad_t:], N, (du, du)),
    )


def _pallas_gps_backward(cost, dyn, old, alpha, *, time_chunk, interpret):
    N, T = dyn.A.shape[0], dyn.A.shape[1]
    dx, du = dyn.A.shape[-1], dyn.B.shape[-1]
    mu0 = jnp.zeros((N, dx), dyn.A.dtype)
    sig0 = jnp.zeros((N, dx, dx), dyn.A.dtype)
    packed = pack_gps_lanes(cost, dyn, old, mu0, sig0, time_chunk=time_chunk)
    alpha_l = pack_gps_alpha(alpha, time_chunk=time_chunk)
    K_l, kff_l, sigc_l, V0, vv0, c0, bad = pallas_gps_backward_packed(
        packed, alpha_l, dx, du, time_chunk=time_chunk, interpret=interpret
    )
    policy = unpack_gps_policy(K_l, kff_l, sigc_l, N, T, dx, du)
    V0_out = jnp.transpose(V0.reshape(dx * dx, -1), (1, 0))[:N].reshape(N, dx, dx)
    vv0_out = jnp.transpose(vv0.reshape(dx, -1), (1, 0))[:N]
    c0_out = c0.reshape(-1)[:N]
    diverged = bad.reshape(-1)[:N] > 0
    return policy, V0_out, vv0_out, c0_out, diverged


def pallas_gps_forward_kl(
    dyn: LinearGaussianDynamics,
    new: LinearGaussianPolicy,
    old: LinearGaussianPolicy,
    mu0: Array,
    sigma0: Array,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
):
    """Fused Gaussian forward propagation + Σ_t policy-KL for a batch.

    Args are batch-leading; ``mu0 (N, dx)``, ``sigma0 (N, dx, dx)``.
    Returns (kl_sum (N,), muT (N, dx), sigmaT (N, dx, dx)).
    """
    fn = _pallas_gps_forward_kl if interpret else _pallas_gps_forward_kl_jit
    return fn(dyn, new, old, mu0, sigma0, time_chunk=time_chunk, interpret=interpret)


@partial(jax.jit, static_argnames=("time_chunk", "interpret"))
def _pallas_gps_forward_kl_jit(dyn, new, old, mu0, sigma0, time_chunk, interpret):
    return _pallas_gps_forward_kl(
        dyn, new, old, mu0, sigma0, time_chunk=time_chunk, interpret=False
    )


def _pallas_gps_forward_kl(dyn, new, old, mu0, sigma0, *, time_chunk, interpret):
    N, T = dyn.A.shape[0], dyn.A.shape[1]
    dx, du = dyn.A.shape[-1], dyn.B.shape[-1]
    dtype = dyn.A.dtype
    n_pad, _, _, _, t_pad = _pad_batch_geom(N, time_chunk, T)
    pad_t = t_pad - T
    zero_cost = QuadraticCost(
        Cxx=jnp.zeros((N, T + 1, dx, dx), dtype),
        cx=jnp.zeros((N, T + 1, dx), dtype),
        Cuu=jnp.zeros((N, T + 1, du, du), dtype),
        cu=jnp.zeros((N, T + 1, du), dtype),
        Cxu=jnp.zeros((N, T + 1, dx, du), dtype),
        c0=jnp.zeros((N, T + 1), dtype),
    )
    packed = pack_gps_lanes(zero_cost, dyn, old, mu0, sigma0, time_chunk=time_chunk)

    def padT(x, neutral):
        if pad_t == 0:
            return x
        p = jnp.broadcast_to(neutral, (x.shape[0], pad_t) + x.shape[2:]).astype(x.dtype)
        return jnp.concatenate([p, x], axis=1)

    eye_u = jnp.eye(du, dtype=dtype)
    # the neutral pad policy must equal the packed old policy's pad rows so the
    # pad steps contribute KL = 0
    K_l = _to_lanes(padT(new.K, jnp.zeros((du, dx), dtype)), n_pad)
    kff_l = _to_lanes(padT(new.kff, jnp.zeros((du,), dtype)), n_pad)
    sigc_l = _to_lanes(padT(new.sigma, eye_u), n_pad)

    kl, muT, sigT = pallas_gps_forward_kl_packed(
        packed, K_l, kff_l, sigc_l, dx, du,
        time_chunk=time_chunk, interpret=interpret,
    )
    kl_out = kl.reshape(-1)[:N]
    muT_out = jnp.transpose(muT.reshape(dx, -1), (1, 0))[:N]
    sigT_out = jnp.transpose(sigT.reshape(dx * dx, -1), (1, 0))[:N].reshape(N, dx, dx)
    return kl_out, muT_out, sigT_out
