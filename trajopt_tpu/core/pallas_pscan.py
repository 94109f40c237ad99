"""Pallas-native parallel-in-time iLQR/Riccati backward pass (batch-1 latency).

``lax.associative_scan`` over Riccati value elements delivers no win at batch 1
(BENCH_r01: the per-level lane shuffles between HBM-round-tripping XLA ops
dominate).  This kernel runs the ENTIRE log-depth suffix-scan tree — element
construction from the raw quadratic model, ⌈log₂T⌉ combine levels, and the
per-step gain solves — as ONE Pallas program with every operand resident in VMEM
in a **time-tiled** layout: each small-matrix entry is an ``(8, C)`` tile with
timestep ``t`` at ``(t // C, t mod C)``, so every plane is one fully-utilized
vector register (vs the round-2 ``(1, T_pad)`` layout's 1/8 sublane use — 8×
fewer VPU ops per combine level) and a "shift by d" is a lane roll plus a
sublane-roll select (two in-register shuffles).  Total footprint at T = 1000,
dx = 4: ~0.4 MB — far under VMEM.

Composition algebra and conventions are exactly :mod:`core.pscan_lqr`
(Särkkä & García-Fernández elements; delta-convention wrapper at λ = 0 matching
ilqr/src/util.cpp:83-182, kills its O(T) sequential loop at line 126).  Parity
with the sequential kernel is tested in interpreter mode
(tests/test_pallas_pscan.py); the batch-1 latency target vs the XLA
associative scan is measured in bench.py on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pscan_lqr import _gj_inv, _lmm, _lmv, _lt
from .types import LinearPolicy, QuadraticCost, QuadraticValue

LANES = 128
SUBS = 8


def _rows_of(ref, n, m):
    """(n*m*8, C) ref → list-of-lists of (8, C) time tiles."""
    return [
        [ref[(i * m + j) * SUBS : (i * m + j + 1) * SUBS, :] for j in range(m)]
        for i in range(n)
    ]


def _vec_of(ref, n):
    return [ref[i * SUBS : (i + 1) * SUBS, :] for i in range(n)]


def _make_roll(c_lanes: int, lane_iota, *, mosaic: bool):
    """Left-rotate an (8, C) time tile by d positions in the t = s·C + l
    ordering: a lane rotation by d mod C, then a per-column select between the
    sublane rotations by d//C and d//C + 1 (columns that wrapped past C take
    their value from the next sublane).  Under Mosaic both rotations are
    in-register shuffles (``pltpu.roll``); the plain-XLA test path uses
    ``jnp.roll``."""

    if mosaic:
        def rot(p, k, axis):
            n = p.shape[axis]
            return p if k % n == 0 else pltpu.roll(p, (n - k) % n, axis)
    else:
        def rot(p, k, axis):
            return p if k % p.shape[axis] == 0 else jnp.roll(p, -k, axis)

    def roll(p, d: int):
        dp, k = d % c_lanes, d // c_lanes
        if dp == 0:
            return rot(p, k, 0)
        q = rot(p, dp, 1)
        lo = rot(q, k, 0)
        hi = rot(q, k + 1, 0)
        return jnp.where(lane_iota < c_lanes - dp, lo, hi)

    return roll


def _shift_element(el, d: int, dx: int, mask, roll):
    """Element tiles at position t ← value at t+d; positions whose partner
    index exceeds the terminal (``mask`` False) take the composition identity
    (A = I, rest 0)."""
    A, b, C, eta, J = el

    def sh(p, fill):
        return jnp.where(mask, roll(p, d), fill)

    A_s = [[sh(A[i][j], 1.0 if i == j else 0.0) for j in range(dx)]
           for i in range(dx)]
    b_s = [sh(x, 0.0) for x in b]
    C_s = [[sh(C[i][j], 0.0) for j in range(dx)] for i in range(dx)]
    eta_s = [sh(x, 0.0) for x in eta]
    J_s = [[sh(J[i][j], 0.0) for j in range(dx)] for i in range(dx)]
    return (A_s, b_s, C_s, eta_s, J_s)


def _combine_planes(e1, e2, dx):
    """(A, b, C, eta, J) composition in tile form — core/pscan_lqr.combine."""
    A1, b1, C1, n1, J1 = e1
    A2, b2, C2, n2, J2 = e2

    C1J2 = _lmm(C1, J2)
    M = [[C1J2[i][j] + (1.0 if i == j else 0.0) for j in range(dx)]
         for i in range(dx)]
    G = _gj_inv(M)
    Gt = _lt(G)

    A2G = _lmm(A2, G)
    A12 = _lmm(A2G, A1)
    b12 = [s + b2[i] for i, s in enumerate(_lmv(A2G, [
        b1[k] + sum(C1[k][l] * n2[l] for l in range(dx)) for k in range(dx)
    ]))]
    C12 = _lmm(_lmm(A2G, C1), _lt(A2))
    C12 = [[0.5 * (C12[i][j] + C12[j][i]) + C2[i][j] for j in range(dx)]
           for i in range(dx)]
    A1tGt = _lmm(_lt(A1), Gt)
    n12 = [s + n1[i] for i, s in enumerate(_lmv(A1tGt, [
        n2[k] - sum(J2[k][l] * b1[l] for l in range(dx)) for k in range(dx)
    ]))]
    J12 = _lmm(_lmm(A1tGt, J2), A1)
    J12 = [[0.5 * (J12[i][j] + J12[j][i]) + J1[i][j] for j in range(dx)]
           for i in range(dx)]
    return (A12, b12, C12, n12, J12)


def _chol_planes(A):
    """Unrolled Cholesky on tile lists (same recurrence as pallas_lqr._chol)."""
    n = len(A)
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = A[j][j] - sum(L[j][k] * L[j][k] for k in range(j))
        s = jnp.where((s > 0) & jnp.isfinite(s), s, jnp.ones_like(s))
        L[j][j] = jnp.sqrt(s)
        inv_d[j] = 1.0 / L[j][j]
        for i in range(j + 1, n):
            r = A[i][j] - sum(L[i][k] * L[j][k] for k in range(j))
            L[i][j] = r * inv_d[j]
    return L, inv_d


def _chol_solve_vec_planes(L, inv_d, b):
    n = len(b)
    y = [None] * n
    for i in range(n):
        y[i] = (b[i] - sum(L[i][k] * y[k] for k in range(i))) * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = (y[i] - sum(L[k][i] * x[k] for k in range(i + 1, n))) * inv_d[i]
    return x


def _chol_solve_mat_planes(L, inv_d, B):
    cols = [
        _chol_solve_vec_planes(L, inv_d, [B[i][j] for i in range(len(B))])
        for j in range(len(B[0]))
    ]
    return [[cols[j][i] for j in range(len(cols))] for i in range(len(B))]


def _pscan_compute(
    q_in, qv_in, r_in, rv_in, m_in, a_in, b_in,
    *, dx: int, du: int, T: int, c_lanes: int, n_levels: int, mosaic: bool,
):
    """The full computation on (entries·8, C) time-tiled arrays — pure jnp, so
    it runs identically inside the Pallas kernel (Mosaic) and as a plain jitted
    function (CPU tests; the Pallas interpreter is pathologically slow on a
    body this unrolled)."""
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBS, c_lanes), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBS, c_lanes), 1)
    t_iota = s_iota * c_lanes + l_iota
    is_term = t_iota == T
    before_term = t_iota < T
    roll = _make_roll(c_lanes, l_iota, mosaic=mosaic)

    Q = _rows_of(q_in, dx, dx)
    q = _vec_of(qv_in, dx)
    R = _rows_of(r_in, du, du)
    r = _vec_of(rv_in, du)
    M = _rows_of(m_in, dx, du)
    F = _rows_of(a_in, dx, dx)
    L = _rows_of(b_in, dx, du)

    # ---- element construction (pscan_lqr.make_elements, all t at once) --------
    Lr, inv_d = _chol_planes(R)
    RiMt = _chol_solve_mat_planes(Lr, inv_d, _lt(M))   # R⁻¹Mᵀ (du, dx)
    Rir = _chol_solve_vec_planes(Lr, inv_d, r)          # R⁻¹r  (du,)
    RiLt = _chol_solve_mat_planes(Lr, inv_d, _lt(L))    # R⁻¹Lᵀ (du, dx)

    LRiMt = _lmm(L, RiMt)                               # (dx, dx)
    A_el = [[F[i][j] - LRiMt[i][j] for j in range(dx)] for i in range(dx)]
    LRir = _lmv(L, Rir)
    b_el = [-LRir[i] for i in range(dx)]                # c = 0 (delta convention)
    C_el = _lmm(L, RiLt)
    C_el = [[0.5 * (C_el[i][j] + C_el[j][i]) for j in range(dx)] for i in range(dx)]
    MRiMt = _lmm(M, RiMt)
    J_el = [[Q[i][j] - MRiMt[i][j] for j in range(dx)] for i in range(dx)]
    MRir = _lmv(M, Rir)
    eta_el = [-(q[i] - MRir[i]) for i in range(dx)]

    # overwrite position T with the terminal element (A=0, b=0, C=0, η=−q_T,
    # J=Q_T — the raw Q/q planes already hold the terminal cost at index T) and
    # positions > T with the composition identity (A=I, rest 0)
    one = jnp.ones((SUBS, c_lanes), q_in.dtype)
    zero = jnp.zeros((SUBS, c_lanes), q_in.dtype)
    after = t_iota > T
    for i in range(dx):
        for j in range(dx):
            ident = one if i == j else zero
            A_el[i][j] = jnp.where(is_term, zero, jnp.where(after, ident, A_el[i][j]))
            C_el[i][j] = jnp.where(is_term | after, zero, C_el[i][j])
            J_el[i][j] = jnp.where(is_term, Q[i][j], jnp.where(after, zero, J_el[i][j]))
        b_el[i] = jnp.where(is_term | after, zero, b_el[i])
        eta_el[i] = jnp.where(is_term, -q[i], jnp.where(after, zero, eta_el[i]))

    # ---- log-depth suffix scan: S_t ← S_t ⊗ S_{t+d},  d = 1, 2, 4, … ---------
    el = (A_el, b_el, C_el, eta_el, J_el)
    d = 1
    for _ in range(n_levels):
        mask = t_iota < (T + 1 - d)   # partner t+d exists (≤ terminal)
        el = _combine_planes(el, _shift_element(el, d, dx, mask, roll), dx)
        d *= 2

    S = el[4]                      # J tiles: value Hessian (T+1 valid entries)
    s = [-e for e in el[3]]        # −η tiles: value linear term

    # ---- gains (pscan_lqr._gains in tile form, S' = S shifted by 1; the
    # wrapped value at the last pad position is unused by t < T and finite) ----
    Sn = [[roll(S[i][j], 1) for j in range(dx)] for i in range(dx)]
    sn = [roll(s[i], 1) for i in range(dx)]

    LtS = _lmm(_lt(L), Sn)                              # LᵀS' (du, dx)
    Quu = [[R[i][j] + sum(LtS[i][k] * L[k][j] for k in range(dx))
            for j in range(du)] for i in range(du)]
    Lq, inv_q = _chol_planes(Quu)
    rhs_K = [[sum(LtS[i][k] * F[k][j] for k in range(dx)) + M[j][i]
              for j in range(dx)] for i in range(du)]
    K = [[-e for e in row] for row in _chol_solve_mat_planes(Lq, inv_q, rhs_K)]
    Lts = _lmv(_lt(L), sn)
    kff = [-e for e in _chol_solve_vec_planes(
        Lq, inv_q, [Lts[i] + r[i] for i in range(du)]
    )]

    # dV pair (ilqr/src/util.cpp:154): per-t contributions, masked to t < T
    qu = [r[i] + Lts[i] for i in range(du)]
    dv0 = sum(kff[i] * qu[i] for i in range(du))
    Quu_kff = _lmv(Quu, kff)
    dv1 = 0.5 * sum(kff[i] * Quu_kff[i] for i in range(du))

    def cat_mat(Mrows):
        return jnp.concatenate([p for row in Mrows for p in row], axis=0)

    dv = jnp.concatenate([
        jnp.where(before_term, dv0, zero), jnp.where(before_term, dv1, zero)
    ], axis=0)
    return (
        cat_mat(K),
        jnp.concatenate(kff, axis=0),
        cat_mat(S),
        jnp.concatenate(s, axis=0),
        dv,
    )


def _pscan_kernel(
    q_ref, qv_ref, r_ref, rv_ref, m_ref, a_ref, b_ref,
    k_ref, kff_ref, s_ref, sv_ref, dv_ref,
    *, dx: int, du: int, T: int, c_lanes: int, n_levels: int,
):
    Kp, kffp, Sp, sp, dvp = _pscan_compute(
        q_ref[...], qv_ref[...], r_ref[...], rv_ref[...], m_ref[...],
        a_ref[...], b_ref[...],
        dx=dx, du=du, T=T, c_lanes=c_lanes, n_levels=n_levels, mosaic=True,
    )
    k_ref[...] = Kp
    kff_ref[...] = kffp
    s_ref[...] = Sp
    sv_ref[...] = sp
    dv_ref[...] = dvp


def _to_time_tiles(x: Array, c_lanes: int, pad_value: Array) -> Array:
    """(Tn, n, m) → (n*m*8, C) time tiles (t at (t//C, t mod C)), padded along
    time with ``pad_value``."""
    Tn = x.shape[0]
    e = 1
    for dim in x.shape[1:]:
        e *= dim
    t_pad = SUBS * c_lanes
    planes = jnp.moveaxis(x.reshape(Tn, e), 0, 1)
    pad = jnp.broadcast_to(
        jnp.asarray(pad_value, x.dtype).reshape(-1)[:, None], (e, t_pad - Tn)
    )
    return jnp.concatenate([planes, pad], axis=1).reshape(e * SUBS, c_lanes)


def pallas_pilqr_backward(
    cost: QuadraticCost,
    A: Array,
    B: Array,
    *,
    interpret: bool = False,
) -> tuple[LinearPolicy, QuadraticValue, Array]:
    """Single-problem parallel-in-time iLQR backward pass (λ = 0) as one Pallas
    launch — the batch-1 latency path.  Same contract as
    :func:`core.pscan_lqr.pilqr_backward`.

    ``interpret=True`` (CPU tests) runs the IDENTICAL tile computation
    (:func:`_pscan_compute`) as a plain jitted function instead of through the
    Pallas interpreter, which is pathologically slow on a body this unrolled —
    the Mosaic path adds only the VMEM plumbing around the same jnp ops."""
    if interpret:
        return jax.jit(partial(_pallas_pilqr_backward, use_pallas=False))(
            cost, A, B
        )
    return _pallas_pilqr_backward_jit(cost, A, B)


@jax.jit
def _pallas_pilqr_backward_jit(cost, A, B):
    return _pallas_pilqr_backward(cost, A, B, use_pallas=True)


def _pallas_pilqr_backward(cost, A, B, *, use_pallas):
    T = A.shape[0]
    dx, du = A.shape[-1], B.shape[-1]
    dtype = A.dtype
    t_tot = T + 1
    per_sub = -(-t_tot // SUBS)                       # ceil(t_tot / 8)
    c_lanes = max(LANES, -(-per_sub // LANES) * LANES)
    t_pad = SUBS * c_lanes
    n_levels = max(1, (t_tot - 1).bit_length())

    eye_u = jnp.eye(du, dtype=dtype)
    eye_x = jnp.eye(dx, dtype=dtype)
    zx = jnp.zeros((dx, dx), dtype)

    ins = [
        _to_time_tiles(cost.Cxx[: T + 1], c_lanes, zx),
        _to_time_tiles(cost.cx[: T + 1, :, None], c_lanes, jnp.zeros((dx, 1), dtype)),
        # R/r/M/A/B are only meaningful for t < T; pad (incl. position T) with
        # values that keep the element construction finite (R = I)
        _to_time_tiles(jnp.concatenate([cost.Cuu[:T], eye_u[None]], 0), c_lanes, eye_u),
        _to_time_tiles(cost.cu[:T, :, None], c_lanes, jnp.zeros((du, 1), dtype)),
        _to_time_tiles(cost.Cxu[:T], c_lanes, jnp.zeros((dx, du), dtype)),
        _to_time_tiles(A, c_lanes, eye_x),
        _to_time_tiles(B, c_lanes, jnp.zeros((dx, du), dtype)),
    ]

    if use_pallas:
        kernel = partial(
            _pscan_kernel, dx=dx, du=du, T=T, c_lanes=c_lanes, n_levels=n_levels
        )
        spec = lambda e: pl.BlockSpec(
            (e * SUBS, c_lanes), lambda: (0, 0), memory_space=pltpu.VMEM
        )

        K_p, kff_p, S_p, s_p, dv_p = pl.pallas_call(
            kernel,
            in_specs=[spec(dx * dx), spec(dx), spec(du * du), spec(du),
                      spec(dx * du), spec(dx * dx), spec(dx * du)],
            out_specs=[spec(du * dx), spec(du), spec(dx * dx), spec(dx), spec(2)],
            out_shape=[
                jax.ShapeDtypeStruct((du * dx * SUBS, c_lanes), dtype),
                jax.ShapeDtypeStruct((du * SUBS, c_lanes), dtype),
                jax.ShapeDtypeStruct((dx * dx * SUBS, c_lanes), dtype),
                jax.ShapeDtypeStruct((dx * SUBS, c_lanes), dtype),
                jax.ShapeDtypeStruct((2 * SUBS, c_lanes), dtype),
            ],
        )(*ins)
    else:
        K_p, kff_p, S_p, s_p, dv_p = _pscan_compute(
            *ins, dx=dx, du=du, T=T, c_lanes=c_lanes, n_levels=n_levels,
            mosaic=False,
        )

    def untile(P_p, e):
        return P_p.reshape(e, t_pad)   # row-major (entry, s, l) → t = s·C + l

    K = jnp.moveaxis(untile(K_p, du * dx)[:, :T], 1, 0).reshape(T, du, dx)
    kff = jnp.moveaxis(untile(kff_p, du)[:, :T], 1, 0)
    S = jnp.moveaxis(untile(S_p, dx * dx)[:, : T + 1], 1, 0).reshape(T + 1, dx, dx)
    s = jnp.moveaxis(untile(s_p, dx)[:, : T + 1], 1, 0)
    dV = jnp.sum(untile(dv_p, 2), axis=1)
    value = QuadraticValue(V=S, v=s, v0=jnp.zeros(T + 1, dtype))
    return LinearPolicy(K=K, kff=kff), value, dV


def pallas_pilqr_backward_reg(
    cost: QuadraticCost,
    A: Array,
    B: Array,
    lmbda: Array | float = 0.0,
    *,
    interpret: bool = False,
) -> tuple[LinearPolicy, QuadraticValue, Array, Array]:
    """λ-regularized variant with the same λ-folded semantics as
    :func:`core.pscan_lqr.pilqr_backward_reg` (λ into the action Hessian — exact
    at λ = 0, proximal above), plus a NaN/Inf divergence flag: the solver-engine
    contract for ``backward='pallas-pscan'`` in
    :func:`parallel.mpc.make_ilqr_solver`."""
    du = B.shape[-1]
    lam_eye = lmbda * jnp.eye(du, dtype=A.dtype)
    ctl, value, dV = pallas_pilqr_backward(
        cost._replace(Cuu=cost.Cuu + lam_eye), A, B, interpret=interpret
    )
    diverged = ~(
        jnp.all(jnp.isfinite(ctl.K))
        & jnp.all(jnp.isfinite(ctl.kff))
        & jnp.all(jnp.isfinite(value.V))
    )
    return ctl, value, dV, diverged
