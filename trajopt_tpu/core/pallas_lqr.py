"""Batched Pallas TPU kernel for the regularized iLQR backward pass.

TPU-native counterpart of ilqr.core.backward_pass (reference
ilqr/src/util.cpp:83-182) for *batches* of problems — the layout the MPC farms
(examples/ilqr/mpc/pendulum_parallel.py) and GPS rollout fitting actually run.

Why Pallas here: the per-timestep blocks are tiny (dx ≤ 8, du ≤ 4).  XLA's batched
``cholesky``/``triangular_solve`` put those small dims on the 128-wide vector lanes,
so a (batch, 2, 2) factorization lights up 2 of 128 lanes.  This kernel transposes to
a **lane-major** layout instead: every matrix entry is a ``(SUB, 128)`` tile holding
``SUB·128`` independent problem instances, every small-matrix product / Cholesky /
triangular solve is an unrolled scalar recurrence over fully-occupied VPU tiles, and
the time recursion runs as a sequential Pallas grid with the value-function carry
resident in VMEM scratch.  The HBM traffic is exactly one stream of the per-timestep
cost/dynamics blocks — the bandwidth roofline for this op.

Numerics match :func:`trajopt_tpu.core.scan_lqr.ilqr_backward` (same regularization
modes reg ∈ {1, 2}, same expected-improvement ``dV``, same divergence semantics: a
non-PD ``Quu`` flags the instance and the affected lanes carry safe finite garbage,
exactly like the guarded-Cholesky scan path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import LinearPolicy, QuadraticCost

LANES = 128


# --------------------------------------------------------------------------------------
# Small-matrix algebra on lists of (SUB, LANES) tiles.
#
# A "matrix" is a list-of-lists of 2-D arrays: M[i][j] is the (i, j) entry for all
# SUB·LANES problem instances at once.  Everything below unrolls at trace time
# (dims ≤ 8), producing straight-line VPU code.
# --------------------------------------------------------------------------------------


def _load_mat(ref, t, n, m):
    return [[ref[t, i * m + j] for j in range(m)] for i in range(n)]


def _load_vec(ref, t, n):
    return [ref[t, i] for i in range(n)]


def _t(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _add(A, B):
    return [[A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def _mm(A, B):
    """(n,k) @ (k,m)."""
    n, k, m = len(A), len(B), len(B[0])
    return [
        [sum(A[i][l] * B[l][j] for l in range(k)) for j in range(m)]
        for i in range(n)
    ]


def _mm_tn(A, B):
    """Aᵀ @ B for A:(k,n), B:(k,m)."""
    k, n, m = len(A), len(A[0]), len(B[0])
    return [
        [sum(A[l][i] * B[l][j] for l in range(k)) for j in range(m)]
        for i in range(n)
    ]


def _mv(A, x):
    return [sum(A[i][j] * x[j] for j in range(len(x))) for i in range(len(A))]


def _mv_tn(A, x):
    """Aᵀ x for A:(k,n), x:(k,)."""
    return [sum(A[l][i] * x[l] for l in range(len(A))) for i in range(len(A[0]))]


def _dot(x, y):
    return sum(a * b for a, b in zip(x, y))


def _sym(A):
    n = len(A)
    return [[0.5 * (A[i][j] + A[j][i]) for j in range(n)] for i in range(n)]


def _chol(A):
    """Unrolled Cholesky–Banachiewicz of a symmetric matrix per lane.

    Returns (L, bad) where ``bad`` marks lanes whose pivot was non-positive or
    non-finite (the C++ ``is_sympd`` break, ilqr/src/util.cpp:145-148).  Bad lanes
    continue with a unit pivot so downstream arithmetic stays finite — the same
    contract as the guarded solve in scan_lqr.ilqr_backward.
    """
    n = len(A)
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    bad = jnp.zeros_like(A[0][0], dtype=jnp.bool_)
    for j in range(n):
        s = A[j][j] - sum(L[j][k] * L[j][k] for k in range(j))
        bad = bad | ~(s > 0) | ~jnp.isfinite(s)
        s = jnp.where((s > 0) & jnp.isfinite(s), s, jnp.ones_like(s))
        L[j][j] = jnp.sqrt(s)
        inv_d[j] = 1.0 / L[j][j]
        for i in range(j + 1, n):
            r = A[i][j] - sum(L[i][k] * L[j][k] for k in range(j))
            L[i][j] = r * inv_d[j]
    return L, inv_d, bad


def _chol_solve_vec(L, inv_d, b):
    """Solve (L Lᵀ) x = b by unrolled forward/back substitution."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        y[i] = (b[i] - sum(L[i][k] * y[k] for k in range(i))) * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = (y[i] - sum(L[k][i] * x[k] for k in range(i + 1, n))) * inv_d[i]
    return x


def _chol_solve_mat(L, inv_d, B):
    """Solve (L Lᵀ) X = B column by column; B is (n, m)."""
    cols = [
        _chol_solve_vec(L, inv_d, [B[i][j] for i in range(len(B))])
        for j in range(len(B[0]))
    ]
    return [[cols[j][i] for j in range(len(cols))] for i in range(len(B))]


# --------------------------------------------------------------------------------------
# Kernel body
# --------------------------------------------------------------------------------------


def _bwd_step(Cxx, cx, Cuu, cu, Cxu, A, B, V, v, dv0, dv1, bad, lam,
              dx, du, reg):
    """One backward-recursion step on block values (the body of
    ilqr/src/util.cpp:83-182) — shared by the stream kernel (blocks loaded from
    HBM) and the fused kernel (blocks computed in-kernel)."""
    VA = _mm(V, A)
    VB = _mm(V, B)

    Qxx = _add(Cxx, _mm_tn(A, VA))
    Quu = _add(Cuu, _mm_tn(B, VB))
    QuxT = _add(Cxu, _mm_tn(A, VB))      # = Quxᵀ, (dx, du)
    qx = [cx[i_] + s for i_, s in enumerate(_mv_tn(A, v))]
    qu = [cu[i_] + s for i_, s in enumerate(_mv_tn(B, v))]

    if reg == 1:
        # λ on Quu only: the regularized blocks share the unregularized matmuls
        QuxT_r = QuxT
        Quu_r = [row[:] for row in Quu]
        for j_ in range(du):
            Quu_r[j_][j_] = Quu_r[j_][j_] + lam
    else:
        # λ on the value Hessian: V_reg = V + λI ⇒ VB_reg = VB + λB
        VB_r = [[VB[i_][j_] + lam * B[i_][j_] for j_ in range(du)]
                for i_ in range(dx)]
        QuxT_r = _add(Cxu, _mm_tn(A, VB_r))
        Quu_r = _add(Cuu, _mm_tn(B, VB_r))

    L, inv_d, step_bad = _chol(_sym(Quu_r))
    bad = bad | step_bad

    K = [[-e for e in row] for row in _chol_solve_mat(L, inv_d, _t(QuxT_r))]
    kff = [-e for e in _chol_solve_vec(L, inv_d, qu)]

    Quu_kff = _mv(Quu, kff)
    dv0 = dv0 + _dot(kff, qu)
    dv1 = dv1 + 0.5 * _dot(kff, Quu_kff)

    v = [
        qx[i_] + kquu + kqu + qk
        for i_, (kquu, kqu, qk) in enumerate(
            zip(_mv_tn(K, Quu_kff), _mv_tn(K, qu), _mv(QuxT, kff))
        )
    ]
    M = _sym(_add(Qxx, _mm_tn(K, _mm(Quu, K))))
    P = _mm_tn(K, _t(QuxT))              # Kᵀ Qux, (dx, dx)
    V = [[M[i_][j_] + P[i_][j_] + P[j_][i_] for j_ in range(dx)]
         for i_ in range(dx)]
    return K, kff, V, v, dv0, dv1, bad


def _ilqr_kernel(
    # inputs (per grid step (b, i); time runs backward in i)
    cxx_ref, cx_ref, cuu_ref, cu_ref, cxu_ref, a_ref, b_ref,
    vT_ref, vvT_ref, lam_ref,
    # outputs
    k_ref, kff_ref, dv_ref, bad_ref,
    # scratch (VMEM carry across grid steps)
    v_s, vv_s,
    *, dx: int, du: int, reg: int, time_chunk: int,
):
    i = pl.program_id(1)
    lam = lam_ref[...]

    # First grid step of each batch block: carry ← terminal value, accumulators ← 0.
    @pl.when(i == 0)
    def _():
        v_s[...] = vT_ref[...]
        vv_s[...] = vvT_ref[...]
        dv_ref[...] = jnp.zeros_like(dv_ref)
        bad_ref[...] = jnp.zeros_like(bad_ref)

    V = [[v_s[i_ * dx + j_] for j_ in range(dx)] for i_ in range(dx)]
    v = [vv_s[i_] for i_ in range(dx)]
    dv0 = dv_ref[0]
    dv1 = dv_ref[1]
    bad = bad_ref[...] > 0

    for tloc in reversed(range(time_chunk)):
        Cxx = _load_mat(cxx_ref, tloc, dx, dx)
        cx = _load_vec(cx_ref, tloc, dx)
        Cuu = _load_mat(cuu_ref, tloc, du, du)
        cu = _load_vec(cu_ref, tloc, du)
        Cxu = _load_mat(cxu_ref, tloc, dx, du)
        A = _load_mat(a_ref, tloc, dx, dx)
        B = _load_mat(b_ref, tloc, dx, du)

        K, kff, V, v, dv0, dv1, bad = _bwd_step(
            Cxx, cx, Cuu, cu, Cxu, A, B, V, v, dv0, dv1, bad, lam,
            dx, du, reg,
        )

        for i_ in range(du):
            for j_ in range(dx):
                k_ref[tloc, i_ * dx + j_] = K[i_][j_]
            kff_ref[tloc, i_] = kff[i_]

    for i_ in range(dx):
        for j_ in range(dx):
            v_s[i_ * dx + j_] = V[i_][j_]
        vv_s[i_] = v[i_]
    dv_ref[0] = dv0
    dv_ref[1] = dv1
    bad_ref[...] = bad.astype(bad_ref.dtype)


# --------------------------------------------------------------------------------------
# Host-side wrapper: layout transform, padding, pallas_call
# --------------------------------------------------------------------------------------


def _to_lanes(x: Array, n_pad: int) -> Array:
    """(N, T, *dims) → (T, prod(dims), n_pad // LANES, LANES), batch on lanes."""
    N, T = x.shape[0], x.shape[1]
    e = 1
    for d in x.shape[2:]:
        e *= d
    x = x.reshape(N, T, e)
    if n_pad > N:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (n_pad - N,) + x.shape[1:])])
    return jnp.transpose(x, (1, 2, 0)).reshape(T, e, n_pad // LANES, LANES)


def _from_lanes(x: Array, N: int, dims: tuple[int, ...]) -> Array:
    """(T, prod(dims), NSUB, LANES) → (N, T, *dims)."""
    T, e = x.shape[0], x.shape[1]
    x = x.reshape(T, e, -1)
    return jnp.transpose(x, (2, 0, 1)).reshape(-1, T, *dims)[:N]


def pallas_ilqr_backward(
    cost: QuadraticCost,
    A: Array,
    B: Array,
    lmbda: Array,
    reg: int = 1,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
) -> tuple[LinearPolicy, Array, Array]:
    """Batched regularized iLQR backward pass as one Pallas TPU kernel.

    Args:
      cost: batch-leading stacks — ``Cxx (N, T+1, dx, dx)`` … (delta convention,
        ilqr/objects.py:52-78); slice ``T`` is the terminal cost.
      A, B: linearized dynamics, ``(N, T, dx, dx)`` / ``(N, T, dx, du)``.
      lmbda: per-instance Levenberg–Marquardt λ, shape ``(N,)``.
      reg: 1 → λ on Quu, 2 → λ on the value Hessian (ilqr/src/util.cpp:103-117).

    Returns:
      (policy with ``K (N, T, du, dx)``, ``kff (N, T, du)``;
       dV ``(N, 2)`` expected-improvement pair; diverged ``(N,)`` bool) —
      the same contract as ``jax.vmap(scan_lqr.ilqr_backward)`` restricted to the
      outputs the compiled solver consumes.

    In interpreter mode (CPU tests) the call runs eagerly — jitting the fully
    unrolled straight-line body is only worthwhile under the Mosaic compiler.
    """
    if interpret:
        return _pallas_ilqr_backward(
            cost, A, B, lmbda, reg, time_chunk=time_chunk, interpret=True
        )
    return _pallas_ilqr_backward_jit(
        cost, A, B, lmbda, reg=reg, time_chunk=time_chunk
    )


@partial(jax.jit, static_argnames=("reg", "time_chunk"))
def _pallas_ilqr_backward_jit(cost, A, B, lmbda, reg, time_chunk):
    return _pallas_ilqr_backward(
        cost, A, B, lmbda, reg, time_chunk=time_chunk, interpret=False
    )


# A "PackedLQR" is a plain dict pytree of the kernel's lane-major operands —
# batch on the 128 vector lanes, time leading.  Produced by :func:`pack_lanes`;
# consumed by :func:`pallas_ilqr_backward_packed`.  Callers that run the backward
# pass repeatedly on the same linearization (λ loops, dual loops, benchmarks) pack
# once and skip the HBM relayout that dominates the unpacked call when its inputs
# are program inputs (measured via xprof: 54% of device time is XLA "data
# formatting" at batch 8192 — see CLAUDE.md "Known headroom").
PackedLQR = dict


def pack_lanes(
    cost: QuadraticCost, A: Array, B: Array, lmbda: Array, *, time_chunk: int = 4
) -> PackedLQR:
    """Relayout batch-leading operands into the kernel's native lane-major layout."""
    N, T = A.shape[0], A.shape[1]
    dx, du = A.shape[-1], B.shape[-1]
    dtype = A.dtype

    n_pad = max(LANES, -(-N // LANES) * LANES)
    t_pad = -(-T // time_chunk) * time_chunk
    pad_t = t_pad - T

    def padT(x, neutral):
        if pad_t == 0:
            return x
        p = jnp.broadcast_to(neutral, (x.shape[0], pad_t) + x.shape[2:]).astype(x.dtype)
        return jnp.concatenate([p, x], axis=1)

    # Neutral early-time padding (processed after the real steps; outputs discarded):
    # B = 0 makes Quu_reg = Cuu = I — always PD, never flags divergence.
    eye_u = jnp.eye(du, dtype=dtype)
    zx = jnp.zeros((dx,), dtype)
    return PackedLQR(
        cxx=_to_lanes(padT(cost.Cxx[:, :T], jnp.zeros((dx, dx), dtype)), n_pad),
        cx=_to_lanes(padT(cost.cx[:, :T], zx), n_pad),
        cuu=_to_lanes(padT(cost.Cuu[:, :T], eye_u), n_pad),
        cu=_to_lanes(padT(cost.cu[:, :T], jnp.zeros((du,), dtype)), n_pad),
        cxu=_to_lanes(padT(cost.Cxu[:, :T], jnp.zeros((dx, du), dtype)), n_pad),
        A=_to_lanes(padT(A, jnp.zeros((dx, dx), dtype)), n_pad),
        B=_to_lanes(padT(B, jnp.zeros((dx, du), dtype)), n_pad),
        # terminal value triplet + per-instance λ
        vT=_to_lanes(cost.Cxx[:, T][:, None], n_pad)[0],   # (dx*dx, nsub, LANES)
        vvT=_to_lanes(cost.cx[:, T][:, None], n_pad)[0],   # (dx, nsub, LANES)
        lam=_to_lanes(lmbda[:, None, None], n_pad)[0, 0],  # (nsub, LANES)
    )


def lane_pad(N: int) -> int:
    """Instance padding used by :func:`pack_lanes` for a batch of ``N``."""
    return max(LANES, -(-N // LANES) * LANES)


def sub_block(nsub: int, max_sub: int = 8) -> int:
    """Largest divisor of ``nsub`` up to ``max_sub`` — the sublane block size
    each grid step processes (shared by every lane-major kernel wrapper)."""
    sub = min(max_sub, nsub)
    while nsub % sub:
        sub -= 1
    return sub


def pack_scalar(x: Array, n_pad: int) -> Array:
    """Per-instance scalar ``(N,)`` → lane-major ``(nsub, LANES)`` (λ, masks…)."""
    return _to_lanes(x[:, None, None], n_pad)[0, 0]


def unpack_policy(K: Array, kff: Array, N: int, T: int, dx: int, du: int) -> LinearPolicy:
    """Lane-major kernel gain outputs → batch-leading ``LinearPolicy``."""
    pad_t = K.shape[0] - T
    return LinearPolicy(
        K=_from_lanes(K[pad_t:], N, (du, dx)), kff=_from_lanes(kff[pad_t:], N, (du,))
    )


def pallas_ilqr_backward_packed(
    packed: PackedLQR,
    dx: int,
    du: int,
    reg: int = 1,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
) -> tuple[Array, Array, Array, Array]:
    """Run the kernel on pre-packed lane-major operands, returning lane-major
    outputs ``(K (t_pad, du*dx, nsub, LANES), kff (t_pad, du, nsub, LANES),
    dV (2, nsub, LANES), bad (nsub, LANES))`` — no relayout on either side.
    Unpack with :func:`unpack_lanes` (padding lanes replicate instance 0,
    early-time padding rows precede the real steps)."""
    return _call_packed(
        packed, dx=dx, du=du, reg=reg, time_chunk=time_chunk, interpret=interpret
    )


def unpack_lanes(K, kff, dV, bad, N: int, T: int, dx: int, du: int):
    """Lane-major kernel outputs → the batch-leading contract of
    :func:`pallas_ilqr_backward`."""
    pad_t = K.shape[0] - T
    policy = LinearPolicy(
        K=_from_lanes(K[pad_t:], N, (du, dx)), kff=_from_lanes(kff[pad_t:], N, (du,))
    )
    dV_out = jnp.transpose(dV.reshape(2, -1), (1, 0))[:N]
    diverged = bad.reshape(-1)[:N] > 0
    return policy, dV_out, diverged


def _pallas_ilqr_backward(
    cost: QuadraticCost,
    A: Array,
    B: Array,
    lmbda: Array,
    reg: int = 1,
    *,
    time_chunk: int = 4,
    interpret: bool = False,
) -> tuple[LinearPolicy, Array, Array]:
    """Batched regularized iLQR backward pass as one Pallas TPU kernel.

    Args:
      cost: batch-leading stacks — ``Cxx (N, T+1, dx, dx)`` … (delta convention,
        ilqr/objects.py:52-78); slice ``T`` is the terminal cost.
      A, B: linearized dynamics, ``(N, T, dx, dx)`` / ``(N, T, dx, du)``.
      lmbda: per-instance Levenberg–Marquardt λ, shape ``(N,)``.
      reg: 1 → λ on Quu, 2 → λ on the value Hessian (ilqr/src/util.cpp:103-117).

    Returns:
      (policy with ``K (N, T, du, dx)``, ``kff (N, T, du)``;
       dV ``(N, 2)`` expected-improvement pair; diverged ``(N,)`` bool) —
      the same contract as ``jax.vmap(scan_lqr.ilqr_backward)`` restricted to the
      outputs the compiled solver consumes.
    """
    N, T = A.shape[0], A.shape[1]
    dx, du = A.shape[-1], B.shape[-1]

    packed = pack_lanes(cost, A, B, lmbda, time_chunk=time_chunk)
    K, kff, dV, bad = _call_packed(
        packed, dx=dx, du=du, reg=reg, time_chunk=time_chunk, interpret=interpret
    )
    return unpack_lanes(K, kff, dV, bad, N, T, dx, du)


def _call_packed(
    packed: PackedLQR,
    *,
    dx: int,
    du: int,
    reg: int,
    time_chunk: int,
    interpret: bool,
) -> tuple[Array, Array, Array, Array]:
    t_pad, _, nsub, _ = packed["A"].shape
    dtype = packed["A"].dtype
    sub = sub_block(nsub)   # batch blocks must tile the sublane stack evenly
    nb = nsub // sub

    tc = t_pad // time_chunk
    grid = (nb, tc)

    def tspec(e):
        return pl.BlockSpec(
            (time_chunk, e, sub, LANES),
            lambda b, i, tc=tc: (tc - 1 - i, 0, b, 0),
            memory_space=pltpu.VMEM,
        )

    def cspec(e):
        return pl.BlockSpec(
            (e, sub, LANES), lambda b, i: (0, b, 0), memory_space=pltpu.VMEM
        )

    kernel = partial(_ilqr_kernel, dx=dx, du=du, reg=reg, time_chunk=time_chunk)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tspec(dx * dx), tspec(dx), tspec(du * du), tspec(du), tspec(dx * du),
            tspec(dx * dx), tspec(dx * du),
            cspec(dx * dx), cspec(dx),
            pl.BlockSpec((sub, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tspec(du * dx), tspec(du),
            cspec(2),
            pl.BlockSpec((sub, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, du * dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((t_pad, du, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((2, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((nsub, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((dx * dx, sub, LANES), dtype),
            pltpu.VMEM((dx, sub, LANES), dtype),
        ],
        interpret=interpret,
    )(
        packed["cxx"], packed["cx"], packed["cuu"], packed["cu"], packed["cxu"],
        packed["A"], packed["B"], packed["vT"], packed["vvT"], packed["lam"],
    )


# --------------------------------------------------------------------------------------
# Riccati (absolute convention) via homogeneous-coordinate reduction
# --------------------------------------------------------------------------------------


def _augment_riccati(cost: QuadraticCost, A: Array, B: Array, c: Array):
    """Reduce the absolute-convention affine LQR (riccati/riccati.py:100-126) to
    the delta-convention pure-quadratic problem the iLQR kernel solves, via
    homogeneous coordinates z = [x; 1]:

        z' = [[A, c], [0, 1]] z + [B; 0] u,
        stage cost  zᵀ [[Cxx, cx/2], [cxᵀ/2, c0]] z + uᵀ Cuu u + 2 zᵀ [[Cxu], [cuᵀ/2]] u.

    The kernel's recursion on these matrices reproduces the reference recursion
    exactly — e.g. its Qux last column is ½(cu + 2BᵀVc + Bᵀv) = ½qu, so the
    feedforward appears as the gain's last column with the reference's
    ``kff = −½Quu⁻¹qu`` factor built in.  The kernel's own linear channels
    (cx, cu) stay zero."""
    N, T = A.shape[0], A.shape[1]
    dx, du = A.shape[-1], B.shape[-1]
    dtype = A.dtype

    bot = jnp.zeros((N, T, 1, dx + 1), dtype).at[..., 0, dx].set(1.0)
    A_aug = jnp.concatenate(
        [jnp.concatenate([A, c[..., None]], axis=-1), bot], axis=-2
    )
    B_aug = jnp.concatenate([B, jnp.zeros((N, T, 1, du), dtype)], axis=-2)

    top = jnp.concatenate([cost.Cxx, 0.5 * cost.cx[..., None]], axis=-1)
    low = jnp.concatenate(
        [0.5 * cost.cx[..., None, :], cost.c0[..., None, None]], axis=-1
    )
    Cxx_aug = jnp.concatenate([top, low], axis=-2)
    Cxu_aug = jnp.concatenate([cost.Cxu, 0.5 * cost.cu[..., None, :]], axis=-2)

    zeros_x = jnp.zeros((N, T + 1, dx + 1), dtype)
    zeros_u = jnp.zeros((N, T + 1, du), dtype)
    cost_aug = QuadraticCost(
        Cxx=Cxx_aug, cx=zeros_x, Cuu=cost.Cuu, cu=zeros_u, Cxu=Cxu_aug,
        c0=jnp.zeros((N, T + 1), dtype),
    )
    return cost_aug, A_aug, B_aug


def pallas_riccati_backward(
    cost: QuadraticCost,
    A: Array,
    B: Array,
    c: Array,
    *,
    time_chunk: int = 8,
    interpret: bool = False,
) -> tuple[LinearPolicy, Array]:
    """Batched exact-LQR (Riccati) backward pass on the Pallas kernel — the
    absolute-convention counterpart of :func:`pallas_ilqr_backward` via
    :func:`_augment_riccati`.  Batch-leading args (``c`` is the dynamics
    residual, (N, T, dx)); returns (policy(K (N,T,du,dx), kff (N,T,du)),
    diverged (N,))."""
    dx = A.shape[-1]
    cost_aug, A_aug, B_aug = _augment_riccati(cost, A, B, c)
    lam = jnp.zeros(A.shape[0], A.dtype)
    pol, _, div = pallas_ilqr_backward(
        cost_aug, A_aug, B_aug, lam, 1, time_chunk=time_chunk, interpret=interpret
    )
    return LinearPolicy(K=pol.K[..., :dx], kff=pol.K[..., dx]), div
