"""Lane-major Pallas TPU kernel for the belief-value backward recursion.

TPU-native batched counterpart of ``bspilqr.core.backward_pass``
(bspilqr/src/util.cpp:83-204), the kernel behind BASELINE config #4's
backward-pass throughput.  :func:`core.belief.bsp_backward` (the scan form used
by the compiled solvers) is exact but — vmapped over a batch — leaves XLA
dispatching T sequential groups of sub-tile (2–4)-dim ops with relayouts
between them, the same regime the iLQR/GPS packed kernels left behind.

Here the whole recursion over the (S, s, τ) belief value — μ-quadratic,
μ-linear, and vec(Σ)-linear channels — runs as ONE Pallas launch: batch on the
128 lanes, every matrix entry a fully-occupied VPU tile, value carry in VMEM
scratch across a reverse-streamed time grid, per-lane λ regularization with
the reg∈{1,2} semantics of the scan kernel (λ on Quu vs on the value Hessian)
and the same guarded-Cholesky divergence contract.  Numerics match
:func:`core.belief.bsp_backward` (incl. the tau-index fix of util.cpp:158) to
roundoff; parity is pinned in tests/test_pallas_belief.py (interpreter mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .belief import BeliefCostExpansion, BeliefDynamicsExpansion
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
    _t,
    _to_lanes,
    lane_pad,
    sub_block,
)
from .types import LinearPolicy


def _belief_kernel(
    q_ref, qv_ref, r_ref, rv_ref, p_ref, pv_ref,
    f_ref, g_ref, x_ref, y_ref, z_ref, tt_ref, u_ref, vv_ref,
    sT_ref, svT_ref, tauT_ref, lam_ref,
    k_ref, kff_ref, s_out_ref, sv_out_ref, tau_out_ref, ds_ref, bad_ref,
    S_s, sv_s, tau_s,
    *, b: int, a: int, reg: int, time_chunk: int,
):
    i = pl.program_id(1)
    lam = lam_ref[...]
    b2 = b * b

    @pl.when(i == 0)
    def _():
        S_s[...] = sT_ref[...]
        sv_s[...] = svT_ref[...]
        tau_s[...] = tauT_ref[...]
        ds_ref[...] = jnp.zeros_like(ds_ref)
        bad_ref[...] = jnp.zeros_like(bad_ref)

    S = [[S_s[i_ * b + j_] for j_ in range(b)] for i_ in range(b)]
    sv = [sv_s[i_] for i_ in range(b)]
    tau = [tau_s[i_] for i_ in range(b2)]
    ds0 = ds_ref[0]
    ds1 = ds_ref[1]
    bad = bad_ref[...] > 0

    for tloc in reversed(range(time_chunk)):
        Q = _load_mat(q_ref, tloc, b, b)
        q = _load_vec(qv_ref, tloc, b)
        R = _load_mat(r_ref, tloc, a, a)
        r = _load_vec(rv_ref, tloc, a)
        P = _load_mat(p_ref, tloc, b, a)
        p = _load_vec(pv_ref, tloc, b2)
        F = _load_mat(f_ref, tloc, b, b)
        G = _load_mat(g_ref, tloc, b, a)
        X = _load_mat(x_ref, tloc, b2, b)
        Y = _load_mat(y_ref, tloc, b2, b2)
        Z = _load_mat(z_ref, tloc, b2, a)
        T_ = _load_mat(tt_ref, tloc, b2, b)
        U = _load_mat(u_ref, tloc, b2, b2)
        V = _load_mat(vv_ref, tloc, b2, a)

        SF = _mm(S, F)
        SG = _mm(S, G)
        C = _add(Q, _mm_tn(F, SF))
        D = _add(R, _mm_tn(G, SG))
        ET = _add(P, _mm_tn(F, SG))          # = Eᵀ, (b, a)
        E = _t(ET)

        vecS = [S[i_][j_] for i_ in range(b) for j_ in range(b)]  # C-order
        Fs = _mv_tn(F, sv)
        Tt = _mv_tn(T_, tau)
        Xs = _mv_tn(X, vecS)
        c = [q[i_] + Fs[i_] + Tt[i_] + 0.5 * Xs[i_] for i_ in range(b)]
        Gs = _mv_tn(G, sv)
        Vt = _mv_tn(V, tau)
        Zs = _mv_tn(Z, vecS)
        d = [r[i_] + Gs[i_] + Vt[i_] + 0.5 * Zs[i_] for i_ in range(a)]
        Ut = _mv_tn(U, tau)
        Ys = _mv_tn(Y, vecS)
        e = [p[i_] + Ut[i_] + 0.5 * Ys[i_] for i_ in range(b2)]

        if reg == 2:
            # λ on the value Hessian: S_reg = S + λI ⇒ SG_reg = SG + λG
            SG_r = [[SG[i_][j_] + lam * G[i_][j_] for j_ in range(a)]
                    for i_ in range(b)]
            D_reg = _add(R, _mm_tn(G, SG_r))
            E_reg = _t(_add(P, _mm_tn(F, SG_r)))
        else:
            # λ on the action Hessian only
            D_reg = [row[:] for row in D]
            for j_ in range(a):
                D_reg[j_][j_] = D_reg[j_][j_] + lam
            E_reg = E

        L, inv_d, step_bad = _chol(_sym(D_reg))
        bad = bad | step_bad

        K = [[-v for v in row] for row in _chol_solve_mat(L, inv_d, E_reg)]
        kff = [-v for v in _chol_solve_vec(L, inv_d, d)]

        D_kff = _mv(D, kff)
        ds0 = ds0 + _dot(kff, d)
        ds1 = ds1 + 0.5 * _dot(kff, D_kff)

        tau = e
        sv = [
            c[i_] + kd + kdv + ek
            for i_, (kd, kdv, ek) in enumerate(
                zip(_mv_tn(K, D_kff), _mv_tn(K, d), _mv_tn(E, kff))
            )
        ]
        KD = _mm_tn(K, _mm(D, K))
        KE = _mm_tn(K, E)
        S = _sym([[C[i_][j_] + KD[i_][j_] + KE[i_][j_] + KE[j_][i_]
                   for j_ in range(b)] for i_ in range(b)])

        for i_ in range(a):
            for j_ in range(b):
                k_ref[tloc, i_ * b + j_] = K[i_][j_]
            kff_ref[tloc, i_] = kff[i_]
        for i_ in range(b):
            for j_ in range(b):
                s_out_ref[tloc, i_ * b + j_] = S[i_][j_]
            sv_out_ref[tloc, i_] = sv[i_]
        for i_ in range(b2):
            tau_out_ref[tloc, i_] = tau[i_]

    for i_ in range(b):
        for j_ in range(b):
            S_s[i_ * b + j_] = S[i_][j_]
        sv_s[i_] = sv[i_]
    for i_ in range(b2):
        tau_s[i_] = tau[i_]
    ds_ref[0] = ds0
    ds_ref[1] = ds1
    bad_ref[...] = bad.astype(bad_ref.dtype)


def pallas_bsp_backward(
    cost: BeliefCostExpansion,
    dyn: BeliefDynamicsExpansion,
    lmbda: Array,
    reg: int = 1,
    *,
    time_chunk: int | None = None,
    interpret: bool = False,
):
    """Batched belief-value backward pass as one Pallas launch.

    Args hold a LEADING batch axis: cost fields ``(N, T+1, …)``, dyn fields
    ``(N, T, …)``, ``lmbda (N,)``.  Returns the same contract as
    ``jax.vmap(bsp_backward)``: (policy, S (N,T+1,b,b), s (N,T+1,b),
    tau (N,T+1,b²), dS (N,2), diverged (N,))."""
    N, Tn = dyn.F.shape[0], dyn.F.shape[1]
    b = dyn.F.shape[-1]
    a = dyn.G.shape[-1]
    b2 = b * b
    dtype = dyn.F.dtype
    if time_chunk is None:
        from .pallas_rollout import pick_time_chunk

        time_chunk = pick_time_chunk(Tn, max_chunk=5)
    if Tn % time_chunk:
        raise ValueError(f"T={Tn} not divisible by time_chunk={time_chunk}")
    tc = Tn // time_chunk
    n_pad = lane_pad(N)

    ins = [
        _to_lanes(cost.Q[:, :Tn], n_pad),
        _to_lanes(cost.q[:, :Tn], n_pad),
        _to_lanes(cost.R[:, :Tn], n_pad),
        _to_lanes(cost.r[:, :Tn], n_pad),
        _to_lanes(cost.P[:, :Tn], n_pad),
        _to_lanes(cost.p[:, :Tn], n_pad),
        _to_lanes(dyn.F, n_pad),
        _to_lanes(dyn.G, n_pad),
        _to_lanes(dyn.X, n_pad),
        _to_lanes(dyn.Y, n_pad),
        _to_lanes(dyn.Z, n_pad),
        _to_lanes(dyn.T, n_pad),
        _to_lanes(dyn.U, n_pad),
        _to_lanes(dyn.V, n_pad),
        _to_lanes(cost.Q[:, Tn][:, None], n_pad)[0],
        _to_lanes(cost.q[:, Tn][:, None], n_pad)[0],
        _to_lanes(cost.p[:, Tn][:, None], n_pad)[0],
        _to_lanes(lmbda[:, None, None], n_pad)[0, 0],
    ]
    nsub = ins[0].shape[2]
    sub = sub_block(nsub)

    def tspec(e):
        return pl.BlockSpec(
            (time_chunk, e, sub, LANES),
            lambda bb, ii: (tc - 1 - ii, 0, bb, 0),
            memory_space=pltpu.VMEM,
        )

    def cspec(e):
        return pl.BlockSpec((e, sub, LANES), lambda bb, ii: (0, bb, 0),
                            memory_space=pltpu.VMEM)

    lam_spec = pl.BlockSpec((sub, LANES), lambda bb, ii: (bb, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_belief_kernel, b=b, a=a, reg=reg, time_chunk=time_chunk)
    outs = pl.pallas_call(
        kernel,
        grid=(nsub // sub, tc),
        in_specs=[tspec(e) for e in
                  [b * b, b, a * a, a, b * a, b2,
                   b * b, b * a, b2 * b, b2 * b2, b2 * a, b2 * b, b2 * b2,
                   b2 * a]]
        + [cspec(b * b), cspec(b), cspec(b2), lam_spec],
        out_specs=[tspec(a * b), tspec(a), tspec(b * b), tspec(b), tspec(b2),
                   cspec(2), lam_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Tn, a * b, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((Tn, a, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((Tn, b * b, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((Tn, b, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((Tn, b2, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((2, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((nsub, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b * b, sub, LANES), dtype),
            pltpu.VMEM((b, sub, LANES), dtype),
            pltpu.VMEM((b2, sub, LANES), dtype),
        ],
        interpret=interpret,
    )(*ins)
    K_l, kff_l, S_l, sv_l, tau_l, ds_l, bad_l = outs

    policy = LinearPolicy(
        K=_from_lanes(K_l, N, (a, b)), kff=_from_lanes(kff_l, N, (a,))
    )
    S = jnp.concatenate(
        [_from_lanes(S_l, N, (b, b)), cost.Q[:, Tn][:, None]], axis=1
    )
    s = jnp.concatenate(
        [_from_lanes(sv_l, N, (b,)), cost.q[:, Tn][:, None]], axis=1
    )
    tau = jnp.concatenate(
        [_from_lanes(tau_l, N, (b2,)), cost.p[:, Tn][:, None]], axis=1
    )
    dS = _from_lanes(ds_l[None], N, (2,))[:, 0]
    diverged = bad_l.reshape(-1)[:N] > 0
    return policy, S, s, tau, dS, diverged
