"""Fused lane-major Pallas TPU kernels for the extended-LQR sweeps.

TPU-native counterpart of the eLQR iteration (reference elqr/elqr.py:67-160):
forward cost-to-come sweep with inverse-dynamics linearization, backward
cost-to-go sweep with forward-dynamics linearization, and the evaluation
rollout.  Unlike Riccati/iLQR, the linearization points are data-dependent
*inside* each sweep, so the sweeps cannot be reduced to the packed LQR kernel —
as ``lax.scan`` bodies they dispatch T tiny jacfwd+inv steps per sweep and run
latency-bound (BENCH_r02: 3.9e3 iters/s at batch 64 on v5e).  Here each sweep is
ONE Pallas launch, batch on the 128 lanes:

* physics and linearization run in-kernel on the tile-level env protocol
  (envs/base.py ``_ode_parts``): jacobians of the (inverse) RK4 dynamics are
  dx+du ``jax.jvp`` columns of straight-line VPU code (Mosaic CSE's the repeated
  primal evaluation), never an XLA while-loop or a host round-trip;
* the cost quadratization (core/diff.quadratize_cost_elqr) is evaluated in
  closed form: under the detached-feature-Jacobian convention
  (envs/base.py:131-144) the cost is exactly quadratic with
  ``Cxx = JᵀGJ``, ``Cuu = diag(uw)``, ``Cxu = 0``, ``cu = 0`` — only the
  feature Jacobian J (dz ``jvp`` columns) is data-dependent;
* the per-step dx×dx / du×du inverses use the partial-pivoted Gauss–Jordan
  plane ladder (core/pscan_lqr._gj_inv), matching the reference's plain
  ``inv`` semantics (elqr.py:84-88).

Layout contract: identical to core/pallas_lqr.py — batch on lanes, time
leading, ``(T, planes, nsub, LANES)`` streams.  Numerics match
:mod:`solvers.elqr`'s scan sweeps to f32 roundoff; parity is pinned in
tests/test_pallas_elqr.py (interpreter mode) and tests/test_tpu.py (device).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lqr import LANES, _from_lanes, _to_lanes, lane_pad, sub_block
from .pallas_rollout import tile_clip_act, tile_clip_state, tile_dynamics
from .pscan_lqr import _gj_inv, _lmm, _lmv, _lt


def tile_inverse_dynamics(env, x, u):
    """env.inverse_dynamics on tiles: clip action, backward-sign RK4 over
    ``_ode_parts``, clip state (envs/base.py:121-123)."""
    dt = float(env.dt)
    u = tile_clip_act(env, u)
    f = env._ode_parts
    n = len(x)
    k1 = f(x, u)
    k2 = f([x[i] - (0.5 * dt) * k1[i] for i in range(n)], u)
    k3 = f([x[i] - (0.5 * dt) * k2[i] for i in range(n)], u)
    k4 = f([x[i] - dt * k3[i] for i in range(n)], u)
    xp = [
        x[i] - (dt / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
        for i in range(n)
    ]
    return tile_clip_state(env, xp)


def _tile_lin(f, x, u):
    """Affine model ``f(ξ, ν) ≈ Aξ + Bν + c`` about (x, u) on tiles via dx+du
    forward-mode columns (the jvp re-evaluates the primal per column; Mosaic's
    CSE collapses the duplicates, so the cost is ~one primal + dx+du tangents).
    """
    ndx, ndu = len(x), len(u)
    ones = jnp.ones_like(x[0])
    zeros = jnp.zeros_like(x[0])
    f0 = f(x, u)

    def col(seed_x, seed_u):
        _, t = jax.jvp(f, (list(x), list(u)), (seed_x, seed_u))
        return t

    colsA = [
        col([ones if i == k else zeros for i in range(ndx)], [zeros] * ndu)
        for k in range(ndx)
    ]
    colsB = [
        col([zeros] * ndx, [ones if j == k else zeros for j in range(ndu)])
        for k in range(ndu)
    ]
    A = [[colsA[k][i] for k in range(ndx)] for i in range(ndx)]
    B = [[colsB[k][i] for k in range(ndu)] for i in range(ndx)]
    c = [
        f0[i]
        - sum(A[i][k] * x[k] for k in range(ndx))
        - sum(B[i][j] * u[j] for j in range(ndu))
        for i in range(ndx)
    ]
    return A, B, c


def _tile_quad_cost(env, x, u):
    """Closed-form eLQR quadratization of the env cost at (x, u) with a = 1,
    u_last = 0 (core/diff.quadratize_cost_elqr on envs/base.py:149-155): the
    detached-Jacobian feature cost is exactly quadratic in x, so
    ``Cxx = JᵀGJ``, ``cx = 2JᵀG(z₀−g) − 2Cxx·x``, ``Cuu = diag(uw)``,
    ``Cxu = 0``, ``cu = 0`` and c0 closes the identity
    cost = xᵀCxx x + uᵀCuu u + cxᵀx + c0."""
    ndx, ndu = len(x), len(u)
    uw = tuple(float(v) for v in env.uw)
    g = tuple(float(v) for v in env.g)
    gw = tuple(float(v) for v in env.gw)

    y = list(env._periodic_parts(x))
    z0 = env.features_parts(y)
    nz = len(z0)
    ones = jnp.ones_like(x[0])
    zeros = jnp.zeros_like(x[0])

    def jcol(k):
        seed = [ones if i == k else zeros for i in range(ndx)]
        _, t = jax.jvp(lambda yy: env.features_parts(yy), (y,), (seed,))
        return t

    cols = [jcol(k) for k in range(ndx)]
    J = [[cols[k][i] for k in range(ndx)] for i in range(nz)]

    Cxx = [
        [sum(gw[k] * J[k][i] * J[k][j] for k in range(nz)) for j in range(ndx)]
        for i in range(ndx)
    ]
    gx = [
        2.0 * sum(gw[k] * (z0[k] - g[k]) * J[k][i] for k in range(nz))
        for i in range(ndx)
    ]
    cx = [
        gx[i] - 2.0 * sum(Cxx[i][j] * x[j] for j in range(ndx))
        for i in range(ndx)
    ]
    cost_val = sum(uw[j] * u[j] * u[j] for j in range(ndu)) + sum(
        gw[k] * (z0[k] - g[k]) ** 2 for k in range(nz)
    )
    xCx = sum(x[i] * Cxx[i][j] * x[j] for i in range(ndx) for j in range(ndx))
    uCu = sum(uw[j] * u[j] * u[j] for j in range(ndu))
    c0 = cost_val - xCx - uCu - sum(cx[i] * x[i] for i in range(ndx))
    return Cxx, cx, c0


def _sym(M):
    n = len(M)
    return [[0.5 * (M[i][j] + M[j][i]) for j in range(n)] for i in range(n)]


def _cuu_tiles(env, like):
    uw = tuple(float(v) for v in env.uw)
    ndu = len(uw)
    zero = jnp.zeros_like(like)
    return [
        [uw[i] * jnp.ones_like(like) if i == j else zero for j in range(ndu)]
        for i in range(ndu)
    ]


# --------------------------------------------------------------------------------------
# Kernel bodies
# --------------------------------------------------------------------------------------


def _forward_kernel(
    k_ref, kff_ref, goVn_ref, govn_ref, x0_ref,
    ik_ref, ikff_ref, comeV_ref, comev_ref, comev0_ref, xout_ref,
    x_s, V_s, v_s, v0_s,
    *, env, dx, du, time_chunk, tc,
):
    """Cost-to-come sweep (elqr/elqr.py:67-110).  Inputs per t: controller
    (K, kff) and the NEXT go-value rows goV_{t+1}, gov_{t+1}; emits
    (iK, ikff, comeV_{t+1}, comev_{t+1}, comev0_{t+1}) at row t and the final
    re-chosen state."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for c in range(dx):
            x_s[c] = x0_ref[c]
        for a in range(dx):
            for b in range(dx):
                V_s[a * dx + b] = jnp.full_like(
                    V_s[a * dx + b], 1e-16 if a == b else 0.0
                )
        for c in range(dx):
            v_s[c] = jnp.zeros_like(v_s[c])
        v0_s[0] = jnp.zeros_like(v0_s[0])

    for tloc in range(time_chunk):
        K = [[k_ref[tloc, j * dx + c] for c in range(dx)] for j in range(du)]
        kff = [kff_ref[tloc, j] for j in range(du)]
        goV_n = [[goVn_ref[tloc, a * dx + b] for b in range(dx)] for a in range(dx)]
        gov_n = [govn_ref[tloc, c] for c in range(dx)]
        x = [x_s[c] for c in range(dx)]
        comeV = [[V_s[a * dx + b] for b in range(dx)] for a in range(dx)]
        comev = [v_s[c] for c in range(dx)]
        comev0 = v0_s[0]

        u = [kff[j] + sum(K[j][c] * x[c] for c in range(dx)) for j in range(du)]
        xn = tile_dynamics(env, x, u)
        A, B, c_aff = _tile_lin(partial(tile_inverse_dynamics, env), xn, u)
        Cxx, cx, c0 = _tile_quad_cost(env, x, u)
        Cuu = _cuu_tiles(env, x[0])

        M = [[Cxx[a][b] + comeV[a][b] for b in range(dx)] for a in range(dx)]
        Qxx = _lmm(_lmm(_lt(A), M), A)
        BtM = _lmm(_lt(B), M)
        Quu = [[sum(BtM[a][k] * B[k][b] for k in range(dx)) + Cuu[a][b]
                for b in range(du)] for a in range(du)]
        Qux = _lmm(BtM, A)
        Mc = _lmv(M, c_aff)
        vec = [Mc[k] + cx[k] + comev[k] for k in range(dx)]
        qx = _lmv(_lt(A), vec)
        qu = _lmv(_lt(B), vec)
        q0 = (
            0.5 * sum(c_aff[k] * Mc[k] for k in range(dx))
            + sum(c_aff[k] * (cx[k] + comev[k]) for k in range(dx))
            + c0 + comev0
        )

        Qiu = _gj_inv(Quu)
        iK = [[-e for e in row] for row in _lmm(Qiu, Qux)]
        ikff = [-e for e in _lmv(Qiu, qu)]

        comeV_n = _sym([[Qxx[a][b] + sum(Qux[k][a] * iK[k][b] for k in range(du))
                         for b in range(dx)] for a in range(dx)])
        comev_n = [qx[a] + sum(Qux[k][a] * ikff[k] for k in range(du))
                   for a in range(dx)]
        comev0_n = q0 + 0.5 * sum(qu[k] * ikff[k] for k in range(du))

        S = [[goV_n[a][b] + comeV_n[a][b] for b in range(dx)] for a in range(dx)]
        r = [gov_n[a] + comev_n[a] for a in range(dx)]
        x_new = [-e for e in _lmv(_gj_inv(S), r)]

        for j in range(du):
            for c in range(dx):
                ik_ref[tloc, j * dx + c] = iK[j][c]
            ikff_ref[tloc, j] = ikff[j]
        for a in range(dx):
            for b in range(dx):
                comeV_ref[tloc, a * dx + b] = comeV_n[a][b]
            comev_ref[tloc, a] = comev_n[a]
        comev0_ref[tloc, 0] = comev0_n

        for c in range(dx):
            x_s[c] = x_new[c]
        for a in range(dx):
            for b in range(dx):
                V_s[a * dx + b] = comeV_n[a][b]
            v_s[a] = comev_n[a]
        v0_s[0] = comev0_n

    @pl.when(i == tc - 1)
    def _():
        for c in range(dx):
            xout_ref[c] = x_s[c]


def _backward_kernel(
    ik_ref, ikff_ref, comeV_ref, comev_ref, comeVT_ref, comevT_ref, xin_ref,
    k_ref, kff_ref, goV_ref, gov_ref, gov0_ref,
    goVT_ref, govT_ref, gov0T_ref, xout_ref,
    x_s, V_s, v_s, v0_s,
    *, env, dx, du, time_chunk, tc,
):
    """Cost-to-go sweep (elqr/elqr.py:112-160), streamed in reverse time.  At
    the first grid step the terminal value is quadratized at (x_in, 0) and the
    terminal state re-chosen against comeV_T; emits (K, kff, goV_t, gov_t,
    gov0_t) at row t and the re-chosen initial state."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        x_in = [xin_ref[c] for c in range(dx)]
        zeros_u = [jnp.zeros_like(x_in[0]) for _ in range(du)]
        goV_T, gov_T, gov0_T = _tile_quad_cost(env, x_in, zeros_u)
        comeV_T = [[comeVT_ref[a * dx + b] for b in range(dx)] for a in range(dx)]
        comev_T = [comevT_ref[c] for c in range(dx)]
        S = [[goV_T[a][b] + comeV_T[a][b] for b in range(dx)] for a in range(dx)]
        r = [gov_T[a] + comev_T[a] for a in range(dx)]
        x_new = [-e for e in _lmv(_gj_inv(S), r)]
        for a in range(dx):
            for b in range(dx):
                goVT_ref[a * dx + b] = goV_T[a][b]
                V_s[a * dx + b] = goV_T[a][b]
            govT_ref[a] = gov_T[a]
            v_s[a] = gov_T[a]
            xout_ref[a] = x_new[a]
            x_s[a] = x_new[a]
        gov0T_ref[0] = gov0_T
        v0_s[0] = gov0_T

    for tloc in range(time_chunk - 1, -1, -1):
        iK = [[ik_ref[tloc, j * dx + c] for c in range(dx)] for j in range(du)]
        ikff = [ikff_ref[tloc, j] for j in range(du)]
        comeV_t = [[comeV_ref[tloc, a * dx + b] for b in range(dx)]
                   for a in range(dx)]
        comev_t = [comev_ref[tloc, c] for c in range(dx)]
        x = [x_s[c] for c in range(dx)]
        goV_n = [[V_s[a * dx + b] for b in range(dx)] for a in range(dx)]
        gov_n = [v_s[c] for c in range(dx)]
        gov0_n = v0_s[0]

        u = [ikff[j] + sum(iK[j][c] * x[c] for c in range(dx)) for j in range(du)]
        xp = tile_inverse_dynamics(env, x, u)
        A, B, c_aff = _tile_lin(partial(tile_dynamics, env), xp, u)
        Cxx, cx, c0 = _tile_quad_cost(env, xp, u)
        Cuu = _cuu_tiles(env, x[0])

        AtV = _lmm(_lt(A), goV_n)
        Qxx = [[Cxx[a][b] + sum(AtV[a][k] * A[k][b] for k in range(dx))
                for b in range(dx)] for a in range(dx)]
        BtV = _lmm(_lt(B), goV_n)
        Quu = [[Cuu[a][b] + sum(BtV[a][k] * B[k][b] for k in range(dx))
                for b in range(du)] for a in range(du)]
        Qux = _lmm(BtV, A)
        Vc = _lmv(goV_n, c_aff)
        vec = [Vc[k] + gov_n[k] for k in range(dx)]
        qx = [cx[a] + sum(A[k][a] * vec[k] for k in range(dx)) for a in range(dx)]
        qu = [sum(B[k][a] * vec[k] for k in range(dx)) for a in range(du)]
        q0 = (
            c0 + gov0_n
            + 0.5 * sum(c_aff[k] * Vc[k] for k in range(dx))
            + sum(c_aff[k] * gov_n[k] for k in range(dx))
        )

        Qiu = _gj_inv(Quu)
        K = [[-e for e in row] for row in _lmm(Qiu, Qux)]
        kff = [-e for e in _lmv(Qiu, qu)]

        goV = _sym([[Qxx[a][b] + sum(Qux[k][a] * K[k][b] for k in range(du))
                     for b in range(dx)] for a in range(dx)])
        gov = [qx[a] + sum(Qux[k][a] * kff[k] for k in range(du))
               for a in range(dx)]
        gov0 = q0 + 0.5 * sum(qu[k] * kff[k] for k in range(du))

        S = [[goV[a][b] + comeV_t[a][b] for b in range(dx)] for a in range(dx)]
        r = [gov[a] + comev_t[a] for a in range(dx)]
        x_new = [-e for e in _lmv(_gj_inv(S), r)]

        for j in range(du):
            for c in range(dx):
                k_ref[tloc, j * dx + c] = K[j][c]
            kff_ref[tloc, j] = kff[j]
        for a in range(dx):
            for b in range(dx):
                goV_ref[tloc, a * dx + b] = goV[a][b]
            gov_ref[tloc, a] = gov[a]
        gov0_ref[tloc, 0] = gov0

        for c in range(dx):
            x_s[c] = x_new[c]
        for a in range(dx):
            for b in range(dx):
                V_s[a * dx + b] = goV[a][b]
            v_s[a] = gov[a]
        v0_s[0] = gov0

    @pl.when(i == tc - 1)
    def _():
        for c in range(dx):
            xout_ref[c] = x_s[c]


def _rollout_kernel(
    k_ref, kff_ref, x0_ref,
    ret_ref,
    x_s,
    *, env, dx, du, time_chunk, tc,
):
    """Evaluation rollout u = kff + Kx with the eLQR cost convention
    (elqr/elqr.py:53-65): cost on the RAW action (u_last = 0, a = 1), dynamics
    clip internally."""
    i = pl.program_id(1)
    uw = tuple(float(v) for v in env.uw)
    g = tuple(float(v) for v in env.g)
    gw = tuple(float(v) for v in env.gw)

    def stage_cost(x, u):
        z = env.features_parts(env._periodic_parts(x))
        return sum(uw[j] * u[j] * u[j] for j in range(len(u))) + sum(
            gw[k] * (z[k] - g[k]) ** 2 for k in range(len(z))
        )

    @pl.when(i == 0)
    def _():
        for c in range(dx):
            x_s[c] = x0_ref[c]
        ret_ref[...] = jnp.zeros_like(ret_ref)

    for tloc in range(time_chunk):
        K = [[k_ref[tloc, j * dx + c] for c in range(dx)] for j in range(du)]
        kff = [kff_ref[tloc, j] for j in range(du)]
        x = [x_s[c] for c in range(dx)]
        u = [kff[j] + sum(K[j][c] * x[c] for c in range(dx)) for j in range(du)]
        ret_ref[...] = ret_ref[...] + stage_cost(x, u)
        xn = tile_dynamics(env, x, u)
        for c in range(dx):
            x_s[c] = xn[c]

    @pl.when(i == tc - 1)
    def _():
        x = [x_s[c] for c in range(dx)]
        zeros_u = [jnp.zeros_like(x[0]) for _ in range(du)]
        ret_ref[...] = ret_ref[...] + stage_cost(x, zeros_u)


# --------------------------------------------------------------------------------------
# Host-side wrappers (lane-major operands)
# --------------------------------------------------------------------------------------


def _tspec(e, time_chunk, sub, reverse, tc):
    if reverse:
        return pl.BlockSpec(
            (time_chunk, e, sub, LANES),
            lambda b, i: (tc - 1 - i, 0, b, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (time_chunk, e, sub, LANES),
        lambda b, i: (i, 0, b, 0),
        memory_space=pltpu.VMEM,
    )


def _cspec(e, sub):
    return pl.BlockSpec((e, sub, LANES), lambda b, i: (0, b, 0),
                        memory_space=pltpu.VMEM)


def _stream_shapes(T, es, nsub, dtype):
    return [jax.ShapeDtypeStruct((T, e, nsub, LANES), dtype) for e in es]


def elqr_forward_pallas(env, K_l, kff_l, goVn_l, govn_l, x0_l, *,
                        time_chunk=None, interpret=False):
    """One forward sweep on lane-major streams.  ``goVn_l/govn_l`` rows hold
    goV_{t+1}/gov_{t+1}.  Returns (iK, ikff, comeV, comev, comev0 streams
    [rows = values at t+1], x_out)."""
    T, _, nsub, _ = K_l.shape
    dx = x0_l.shape[0]
    du = kff_l.shape[1]
    dtype = K_l.dtype
    if time_chunk is None:
        time_chunk = pick_time_chunk_elqr(T)
    tc = T // time_chunk
    sub = sub_block(nsub)

    kernel = partial(_forward_kernel, env=env, dx=dx, du=du,
                     time_chunk=time_chunk, tc=tc)
    ts = lambda e: _tspec(e, time_chunk, sub, False, tc)
    call = pl.pallas_call(
        kernel,
        grid=(nsub // sub, tc),
        in_specs=[ts(du * dx), ts(du), ts(dx * dx), ts(dx), _cspec(dx, sub)],
        out_specs=[ts(du * dx), ts(du), ts(dx * dx), ts(dx), ts(1),
                   _cspec(dx, sub)],
        out_shape=_stream_shapes(T, [du * dx, du, dx * dx, dx, 1], nsub, dtype)
        + [jax.ShapeDtypeStruct((dx, nsub, LANES), dtype)],
        scratch_shapes=[
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((dx * dx, sub, LANES), dtype),
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((1, sub, LANES), dtype),
        ],
        interpret=interpret,
    )
    return call(K_l, kff_l, goVn_l, govn_l, x0_l)


def elqr_backward_pallas(env, iK_l, ikff_l, comeV_l, comev_l, comeVT_l,
                         comevT_l, xin_l, *, time_chunk=None, interpret=False):
    """One backward sweep on lane-major streams.  ``comeV_l/comev_l`` rows hold
    comeV_t/comev_t for t < T; ``comeVT_l/comevT_l`` the terminal row.  Returns
    (K, kff, goV, gov, gov0 streams [rows = values at t], goV_T, gov_T, gov0_T,
    x_out)."""
    T, _, nsub, _ = iK_l.shape
    dx = xin_l.shape[0]
    du = ikff_l.shape[1]
    dtype = iK_l.dtype
    if time_chunk is None:
        time_chunk = pick_time_chunk_elqr(T)
    tc = T // time_chunk
    sub = sub_block(nsub)

    kernel = partial(_backward_kernel, env=env, dx=dx, du=du,
                     time_chunk=time_chunk, tc=tc)
    ts = lambda e: _tspec(e, time_chunk, sub, True, tc)
    call = pl.pallas_call(
        kernel,
        grid=(nsub // sub, tc),
        in_specs=[ts(du * dx), ts(du), ts(dx * dx), ts(dx),
                  _cspec(dx * dx, sub), _cspec(dx, sub), _cspec(dx, sub)],
        out_specs=[ts(du * dx), ts(du), ts(dx * dx), ts(dx), ts(1),
                   _cspec(dx * dx, sub), _cspec(dx, sub), _cspec(1, sub),
                   _cspec(dx, sub)],
        out_shape=_stream_shapes(T, [du * dx, du, dx * dx, dx, 1], nsub, dtype)
        + [
            jax.ShapeDtypeStruct((dx * dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((dx, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((1, nsub, LANES), dtype),
            jax.ShapeDtypeStruct((dx, nsub, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((dx * dx, sub, LANES), dtype),
            pltpu.VMEM((dx, sub, LANES), dtype),
            pltpu.VMEM((1, sub, LANES), dtype),
        ],
        interpret=interpret,
    )
    return call(iK_l, ikff_l, comeV_l, comev_l, comeVT_l, comevT_l, xin_l)


def elqr_rollout_pallas(env, K_l, kff_l, x0_l, *, time_chunk=None,
                        interpret=False):
    """Evaluation-rollout returns (nsub, LANES) for u = kff + Kx."""
    T, _, nsub, _ = K_l.shape
    dx = x0_l.shape[0]
    du = kff_l.shape[1]
    dtype = K_l.dtype
    if time_chunk is None:
        time_chunk = pick_time_chunk_elqr(T)
    tc = T // time_chunk
    sub = sub_block(nsub)

    kernel = partial(_rollout_kernel, env=env, dx=dx, du=du,
                     time_chunk=time_chunk, tc=tc)
    ts = lambda e: _tspec(e, time_chunk, sub, False, tc)
    call = pl.pallas_call(
        kernel,
        grid=(nsub // sub, tc),
        in_specs=[ts(du * dx), ts(du), _cspec(dx, sub)],
        out_specs=[pl.BlockSpec((sub, LANES), lambda b, i: (b, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nsub, LANES), dtype)],
        scratch_shapes=[pltpu.VMEM((dx, sub, LANES), dtype)],
        interpret=interpret,
    )
    return call(K_l, kff_l, x0_l)[0]


def pick_time_chunk_elqr(T: int, max_chunk: int = 4) -> int:
    """Largest divisor of T up to ``max_chunk`` (smaller default than the
    rollout kernels: the eLQR step body is ~10× bigger, so unrolling past 4
    inflates compile time for little pipeline gain)."""
    for c in range(max_chunk, 0, -1):
        if T % c == 0:
            return c
    return 1


def pack_elqr(K: Array, kff: Array, x0: Array):
    """Batch-leading eLQR operands → lane-major streams.  Args:
    ``K (N, T, du, dx)``, ``kff (N, T, du)``, ``x0 (N, dx)``."""
    N = K.shape[0]
    n_pad = lane_pad(N)
    return (
        _to_lanes(K, n_pad),
        _to_lanes(kff, n_pad),
        _to_lanes(x0[:, None, :], n_pad)[0],
    )
