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
from jax import Array, lax
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
    forward-mode columns.  ``jax.linearize`` evaluates the primal ONCE and
    replays only the (much cheaper) linear tangent map per column — the jvp-
    per-column form traced ~5 duplicated primals and leaned on Mosaic CSE to
    collapse them, which inflated compile time and left residual work."""
    ndx, ndu = len(x), len(u)
    ones = jnp.ones_like(x[0])
    zeros = jnp.zeros_like(x[0])
    f0, f_lin = jax.linearize(
        lambda xx, uu: f(xx, uu), list(x), list(u)
    )

    def col(seed_x, seed_u):
        return f_lin(seed_x, seed_u)

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

    z0_lin, j_lin = jax.linearize(lambda yy: env.features_parts(yy), y)

    def jcol(k):
        return j_lin([ones if i == k else zeros for i in range(ndx)])

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
# Shared per-step recursions (used by the streamed kernels AND the fused
# whole-solve kernel — byte-for-byte the same math, the `_bwd_step` trick of
# core/pallas_lqr.py)
# --------------------------------------------------------------------------------------


def _forward_step(env, dx, du, K, kff, goV_n, gov_n, x, comeV, comev, comev0):
    """One cost-to-come step (elqr/elqr.py:67-110) on (·, LANES) planes.
    Returns (iK, ikff, comeV_n, comev_n, comev0_n, x_new)."""
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
    return iK, ikff, comeV_n, comev_n, comev0_n, x_new


def _backward_step(env, dx, du, iK, ikff, comeV_t, comev_t, x,
                   goV_n, gov_n, gov0_n):
    """One cost-to-go step (elqr/elqr.py:112-160) on (·, LANES) planes.
    Returns (K, kff, goV, gov, gov0, x_new)."""
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
    return K, kff, goV, gov, gov0, x_new


def _terminal_step(env, dx, du, x_in, comeV_T, comev_T):
    """Terminal quadratization at (x_in, 0) + re-choice of x_T against the
    cost-to-come (elqr/elqr.py:112-125)."""
    zeros_u = [jnp.zeros_like(x_in[0]) for _ in range(du)]
    goV_T, gov_T, gov0_T = _tile_quad_cost(env, x_in, zeros_u)
    S = [[goV_T[a][b] + comeV_T[a][b] for b in range(dx)] for a in range(dx)]
    r = [gov_T[a] + comev_T[a] for a in range(dx)]
    x_new = [-e for e in _lmv(_gj_inv(S), r)]
    return goV_T, gov_T, gov0_T, x_new


def _stage_cost_tiles(env, x, u):
    """eLQR stage cost on tiles (elqr/elqr.py:53-65): raw action, a = 1."""
    uw = tuple(float(v) for v in env.uw)
    g = tuple(float(v) for v in env.g)
    gw = tuple(float(v) for v in env.gw)
    z = env.features_parts(env._periodic_parts(x))
    return sum(uw[j] * u[j] * u[j] for j in range(len(u))) + sum(
        gw[k] * (z[k] - g[k]) ** 2 for k in range(len(z))
    )


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

        iK, ikff, comeV_n, comev_n, comev0_n, x_new = _forward_step(
            env, dx, du, K, kff, goV_n, gov_n, x, comeV, comev, comev0
        )

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
        comeV_T = [[comeVT_ref[a * dx + b] for b in range(dx)] for a in range(dx)]
        comev_T = [comevT_ref[c] for c in range(dx)]
        goV_T, gov_T, gov0_T, x_new = _terminal_step(
            env, dx, du, x_in, comeV_T, comev_T
        )
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

        K, kff, goV, gov, gov0, x_new = _backward_step(
            env, dx, du, iK, ikff, comeV_t, comev_t, x, goV_n, gov_n, gov0_n
        )

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
    stage_cost = partial(_stage_cost_tiles, env)

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


# --------------------------------------------------------------------------------------
# Fused whole-solve kernel (the latency engine)
# --------------------------------------------------------------------------------------


def _row_planes(ref, t, e):
    """Row ``t`` of a ``(T, e, LANES)`` VMEM ref as ``e`` planes of (1, LANES)."""
    row = ref[pl.ds(t, 1)]
    return [row[:, p, :] for p in range(e)]


def _store_row(ref, t, planes):
    ref[pl.ds(t, 1)] = jnp.concatenate([p[:, None, :] for p in planes], axis=1)


def _as_mat(planes, n, m):
    return [[planes[a * m + b] for b in range(m)] for a in range(n)]


def _flatm(M):
    return [e for row in M for e in row]


def _solve_kernel(
    kff0_ref, x0_ref,
    kout_ref, kffout_ref, xs_ref, us_ref, rets_ref,
    K_s, kff_s, iK_s, ikff_s, comeV_s, comev_s, goV_s, gov_s,
    *, env, dx, du, T, nb_iter,
):
    """The ENTIRE eLQR solve — nb_iter × (forward sweep, terminal step,
    backward sweep, evaluation rollout) — in one kernel instance, batch on the
    128 lanes (one block per grid step).  Time is a ``lax.fori_loop`` with
    dynamic-row VMEM indexing (the `pallas_bsp` recipe), NOT a grid dimension,
    so the per-step math (`_forward_step`/`_backward_step`, shared
    byte-for-byte with the streamed kernels) never pays an XLA dispatch or a
    kernel-launch boundary.  Replaces ~3·nb_iter launches + a host rollout scan
    with ONE launch — the batch-≤128 latency path (elqr/elqr.py:179-201)."""
    x0 = [x0_ref[c:c + 1, :] for c in range(dx)]
    zero = jnp.zeros_like(x0[0])

    # per-block init (scratch persists across grid steps)
    K_s[...] = jnp.zeros(K_s.shape, K_s.dtype)
    kff_s[...] = kff0_ref[...]
    goV_s[...] = jnp.zeros(goV_s.shape, goV_s.dtype)
    gov_s[...] = jnp.zeros(gov_s.shape, gov_s.dtype)
    initV = [
        jnp.full_like(zero, 1e-16) if a == b else zero
        for a in range(dx) for b in range(dx)
    ]
    _store_row(comeV_s, 0, initV)
    _store_row(comev_s, 0, [zero] * dx)

    def rollout(store):
        def body(t, carry):
            x, ret = carry
            K = _as_mat(_row_planes(K_s, t, du * dx), du, dx)
            kff = _row_planes(kff_s, t, du)
            u = [kff[j] + sum(K[j][c] * x[c] for c in range(dx))
                 for j in range(du)]
            ret = ret + _stage_cost_tiles(env, list(x), u)
            if store:
                _store_row(xs_ref, t, list(x))
                _store_row(us_ref, t, u)
            xn = tile_dynamics(env, list(x), u)
            return (tuple(xn), ret)

        x, ret = lax.fori_loop(0, T, body, (tuple(x0), zero))
        ret = ret + _stage_cost_tiles(env, list(x), [zero] * du)
        if store:
            _store_row(xs_ref, T, list(x))
        return ret

    rets_ref[pl.ds(0, 1)] = rollout(False)

    def iteration(it, x_state):
        def fwd(t, carry):
            x, comeV_f, comev_f, comev0 = carry
            K = _as_mat(_row_planes(K_s, t, du * dx), du, dx)
            kff = _row_planes(kff_s, t, du)
            goV_n = _as_mat(_row_planes(goV_s, t + 1, dx * dx), dx, dx)
            gov_n = _row_planes(gov_s, t + 1, dx)
            iK, ikff, comeV_n, comev_n, comev0_n, x_new = _forward_step(
                env, dx, du, K, kff, goV_n, gov_n, list(x),
                _as_mat(list(comeV_f), dx, dx), list(comev_f), comev0,
            )
            _store_row(iK_s, t, _flatm(iK))
            _store_row(ikff_s, t, ikff)
            _store_row(comeV_s, t + 1, _flatm(comeV_n))
            _store_row(comev_s, t + 1, comev_n)
            return (tuple(x_new), tuple(_flatm(comeV_n)), tuple(comev_n),
                    comev0_n)

        carry_f = lax.fori_loop(
            0, T, fwd, (x_state, tuple(initV), (zero,) * dx, zero)
        )
        x_mid = carry_f[0]

        comeV_T = _as_mat(_row_planes(comeV_s, T, dx * dx), dx, dx)
        comev_T = _row_planes(comev_s, T, dx)
        goV_T, gov_T, gov0_T, x_term = _terminal_step(
            env, dx, du, list(x_mid), comeV_T, comev_T
        )
        _store_row(goV_s, T, _flatm(goV_T))
        _store_row(gov_s, T, gov_T)

        def bwd(i, carry):
            x, goV_f, gov_f, gov0 = carry
            t = T - 1 - i
            iK = _as_mat(_row_planes(iK_s, t, du * dx), du, dx)
            ikff = _row_planes(ikff_s, t, du)
            comeV_t = _as_mat(_row_planes(comeV_s, t, dx * dx), dx, dx)
            comev_t = _row_planes(comev_s, t, dx)
            K, kff, goV, gov, gov0_n, x_new = _backward_step(
                env, dx, du, iK, ikff, comeV_t, comev_t, list(x),
                _as_mat(list(goV_f), dx, dx), list(gov_f), gov0,
            )
            _store_row(K_s, t, _flatm(K))
            _store_row(kff_s, t, kff)
            _store_row(goV_s, t, _flatm(goV))
            _store_row(gov_s, t, gov)
            return (tuple(x_new), tuple(_flatm(goV)), tuple(gov), gov0_n)

        carry_b = lax.fori_loop(
            0, T, bwd,
            (tuple(x_term), tuple(_flatm(goV_T)), tuple(gov_T), gov0_T),
        )
        rets_ref[pl.ds(it + 1, 1)] = rollout(False)
        return carry_b[0]

    lax.fori_loop(0, nb_iter, iteration, tuple(x0))

    kout_ref[...] = K_s[...]
    kffout_ref[...] = kff_s[...]
    rollout(True)


def elqr_solve_fused_pallas(env, kff0_l, x0_l, nb_iter, *, interpret=False):
    """Whole-solve single-launch eLQR on lane-major operands.

    Args: ``kff0_l (T, du, nblk, LANES)``, ``x0_l (dx, nblk, LANES)``.
    Returns ``(K_l, kff_l, xs_l (T+1,…), us_l, rets (nb_iter+1, nblk, LANES))``
    with the exact iteration semantics of :func:`parallel.elqr.make_elqr_solver`.
    One grid step per 128-lane batch block; each block's solve runs start to
    finish inside the kernel (VMEM-resident streams, ~4 MB at T=100, dx=4)."""
    T, du, nblk, _ = kff0_l.shape
    dx = x0_l.shape[0]
    dtype = kff0_l.dtype
    if (T + 1) * (2 * dx * dx + 2 * dx + 2 * du * dx + 2 * du) * LANES * 4 \
            > 12 * 2**20:
        raise ValueError(f"T={T} too large for the VMEM-resident fused solve")

    kernel = partial(_solve_kernel, env=env, dx=dx, du=du, T=T,
                     nb_iter=nb_iter)
    ts = lambda e, L: pl.BlockSpec((L, e, None, LANES), lambda b: (0, 0, b, 0),
                                   memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            ts(du, T),
            pl.BlockSpec((dx, None, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            ts(du * dx, T), ts(du, T), ts(dx, T + 1), ts(du, T),
            pl.BlockSpec((nb_iter + 1, None, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, du * dx, nblk, LANES), dtype),
            jax.ShapeDtypeStruct((T, du, nblk, LANES), dtype),
            jax.ShapeDtypeStruct((T + 1, dx, nblk, LANES), dtype),
            jax.ShapeDtypeStruct((T, du, nblk, LANES), dtype),
            jax.ShapeDtypeStruct((nb_iter + 1, nblk, LANES), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, du * dx, LANES), dtype),
            pltpu.VMEM((T, du, LANES), dtype),
            pltpu.VMEM((T, du * dx, LANES), dtype),
            pltpu.VMEM((T, du, LANES), dtype),
            pltpu.VMEM((T + 1, dx * dx, LANES), dtype),
            pltpu.VMEM((T + 1, dx, LANES), dtype),
            pltpu.VMEM((T + 1, dx * dx, LANES), dtype),
            pltpu.VMEM((T + 1, dx, LANES), dtype),
        ],
        interpret=interpret,
    )
    return call(kff0_l, x0_l)


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
