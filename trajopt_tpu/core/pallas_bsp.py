"""Single-launch Pallas TPU kernels for belief-space iLQR (batch-1 latency).

TPU-native counterpart of the reference's flagship belief-space use case — the
light-dark MPC loop (examples/bspilqr/lightdark.py:24-45, kernel chain
bspilqr/src/util.cpp:83-204): at every control step, replan with BSP-iLQR from
the current belief (nb_iter iterations of belief-dynamics expansion → λ-escalated
(S, s, τ) backward → 11-α belief rollouts → accept/reject), apply the first
action on the true noisy system, fold the observation in with an EKF update.

As ``lax`` programs (parallel/bsp.py) one control step is ~500 sequential
dispatch groups of (2–4)-dim ops — dispatch-latency-bound at ~265 steps/s on a
v5e (BASELINE.md round-3 analysis).  Here the ENTIRE episode is ONE Pallas
launch; within it every phase rides the 128 vector lanes:

* **expansion** (lanes = time): the Jacobian of the flattened belief-EKF map
  (core/belief.belief_dynamics_expansion) and the cost quadratization are
  b+b²+du forward-mode ``jax.jvp`` columns of straight-line tile code evaluated
  for ALL horizon steps at once;
* **backward** (lanes = λ-trial): the λ-escalation while-loop of
  ``backward_with_lm`` (parallel/bsp.py) re-runs the whole T-step recursion per
  trial; its trial sequence is a *deterministic ladder* given (λ₀, Δλ₀), so all
  ``_NL`` candidate trials run at once, one per lane, and the first-successful
  trial is selected exactly as the sequential while would — one 25-step pass
  regardless of how far λ escalates;
* **rollouts** (lanes = α): the 11 line-search candidates advance together
  through the nonlinear belief-EKF step.

Every function here is pure plane math on ``(SUB, LANES)`` jnp arrays
(full canonical (8, 128) vregs — partial shapes acquire replicated Mosaic
layouts inside loop carries that select_n cannot reconcile), so the
SAME code runs (a) inside the Pallas kernels and (b) as a plain-jnp program for
CPU parity tests (:func:`run_bsp_solve_planes`, :func:`run_bsp_episode_planes`)
— the ``pallas_pscan`` testing recipe (its interpreter mode is pathological on
unrolled bodies; the jnp twin pins semantics instead, device parity lives in
tests/test_tpu.py).

Semantics mirror parallel/bsp.make_bsp_solver / make_bsp_mpc_runner (dense
value form, Joseph-form EKF) to roundoff; parity is pinned in
tests/test_pallas_bsp.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers.common import DEFAULT_ALPHAS
from .pscan_lqr import _lmm, _lmv, _lt

LANES = 128
SUB = 8  # full-vreg sublane rows: every plane is one canonical (8, 128) vreg
_NL = 16  # λ-ladder width; covers λ: 0 → >1e6 in ≤13 trials (see _lam_ladder)


# --------------------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------------------


@dataclass(frozen=True)
class BSPConfig:
    """Static solve configuration (mirrors make_bsp_solver's kwargs)."""

    T: int
    nb_iter: int
    b: int
    a: int
    do: int
    alphas: tuple
    lmbda: float = 1.0
    min_lmbda: float = 1e-6
    max_lmbda: float = 1e6
    mult_lmbda: float = 1.6
    tolfun: float = 1e-8
    tolgrad: float = 1e-6
    min_imp: float = 0.0
    reg: int = 1


def _cfg(env, T, nb_iter, **kw):
    return BSPConfig(
        T=T, nb_iter=nb_iter, b=env.belief_dim, a=env.act_dim, do=env.obs_dim,
        alphas=tuple(float(a) for a in kw.pop("alphas", DEFAULT_ALPHAS)), **kw,
    )


# --------------------------------------------------------------------------------------
# Small unrolled linear algebra on tiles (lists-of-lists of planes; python
# floats allowed as constant entries)
# --------------------------------------------------------------------------------------


def _madd(A, B):
    return [[A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def _sym_t(M):
    n = len(M)
    return [[0.5 * (M[i][j] + M[j][i]) for j in range(n)] for i in range(n)]


def _eye_t(n, one, zero):
    return [[one if i == j else zero for j in range(n)] for i in range(n)]


def _flat(M):
    return [M[i][j] for i in range(len(M)) for j in range(len(M[0]))]


def _mat(v, n, m):
    return [[v[i * m + j] for j in range(m)] for i in range(n)]


def _chol_t(M, n):
    """Unrolled lower Cholesky; NaN entries for non-PD inputs (mirror of
    ``jnp.linalg.cholesky`` failure semantics used by utils/psd.cholesky_ok)."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = M[j][j] - sum(L[j][k] * L[j][k] for k in range(j))
        L[j][j] = jnp.sqrt(d)
        for i in range(j + 1, n):
            L[i][j] = (
                M[i][j] - sum(L[i][k] * L[j][k] for k in range(j))
            ) / L[j][j]
    return L


def _chol_solve_vec(L, v, n):
    """(L Lᵀ) x = v via unrolled forward/back substitution
    (utils/psd.chol_solve)."""
    y = [None] * n
    for i in range(n):
        y[i] = (v[i] - sum(L[i][k] * y[k] for k in range(i))) / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = (y[i] - sum(L[k][i] * x[k] for k in range(i + 1, n))) / L[i][i]
    return x


def _chol_solve_mat(L, B, n):
    m = len(B[0])
    cols = [_chol_solve_vec(L, [B[i][j] for i in range(n)], n) for j in range(m)]
    return [[cols[j][i] for j in range(m)] for i in range(n)]


def _inv_psd_t(S, n, dtype):
    """Mirror of core/ekf._inv on tiles: symmetrize, f32-only relative jitter,
    Cholesky inverse (exact no-op jitter in f64)."""
    S = _sym_t(S)
    if dtype == jnp.float32:
        scale = sum(S[i][i] for i in range(n)) / n + 1e-12
        S = [[S[i][j] + (1e-5 * scale if i == j else 0.0) for j in range(n)]
             for i in range(n)]
    L = _chol_t(S, n)
    like = S[0][0]
    I = _eye_t(n, jnp.ones_like(like), jnp.zeros_like(like))
    return _chol_solve_mat(L, I, n)


def _psd_floor_t(M, n, dtype):
    """Mirror of core/ekf._psd_floor on tiles (f32 only)."""
    if dtype != jnp.float32:
        return M
    scale = sum(M[i][i] for i in range(n)) / n + 1e-12
    return [[M[i][j] + (1e-5 * scale if i == j else 0.0) for j in range(n)]
            for i in range(n)]


# --------------------------------------------------------------------------------------
# Belief-EKF step and expansions on tiles
# --------------------------------------------------------------------------------------


def _jac_cols(fn, x0, ndim):
    """Forward-mode Jacobian columns of ``fn`` (list → list) at ``x0``.

    ``jax.linearize``: ONE primal trace + a cheap linear tangent replay per
    column (the jvp-per-column form re-traced the primal ndim times and relied
    on Mosaic CSE to collapse the duplicates)."""
    ones = jnp.ones_like(x0[0])
    zeros = jnp.zeros_like(x0[0])
    _, f_lin = jax.linearize(fn, list(x0))
    cols = []
    for k in range(ndim):
        seed = [ones if i == k else zeros for i in range(ndim)]
        cols.append(f_lin(seed))
    return cols


def tile_belief_ekf_step(env, mu, sig, u, dtype):
    """One EKF predict + gain step of the belief dynamics on tiles — mirror of
    core/ekf.belief_ekf_step (reference bspilqr/objects.py:213-233).

    ``sig`` is the row-major flat list of b·b tiles.  Returns
    (f (b,), W (b·b,), Φ (b·b,)) flat lists."""
    b, do = env.belief_dim, env.obs_dim

    f = list(env.dynamics_parts(mu, u))
    colsA = _jac_cols(lambda m: list(env.dynamics_parts(m, u)), mu, b)
    A = [[colsA[k][i] for k in range(b)] for i in range(b)]
    colsH = _jac_cols(lambda xx: list(env.observe_parts(xx)), f, b)
    H = [[colsH[k][i] for k in range(b)] for i in range(do)]

    sigma_dyn = env.dyn_noise_parts(mu, u)
    sigma_obs = env.obs_noise_parts(f)
    Sig = _mat(sig, b, b)

    D = _sym_t(_madd(_lmm(_lmm(A, Sig), _lt(A)), sigma_dyn))
    S = _madd(_lmm(_lmm(H, D), _lt(H)), sigma_obs)
    Sinv = _inv_psd_t(S, do, dtype)
    K = _lmm(_lmm(D, _lt(H)), Sinv)

    W = _lmm(_lmm(K, H), D)
    KH = _lmm(K, H)
    one = jnp.ones_like(D[0][0])
    zero = jnp.zeros_like(D[0][0])
    I_KH = [[(one if i == j else zero) - KH[i][j] for j in range(b)]
            for i in range(b)]
    KRKt = _lmm(_lmm(K, sigma_obs), _lt(K))
    phi = _psd_floor_t(
        _sym_t(_madd(_lmm(_lmm(I_KH, D), _lt(I_KH)), KRKt)), b, dtype
    )
    return f, _flat(W), _flat(phi)


def tile_belief_expansion(env, mu_pl, sig_pl, u_pl, dtype):
    """Jacobian blocks of the flattened belief-EKF map wrt (μ, vecΣ, u) on
    planes with lanes = t — mirror of core/belief.belief_dynamics_expansion.

    Returns (F, G, X, Y, Z, T_, U, V) as lists-of-lists of planes."""
    b, a = env.belief_dim, env.act_dim
    bb = b * b
    n_in = b + bb + a

    def fn(z):
        m, s, uu = z[:b], z[b:b + bb], z[b + bb:]
        f, W, phi = tile_belief_ekf_step(env, m, s, uu, dtype)
        return list(f) + list(W) + list(phi)

    z0 = list(mu_pl) + list(sig_pl) + list(u_pl)
    cols = _jac_cols(fn, z0, n_in)

    F = [[cols[k][i] for k in range(b)] for i in range(b)]
    G = [[cols[b + bb + k][i] for k in range(a)] for i in range(b)]
    X = [[cols[k][b + i] for k in range(b)] for i in range(bb)]
    Y = [[cols[b + k][b + i] for k in range(bb)] for i in range(bb)]
    Z = [[cols[b + bb + k][b + i] for k in range(a)] for i in range(bb)]
    T_ = [[cols[k][b + bb + i] for k in range(b)] for i in range(bb)]
    U = [[cols[b + k][b + bb + i] for k in range(bb)] for i in range(bb)]
    V = [[cols[b + bb + k][b + bb + i] for k in range(a)] for i in range(bb)]
    return F, G, X, Y, Z, T_, U, V


def tile_belief_cost_expansion(env, mu_pl, sig_pl, u_pl):
    """Raw quadratic expansion of the belief cost on planes with lanes = t —
    mirror of core/belief.belief_cost_expansion (nested forward-mode columns;
    the reference belief costs are quadratic, so XLA/Mosaic folds most of it).

    Returns (Q, q, R, r, P, p): Q (b,b), q (b,), R (a,a), r (a,), P (b,a),
    p (b·b,) lists of planes."""
    b, a = env.belief_dim, env.act_dim
    bb = b * b
    n_in = b + bb + a

    def c(z):
        return env.belief_cost_parts(z[:b], z[b:b + bb], z[b + bb:])

    z0 = list(mu_pl) + list(sig_pl) + list(u_pl)
    ones = jnp.ones_like(mu_pl[0])
    zeros = jnp.zeros_like(mu_pl[0])

    def grad(z):
        _, c_lin = jax.linearize(c, list(z))
        g = []
        for k in range(n_in):
            seed = [ones if i == k else zeros for i in range(n_in)]
            g.append(c_lin(seed))
        return g

    g = grad(z0)
    q = g[:b]
    p = g[b:b + bb]
    r = g[b + bb:]

    _, g_lin = jax.linearize(grad, z0)
    hcols = []
    for k in list(range(b)) + list(range(b + bb, n_in)):
        seed = [ones if i == k else zeros for i in range(n_in)]
        hcols.append(g_lin(seed))
    Q = [[hcols[j][i] for j in range(b)] for i in range(b)]
    R = [[hcols[b + j][b + bb + i] for j in range(a)] for i in range(a)]
    P = [[hcols[b + j][i] for j in range(a)] for i in range(b)]
    return Q, q, R, r, P, p


# --------------------------------------------------------------------------------------
# λ-ladder backward pass (lanes = trial)
# --------------------------------------------------------------------------------------


def _lam_ladder(lmbda, dlmbda, cfg):
    """The deterministic λ-escalation sequence of backward_with_lm
    (parallel/bsp.py): trial k runs at λ_k; on divergence
    Δλ_{k+1} = max(Δλ_k·mult, mult), λ_{k+1} = max(λ_k·Δλ_{k+1}, min_λ).

    Δλ_k ≥ mult^k, so λ_k ≥ min_λ·mult^{k(k+1)/2−1}: from the worst start
    (λ₀ = 0 → λ₁ = 1e-6) trial 12 exceeds max_λ = 1e6 — _NL = 16 always
    contains the while-loop's exit trial."""
    lams, dls = [lmbda], [dlmbda]
    for _ in range(_NL):
        dln = jnp.maximum(dls[-1] * cfg.mult_lmbda, cfg.mult_lmbda)
        lams.append(jnp.maximum(lams[-1] * dln, cfg.min_lmbda))
        dls.append(dln)
    return lams, dls


def _lane_iota(dtype=jnp.int32):
    return lax.broadcasted_iota(dtype, (SUB, LANES), 1)


def _scalars_to_lanes(vals, like):
    """Plane whose lane k holds the traced scalar vals[k] (k < len(vals))."""
    li = _lane_iota()
    acc = jnp.zeros((SUB, LANES), like.dtype)
    for k, v in enumerate(vals):
        acc = jnp.where(li == k, v, acc)
    return acc


def _ext(pl_, t):
    """Lane-t value of a lanes=t plane as a lane-REPLICATED (SUB, 1) value.

    Implemented as a masked cross-lane sum rather than a slice: Mosaic marks
    reduction outputs replicated, while a ``pl[:, t:t+1]`` slice is lane-0-
    resident — such values demote every loop carry they touch to a
    non-replicated layout, and a later ``select_n`` against replicated
    constants then dies with "Invalid relayout" (observed in the episode
    kernel; the masks are constants for the static t used everywhere here)."""
    mask = _lane_iota() == t
    return jnp.sum(jnp.where(mask, pl_, jnp.zeros_like(pl_)), axis=1,
                   keepdims=True)


def _pick(pl_, mask):
    """Masked single-lane extraction: Σ_lanes mask·plane → (1, 1)."""
    return jnp.sum(jnp.where(mask, pl_, jnp.zeros_like(pl_)), axis=1,
                   keepdims=True)


def _ladder_backward(cost_pl, dyn_pl, lam_plane, cfg, dtype):
    """The (S, s, τ) belief-value backward recursion (core/belief.bsp_backward,
    reference bspilqr/src/util.cpp:83-204 with the τ-index fix), evaluated for
    every λ-ladder trial at once: all values are (1, LANES) planes whose lane k
    is trial k; expansion inputs enter as lane-t extracts that broadcast across
    trials.  Returns (Kts, kffts, dS0, dS1, bad) with Kts[t] a (a, b)
    list-of-lists of per-trial planes."""
    T, b, a = cfg.T, cfg.b, cfg.a
    bb = b * b
    Q_pl, q_pl, R_pl, r_pl, P_pl, p_pl = cost_pl
    F_pl, G_pl, X_pl, Y_pl, Z_pl, T_pl, U_pl, V_pl = dyn_pl

    # extracts MUST be the masked-reduction _ext: a raw lane slice here gives
    # Mosaic a non-replicated layout that later dies with "Invalid relayout"
    # when these values reach the fori_loop carries (regressed once — r4)
    def emat(M, t):
        return [[_ext(M[i][j], t) for j in range(len(M[0]))]
                for i in range(len(M))]

    def evec(v, t):
        return [_ext(v[i], t) for i in range(len(v))]

    zero = jnp.zeros((SUB, LANES), dtype)
    one_t = jnp.ones((SUB, 1), dtype)
    zero_t = jnp.zeros((SUB, 1), dtype)

    S = emat(Q_pl, T)
    s = evec(q_pl, T)
    tau = evec(p_pl, T)
    dS0 = zero
    dS1 = zero
    bad = jnp.zeros((SUB, LANES), bool)

    Kts = [None] * T
    kffts = [None] * T

    for t in reversed(range(T)):
        Q = emat(Q_pl, t)
        q = evec(q_pl, t)
        R = emat(R_pl, t)
        r = evec(r_pl, t)
        P = emat(P_pl, t)
        p = evec(p_pl, t)
        F = emat(F_pl, t)
        G = emat(G_pl, t)
        X = emat(X_pl, t)
        Y = emat(Y_pl, t)
        Z = emat(Z_pl, t)
        T_ = emat(T_pl, t)
        U = emat(U_pl, t)
        V = emat(V_pl, t)

        FtS = _lmm(_lt(F), S)
        GtS = _lmm(_lt(G), S)
        D = _madd(R, _lmm(GtS, G))
        # E = (P + Fᵀ S G)ᵀ — an (a, b) block
        E = _lt(_madd(P, _lmm(FtS, G)))

        vecS = _flat(S)
        c_ = [
            q[i] + _lmv(_lt(F), s)[i] + _lmv(_lt(T_), tau)[i]
            + 0.5 * _lmv(_lt(X), vecS)[i]
            for i in range(b)
        ]
        d_ = [
            r[j] + _lmv(_lt(G), s)[j] + _lmv(_lt(V), tau)[j]
            + 0.5 * _lmv(_lt(Z), vecS)[j]
            for j in range(a)
        ]
        e_ = [
            p[i] + _lmv(_lt(U), tau)[i] + 0.5 * _lmv(_lt(Y), vecS)[i]
            for i in range(bb)
        ]

        if cfg.reg == 2:
            S_reg = [[S[i][j] + (lam_plane if i == j else 0.0)
                      for j in range(b)] for i in range(b)]
            E_reg = _lt(_madd(P, _lmm(_lmm(_lt(F), S_reg), G)))
            D_reg = _madd(R, _lmm(_lmm(_lt(G), S_reg), G))
        else:
            E_reg = E
            D_reg = [[D[i][j] + (lam_plane if i == j else 0.0)
                      for j in range(a)] for i in range(a)]

        L = _chol_t(_sym_t(D_reg), a)
        fin = [[jnp.isfinite(L[i][j]) for j in range(i + 1)] for i in range(a)]
        step_ok = jnp.ones((SUB, LANES), bool)
        for i in range(a):
            for j in range(i + 1):
                step_ok = step_ok & fin[i][j]
        # per-entry safe replacement (bsp_backward: where(isfinite, chol, I))
        Ls = [[jnp.where(fin[i][j], L[i][j], one_t if i == j else zero_t)
               for j in range(i + 1)] for i in range(a)]
        Ls = [[Ls[i][j] if j <= i else 0.0 for j in range(a)] for i in range(a)]

        K = [[-v for v in row] for row in _chol_solve_mat(Ls, E_reg, a)]
        kff = [-v for v in _chol_solve_vec(Ls, d_, a)]

        Dk = _lmv(D, kff)
        dS0 = dS0 + sum(kff[j] * d_[j] for j in range(a))
        dS1 = dS1 + 0.5 * sum(kff[j] * Dk[j] for j in range(a))

        KtD = _lmm(_lt(K), D)
        s = [
            c_[i] + _lmv(KtD, kff)[i] + _lmv(_lt(K), d_)[i]
            + _lmv(_lt(E), kff)[i]
            for i in range(b)
        ]
        S = _sym_t(
            _madd(
                _madd(_madd(Q, _lmm(FtS, F)), _lmm(KtD, K)),
                _madd(_lmm(_lt(K), E), _lmm(_lt(E), K)),
            )
        )
        tau = e_
        bad = bad | ~step_ok

        Kts[t] = K
        kffts[t] = kff
    return Kts, kffts, dS0, dS1, bad


def _backward_with_lm_planes(cost_pl, dyn_pl, lmbda, dlmbda, cfg, dtype):
    """backward_with_lm (parallel/bsp.py) with the whole λ-escalation ladder on
    lanes: one T-step pass, then select the first trial the sequential while
    would have exited on.  ``lmbda``/``dlmbda`` are (1, 1) planes.  Returns
    (K_pl lanes=t, kff_pl lanes=t, dS0, dS1, λ, Δλ, diverged) — scalars as
    (1, 1) planes."""
    T, b, a = cfg.T, cfg.b, cfg.a
    lams, dls = _lam_ladder(lmbda, dlmbda, cfg)
    like = jnp.zeros((SUB, LANES), dtype)
    lam_plane = _scalars_to_lanes(lams[:_NL], like)
    lamnext_plane = _scalars_to_lanes(lams[1:_NL + 1], like)
    dl_plane = _scalars_to_lanes(dls[:_NL], like)
    dlnext_plane = _scalars_to_lanes(dls[1:_NL + 1], like)

    Kts, kffts, dS0, dS1, bad = _ladder_backward(
        cost_pl, dyn_pl, lam_plane, cfg, dtype
    )

    li = _lane_iota()
    valid = li < _NL
    # while-loop exit at trial k: success (~bad_k) or the NEXT λ exceeds max
    sel = (~bad | (lamnext_plane > cfg.max_lmbda)) & valid
    idx = jnp.min(jnp.where(sel, li, _NL), axis=1, keepdims=True)
    mask = li == idx

    div_sel = _pick(bad.astype(dtype), mask) > 0.5
    lam_sel = _pick(lam_plane, mask)
    # a trial only *ran* if its λ ≤ max (λ₀ > max ⇒ backward_with_lm returns
    # the un-escalated dummy with diverged = False)
    diverged = div_sel & (lam_sel <= cfg.max_lmbda)
    lam_out = jnp.where(diverged, _pick(lamnext_plane, mask), lam_sel)
    dl_out = jnp.where(diverged, _pick(dlnext_plane, mask), _pick(dl_plane, mask))

    lane_masks = [li == t for t in range(T)]
    K_pl = [[jnp.zeros((SUB, LANES), dtype) for _ in range(b)] for _ in range(a)]
    kff_pl = [jnp.zeros((SUB, LANES), dtype) for _ in range(a)]
    for t in range(T):
        for j in range(a):
            kff_pl[j] = jnp.where(lane_masks[t], _pick(kffts[t][j], mask),
                                  kff_pl[j])
            for c_ in range(b):
                K_pl[j][c_] = jnp.where(
                    lane_masks[t], _pick(Kts[t][j][c_], mask), K_pl[j][c_]
                )
    return (K_pl, kff_pl, _pick(dS0, mask), _pick(dS1, mask),
            lam_out, dl_out, diverged)


# --------------------------------------------------------------------------------------
# α-grid belief rollouts (lanes = α)
# --------------------------------------------------------------------------------------


def _forward_all_planes(env, K_pl, kff_pl, mu0, sig0, bref_mu_pl, uref_pl,
                        cfg, dtype):
    """forward_all (parallel/bsp.py): the α-candidate belief rollouts, all
    candidates on lanes.  ``mu0``/``sig0`` are (1, 1) plane lists; gains and
    references are lanes=t planes.  Returns (store, ret, finite): ``store[t]``
    = (mu list, sig list, u list) of lanes=α planes (t = 0..T; u empty at T),
    ``ret`` per-α returns, ``finite`` the init-rollout blow-up flag."""
    T, b, a = cfg.T, cfg.b, cfg.a
    nA = len(cfg.alphas)
    like = jnp.zeros((SUB, LANES), dtype)
    alpha_plane = _scalars_to_lanes(
        [jnp.asarray(al, dtype) for al in cfg.alphas], like
    )

    mu = [m + like for m in mu0]
    sig = [sv + like for sv in sig0]
    ret = like
    finite = jnp.ones((SUB, LANES), bool)
    store = [None] * (T + 1)

    for t in range(T):
        # masked-reduction _ext only — see the layout note in _ladder_backward
        Kt = [[_ext(K_pl[j][c_], t) for c_ in range(b)] for j in range(a)]
        kfft = [_ext(kff_pl[j], t) for j in range(a)]
        murt = [_ext(bref_mu_pl[i], t) for i in range(b)]
        urt = [_ext(uref_pl[j], t) for j in range(a)]

        u = [
            urt[j] + alpha_plane * kfft[j]
            + sum(Kt[j][c_] * (mu[c_] - murt[c_]) for c_ in range(b))
            for j in range(a)
        ]
        c_step = env.belief_cost_parts(mu, sig, u)
        store[t] = (list(mu), list(sig), list(u))
        ret = ret + c_step
        for i in range(b):
            finite = finite & (mu[i] < 1e8)

        f, W, phi = tile_belief_ekf_step(env, mu, sig, u, dtype)
        mu, sig = list(f), list(phi)

    zeros_u = [0.0] * a
    c_T = env.belief_cost_parts(mu, sig, zeros_u)
    ret = ret + c_T
    store[T] = (list(mu), list(sig), [])
    for i in range(b):
        finite = finite & (mu[i] < 1e8)
    return store, ret, finite


def _transpose_store(store, mask_idx, cfg, dtype):
    """Masked α-selection + lanes=α → lanes=t relayout of a rollout store:
    the accepted candidate's trajectory becomes the next reference planes."""
    T, b, a = cfg.T, cfg.b, cfg.a
    bb = b * b
    li = _lane_iota()
    bref_mu = [jnp.zeros((SUB, LANES), dtype) for _ in range(b)]
    bref_sig = [jnp.zeros((SUB, LANES), dtype) for _ in range(bb)]
    uref = [jnp.zeros((SUB, LANES), dtype) for _ in range(a)]
    for t in range(T + 1):
        m_t = li == t
        mus, sigs, us = store[t]
        for i in range(b):
            bref_mu[i] = jnp.where(m_t, _pick(mus[i], mask_idx), bref_mu[i])
        for i in range(bb):
            bref_sig[i] = jnp.where(m_t, _pick(sigs[i], mask_idx), bref_sig[i])
        for j in range(len(us)):
            uref[j] = jnp.where(m_t, _pick(us[j], mask_idx), uref[j])
    return bref_mu, bref_sig, uref


# --------------------------------------------------------------------------------------
# The full solve on planes
# --------------------------------------------------------------------------------------


def _solve_core(env, mu0, sig0, kff0_pl, cfg, dtype):
    """make_bsp_solver's ``solve`` as pure plane math.  ``mu0``/``sig0`` are
    (1, 1) plane lists; ``kff0_pl`` lanes=t planes (or None → zeros).  Returns
    (bref_mu, bref_sig, uref, K_pl, kff_pl, λ, Δλ, last_return, done, trace)
    — trace lanes = iteration."""
    T, b, a = cfg.T, cfg.b, cfg.a
    nA = len(cfg.alphas)
    li = _lane_iota()
    zero = jnp.zeros((SUB, LANES), dtype)

    # NOTE on shapes: μ₀/Σ₀ enter as (SUB, 1) values — lane-broadcastable
    # (Mosaic implements lane broadcast; (1, 1) values hit "Not implemented:
    # Sublane broadcast" and (SUB, LANES) loop-carried values hit "Invalid
    # relayout" when selected against replicated constants)
    if kff0_pl is None:
        kff0_pl = [zero for _ in range(a)]
    K0_pl = [[zero for _ in range(b)] for _ in range(a)]

    # init rollout: zero references, bref_mu row 0 = mu0 (solve():216-236)
    bref_mu0 = [jnp.where(li == 0, mu0[i], zero) for i in range(b)]
    uref0 = [zero for _ in range(a)]
    store, ret, finite = _forward_all_planes(
        env, K0_pl, kff0_pl, mu0, sig0, bref_mu0, uref0, cfg, dtype
    )
    validA = li < nA
    fin_valid = finite & validA
    any_fin = jnp.max(fin_valid.astype(dtype), axis=1, keepdims=True) > 0.5
    first_fin = jnp.min(jnp.where(fin_valid, li, nA), axis=1, keepdims=True)
    idx0 = jnp.where(any_fin, first_fin, 0)  # argmax(all-False) = 0
    mask0 = li == idx0
    bref_mu, bref_sig, uref = _transpose_store(store, mask0, cfg, dtype)
    last_return = _pick(ret, mask0)

    one_t = jnp.ones((SUB, 1), dtype)
    state = (
        bref_mu, bref_sig, uref, K0_pl, kff0_pl,
        cfg.lmbda * one_t, one_t, last_return,
        # `done` carried as f32 0/1 — Mosaic cannot carry i1 vectors through
        # scf.for (the fori_loop lowering); predicates are rebuilt by > 0.5
        jnp.zeros((SUB, 1), dtype), zero,  # done, trace
    )

    def iteration(i, state):
        (bref_mu, bref_sig, uref, K_st, kff_st, lmbda, dlmbda,
         last_return, done_f, trace) = state
        done = done_f > 0.5

        cost_pl = tile_belief_cost_expansion(env, bref_mu, bref_sig, uref)
        dyn_pl = tile_belief_expansion(env, bref_mu, bref_sig, uref, dtype)
        K_pl, kff_pl, dS0, dS1, lam, dlam, diverged = _backward_with_lm_planes(
            cost_pl, dyn_pl, lmbda, dlmbda, cfg, dtype
        )
        backpass_done = ~diverged

        # g_norm = mean_j max_t |kff|/(|uref|+1)  (iteration():165-168)
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        validT = li < cfg.T
        g_norm = sum(
            jnp.max(
                jnp.where(validT,
                          jnp.abs(kff_pl[j]) / (jnp.abs(uref[j]) + 1.0),
                          neg_inf),
                axis=1, keepdims=True,
            )
            for j in range(a)
        ) / a
        grad_done = (g_norm < cfg.tolgrad) & (lam < 1e-5)

        mu0_i = [_ext(bref_mu[i], 0) for i in range(b)]
        sig0_i = [_ext(bref_sig[i], 0) for i in range(b * b)]
        store, ret, _ = _forward_all_planes(
            env, K_pl, kff_pl, mu0_i, sig0_i, bref_mu, uref, cfg, dtype
        )
        dreturns = last_return - ret
        alpha_plane = _scalars_to_lanes(
            [jnp.asarray(al, dtype) for al in cfg.alphas], zero
        )
        expected = -1.0 * alpha_plane * (dS0 + alpha_plane * dS1)
        imp = dreturns / expected
        ok = (
            (imp > cfg.min_imp) & backpass_done & jnp.isfinite(ret) & validA
        )
        any_ok = jnp.max(ok.astype(dtype), axis=1, keepdims=True) > 0.5
        first_ok = jnp.min(jnp.where(ok, li, nA), axis=1, keepdims=True)
        idx = jnp.where(any_ok, first_ok, 0)
        mask_idx = li == idx
        ret_idx = _pick(ret, mask_idx)
        dret_idx = last_return - ret_idx

        dl_acc = jnp.minimum(dlam / cfg.mult_lmbda, 1.0 / cfg.mult_lmbda)
        lam_acc = lam * dl_acc * (lam > cfg.min_lmbda)
        dl_rej = jnp.maximum(dlam * cfg.mult_lmbda, cfg.mult_lmbda)
        lam_rej = jnp.maximum(lam * dl_rej, cfg.min_lmbda)

        take = any_ok & ~grad_done
        nb_mu, nb_sig, nb_u = _transpose_store(store, mask_idx, cfg, dtype)

        def sel(a_, b_):
            return jnp.where(take, a_, b_)

        new = (
            [sel(nb_mu[i], bref_mu[i]) for i in range(b)],
            [sel(nb_sig[i], bref_sig[i]) for i in range(b * b)],
            [sel(nb_u[j], uref[j]) for j in range(a)],
            [[sel(K_pl[j][c_], K_st[j][c_]) for c_ in range(b)]
             for j in range(a)],
            [sel(kff_pl[j], kff_st[j]) for j in range(a)],
            sel(lam_acc, lam_rej),
            sel(dl_acc, dl_rej),
            sel(ret_idx, last_return),
        )
        new_done = (
            grad_done | (take & (dret_idx < cfg.tolfun))
            | (~any_ok & (lam_rej > cfg.max_lmbda))
        )
        old = (bref_mu, bref_sig, uref, K_st, kff_st, lmbda, dlmbda,
               last_return)
        # frozen instances keep their state; `done` (a float 0/1 carry) merges
        # by max — identical to where(done, done, new_done) without an i1
        # vector carry/select Mosaic cannot lower
        frozen = jax.tree.map(lambda o, n: jnp.where(done, o, n), old, new)
        done_out = jnp.maximum(done_f, new_done.astype(dtype))
        trace = jnp.where(li == i, frozen[7], trace)
        return (*frozen, done_out, trace)

    state = lax.fori_loop(0, cfg.nb_iter, iteration, state)
    return state


# --------------------------------------------------------------------------------------
# EKF-in-the-loop MPC episode on planes
# --------------------------------------------------------------------------------------


def _ekf_predict_innovate(env, mu, cov, u, z, dtype):
    """EKF.inference on tiles (core/ekf.py:141-159): predict at (μ, u), then a
    Joseph-form innovate against observation ``z``."""
    b, do = env.belief_dim, env.obs_dim
    mu_p = list(env.dynamics_parts(mu, u))
    colsA = _jac_cols(lambda m: list(env.dynamics_parts(m, u)), mu, b)
    A = [[colsA[k][i] for k in range(b)] for i in range(b)]
    cov_p = _sym_t(_madd(_lmm(_lmm(A, _mat(cov, b, b)), _lt(A)),
                         env.dyn_noise_parts(mu, u)))

    colsH = _jac_cols(lambda xx: list(env.observe_parts(xx)), mu_p, b)
    H = [[colsH[k][i] for k in range(b)] for i in range(do)]
    Rn = env.obs_noise_parts(mu_p)
    S = _madd(_lmm(_lmm(H, cov_p), _lt(H)), Rn)
    K = _lmm(_lmm(cov_p, _lt(H)), _inv_psd_t(S, do, dtype))
    y = list(env.observe_parts(mu_p))
    innov = [z[i] - y[i] for i in range(do)]
    mu_n = [mu_p[i] + _lmv(K, innov)[i] for i in range(b)]
    KH = _lmm(K, H)
    one = jnp.ones_like(cov_p[0][0])
    zero = jnp.zeros_like(cov_p[0][0])
    I_KH = [[(one if i == j else zero) - KH[i][j] for j in range(b)]
            for i in range(b)]
    cov_n = _psd_floor_t(
        _sym_t(_madd(_lmm(_lmm(I_KH, cov_p), _lt(I_KH)),
                     _lmm(_lmm(K, Rn), _lt(K)))), b, dtype,
    )
    return mu_n, _flat(cov_n)


def _ekf_innovate(env, mu, cov, z, dtype):
    """EKF.innovate on tiles (no predict) — the initial observation fold-in."""
    b, do = env.belief_dim, env.obs_dim
    colsH = _jac_cols(lambda xx: list(env.observe_parts(xx)), mu, b)
    H = [[colsH[k][i] for k in range(b)] for i in range(do)]
    Rn = env.obs_noise_parts(mu)
    covm = _mat(cov, b, b)
    S = _madd(_lmm(_lmm(H, covm), _lt(H)), Rn)
    K = _lmm(_lmm(covm, _lt(H)), _inv_psd_t(S, do, dtype))
    y = list(env.observe_parts(mu))
    innov = [z[i] - y[i] for i in range(do)]
    mu_n = [mu[i] + _lmv(K, innov)[i] for i in range(b)]
    KH = _lmm(K, H)
    one = jnp.ones_like(covm[0][0])
    zero = jnp.zeros_like(covm[0][0])
    I_KH = [[(one if i == j else zero) - KH[i][j] for j in range(b)]
            for i in range(b)]
    cov_n = _psd_floor_t(
        _sym_t(_madd(_lmm(_lmm(I_KH, covm), _lt(I_KH)),
                     _lmm(_lmm(K, Rn), _lt(K)))), b, dtype,
    )
    return mu_n, _flat(cov_n)


def _noisy(mean, cov_t, eps, n):
    """mean + chol(cov)·ε on tiles — the multivariate-normal draw of
    BeliefEnv.step with the standard normals supplied by the caller."""
    L = _chol_t(_sym_t(cov_t), n)
    return [mean[i] + sum(L[i][k] * eps[k] for k in range(i + 1))
            for i in range(n)]


def _episode_core(env, x0, eps0, eps_dyn, eps_obs, cfg, nb_steps, dtype,
                  init_belief):
    """make_bsp_mpc_runner's episode (parallel/bsp.py:516-549; reference
    examples/bspilqr/lightdark.py:24-45) as pure plane math.  ``x0``/``eps0``
    are (1, 1) plane lists; ``eps_dyn``/``eps_obs`` lanes=step planes of
    standard normals; ``init_belief`` the (μ₀ floats, Σ₀ floats) pair hoisted
    out of the trace (env.init() builds jnp constants that would be tracers
    here).  Returns (xs, mus, sigmas, us, cs) lanes=step planes."""
    b, a, do = env.belief_dim, env.act_dim, env.obs_dim
    bb = b * b
    li = _lane_iota()
    zero = jnp.zeros((SUB, LANES), dtype)

    mu0_vals, sig0_vals = init_belief
    mu0 = [jnp.full((SUB, 1), mu0_vals[i], dtype) for i in range(b)]
    sig0 = [jnp.full((SUB, 1), sig0_vals[i], dtype) for i in range(b * b)]

    obs0 = _noisy(list(env.observe_parts(x0)), env.obs_noise_parts(x0), eps0,
                  do)
    mu_b, cov_b = _ekf_innovate(env, mu0, sig0, obs0, dtype)

    xs = [zero for _ in range(b)]
    mus = [zero for _ in range(b)]
    sigmas = [zero for _ in range(bb)]
    us = [zero for _ in range(a)]
    cs = zero

    def step(s, carry):
        x, mu_b, cov_b, xs, mus, sigmas, us, cs = carry
        m_s = li == s

        solved = _solve_core(env, mu_b, cov_b, None, cfg, dtype)
        uref = solved[2]
        u = [_ext(uref[j], 0) for j in range(a)]
        c = env.belief_cost_parts(mu_b, cov_b, u)

        eps_d = [_pick(eps_dyn[i], m_s) for i in range(b)]
        eps_o = [_pick(eps_obs[i], m_s) for i in range(do)]
        xn = _noisy(list(env.dynamics_parts(x, u)),
                    env.dyn_noise_parts(x, u), eps_d, b)
        obs = _noisy(list(env.observe_parts(xn)), env.obs_noise_parts(xn),
                     eps_o, do)
        mu_n, cov_n = _ekf_predict_innovate(env, mu_b, cov_b, u, obs, dtype)

        xs = [jnp.where(m_s, x[i], xs[i]) for i in range(b)]
        mus = [jnp.where(m_s, mu_b[i], mus[i]) for i in range(b)]
        sigmas = [jnp.where(m_s, cov_b[i], sigmas[i]) for i in range(bb)]
        us = [jnp.where(m_s, u[j], us[j]) for j in range(a)]
        cs = jnp.where(m_s, c, cs)
        return xn, mu_n, cov_n, xs, mus, sigmas, us, cs

    # the belief/state carries stay (SUB, 1) lane-broadcastable values (see
    # the shape note in _solve_core)
    carry = (list(x0), list(mu_b), list(cov_b), xs, mus, sigmas, us, cs)
    x, mu_b, cov_b, xs, mus, sigmas, us, cs = lax.fori_loop(
        0, nb_steps, step, carry
    )
    m_T = li == nb_steps
    xs = [jnp.where(m_T, x[i], xs[i]) for i in range(b)]
    mus = [jnp.where(m_T, mu_b[i], mus[i]) for i in range(b)]
    sigmas = [jnp.where(m_T, cov_b[i], sigmas[i]) for i in range(bb)]
    return xs, mus, sigmas, us, cs


# --------------------------------------------------------------------------------------
# Plain-jnp entry points (CPU parity twins) and Pallas wrappers
# --------------------------------------------------------------------------------------


def _check(env, cfg, nb_steps=0):
    if not getattr(env, "supports_belief_tiles", False):
        raise ValueError(
            f"{type(env).__name__} does not support the belief tile protocol"
        )
    if cfg.T + 1 > LANES or cfg.nb_iter > LANES or nb_steps + 1 > LANES:
        raise ValueError("horizon/iterations/steps must fit in 128 lanes")


def _unpack_state(env, out, cfg):
    """Planes → BSPState arrays (parallel/bsp.BSPState layout)."""
    from ..parallel.bsp import BSPState

    T, b, a = cfg.T, cfg.b, cfg.a
    (bref_mu, bref_sig, uref, K_pl, kff_pl, lam, dlam, last_ret, done,
     trace) = out
    stack = lambda pls: jnp.stack([p[0] for p in pls], axis=-1)
    return (
        BSPState(
            bref_mu=stack(bref_mu)[:T + 1],
            bref_sigma=stack(bref_sig)[:T + 1].reshape(T + 1, b, b),
            uref=stack(uref)[:T],
            K=jnp.stack(
                [jnp.stack([K_pl[j][c_][0] for c_ in range(b)], axis=-1)
                 for j in range(a)], axis=1,
            )[:T],
            kff=stack(kff_pl)[:T],
            lmbda=lam[0, 0],
            dlmbda=dlam[0, 0],
            last_return=last_ret[0, 0],
            done=done[0, 0] > 0.5,  # float 0/1 carry (see _solve_core)
        ),
        trace[0, :cfg.nb_iter],
    )


def run_bsp_solve_planes(env, nb_steps, nb_iter=25, **kw):
    """Pure-jnp twin of :func:`pallas_bsp_solve` — the plane-math solve without
    a Pallas launch, for CPU parity against parallel/bsp.make_bsp_solver."""
    cfg = _cfg(env, nb_steps, nb_iter, **kw)
    _check(env, cfg)

    def solve(mu0: Array, sigma0: Array):
        dtype = mu0.dtype
        b = cfg.b
        mu0_t = [mu0[i].reshape(1, 1) + jnp.zeros((SUB, 1), dtype) for i in range(b)]
        sig0_t = [sigma0[i, j].reshape(1, 1) + jnp.zeros((SUB, 1), dtype) for i in range(b)
                  for j in range(b)]
        out = _solve_core(env, mu0_t, sig0_t, None, cfg, dtype)
        return _unpack_state(env, out, cfg)

    return solve


def _init_belief(env):
    import numpy as np

    mu0_arr, sig0_arr = env.init()
    mu0 = np.asarray(mu0_arr)
    sig0 = np.asarray(sig0_arr)
    return (
        tuple(float(v) for v in mu0),
        tuple(float(v) for v in sig0.reshape(-1)),
    )


def run_bsp_episode_planes(env, horizon, nb_steps, nb_iter=25, **kw):
    """Pure-jnp twin of :func:`pallas_bsp_episode`: ``run(x0, eps0, eps_dyn,
    eps_obs)`` with explicit standard normals (ε) for the true-system and
    observation draws."""
    cfg = _cfg(env, horizon, nb_iter, **kw)
    _check(env, cfg, nb_steps)
    b, do = cfg.b, cfg.do
    init_belief = _init_belief(env)

    def run(x0, eps0, eps_dyn, eps_obs):
        dtype = x0.dtype
        x0_t = [x0[i].reshape(1, 1) + jnp.zeros((SUB, 1), dtype) for i in range(b)]
        eps0_t = [eps0[i].reshape(1, 1) + jnp.zeros((SUB, 1), dtype) for i in range(do)]
        ed = [jnp.zeros((SUB, LANES), dtype).at[0, :nb_steps].set(eps_dyn[:, i])
              for i in range(b)]
        eo = [jnp.zeros((SUB, LANES), dtype).at[0, :nb_steps].set(eps_obs[:, i])
              for i in range(do)]
        xs, mus, sigmas, us, cs = _episode_core(
            env, x0_t, eps0_t, ed, eo, cfg, nb_steps, dtype, init_belief
        )
        return _unpack_episode(xs, mus, sigmas, us, cs, cfg, nb_steps)

    return run


def _unpack_episode(xs, mus, sigmas, us, cs, cfg, nb_steps):
    b = cfg.b
    stack = lambda pls: jnp.stack([p[0] for p in pls], axis=-1)
    return (
        stack(xs)[:nb_steps + 1],
        stack(mus)[:nb_steps + 1],
        stack(sigmas)[:nb_steps + 1].reshape(nb_steps + 1, b, b),
        stack(us)[:nb_steps],
        cs[0, :nb_steps],
    )


def pallas_bsp_solve(env, nb_steps, nb_iter=25, interpret=False, **kw):
    """ONE-launch BSP-iLQR solve: ``solve(mu0 (b,), sigma0 (b,b)) ->
    (BSPState, trace)`` with make_bsp_solver semantics (dense value form)."""
    cfg = _cfg(env, nb_steps, nb_iter, **kw)
    _check(env, cfg)
    b, a = cfg.b, cfg.a
    bb = b * b

    def kernel(mu0_ref, sig0_ref, bref_mu_ref, bref_sig_ref, uref_ref,
               k_ref, kff_ref, misc_ref, trace_ref):
        dtype = bref_mu_ref.dtype
        mu0 = [jnp.full((SUB, 1), mu0_ref[i], dtype) for i in range(b)]
        sig0 = [jnp.full((SUB, 1), sig0_ref[i], dtype) for i in range(bb)]
        out = _solve_core(env, mu0, sig0, None, cfg, dtype)
        (bref_mu, bref_sig, uref, K_pl, kff_pl, lam, dlam, last_ret, done,
         trace) = out
        bref_mu_ref[...] = jnp.concatenate(bref_mu, axis=0)
        bref_sig_ref[...] = jnp.concatenate(bref_sig, axis=0)
        uref_ref[...] = jnp.concatenate(uref, axis=0)
        k_ref[...] = jnp.concatenate(
            [K_pl[j][c_] for j in range(a) for c_ in range(b)], axis=0
        )
        kff_ref[...] = jnp.concatenate(kff_pl, axis=0)
        li = _lane_iota()
        misc = jnp.where(li == 0, lam, 0.0)
        misc = jnp.where(li == 1, dlam, misc)
        misc = jnp.where(li == 2, last_ret, misc)
        misc = jnp.where(li == 3, done, misc)  # already a float 0/1
        misc_ref[...] = misc
        trace_ref[...] = trace

    def solve(mu0: Array, sigma0: Array):
        dtype = mu0.dtype
        out_shapes = [
            jax.ShapeDtypeStruct((b * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((bb * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((a * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((a * b * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((a * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((SUB, LANES), dtype),
            jax.ShapeDtypeStruct((SUB, LANES), dtype),
        ]
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            kernel,
            in_specs=[smem, smem],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_shape=out_shapes,
            interpret=interpret,
        )(mu0, sigma0.reshape(-1))
        T = cfg.T
        bref_mu_o, bref_sig_o, uref_o, k_o, kff_o, misc, trace = outs
        row = lambda o, i: o[i * SUB:i * SUB + 1]
        planes = (
            [row(bref_mu_o, i) for i in range(b)],
            [row(bref_sig_o, i) for i in range(bb)],
            [row(uref_o, j) for j in range(a)],
            [[row(k_o, j * b + c_) for c_ in range(b)] for j in range(a)],
            [row(kff_o, j) for j in range(a)],
            misc[0:1, 0:1], misc[0:1, 1:2], misc[0:1, 2:3],
            misc[0:1, 3:4], trace[0:1],
        )
        return _unpack_state(env, planes, cfg)

    return solve


def pallas_bsp_episode(env, horizon, nb_steps, nb_iter=25, interpret=False,
                       **kw):
    """ONE-launch belief-MPC episode: ``run(x0, eps0, eps_dyn, eps_obs) ->
    (xs, mus, sigmas, us, cs)`` — the entire examples/bspilqr/lightdark.py
    control loop (nb_steps replans, acts and EKF updates) as a single Pallas
    kernel; ε are standard normals supplied by the caller (the
    multivariate-normal draws of BeliefEnv.step with chol applied in-kernel)."""
    cfg = _cfg(env, horizon, nb_iter, **kw)
    _check(env, cfg, nb_steps)
    b, a, do = cfg.b, cfg.a, cfg.do
    bb = b * b
    init_belief = _init_belief(env)

    def kernel(x0_ref, eps0_ref, eps_dyn_ref, eps_obs_ref,
               xs_ref, mus_ref, sig_ref, us_ref, cs_ref):
        dtype = xs_ref.dtype
        x0 = [jnp.full((SUB, 1), x0_ref[i], dtype) for i in range(b)]
        eps0 = [jnp.full((SUB, 1), eps0_ref[i], dtype) for i in range(do)]
        li = _lane_iota()
        zero = jnp.zeros((SUB, LANES), dtype)
        ed = []
        for i in range(b):
            acc = zero
            for s in range(nb_steps):
                acc = jnp.where(li == s, eps_dyn_ref[s, i], acc)
            ed.append(acc)
        eo = []
        for i in range(do):
            acc = zero
            for s in range(nb_steps):
                acc = jnp.where(li == s, eps_obs_ref[s, i], acc)
            eo.append(acc)
        xs, mus, sigmas, us, cs = _episode_core(
            env, x0, eps0, ed, eo, cfg, nb_steps, dtype, init_belief
        )
        xs_ref[...] = jnp.concatenate(xs, axis=0)
        mus_ref[...] = jnp.concatenate(mus, axis=0)
        sig_ref[...] = jnp.concatenate(sigmas, axis=0)
        us_ref[...] = jnp.concatenate(us, axis=0)
        cs_ref[...] = cs

    def run(x0: Array, eps0: Array, eps_dyn: Array, eps_obs: Array):
        dtype = x0.dtype
        out_shapes = [
            jax.ShapeDtypeStruct((b * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((b * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((bb * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((a * SUB, LANES), dtype),
            jax.ShapeDtypeStruct((SUB, LANES), dtype),
        ]
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            kernel,
            in_specs=[smem] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_shape=out_shapes,
            interpret=interpret,
        )(x0, eps0, eps_dyn, eps_obs)
        xs_o, mus_o, sig_o, us_o, cs_o = outs
        row = lambda o, i: o[i * SUB:i * SUB + 1]
        planes = (
            [row(xs_o, i) for i in range(b)],
            [row(mus_o, i) for i in range(b)],
            [row(sig_o, i) for i in range(bb)],
            [row(us_o, j) for j in range(a)],
            cs_o[0:1],
        )
        return _unpack_episode(*planes, cfg, nb_steps)

    return run
