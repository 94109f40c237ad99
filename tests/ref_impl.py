"""Pure-NumPy oracle implementations of the kernel math, written as straight loops.

These mirror the *equations* of the reference's C++ kernels (cited per function) and
serve as the unit-test oracles for the JAX scan kernels, per the test strategy in
SURVEY.md §4.  Time axis is leading, matching trajopt_tpu conventions.
"""

from __future__ import annotations

import numpy as np


def riccati_backward_np(Cxx, cx, Cuu, cu, Cxu, A, B, c):
    """riccati/riccati.py:100-126 (with the matmul fix at line 123)."""
    T = A.shape[0]
    dx, du = A.shape[-1], B.shape[-1]
    V = np.zeros((T + 1, dx, dx))
    v = np.zeros((T + 1, dx))
    K = np.zeros((T, du, dx))
    kff = np.zeros((T, du))

    V[T] = Cxx[T]
    v[T] = cx[T]
    for t in range(T - 1, -1, -1):
        Qxx = Cxx[t] + A[t].T @ V[t + 1] @ A[t]
        Quu = Cuu[t] + B[t].T @ V[t + 1] @ B[t]
        Qux = Cxu[t].T + B[t].T @ V[t + 1] @ A[t]
        qx = cx[t] + 2.0 * A[t].T @ V[t + 1] @ c[t] + A[t].T @ v[t + 1]
        qu = cu[t] + 2.0 * B[t].T @ V[t + 1] @ c[t] + B[t].T @ v[t + 1]

        Quu_inv = np.linalg.inv(Quu)
        K[t] = -Quu_inv @ Qux
        kff[t] = -0.5 * Quu_inv @ qu

        V[t] = Qxx + Qux.T @ K[t]
        v[t] = qx + 2.0 * Qux.T @ kff[t]
    return K, kff, V, v


def ilqr_backward_np(Cxx, cx, Cuu, cu, Cxu, A, B, lmbda, reg):
    """ilqr/src/util.cpp:83-182."""
    T = A.shape[0]
    dx, du = A.shape[-1], B.shape[-1]
    V = np.zeros((T + 1, dx, dx))
    v = np.zeros((T + 1, dx))
    K = np.zeros((T, du, dx))
    kff = np.zeros((T, du))
    dV = np.zeros(2)
    diverge = False

    V[T] = Cxx[T]
    v[T] = cx[T]
    for t in range(T - 1, -1, -1):
        Qxx = Cxx[t] + A[t].T @ V[t + 1] @ A[t]
        Quu = Cuu[t] + B[t].T @ V[t + 1] @ B[t]
        Qux = (Cxu[t] + A[t].T @ V[t + 1] @ B[t]).T
        qu = cu[t] + B[t].T @ v[t + 1]
        qx = cx[t] + A[t].T @ v[t + 1]

        V_reg = V[t + 1] + (lmbda * np.eye(dx) if reg == 2 else 0.0)
        Qux_reg = (Cxu[t] + A[t].T @ V_reg @ B[t]).T
        Quu_reg = Cuu[t] + B[t].T @ V_reg @ B[t] + (lmbda * np.eye(du) if reg == 1 else 0.0)

        # SPD check
        try:
            np.linalg.cholesky(Quu_reg)
        except np.linalg.LinAlgError:
            diverge = True
            break

        Quu_inv = np.linalg.inv(Quu_reg)
        K[t] = -Quu_inv @ Qux_reg
        kff[t] = -Quu_inv @ qu

        dV += np.array([kff[t] @ qu, 0.5 * kff[t] @ Quu @ kff[t]])

        v[t] = qx + K[t].T @ Quu @ kff[t] + K[t].T @ qu + Qux.T @ kff[t]
        V[t] = Qxx + K[t].T @ Quu @ K[t] + K[t].T @ Qux + Qux.T @ K[t]
        V[t] = 0.5 * (V[t] + V[t].T)
    return K, kff, V, v, dV, diverge


def gps_backward_np(Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, sigma_dyn, alpha):
    """gps/src/util.cpp:272-374."""
    T = A.shape[0]
    dx, du = A.shape[-1], B.shape[-1]
    V = np.zeros((T + 1, dx, dx))
    v = np.zeros((T + 1, dx))
    v0 = np.zeros(T + 1)
    K = np.zeros((T, du, dx))
    kff = np.zeros((T, du))
    sigma_ctl = np.zeros((T, du, du))
    diverge = False

    V[T] = Cxx[T]
    v[T] = cx[T]
    v0[T] = c0[T]
    for t in range(T - 1, -1, -1):
        a = alpha[t]
        Qxx = -(Cxx[t] + A[t].T @ V[t + 1] @ A[t]) / a
        Quu = -(Cuu[t] + B[t].T @ V[t + 1] @ B[t]) / a
        Qux = -(Cxu[t] + A[t].T @ V[t + 1] @ B[t]).T / a
        qu = -(cu[t] + 2.0 * B[t].T @ V[t + 1] @ c[t] + B[t].T @ v[t + 1]) / a
        qx = -(cx[t] + 2.0 * A[t].T @ V[t + 1] @ c[t] + A[t].T @ v[t + 1]) / a
        q0 = -(
            c0[t] + v0[t + 1] + c[t] @ V[t + 1] @ c[t]
            + np.trace(V[t + 1] @ sigma_dyn[t]) + v[t + 1] @ c[t]
        ) / a

        # -Quu must be PD for a valid Gaussian policy
        try:
            np.linalg.cholesky(-0.5 * (Quu + Quu.T))
        except np.linalg.LinAlgError:
            diverge = True
            break

        Quu_inv = np.linalg.inv(Quu)
        K[t] = -Quu_inv @ Qux
        kff[t] = -0.5 * Quu_inv @ qu
        sigma_ctl[t] = -0.5 * Quu_inv
        sigma_ctl[t] = 0.5 * (sigma_ctl[t] + sigma_ctl[t].T)

        V[t] = -a * (Qxx + Qux.T @ K[t])
        V[t] = 0.5 * (V[t] + V[t].T)
        v[t] = -a * (qx + 2.0 * Qux.T @ kff[t])
        v0[t] = -a * (
            0.5 * qu @ kff[t] + q0
            + 0.5 * (du * np.log(2.0 * np.pi) - np.log(np.linalg.det(-2.0 * Quu)))
        )
    return K, kff, sigma_ctl, V, v, v0, diverge


def gaussian_forward_np(mu0, sigma0, A, B, c, sigma_dyn, K, kff, sigma_ctl):
    """gps/src/util.cpp:195-269."""
    T = A.shape[0]
    dx, du = A.shape[-1], B.shape[-1]
    mu_x = np.zeros((T + 1, dx))
    sigma_x = np.zeros((T + 1, dx, dx))
    mu_u = np.zeros((T, du))
    sigma_u = np.zeros((T, du, du))
    mu_xu = np.zeros((T + 1, dx + du))
    sigma_xu = np.zeros((T + 1, dx + du, dx + du))

    mu_x[0] = mu0
    sigma_x[0] = sigma0
    for t in range(T):
        mu_u[t] = K[t] @ mu_x[t] + kff[t]
        su = sigma_ctl[t] + K[t] @ sigma_x[t] @ K[t].T
        sigma_u[t] = 0.5 * (su + su.T)

        cross = sigma_x[t] @ K[t].T
        sxu = np.block([[sigma_x[t], cross], [cross.T, sigma_u[t]]])
        sigma_xu[t] = 0.5 * (sxu + sxu.T)
        mu_xu[t] = np.concatenate([mu_x[t], mu_u[t]])

        AB = np.concatenate([A[t], B[t]], axis=1)
        sxn = sigma_dyn[t] + AB @ sigma_xu[t] @ AB.T
        sigma_x[t + 1] = 0.5 * (sxn + sxn.T)
        mu_x[t + 1] = AB @ mu_xu[t] + c[t]

    mu_xu[T] = np.concatenate([mu_x[T], np.zeros(du)])
    sigma_xu[T, :dx, :dx] = sigma_x[T]
    return mu_x, sigma_x, mu_u, sigma_u, mu_xu, sigma_xu


def augment_cost_np(Cxx, cx, Cuu, cu, Cxu, c0, K, kff, sigma_ctl, alpha):
    """gps/src/util.cpp:136-193."""
    T = K.shape[0]
    agCxx, agcx = Cxx.copy(), cx.copy()
    agCuu, agcu = Cuu.copy(), cu.copy()
    agCxu, agc0 = Cxu.copy(), c0.copy()
    for t in range(T):
        lam = np.linalg.inv(sigma_ctl[t])
        a = alpha[t]
        agCxx[t] = Cxx[t] + 0.5 * a * K[t].T @ lam @ K[t]
        agCuu[t] = Cuu[t] + 0.5 * a * lam
        agCxu[t] = Cxu[t] - 0.5 * a * K[t].T @ lam
        agcx[t] = cx[t] + a * K[t].T @ lam @ kff[t]
        agcu[t] = cu[t] - a * lam @ kff[t]
        agc0[t] = c0[t] + 0.5 * a * np.log(
            np.linalg.det(2.0 * np.pi * sigma_ctl[t])
        ) + 0.5 * a * kff[t] @ lam @ kff[t]
    return agCxx, agcx, agCuu, agcu, agCxu, agc0


def kl_divergence_np(pK, pk, psig, qK, qk, qsig, mu_x, sigma_x):
    """gps/src/util.cpp:83-121."""
    T = pK.shape[0]
    du = pk.shape[-1]
    kl = np.zeros(T)
    for t in range(T):
        q_lam = np.linalg.inv(qsig[t])
        dK = qK[t] - pK[t]
        dk = pk[t] - qk[t]
        diff_K = dK.T @ q_lam @ dK
        diff_crs = dK.T @ q_lam @ dk
        diff_kff = dk @ q_lam @ dk
        kl[t] = (
            0.5 * np.log(np.linalg.det(qsig[t]) / np.linalg.det(psig[t]))
            + 0.5 * np.trace(q_lam @ psig[t])
            - 0.5 * du
            + 0.5 * np.trace(diff_K @ sigma_x[t])
            + 0.5 * mu_x[t] @ diff_K @ mu_x[t]
            - mu_x[t] @ diff_crs
            + 0.5 * diff_kff
        )
    return kl


def random_quadratic_problem(rng, T, dx, du, gaussian=False):
    """A well-conditioned random LQ problem in the absolute convention."""

    def spd(d, scale=1.0):
        M = rng.standard_normal((d, d))
        return scale * (M @ M.T + d * np.eye(d))

    A = np.stack([np.eye(dx) + 0.05 * rng.standard_normal((dx, dx)) for _ in range(T)])
    B = 0.1 * rng.standard_normal((T, dx, du))
    c = 0.01 * rng.standard_normal((T, dx))

    Cxx = np.stack([spd(dx) for _ in range(T + 1)])
    Cuu = np.stack([spd(du, 0.5) for _ in range(T + 1)])
    Cxu = 0.1 * rng.standard_normal((T + 1, dx, du))
    cx = rng.standard_normal((T + 1, dx))
    cu = rng.standard_normal((T + 1, du))
    c0 = rng.standard_normal(T + 1)

    out = dict(Cxx=Cxx, cx=cx, Cuu=Cuu, cu=cu, Cxu=Cxu, c0=c0, A=A, B=B, c=c)
    if gaussian:
        out["sigma_dyn"] = np.stack([1e-4 * spd(dx) for _ in range(T)])
    return out
