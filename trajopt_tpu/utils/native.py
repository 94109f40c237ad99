"""ctypes bridge to the native C++ baseline kernel (native/baseline.cpp).

Provides the measured single-thread CPU denominator for bench.py (the role the
reference's pybind11/Armadillo/OpenBLAS kernels play on CPU) and an independent
second implementation of the iLQR backward pass for cross-validation tests.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "baseline.so"
_SRC = _NATIVE_DIR / "baseline.cpp"


def build(force: bool = False) -> pathlib.Path:
    """Compile baseline.cpp to a shared object (g++ -O3 -march=native)."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-o", str(_SO), str(_SRC)],
        check=True,
    )
    return _SO


def load():
    lib = ctypes.CDLL(str(build()))
    dp = ctypes.POINTER(ctypes.c_double)
    ci = ctypes.c_int
    lib.ilqr_backward_cpu.restype = ci
    lib.ilqr_backward_cpu.argtypes = [dp] * 7 + [
        ctypes.c_double, ci, ci, ci, dp, dp,
    ]
    lib.ilqr_backward_bench.restype = ctypes.c_double
    lib.ilqr_backward_bench.argtypes = [dp] * 7 + [
        ctypes.c_double, ci, ci, ci, ci, dp, dp,
    ]
    lib.gps_dual_chain_cpu.restype = ci
    lib.gps_dual_chain_cpu.argtypes = [dp] * 16 + [ci, ci, ci, dp]
    lib.gps_dual_chain_bench.restype = ctypes.c_double
    lib.gps_dual_chain_bench.argtypes = [dp] * 16 + [ci, ci, ci, ci, dp]
    lib.rgps_fixed_point_cpu.restype = ci
    lib.rgps_fixed_point_cpu.argtypes = (
        [dp] * 12 + [ctypes.c_double] + [dp] * 4
        + [ci, ci, ci, ctypes.c_double] + [dp] * 4
    )
    lib.rgps_fixed_point_bench.restype = ctypes.c_double
    lib.rgps_fixed_point_bench.argtypes = (
        [dp] * 12 + [ctypes.c_double] + [dp] * 4
        + [ci, ci, ci, ctypes.c_double, ci] + [dp] * 4
    )
    lib.bsp_backward_cpu.restype = ci
    lib.bsp_backward_cpu.argtypes = (
        [dp] * 14 + [ctypes.c_double, ci, ci, ci, ci] + [dp] * 3
    )
    lib.bsp_backward_bench.restype = ctypes.c_double
    lib.bsp_backward_bench.argtypes = (
        [dp] * 14 + [ctypes.c_double, ci, ci, ci, ci, ci] + [dp] * 3
    )
    lib.bsp_mpc_step_bench.restype = ctypes.c_double
    lib.bsp_mpc_step_bench.argtypes = [ci, ci, ci]
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ilqr_backward_native(Cxx, cx, Cuu, cu, Cxu, A, B, lmbda=0.0):
    """Run the native backward pass; returns (K, kff, fail_flag)."""
    lib = load()
    T, dx = A.shape[0], A.shape[-1]
    du = B.shape[-1]
    arrs = [np.ascontiguousarray(np.asarray(x, dtype=np.float64))
            for x in (Cxx, cx, Cuu, cu, Cxu, A, B)]
    K = np.zeros((T, du, dx))
    kff = np.zeros((T, du))
    fail = lib.ilqr_backward_cpu(
        *[_ptr(a) for a in arrs], ctypes.c_double(lmbda),
        T, dx, du, _ptr(K), _ptr(kff),
    )
    return K, kff, fail


def _gps_args(Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, Sdyn, K, kff, Sctl,
              alpha, mu0, sigma0):
    arrs = [np.ascontiguousarray(np.asarray(x, dtype=np.float64))
            for x in (Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, Sdyn,
                      K, kff, Sctl, alpha, mu0, sigma0)]
    T, dx = A.shape[0], A.shape[-1]
    du = B.shape[-1]
    return arrs, T, dx, du


def gps_dual_chain_native(Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, Sdyn,
                          K, kff, Sctl, alpha, mu0, sigma0):
    """Run the native GPS dual-evaluation chain (augment -> soft-KL backward ->
    Gaussian forward -> KL + expectation); returns (dual, kl_sum, fail)."""
    lib = load()
    arrs, T, dx, du = _gps_args(Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, Sdyn,
                                K, kff, Sctl, alpha, mu0, sigma0)
    out = np.zeros(2)
    fail = lib.gps_dual_chain_cpu(*[_ptr(a) for a in arrs], T, dx, du, _ptr(out))
    return out[0], out[1], fail


def bench_gps_dual_chain_native(Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, Sdyn,
                                K, kff, Sctl, alpha, mu0, sigma0, reps=10):
    """Time `reps` native GPS dual-chain evaluations; returns seconds."""
    lib = load()
    arrs, T, dx, du = _gps_args(Cxx, cx, Cuu, cu, Cxu, c0, A, B, c, Sdyn,
                                K, kff, Sctl, alpha, mu0, sigma0)
    out = np.zeros(2)
    return lib.gps_dual_chain_bench(
        *[_ptr(a) for a in arrs], T, dx, du, reps, _ptr(out)
    )


def _rgps_args(Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl, Sdyn, agCpp, agcp,
               qmu, qsig, mu0, sigma0):
    const = [np.ascontiguousarray(np.asarray(x, dtype=np.float64))
             for x in (Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl, Sdyn,
                       agCpp, agcp)]
    # q is updated in place by the interpolation step -> fresh copies
    qmu = np.array(np.asarray(qmu, dtype=np.float64), order="C")
    qsig = np.array(np.asarray(qsig, dtype=np.float64), order="C")
    init = [np.ascontiguousarray(np.asarray(x, dtype=np.float64))
            for x in (mu0, sigma0)]
    T, dx = Sdyn.shape[0], Sdyn.shape[-1]
    du = kff.shape[-1]
    p = dx * (dx + du + 1)
    outs = (np.zeros((T, p)), np.zeros((T + 1, dx)),
            np.zeros((T + 1, dx, dx)), np.zeros(1))
    return const, qmu, qsig, init, outs, T, dx, du


def rgps_fixed_point_native(Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl, Sdyn,
                            agCpp, agcp, beta_plus_eta, qmu, qsig, mu0, sigma0,
                            interp_a=0.1):
    """One native RGPS adversary fixed-point trip (parameter backward pass +
    cubature forward + KL + precision-weighted damping).  Returns
    (mu_opt (T,p), p_mu (T+1,dx), p_sig (T+1,dx,dx), kl_sum, q_mu_new,
    q_sig_new, fail)."""
    lib = load()
    const, qmu, qsig, init, outs, T, dx, du = _rgps_args(
        Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl, Sdyn, agCpp, agcp,
        qmu, qsig, mu0, sigma0,
    )
    mu_opt, pmu, psig, kl = outs
    fail = lib.rgps_fixed_point_cpu(
        *[_ptr(a) for a in const], ctypes.c_double(beta_plus_eta),
        _ptr(qmu), _ptr(qsig), *[_ptr(a) for a in init],
        T, dx, du, ctypes.c_double(interp_a),
        _ptr(mu_opt), _ptr(pmu), _ptr(psig), _ptr(kl),
    )
    return mu_opt, pmu, psig, kl[0], qmu, qsig, fail


def bench_rgps_fixed_point_native(Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl,
                                  Sdyn, agCpp, agcp, beta_plus_eta, qmu, qsig,
                                  mu0, sigma0, interp_a=0.1, reps=5):
    """Time `reps` native RGPS fixed-point trips; returns seconds.

    Raises if any trip hits a definiteness failure (the C side returns the
    negated first-failing index): timing partial trips would silently inflate
    the derived CPU rate."""
    lib = load()
    const, qmu, qsig, init, outs, T, dx, du = _rgps_args(
        Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl, Sdyn, agCpp, agcp,
        qmu, qsig, mu0, sigma0,
    )
    mu_opt, pmu, psig, kl = outs
    sec = lib.rgps_fixed_point_bench(
        *[_ptr(a) for a in const], ctypes.c_double(beta_plus_eta),
        _ptr(qmu), _ptr(qsig), *[_ptr(a) for a in init],
        T, dx, du, ctypes.c_double(interp_a), reps,
        _ptr(mu_opt), _ptr(pmu), _ptr(psig), _ptr(kl),
    )
    if sec < 0:
        raise RuntimeError(
            f"native RGPS fixed point diverged at t={int(-sec) - 1} "
            "(definiteness failure); benchmark invalid"
        )
    return sec


def _bsp_args(cost, dyn):
    """Flatten a (BeliefCostExpansion, BeliefDynamicsExpansion) pair."""
    arrs = [np.ascontiguousarray(np.asarray(x, dtype=np.float64))
            for x in (cost.Q, cost.q, cost.R, cost.r, cost.P, cost.p,
                      dyn.F, dyn.G, dyn.X, dyn.Y, dyn.Z, dyn.T, dyn.U, dyn.V)]
    T, b = dyn.F.shape[0], dyn.F.shape[-1]
    a = dyn.G.shape[-1]
    return arrs, T, b, a


def bsp_backward_native(cost, dyn, lmbda=0.0, reg=1):
    """Run the native belief-value backward recursion; returns
    (K, kff, dS, fail)."""
    lib = load()
    arrs, T, b, a = _bsp_args(cost, dyn)
    K = np.zeros((T, a, b))
    kff = np.zeros((T, a))
    dS = np.zeros(2)
    fail = lib.bsp_backward_cpu(
        *[_ptr(x) for x in arrs], ctypes.c_double(lmbda), reg, T, b, a,
        _ptr(K), _ptr(kff), _ptr(dS),
    )
    return K, kff, dS, fail


def bench_bsp_backward_native(cost, dyn, lmbda=0.0, reg=1, reps=10):
    """Time `reps` native belief-value backward passes; returns seconds."""
    lib = load()
    arrs, T, b, a = _bsp_args(cost, dyn)
    K = np.zeros((T, a, b))
    kff = np.zeros((T, a))
    dS = np.zeros(2)
    return lib.bsp_backward_bench(
        *[_ptr(x) for x in arrs], ctypes.c_double(lmbda), reg, T, b, a, reps,
        _ptr(K), _ptr(kff), _ptr(dS),
    )


def bench_bsp_mpc_step_native(T=25, nb_iter=10, reps=10):
    """Time `reps` full belief-MPC control steps at light-dark dims — the
    honest per-step CPU chain (FD expansion + λ-escalated backward + 11-α
    rollouts + accept/reject, × nb_iter, + the closing EKF update); seconds."""
    lib = load()
    return lib.bsp_mpc_step_bench(T, nb_iter, reps)


def bench_backward_native(Cxx, cx, Cuu, cu, Cxu, A, B, lmbda=0.0, reps=10):
    """Time `reps` native backward passes; returns seconds."""
    lib = load()
    T, dx = A.shape[0], A.shape[-1]
    du = B.shape[-1]
    arrs = [np.ascontiguousarray(np.asarray(x, dtype=np.float64))
            for x in (Cxx, cx, Cuu, cu, Cxu, A, B)]
    K = np.zeros((T, du, dx))
    kff = np.zeros((T, du))
    return lib.ilqr_backward_bench(
        *[_ptr(a) for a in arrs], ctypes.c_double(lmbda),
        T, dx, du, reps, _ptr(K), _ptr(kff),
    )
