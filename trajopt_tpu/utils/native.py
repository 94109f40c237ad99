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
