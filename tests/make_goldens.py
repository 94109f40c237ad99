"""Generate the pinned golden fixtures in tests/goldens/.

Why pinned files: the reference's pybind ``core`` modules cannot be built in this
environment (no armadillo headers — only ``libarmadillo.so.11`` with no
``/usr/include/armadillo``; no ``pybind11``, ``autograd``, ``gym`` or ``mimo``
packages; zero network egress), so direct head-to-head goldens against
``ilqr.core.backward_pass`` / ``gps.core.backward_pass`` are infeasible (see
BASELINE.md "Golden oracle protocol").  Instead the NumPy oracle outputs
(tests/ref_impl.py — straight-loop transcriptions of ilqr/src/util.cpp:83-182 and
gps/src/util.cpp:83-374) are evaluated ONCE on fixed-seed problems and committed
as .npz fixtures.  tests/test_goldens.py compares the JAX kernels against these
frozen arrays, so kernel parity no longer depends on regenerating the oracle per
run — a change to either the kernels or the oracle replica that shifts numerics
fails the pinned test.

Run manually only when adding new fixtures:  python tests/make_goldens.py
(Regenerating existing fixtures is a deliberate act; diffs show up in git.)
"""

from __future__ import annotations

import pathlib

import numpy as np

import ref_impl

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def main():
    GOLDEN_DIR.mkdir(exist_ok=True)
    rng = np.random.default_rng(1337)
    T, dx, du = 25, 4, 2
    p = ref_impl.random_quadratic_problem(rng, T, dx, du, gaussian=True)

    out = {f"in_{k}": v for k, v in p.items()}

    # riccati (absolute convention, riccati/riccati.py:100-126 with matmul fix)
    K, kff, V, v = ref_impl.riccati_backward_np(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["A"], p["B"], p["c"]
    )
    out.update(ric_K=K, ric_kff=kff, ric_V=V, ric_v=v)

    # ilqr, both regularization modes (ilqr/src/util.cpp:83-182)
    for reg, lmbda in ((1, 0.3), (2, 0.3)):
        K, kff, V, v, dV, diverge = ref_impl.ilqr_backward_np(
            p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["A"], p["B"],
            lmbda, reg,
        )
        assert not diverge
        out.update({
            f"ilqr{reg}_K": K, f"ilqr{reg}_kff": kff, f"ilqr{reg}_V": V,
            f"ilqr{reg}_v": v, f"ilqr{reg}_dV": dV,
        })

    # gps backward + forward + augment + kl (gps/src/util.cpp:83-374)
    alpha = np.full(T, 7.5)
    K, kff, sig, V, v, v0, diverge = ref_impl.gps_backward_np(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["c0"],
        p["A"], p["B"], p["c"], p["sigma_dyn"], alpha,
    )
    assert not diverge
    out.update(gps_K=K, gps_kff=kff, gps_sig=sig, gps_V=V, gps_v=v, gps_v0=v0,
               gps_alpha=alpha)

    mu0 = rng.standard_normal(dx)
    sigma0 = np.eye(dx) * 0.1
    mu_x, sigma_x, mu_u, sigma_u, mu_xu, sigma_xu = ref_impl.gaussian_forward_np(
        mu0, sigma0, p["A"], p["B"], p["c"], p["sigma_dyn"], K, kff, sig
    )
    out.update(fwd_mu0=mu0, fwd_sigma0=sigma0, fwd_mu_x=mu_x, fwd_sigma_x=sigma_x,
               fwd_mu_u=mu_u, fwd_sigma_u=sigma_u, fwd_mu_xu=mu_xu,
               fwd_sigma_xu=sigma_xu)

    agCxx, agcx, agCuu, agcu, agCxu, agc0 = ref_impl.augment_cost_np(
        p["Cxx"], p["cx"], p["Cuu"], p["cu"], p["Cxu"], p["c0"],
        K, kff, sig, alpha,
    )
    out.update(ag_Cxx=agCxx, ag_cx=agcx, ag_Cuu=agCuu, ag_cu=agcu, ag_Cxu=agCxu,
               ag_c0=agc0)

    qK = K + 0.01 * rng.standard_normal(K.shape)
    qk = kff + 0.01 * rng.standard_normal(kff.shape)
    qsig = sig + 1e-3 * np.eye(du)
    kl = ref_impl.kl_divergence_np(K, kff, sig, qK, qk, qsig,
                                   mu_x[:T], sigma_x[:T])
    out.update(kl_qK=qK, kl_qk=qk, kl_qsig=qsig, kl_kl=kl)

    np.savez_compressed(GOLDEN_DIR / "kernels.npz", **out)
    print(f"wrote {GOLDEN_DIR / 'kernels.npz'} with {len(out)} arrays")


if __name__ == "__main__":
    main()
