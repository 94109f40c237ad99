"""Parity tests for the Pallas parallel-in-time backward pass
(core/pallas_pscan.py) vs the sequential and associative-scan kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.core.pallas_pscan import pallas_pilqr_backward
from trajopt_tpu.core.pscan_lqr import pilqr_backward
from trajopt_tpu.core.scan_lqr import ilqr_backward
from trajopt_tpu.core.types import QuadraticCost

from ref_impl import random_quadratic_problem


def _pack(p):
    return QuadraticCost(
        Cxx=jnp.asarray(p["Cxx"]), cx=jnp.asarray(p["cx"]),
        Cuu=jnp.asarray(p["Cuu"]), cu=jnp.asarray(p["cu"]),
        Cxu=jnp.asarray(p["Cxu"]), c0=jnp.asarray(p["c0"]),
    ), jnp.asarray(p["A"]), jnp.asarray(p["B"])


@pytest.mark.parametrize("T,dx,du", [(19, 3, 2), (130, 2, 1)])
def test_pallas_pscan_matches_sequential(T, dx, du):
    rng = np.random.default_rng(600 + T)
    p = random_quadratic_problem(rng, T, dx=dx, du=du)
    cost, A, B = _pack(p)

    ctl_s, val_s, _, dV_s, div = ilqr_backward(cost, A, B, 0.0, 1)
    assert not bool(div)
    ctl_p, val_p, dV_p = pallas_pilqr_backward(cost, A, B, interpret=True)

    np.testing.assert_allclose(np.asarray(ctl_p.K), np.asarray(ctl_s.K),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ctl_p.kff), np.asarray(ctl_s.kff),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(val_p.V), np.asarray(val_s.V),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(val_p.v), np.asarray(val_s.v),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dV_p), np.asarray(dV_s), rtol=1e-7)


def test_pallas_pscan_matches_assoc_scan():
    rng = np.random.default_rng(700)
    T, dx, du = 61, 3, 2
    p = random_quadratic_problem(rng, T, dx=dx, du=du)
    cost, A, B = _pack(p)

    ctl_a, val_a, dV_a = pilqr_backward(cost, A, B)
    ctl_p, val_p, dV_p = pallas_pilqr_backward(cost, A, B, interpret=True)
    np.testing.assert_allclose(np.asarray(ctl_p.K), np.asarray(ctl_a.K),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dV_p), np.asarray(dV_a), rtol=1e-7)


def test_pallas_pscan_reg_matches_lane_major():
    """λ-folded variant (the 'pallas-pscan' solver engine) == the XLA lane-major
    λ-folded pass at λ = 0 and λ > 0."""
    from trajopt_tpu.core.pallas_pscan import pallas_pilqr_backward_reg
    from trajopt_tpu.core.pscan_lqr import pilqr_backward_reg

    rng = np.random.default_rng(800)
    T, dx, du = 33, 3, 2
    p = random_quadratic_problem(rng, T, dx=dx, du=du)
    cost, A, B = _pack(p)

    for lmbda in (0.0, 0.6):
        ctl_r, val_r, dV_r, div_r = pilqr_backward_reg(cost, A, B, lmbda)
        ctl_p, val_p, dV_p, div_p = pallas_pilqr_backward_reg(
            cost, A, B, lmbda, interpret=True
        )
        assert not bool(div_r) and not bool(div_p)
        np.testing.assert_allclose(np.asarray(ctl_p.K), np.asarray(ctl_r.K),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ctl_p.kff), np.asarray(ctl_r.kff),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dV_p), np.asarray(dV_r), rtol=1e-7)
