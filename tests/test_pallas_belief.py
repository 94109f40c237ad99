"""Parity of the lane-major Pallas belief-value backward vs the scan kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from belief_fixtures import random_belief_problem as _random_problem

from trajopt_tpu.core.belief import bsp_backward
from trajopt_tpu.core.pallas_belief import pallas_bsp_backward


@pytest.mark.parametrize("reg,lmbda", [(1, 0.0), (1, 3.7), (2, 0.5)])
def test_pallas_belief_backward_matches_scan(reg, lmbda):
    N, T, b, a = 5, 10, 2, 2
    cost, dyn = _random_problem(0, N, T, b, a)
    lam = jnp.full((N,), lmbda)

    ref = jax.vmap(lambda c, d, l: bsp_backward(c, d, l, reg))(cost, dyn, lam)
    out = pallas_bsp_backward(cost, dyn, lam, reg, interpret=True)

    for got, want, name in [
        (out[0].K, ref[0].K, "K"),
        (out[0].kff, ref[0].kff, "kff"),
        (out[1], ref[1], "S"),
        (out[2], ref[2], "s"),
        (out[3], ref[3], "tau"),
        (out[4], ref[4], "dS"),
    ]:
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9, err_msg=name)
    np.testing.assert_array_equal(np.asarray(out[5]), np.asarray(ref[5]))
    assert not bool(out[5].any())


def test_pallas_belief_backward_divergence_flag():
    N, T, b, a = 3, 10, 2, 2
    cost, dyn = _random_problem(1, N, T, b, a, bad_instance=True)
    lam = jnp.zeros((N,))
    out = pallas_bsp_backward(cost, dyn, lam, 1, interpret=True)
    ref = jax.vmap(lambda c, d, l: bsp_backward(c, d, l, 1))(cost, dyn, lam)
    np.testing.assert_array_equal(np.asarray(out[5]), np.asarray(ref[5]))
    assert bool(out[5][0]) and not bool(out[5][1:].any())
