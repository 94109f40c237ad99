"""Shared random belief-problem fixture for the packed belief-backward tests.

One builder for the well-conditioned batched problem class used by the
interpreter parity tests (tests/test_pallas_belief.py), the f32 guard shard
(tests/test_f32.py), and the device-only shard (tests/test_tpu.py) — a field
or shape change to the belief expansions propagates from here.
"""

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.core.belief import BeliefCostExpansion, BeliefDynamicsExpansion


def random_belief_problem(seed, N, T, b=2, a=2, dtype=None, bad_instance=False):
    """Batched (N, T, ...) belief cost/dynamics expansions, stable Y/U blocks.

    ``dtype=None`` keeps the suite default (f64 under the conftest);
    ``bad_instance=True`` negates instance 0's R stack to force a non-PD
    regularized control Hessian there (divergence-flag tests).
    """
    rng = np.random.default_rng(seed)
    b2 = b * b
    arr = lambda x: jnp.asarray(x, dtype)

    def spd(d, shape, s):
        M = rng.standard_normal(shape + (d, d))
        return s * np.einsum("...ij,...kj->...ik", M, M) + d * np.eye(d)

    R = spd(a, (N, T + 1), 1.0)
    if bad_instance:
        R[0] = -R[0]
    cost = BeliefCostExpansion(
        Q=arr(spd(b, (N, T + 1), 0.1)),
        q=arr(rng.standard_normal((N, T + 1, b))),
        R=arr(R),
        r=arr(rng.standard_normal((N, T + 1, a))),
        P=arr(0.01 * rng.standard_normal((N, T + 1, b, a))),
        p=arr(rng.standard_normal((N, T + 1, b2))),
    )
    dyn = BeliefDynamicsExpansion(
        F=arr(np.eye(b) + 0.05 * rng.standard_normal((N, T, b, b))),
        G=arr(0.2 * rng.standard_normal((N, T, b, a))),
        X=arr(0.05 * rng.standard_normal((N, T, b2, b))),
        Y=arr(np.eye(b2) * 0.9 + 0.02 * rng.standard_normal((N, T, b2, b2))),
        Z=arr(0.05 * rng.standard_normal((N, T, b2, a))),
        T=arr(0.05 * rng.standard_normal((N, T, b2, b))),
        U=arr(np.eye(b2) * 0.8 + 0.02 * rng.standard_normal((N, T, b2, b2))),
        V=arr(0.05 * rng.standard_normal((N, T, b2, a))),
    )
    return cost, dyn
