"""tpu-trajopt: a TPU-native trajectory-optimization framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
``hanyas/trajopt`` reference toolbox (see SURVEY.md): Riccati LQR, iLQR, eLQR,
belief-space iLQR, and KL-constrained Guided Policy Search in standard and
distributionally-robust flavors, over a suite of differentiable benchmark
environments.
"""

from . import envs  # noqa: F401  (registers all environments)
from .envs.base import make, registered  # noqa: F401

__version__ = "0.1.0"
