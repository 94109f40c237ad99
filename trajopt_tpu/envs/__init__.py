"""Environment registry — ids mirror trajopt/__init__.py:3-97."""

from .base import BeliefEnv, TrajEnv, make, register, registered, wrap_angle  # noqa: F401
from .car import Car  # noqa: F401
from .cartpole import (  # noqa: F401
    Cartpole,
    CartpoleWithCartesianCost,
    DoubleCartpole,
    DoubleCartpoleWithCartesianCost,
)
from .lightdark import LightDark  # noqa: F401
from .lqr import LQRv0, LQRv1, LQRv2  # noqa: F401
from .nlink import (  # noqa: F401
    DoublePendulum,
    DoublePendulumWithCartesianCost,
    QuadPendulum,
    QuadPendulumWithCartesianCost,
)
from .pendulum import Pendulum, PendulumWithCartesianCost  # noqa: F401
from .robot import Robot  # noqa: F401
