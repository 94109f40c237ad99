from . import gps, mpc, regression  # noqa: F401
