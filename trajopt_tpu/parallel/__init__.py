from . import gps, mesh, mpc, regression  # noqa: F401
