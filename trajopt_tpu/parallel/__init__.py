from . import bsp, elqr, gps, mesh, mpc, regression  # noqa: F401
