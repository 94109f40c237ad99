from . import bsp, elqr, gps, mesh, mpc, regression, rgps, riccati  # noqa: F401
