from . import bsp, elqr, gps, mesh, mpc, regression, rgps  # noqa: F401
