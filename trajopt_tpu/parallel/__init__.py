from . import bsp, gps, mesh, mpc, regression  # noqa: F401
