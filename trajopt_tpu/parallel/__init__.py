from . import (  # noqa: F401
    bsp,
    diffmpc,
    elqr,
    gps,
    mesh,
    mpc,
    regression,
    rgps,
    riccati,
)
