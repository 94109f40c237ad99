from .bspilqr import BSPiLQR  # noqa: F401
from .elqr import eLQR  # noqa: F401
from .gps import MBGPS, MFGPS  # noqa: F401
from .ilqr import iLQR  # noqa: F401
from .riccati import Riccati  # noqa: F401
from .rgps import LRGPS, MBRGPS, MFRGPS  # noqa: F401
