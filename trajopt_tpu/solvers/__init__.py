from .ilqr import iLQR  # noqa: F401
from .riccati import Riccati  # noqa: F401
