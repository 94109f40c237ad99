from . import diff, scan_lqr, types  # noqa: F401
