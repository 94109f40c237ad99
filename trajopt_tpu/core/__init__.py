from . import diff, pallas_gps, pallas_lqr, scan_lqr, types  # noqa: F401
