from . import profiling, psd  # noqa: F401
