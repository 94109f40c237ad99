from . import psd  # noqa: F401
