from . import quantile_bin  # noqa: F401
