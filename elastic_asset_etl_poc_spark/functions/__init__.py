from .scalar import make_ean, find_parent, date_math_lookback, PARENT_CASCADE  # noqa: F401
