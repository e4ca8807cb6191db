from .scalar import (  # noqa: F401
    active_flag,
    days_left_expr,
    normalize_date_str,
    parse_duration_days,
)
