from .calendar import date_grid, with_date_grid  # noqa: F401
from .forward_fill import forward_fill_daily  # noqa: F401
