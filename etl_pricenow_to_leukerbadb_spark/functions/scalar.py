"""Scalar column-expression builders (SURVEY T3/T8/T9, §2.7).

All of these are pure Catalyst expressions — JVM-side, codegen-able,
zero Python in the executor hot path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import SeasonConfig


def parse_duration_days(duration: Column | str) -> Column:
    """Duration-grammar parse (SURVEY T3, reference py:315-318).

    ``'4h' -> 1`` (a 4-hour ticket consumes one day); otherwise strip a
    trailing ``'d'`` and cast: ``'13d' -> 13``.
    """
    c = F.col(duration) if isinstance(duration, str) else duration
    return F.when(c == "4h", F.lit(1)).otherwise(
        F.regexp_replace(c, "d$", "").cast("int")
    )


def days_left_expr(valid_from: Column | str, season: SeasonConfig) -> Column:
    """Days remaining in the season from ``valid_from``, inclusive
    (SURVEY T8, reference py:349-361), with the closure calendar applied:
    exact-date overrides first, then open-interval closures force 0.
    """
    c = F.col(valid_from) if isinstance(valid_from, str) else valid_from
    expr = None
    for day, forced in sorted(season.day_overrides.items()):
        cond = c == F.lit(day)
        expr = F.when(cond, F.lit(forced)) if expr is None else expr.when(cond, F.lit(forced))
    for lo, hi in season.closed_open_intervals:
        cond = (c > F.lit(lo)) & (c < F.lit(hi))
        expr = F.when(cond, F.lit(0)) if expr is None else expr.when(cond, F.lit(0))
    base = F.datediff(F.lit(season.end), c) + F.lit(1)
    return base if expr is None else expr.otherwise(base)


def active_flag(days_left: Column, duration_days: Column) -> Column:
    """A ticket is purchasable iff its duration still fits in the season
    (SURVEY T8, reference py:363-367)."""
    return days_left >= duration_days


def normalize_date_str(col: Column | str) -> Column:
    """Canonical 'YYYY-MM-DD' formatting (SURVEY T9, reference py:267-268)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.to_date(c), "yyyy-MM-dd")


def snapshot_ts(now: dt.datetime | None = None) -> Column:
    """One consistent run timestamp stamped on every row (SURVEY T11,
    reference py:432) — computed once on the driver, *not*
    ``current_timestamp()`` per row."""
    now = now or dt.datetime.now(dt.timezone.utc)
    return F.lit(now)
