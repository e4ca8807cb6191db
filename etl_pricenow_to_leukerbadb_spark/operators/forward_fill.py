"""Forward-fill daily densification — the flagship operator.

Semantics follow the reference's ``forward_fill_daily_grid``
(``scripts/pricenow_etl.py:199-240``), generalized per SURVEY §7.1:

- sparse change points (key, date, value) become a dense daily series
  over ``[grid_start, grid_end]``;
- change points *before* ``grid_start`` seed the fill (py:219-225);
- days before a key's first change emit nothing — leading-null
  suppression (py:233-234);
- when several changes share a key+day, the last one in
  ``(date, *tie_break_cols)`` order wins (py:214,229-231).

Physical plan (scale rationale): instead of the naive
``grid LEFT JOIN changes`` + window (two shuffles — one hash join on
(key, day), one window sort on key), we UNION the grid rows with the
change rows and run a single window per key:

    unioned = grid(key, day, value=null, is_grid=1)
              ∪ changes(key, clamped_day, value, is_grid=0)
    filled  = last(value, ignorenulls) OVER (
                PARTITION BY key
                ORDER BY day, is_grid, change_date, *tie_break)
    result  = filled WHERE is_grid = 1 AND value IS NOT NULL

Ordering change rows (is_grid=0) before the grid row of the same day
makes same-day changes visible to that day; ordering multiple changes
by (original date, tie-break) reproduces the reference's stable-sort
last-wins rule. One shuffle on ``key_cols``, no join, and the window
is per-key — never a global sort. At 100 TB this parallelizes across
keys; skewed keys are handled by AQE (the window input per key is
bounded by days + that key's changes).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .calendar import with_date_grid


def forward_fill_daily(
    changes: DataFrame,
    *,
    key_cols: list[str],
    date_col: str,
    value_col: str,
    grid_start: dt.date | str,
    grid_end: dt.date | str,
    tie_break_cols: list[str] | None = None,
    keys_df: DataFrame | None = None,
    out_date_col: str = "day",
) -> DataFrame:
    """Densify sparse per-key change points onto a daily grid.

    ``keys_df`` (optional) supplies the key universe (e.g. a product
    dimension); by default the distinct keys observed in ``changes``.
    Returns ``key_cols + [out_date_col, value_col]``.
    """
    tie = tie_break_cols or []

    # T5 null-validity filter (py:204-208) + drop changes after the grid.
    # The cutoff compares CALENDAR DATES: cast first, because comparing a
    # timestamp-typed date_col against a date literal promotes the date
    # to midnight and silently drops same-day changes after 00:00 on
    # grid_end (the clamping below already casts the same way).
    chg = changes.na.drop(subset=key_cols + [date_col, value_col])
    chg = chg.filter(
        F.col(date_col).cast("date") <= F.lit(str(grid_end)).cast("date")
    )

    # Seed lookback: pre-grid changes participate, pinned to grid_start.
    clamped = F.greatest(F.col(date_col).cast("date"), F.lit(str(grid_start)).cast("date"))
    chg = chg.select(
        *key_cols,
        clamped.alias(out_date_col),
        F.col(date_col).cast("date").alias("__chg_date"),
        *[F.col(t).alias(f"__tie_{i}") for i, t in enumerate(tie)],
        F.col(value_col).alias(value_col),
        F.lit(0).alias("__is_grid"),
    )

    if keys_df is None:
        keys_df = chg.select(*key_cols).distinct()
    grid = with_date_grid(keys_df.select(*key_cols), grid_start, grid_end, out_date_col)
    grid = grid.select(
        *key_cols,
        F.col(out_date_col),
        F.lit(None).cast("date").alias("__chg_date"),
        *[F.lit(None).cast(chg.schema[f"__tie_{i}"].dataType).alias(f"__tie_{i}") for i in range(len(tie))],
        F.lit(None).cast(chg.schema[value_col].dataType).alias(value_col),
        F.lit(1).alias("__is_grid"),
    )

    order = [
        F.col(out_date_col),
        F.col("__is_grid"),
        F.col("__chg_date"),
        *[F.col(f"__tie_{i}") for i in range(len(tie))],
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.unionByName(chg).withColumn(
        "__filled", F.last(value_col, ignorenulls=True).over(w)
    )
    return (
        filled.filter((F.col("__is_grid") == 1) & F.col("__filled").isNotNull())
        .select(*key_cols, F.col(out_date_col), F.col("__filled").alias(value_col))
    )


def linear_interpolate_daily(
    changes: DataFrame,
    *,
    key_cols: list[str],
    date_col: str,
    value_col: str,
    grid_start: dt.date | str,
    grid_end: dt.date | str,
    tie_break_cols: list[str] | None = None,
    out_date_col: str = "day",
) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION between change points — the
    hypertable-style companion to ``forward_fill_daily``.

    Per key and grid day: value = prev + (next - prev) * elapsed/span
    between the nearest anchors; days after the last anchor hold its
    value (trailing forward-fill); days before the first anchor are
    dropped. Anchors are in-range change points only (one per key+day,
    last by ``(date, *tie_break_cols)``).

    One shuffle on the keys feeds both window passes (the ascending
    prev-scan and the descending next-scan share the partitioning;
    Catalyst reuses the exchange and only re-sorts), then everything
    is arithmetic — no joins beyond the grid construction.
    """
    start = dt.date.fromisoformat(grid_start) if isinstance(grid_start, str) else grid_start
    end = dt.date.fromisoformat(grid_end) if isinstance(grid_end, str) else grid_end
    ties = tie_break_cols or []

    d = F.col(date_col)
    # same null-validity rule as forward_fill_daily: a NULL-valued (or
    # NULL-keyed) change row is not an anchor. Keeping it would
    # desynchronize prev_d from prev_v — last(__d, ignorenulls) advances
    # to the NULL-valued row's date while last(__v, ignorenulls) still
    # holds the older anchor's value, corrupting the slope for every day
    # until the next real anchor (and a NULL-valued row could win the
    # per-day dedup over a real same-day change).
    in_range = changes.na.drop(subset=[*key_cols, value_col]).filter(
        (d >= F.lit(start)) & (d <= F.lit(end))
    )
    pick = Window.partitionBy(*key_cols, date_col).orderBy(
        *[F.col(c).desc() for c in [date_col, *ties]]
    )
    dedup = (
        in_range.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(*key_cols, d.alias("__d"), F.col(value_col).alias("__v"))
    )
    keys_df = dedup.select(*key_cols).distinct()
    grid = with_date_grid(keys_df, start, end, out_date_col)
    joined = grid.join(
        dedup,
        on=[*[grid[k] == dedup[k] for k in key_cols], grid[out_date_col] == dedup["__d"]],
        how="left",
    ).select(*[grid[k] for k in key_cols], grid[out_date_col], "__d", "__v")

    w_asc = (
        Window.partitionBy(*key_cols)
        .orderBy(out_date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_desc = (
        Window.partitionBy(*key_cols)
        .orderBy(out_date_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("__v", ignorenulls=True).over(w_asc)
    prev_d = F.last("__d", ignorenulls=True).over(w_asc)
    next_v = F.first("__v", ignorenulls=True).over(w_desc)
    next_d = F.first("__d", ignorenulls=True).over(w_desc)
    day = F.col(out_date_col)
    ratio = F.datediff(day, prev_d).cast("double") / F.datediff(next_d, prev_d).cast(
        "double"
    )
    interp = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(next_v.isNull(), prev_v)
        .when(next_d == prev_d, prev_v)
        .otherwise(prev_v + (next_v - prev_v) * ratio)
    )
    return (
        joined.withColumn("__interp", F.round(interp, 6))
        .filter(F.col("__interp").isNotNull())
        .select(*key_cols, out_date_col, F.col("__interp").alias(value_col))
    )
