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
    chg = changes.na.drop(subset=key_cols + [date_col, value_col])
    chg = chg.filter(F.col(date_col) <= F.lit(str(grid_end)).cast("date"))

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
