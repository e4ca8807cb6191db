"""Dense calendar generation (SURVEY T7, reference py:193-197).

Grids are produced with ``sequence()`` + ``explode`` — generated
executor-side from a literal range, so no driver materialization and
no shuffle. Attaching a grid to a keys DataFrame preserves that
DataFrame's partitioning (narrow explode, not a cross join).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _seq(start: dt.date | str, end: dt.date | str) -> F.Column:
    return F.sequence(
        F.lit(str(start)).cast("date"),
        F.lit(str(end)).cast("date"),
        F.expr("interval 1 day"),
    )


def date_grid(spark: SparkSession, start: dt.date | str, end: dt.date | str, col: str = "day") -> DataFrame:
    """Inclusive daily calendar ``start..end`` as a one-column DataFrame."""
    return spark.range(1).select(F.explode(_seq(start, end)).alias(col))


def with_date_grid(
    keys_df: DataFrame, start: dt.date | str, end: dt.date | str, col: str = "day"
) -> DataFrame:
    """keys × days, via per-row explode (narrow — no shuffle, no cross join)."""
    return keys_df.withColumn(col, F.explode(_seq(start, end)))
