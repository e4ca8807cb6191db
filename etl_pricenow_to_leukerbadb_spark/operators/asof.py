"""Generic two-table as-of join (backward, inclusive).

The reference's J2 is a two-pointer merge over one table's change
points (``pricenow_etl.py:216-231``); the engine also provides the
general two-table form every market-data/telemetry pipeline needs:
each left row picks up the most recent right-side value with
``right.ts <= left.ts`` for the same key.

Implementation is the union-tag pattern, not a range join: tag both
sides, union, run ONE key-partitioned window ordered by (ts, side)
with right-side rows sorting first at equal timestamps (inclusive
semantics), forward-fill the right value, keep left rows. Cost is a
single shuffle on the key — a naive inequality join would be a
per-key cross product that explodes quadratically on active keys,
and Spark would plan it as BroadcastNestedLoopJoin. At 100 TB the
window state per key is one scalar (the last seen right value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    right_tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join, backward or forward.

    ``direction='backward'`` (default): each left row picks up
    ``value_cols`` from the LATEST right row with the same ``on`` keys
    and ``right.ts_col <= left.ts_col``. ``direction='forward'``: the
    EARLIEST right row with ``right.ts_col >= left.ts_col`` — the
    "next quote after the event" form (market data, next-maintenance
    lookup). Null when no qualifying row. If several right rows share
    (keys, ts), ``right_tie_break`` (largest wins) makes the pick
    deterministic — required for cross-engine reproducibility.

    Both directions are the same union-tag single-window plan — the
    forward window just orders time descending, so "last seen" means
    "earliest at-or-after"."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    on = list(on)
    value_cols = list(value_cols)
    if right_tie_break is not None:
        w_dedup = Window.partitionBy(*on, ts_col).orderBy(
            F.col(right_tie_break).desc()
        )
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    left_cols = left.columns
    # NULL-timestamp handling must match SQL three-valued logic (and
    # DuckDB's native ASOF JOIN): a NULL ts satisfies neither <= nor >=,
    # so (a) right rows with NULL ts can never be picked — drop them
    # before the union (NULLS FIRST ordering would otherwise seed every
    # early left row with their value), and (b) left rows with NULL ts
    # must come out with NULL asof values — the nulls-first orderings
    # below place them before any real right row so the running fill
    # has seen nothing.
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("__side"),  # right rows first at equal ts (inclusive)
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on and c != ts_col],
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c) for c in left_cols if c not in on and c != ts_col],
    )
    ts_order = (
        F.col(ts_col).asc_nulls_first()
        if direction == "backward"
        else F.col(ts_col).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *left_cols, *[F.col(f"asof_{c}") for c in value_cols]
    )
