"""Binned interval (range) join: rows-in-time-windows at scale.

A raw range predicate (``e.ts >= w.start AND e.ts < w.end``) has no
equi-key, so Spark plans it as a BroadcastNestedLoopJoin — every event
row tested against every window, O(|events| x |windows|), the classic
range-join scale killer. The standard fix (used by every warehouse
range-join implementation, e.g. Databricks' range-join hints and
KDB-style bucketed windows) is *binning*: quantize time into
fixed-width bins, explode each interval into the bins it covers,
equi-join on the bin key, then apply the exact bounds as a residual
filter.

Each left row carries exactly one bin, so a (row, interval) pair can
match on at most one bin key — the binned join produces no duplicates
and needs no post-dedup.

Scale shape: the equi-join on the bin key hash-partitions both sides
(or broadcasts a small interval side — pass the interval DataFrame
through ``F.broadcast`` for a shuffle-free plan); bin width trades
join fan-out (wide bins -> more residual-filtered candidates) against
interval explosion (narrow bins -> more rows per interval). Hot bins
(event spikes) are ordinary join skew — AQE skew-join or salting on
the bin key applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN_UNITS = {"day": "DAY", "hour": "HOUR", "minute": "MINUTE"}


def interval_join(
    left: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin: str = "day",
) -> DataFrame:
    """Join ``left`` rows to every interval whose half-open window
    ``[start_col, end_col)`` contains ``left[ts_col]``.

    ``bin`` is the quantization unit (``day``/``hour``/``minute``):
    pick it near the typical interval width so each interval explodes
    into O(1) bins. Returns the joined rows with all columns from both
    sides (the internal bin key is dropped)."""
    unit = _BIN_UNITS[bin]
    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(start_col)),
                F.date_trunc(unit, F.col(end_col)),
                F.expr(f"INTERVAL 1 {unit}"),
            )
        ),
    )
    binned_left = left.withColumn("__bin", F.date_trunc(unit, F.col(ts_col)))
    return (
        binned_left.join(binned_iv, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )
