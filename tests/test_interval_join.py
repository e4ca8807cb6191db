"""Binned interval join: exact range semantics through the bin+residual
plan, including every boundary case the binning could get wrong."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.operators.interval_join import interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_interval_join_matches_naive_range_join(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start: included
            (2, _ts("2024-01-01 05:59:59")),  # just inside
            (3, _ts("2024-01-01 06:00:00")),  # == end: excluded (half-open)
            (4, _ts("2024-01-01 23:30:00")),  # inside the bin-spanning window
            (5, _ts("2024-01-02 01:00:00")),  # next day, still inside w2
            (6, _ts("2024-01-03 00:00:00")),  # outside everything
        ],
        "event_id long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 06:00:00")),
            # spans a day boundary: must match events in both days
            (20, _ts("2024-01-01 23:00:00"), _ts("2024-01-02 02:00:00")),
            # overlapping windows: one event can join several windows
            (30, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 12:00:00")),
        ],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    for bin_unit in ("hour", "day"):
        got = {
            (r.event_id, r.window_id)
            for r in interval_join(
                events, "ts", windows, "w_start", "w_end", bin=bin_unit
            ).collect()
        }
        naive = {
            (r.event_id, r.window_id)
            for r in events.crossJoin(windows)
            .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
            .collect()
        }
        assert got == naive, f"bin={bin_unit}"
        # spot-pin the semantics the comparison is standing on
        assert (1, 10) in got and (3, 10) not in got  # closed start, open end
        assert (4, 20) in got and (5, 20) in got  # bin-spanning window
        assert (1, 30) in got and (5, 30) in got  # overlap fan-out
        assert all(e != 6 for e, _ in got)


def test_interval_join_no_duplicate_pairs(spark):
    """One bin per left row => each (row, window) pair appears exactly
    once even when the window covers many bins."""
    events = spark.createDataFrame(
        [(1, _ts("2024-01-05 12:00:00"))], "event_id long, ts timestamp"
    )
    windows = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00"))],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    out = interval_join(events, "ts", windows, "w_start", "w_end", bin="day")
    assert out.count() == 1


def test_interval_join_drops_degenerate_intervals(spark):
    """NULL bounds or end < start match nothing (naive-range-join
    semantics) instead of crashing F.sequence with illegal boundaries."""
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01 03:00:00"))], "event_id long, ts timestamp"
    )
    windows = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00")),  # good
            (20, _ts("2024-01-02 00:00:00"), _ts("2024-01-01 00:00:00")),  # inverted
            (30, None, _ts("2024-01-02 00:00:00")),  # null start
            (40, _ts("2024-01-01 00:00:00"), None),  # null end
        ],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.event_id, r.window_id)
        for r in interval_join(
            events, "ts", windows, "w_start", "w_end", bin="day"
        ).collect()
    }
    assert got == {(1, 10)}


def test_interval_overlap_join_matches_naive(spark):
    from etl_pricenow_to_leukerbadb_spark.operators.interval_join import (
        interval_overlap_join,
    )

    stays = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-03 10:00:00")),  # 2 days
            (2, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 06:00:00")),  # inside day 2
            (3, _ts("2024-01-05 00:00:00"), _ts("2024-01-06 00:00:00")),  # isolated
            (4, _ts("2024-01-03 10:00:00"), _ts("2024-01-03 12:00:00")),  # abuts 1 (no overlap: half-open)
            (5, _ts("2024-01-02 03:00:00"), _ts("2024-01-02 03:00:00")),  # empty [t,t)
        ],
        "stay_id long, s_start timestamp, s_end timestamp",
    )
    maint = spark.createDataFrame(
        [
            (10, _ts("2024-01-02 05:00:00"), _ts("2024-01-02 07:00:00")),  # overlaps 1 and 2
            (20, _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00")),  # covers all non-empty
            (30, _ts("2024-01-03 09:00:00"), _ts("2024-01-03 10:00:00")),  # ends exactly at 4's start
            (40, None, _ts("2024-01-02 00:00:00")),  # null start: dropped
        ],
        "m_id long, m_start timestamp, m_end timestamp",
    )
    for bin_unit in ("hour", "day"):
        got_rows = interval_overlap_join(
            stays, "s_start", "s_end", maint, "m_start", "m_end", bin=bin_unit
        ).collect()
        got = [(r.stay_id, r.m_id) for r in got_rows]
        naive = {
            (r.stay_id, r.m_id)
            for r in stays.crossJoin(maint)
            .filter(
                (F.col("s_start") < F.col("m_end"))
                & (F.col("m_start") < F.col("s_end"))
                & (F.col("s_end") > F.col("s_start"))
                & (F.col("m_end") > F.col("m_start"))
            )
            .collect()
        }
        assert len(got) == len(set(got)), f"duplicate pairs at bin={bin_unit}"
        assert set(got) == naive, f"bin={bin_unit}"
        # pin the standing semantics
        assert (1, 10) in naive and (2, 10) in naive  # genuine overlaps
        assert (1, 20) in naive and (4, 20) in naive
        assert (4, 30) not in naive  # abutting half-open windows: no overlap
        assert all(s != 5 for s, _ in naive)  # empty interval matches nothing
        assert all(m != 40 for _, m in naive)  # null bound dropped
