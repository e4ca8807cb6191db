"""Golden tests for the hypertable-style OHLC time-bucket rollup
(ts_ohlc_rollup): open/close tie-breaking and bucket-boundary
assignment on a hand fixture with a known answer."""

from __future__ import annotations

import datetime as dt

from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )


def _run_rollup(spark, df, tmp_path):
    """ts_ohlc_rollup reads from a sf_dir; write the fixture as the
    events table and point the query at it."""
    d = str(tmp_path / "sf_fixture")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = REGISTRY["ts_ohlc_rollup"].fn(spark, d)
    return {(r["bucket"], r["event_type"]): r.asDict() for r in out.collect()}


def test_ohlc_golden(spark, tmp_path):
    t = dt.datetime(2026, 3, 1, 9, 0, 0)
    s = dt.timedelta
    rows = [
        # hour 09: open=5.0 (earliest ts), close=2.0 (latest ts),
        # low=1.0, high=9.0, vol=17.0
        (1, t + s(minutes=1), 10, "view", 5.0, None),
        (2, t + s(minutes=30), 11, "view", 9.0, None),
        (3, t + s(minutes=40), 12, "view", 1.0, None),
        (4, t + s(minutes=59), 13, "view", 2.0, None),
        # hour 10 starts a new bucket even 1s past the boundary
        (5, t + s(hours=1, seconds=1), 10, "view", 7.0, None),
        # same hour, different type = separate bar
        (6, t + s(minutes=10), 10, "click", 3.0, None),
    ]
    got = _run_rollup(spark, _events_df(spark, rows), tmp_path)
    assert set(got) == {
        ("2026-03-01 09:00", "view"),
        ("2026-03-01 10:00", "view"),
        ("2026-03-01 09:00", "click"),
    }
    bar = got[("2026-03-01 09:00", "view")]
    assert (bar["open"], bar["close"], bar["low"], bar["high"]) == (5.0, 2.0, 1.0, 9.0)
    assert bar["vol"] == 17.0 and bar["n_events"] == 4
    single = got[("2026-03-01 10:00", "view")]
    assert (single["open"], single["close"], single["n_events"]) == (7.0, 7.0, 1)


def test_ohlc_same_ts_ties_break_on_event_id(spark, tmp_path):
    """Two events at the identical timestamp: open is the lower
    event_id, close the higher — deterministic regardless of
    partitioning."""
    t = dt.datetime(2026, 3, 1, 12, 15, 0)
    rows = [
        (20, t, 1, "view", 8.0, None),
        (10, t, 1, "view", 4.0, None),
    ]
    got = _run_rollup(spark, _events_df(spark, rows), tmp_path)
    bar = got[("2026-03-01 12:00", "view")]
    assert (bar["open"], bar["close"]) == (4.0, 8.0)
