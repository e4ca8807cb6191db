"""grouped_running_sum == the plain per-group window, value for value.

The operator exists to remove the one-partition-per-group skew of the
window form (SCALE.md's documented skew point for the token-budget
admission family) without changing ANY output value — so the tests
are equality pins against the window twin, including a dominant-group
layout where the decomposition actually matters and a blocks >> rows
configuration where most blocks are empty.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from etl_pricenow_to_leukerbadb_spark.functions.text import token_count
from etl_pricenow_to_leukerbadb_spark.operators.prefix import (
    grouped_running_sum,
)
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table


def _window_twin(df, group, order, value):
    w = Window.partitionBy(*group).orderBy(*[F.col(c) for c in order])
    return df.withColumn(
        "running_sum",
        F.sum(value).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def _rows(df):
    # key=str: None-keyed groups are legal and not orderable vs strings
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_matches_window_on_documents(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select(
        "source", "doc_id", token_count("text").cast("long").alias("n")
    )
    got = grouped_running_sum(
        docs, ["source"], ["n", "doc_id"], "n", num_blocks=7
    )
    want = _window_twin(docs, ["source"], ["n", "doc_id"], "n")
    assert _rows(got) == _rows(want)


def test_matches_window_under_dominant_group(spark):
    # one group holds 97% of rows — the layout the window form
    # serializes and this operator exists for
    df = spark.range(0, 3000).select(
        F.when(F.col("id") < 2900, F.lit("big"))
        .otherwise(F.concat(F.lit("s"), F.col("id") % 7))
        .alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 13 + 1).alias("v"),
    )
    got = grouped_running_sum(df, ["g"], ["k"], "v", num_blocks=16)
    want = _window_twin(df, ["g"], ["k"], "v")
    assert _rows(got) == _rows(want)
    # the decomposition actually split the dominant group: its rows
    # carry more than one distinct block-local offset, i.e. more than
    # one window partition computed it
    n_blocks_big = (
        df.repartitionByRange(16, F.col("g"), F.col("k"))
        .withColumn("p", F.spark_partition_id())
        .filter(F.col("g") == "big")
        .select("p")
        .distinct()
        .count()
    )
    assert n_blocks_big > 1


def test_null_group_keys_are_kept(spark):
    """A null group key is a real group to groupBy AND to the window —
    the operator's offsets join must be null-safe or those rows vanish
    (Catalyst inserts isnotnull under a plain equi-join)."""
    df = spark.createDataFrame(
        [(None, 1, 5), (None, 2, 7), ("a", 1, 3)],
        "g string, k int, v long",
    )
    got = grouped_running_sum(df, ["g"], ["k"], "v", num_blocks=4)
    want = _window_twin(df, ["g"], ["k"], "v")
    assert got.count() == 3
    assert _rows(got) == _rows(want)


def test_more_blocks_than_rows_and_empty_input(spark):
    df = spark.range(0, 5).select(
        F.lit("only").alias("g"), F.col("id").alias("k"), F.lit(2).alias("v")
    )
    got = grouped_running_sum(df, ["g"], ["k"], "v", num_blocks=64)
    want = _window_twin(df, ["g"], ["k"], "v")
    assert _rows(got) == _rows(want)
    empty = df.filter(F.lit(False))
    assert grouped_running_sum(empty, ["g"], ["k"], "v").count() == 0


def test_null_values_raise_loudly(spark):
    """The non-null value precondition is enforced, not just
    documented: a null-skipping running sum is not decomposable
    consistently with the window form, so the operator refuses."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, None), ("b", 1, 3)],
        "g string, k int, v long",
    )
    with pytest.raises(ValueError, match="null row"):
        grouped_running_sum(df, ["g"], ["k"], "v")


def test_reliable_pin_matches_and_requires_dir(spark, tmp_path):
    """reliable=True mirrors the iterative operators' contract: fail
    fast with setup instructions when no checkpoint dir is configured,
    byte-identical results when one is."""
    import pytest

    df = spark.range(0, 200).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 7 + 1).alias("v"),
    )
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    with pytest.raises(ValueError, match="setCheckpointDir"):
        grouped_running_sum(df, ["g"], ["k"], "v", reliable=True)
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        got = grouped_running_sum(
            df, ["g"], ["k"], "v", num_blocks=5, reliable=True
        )
        want = _window_twin(df, ["g"], ["k"], "v")
        assert _rows(got) == _rows(want)
    finally:
        # restore: the shared session must leave no checkpoint dir
        # behind (the scala setter's JVM name contains '$'). The
        # mangled name is a Spark-internal; if a version rename breaks
        # it, skip the restore rather than cascading the teardown
        # failure into unrelated tests — a stale checkpoint dir only
        # affects the reliable=True refusal assertion above, which
        # runs before this test sets one.
        try:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                sc._jvm.scala.Option.empty()
            )
        except Exception as exc:  # pragma: no cover - version drift
            import warnings

            warnings.warn(f"could not clear checkpoint dir: {exc}")


# -- mode dispatch: window / scan / auto are value-identical --------


def _plan(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_mode_window_matches_scan(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 11 + 1).alias("v"),
    )
    want = _rows(_window_twin(df, ["g"], ["k"], "v"))
    got_w = grouped_running_sum(df, ["g"], ["k"], "v", mode="window")
    got_s = grouped_running_sum(df, ["g"], ["k"], "v", mode="scan", num_blocks=8)
    assert _rows(got_w) == want
    assert _rows(got_s) == want
    # the window arm is the plain window — no scan machinery in its plan
    assert "__prefix_offset" not in _plan(got_w)
    assert "__prefix_offset" in _plan(got_s)


def test_auto_picks_window_for_small_groups(spark):
    """Below the spill threshold auto must choose the plain window —
    the measured-crossover default means the scan's extra shuffle is
    only paid when a group plausibly spills."""
    df = spark.range(0, 400).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").alias("k"),
        F.lit(3).cast("long").alias("v"),
    )
    got = grouped_running_sum(df, ["g"], ["k"], "v", mode="auto")
    assert "__prefix_offset" not in _plan(got)
    assert _rows(got) == _rows(_window_twin(df, ["g"], ["k"], "v"))


def test_auto_picks_scan_for_dominant_group(spark):
    """Above the (here: artificially lowered) threshold on a
    97%-dominant-group layout, auto must switch to the prefix scan."""
    df = spark.range(0, 2000).select(
        F.when(F.col("id") < 1940, F.lit("big"))
        .otherwise(F.concat(F.lit("s"), F.col("id") % 5))
        .alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 7 + 1).alias("v"),
    )
    got = grouped_running_sum(
        df, ["g"], ["k"], "v",
        mode="auto", window_max_group_rows=100, num_blocks=16,
    )
    assert "__prefix_offset" in _plan(got)
    assert _rows(got) == _rows(_window_twin(df, ["g"], ["k"], "v"))


def test_auto_refuses_scan_on_wide_keys(spark):
    """A group key wider than the driver-side offsets bound forces the
    window arm even past the size threshold — many small groups
    partition fine; the scan exists for FEW, LARGE groups."""
    df = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("g"),  # every row its own group
        F.col("id").alias("k"),
        F.lit(1).cast("long").alias("v"),
    )
    got = grouped_running_sum(
        df, ["g"], ["k"], "v",
        mode="auto", window_max_group_rows=0, max_partials=50,
    )
    assert "__prefix_offset" not in _plan(got)
    assert _rows(got) == _rows(_window_twin(df, ["g"], ["k"], "v"))


def test_scan_guards_partials_and_validates_args(spark):
    import pytest

    df = spark.range(0, 200).select(
        F.col("id").cast("string").alias("g"),
        F.col("id").alias("k"),
        F.lit(1).cast("long").alias("v"),
    )
    with pytest.raises(ValueError, match="max_partials"):
        grouped_running_sum(
            df, ["g"], ["k"], "v", mode="scan", max_partials=10, num_blocks=4
        )
    with pytest.raises(ValueError, match="num_blocks"):
        grouped_running_sum(df, ["g"], ["k"], "v", num_blocks=0)
    with pytest.raises(ValueError, match="mode"):
        grouped_running_sum(df, ["g"], ["k"], "v", mode="turbo")


# -- property: equality vs the window twin for ANY (groups, values) --
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# per-group lists of values; order key = list position (unique per group)
group_sets = st.dictionaries(
    keys=st.sampled_from(["a", "b", "c", "dominant"]),
    values=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=group_sets, blocks=st.sampled_from([1, 3, 17]))
def test_property_matches_window(spark, data, blocks):
    rows = [
        (g, i, v) for g, vals in data.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, k int, v long")
    got = grouped_running_sum(df, ["g"], ["k"], "v", num_blocks=blocks)
    want = _window_twin(df, ["g"], ["k"], "v")
    assert _rows(got) == _rows(want)


def test_auto_refuses_nulls_on_both_arms(spark):
    """mode='auto' must not let the non-null precondition flip with
    data volume: the same null-carrying input raises whether the
    dispatch would land on the window arm (small data) or the scan
    arm — only an EXPLICIT mode='window' keeps plain null-skipping
    window semantics."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, None), ("b", 1, 3)],
        "g string, k int, v long",
    )
    # tiny input -> auto would pick the window arm; must still refuse
    with pytest.raises(ValueError, match="null row"):
        grouped_running_sum(df, ["g"], ["k"], "v", mode="auto")
    # forced toward the scan arm -> still refuses (the scan job's gate)
    with pytest.raises(ValueError, match="null row"):
        grouped_running_sum(
            df, ["g"], ["k"], "v", mode="auto", window_max_group_rows=0
        )
    # explicit window: documented plain-window null-skipping semantics
    out = grouped_running_sum(df, ["g"], ["k"], "v", mode="window")
    assert out.count() == 3
