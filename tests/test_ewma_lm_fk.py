"""Edge-case and reference-model tests for the round-5 additions:
ts_ewma_smooth (sequential fold), tx_ngram_lm_score (bigram LM
scoring), and dq_fk_orphans (schema-wide referential audit)."""

from __future__ import annotations

import datetime as dt
import math
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY


# ---------------------------------------------------------------------------
# ts_ewma_smooth — the fold must equal a sequential reference model
# ---------------------------------------------------------------------------


def _ewma_ref(values: list[float]) -> int:
    """Sequential reference: clamp>=0, 1e-6 fixed point, alpha=1/4."""
    fixed = [math.floor(max(v, 0.0) * 1_000_000) for v in values]
    acc = fixed[0]
    for x in fixed[1:]:
        acc = acc - acc // 4 + x // 4
    return acc


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _run_ewma(spark, rows, tmp_path):
    """Run the registered query against a synthetic events table."""
    d = os.path.join(str(tmp_path), "sfX")
    os.makedirs(d, exist_ok=True)
    _events_df(spark, rows).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    out = REGISTRY["ts_ewma_smooth"].fn(spark, d)
    return {r["user_id"]: (r["n_events"], r["ewma_fixed"]) for r in out.collect()}


def test_ewma_matches_sequential_reference(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    # user 1: out-of-order arrival (the fold must sort by ts), user 2:
    # single event (seed only), user 3: negative value clamped to 0.
    rows = [
        (3, t0 + dt.timedelta(hours=2), 1, 30.5),
        (1, t0, 1, 10.0),
        (2, t0 + dt.timedelta(hours=1), 1, 20.25),
        (4, t0, 2, 7.125),
        (5, t0, 3, -5.0),
        (6, t0 + dt.timedelta(hours=1), 3, 8.0),
    ]
    got = _run_ewma(spark, rows, tmp_path)
    assert got[1] == (3, _ewma_ref([10.0, 20.25, 30.5]))
    assert got[2] == (1, _ewma_ref([7.125]))
    assert got[3] == (2, _ewma_ref([-5.0, 8.0]))


def test_ewma_skips_null_values_and_users(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, 4.0),
        (2, t0 + dt.timedelta(hours=1), 1, None),  # dropped from the fold
        (3, t0, None, 9.0),  # no user — excluded
    ]
    got = _run_ewma(spark, rows, tmp_path)
    assert got == {1: (1, _ewma_ref([4.0]))}


def test_ewma_equal_timestamps_tiebreak_on_event_id(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (9, t0, 1, 100.0),
        (2, t0, 1, 0.0),  # same ts: event_id 2 folds BEFORE event_id 9
    ]
    got = _run_ewma(spark, rows, tmp_path)
    assert got[1] == (2, _ewma_ref([0.0, 100.0]))


def test_ewma_stream_orders_subsecond_collisions_by_ts(spark, tmp_path):
    """Same-second events whose MICROSECOND order disagrees with
    event_id order must fold in full-ts order (the batch twin's and
    the oracle's ordering). A seconds-truncated sort key folded these
    by event_id instead and diverged — the fixture events carry such
    collisions."""
    from etl_pricenow_to_leukerbadb_spark.streaming.stateful import ewma_stream

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # event 9 is EARLIER by microseconds but LATER by event_id
        (9, t0 + dt.timedelta(microseconds=100), 1, 100.0),
        (2, t0 + dt.timedelta(microseconds=900), 1, 0.0),
    ]
    # a plain directory (not a *.parquet single-file path): Spark's
    # write produces a directory, and the stream's pathGlobFilter
    # branch is for the testdata's single-FILE events.parquet layout
    d = os.path.join(str(tmp_path), "events_dir")
    _events_df(spark, rows).write.mode("overwrite").parquet(d)
    got = {
        r["user_id"]: (r["n_events"], r["ewma_fixed"])
        for r in ewma_stream(spark, d).collect()
    }
    assert got[1] == (2, _ewma_ref([100.0, 0.0]))


def test_ewma_stream_equals_batch(spark, sf_small):
    """The streaming fold (O(1) state/key) must equal the batch fold
    (whole-group list) row-for-row on a finite input — the claim both
    docstrings make."""
    batch = {
        r["user_id"]: (r["n_events"], r["ewma_fixed"])
        for r in REGISTRY["ts_ewma_smooth"].fn(spark, sf_small).collect()
    }
    stream = {
        r["user_id"]: (r["n_events"], r["ewma_fixed"])
        for r in REGISTRY["st_ewma_fold"].fn(spark, sf_small).collect()
    }
    assert batch == stream


# ---------------------------------------------------------------------------
# tx_ngram_lm_score — hand-computed mini corpus
# ---------------------------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_lm_score_hand_computed(spark, tmp_path):
    d = os.path.join(str(tmp_path), "sfY")
    os.makedirs(d, exist_ok=True)
    # corpus: "a b" x2 and "a c" x1 -> P(b|a)=2/3, P(c|a)=1/3.
    # doc 3 has a single token -> no bigrams -> excluded from output.
    _docs_df(spark, ["a b", "a b", "a c", "z"]).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = REGISTRY["tx_ngram_lm_score"].fn(spark, d)
    rows = {r["doc_id"]: (r["lm_score"], r["n_bigrams"]) for r in out.collect()}
    # score(a,b) = 2_000_000 // 3 = 666666; score(a,c) = 1_000_000 // 3
    assert rows[0] == (666666, 1)
    assert rows[1] == (666666, 1)
    assert rows[2] == (333333, 1)
    assert 3 not in rows
    # ranking: the rarer continuation scores lower (less "natural")
    assert rows[2][0] < rows[0][0]


def test_lm_score_weighted_mean_within_doc(spark, tmp_path):
    d = os.path.join(str(tmp_path), "sfZ")
    os.makedirs(d, exist_ok=True)
    # one doc "a b a c": bigrams (a,b), (b,a), (a,c) — heads: a x2, b x1.
    _docs_df(spark, ["a b a c"]).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = REGISTRY["tx_ngram_lm_score"].fn(spark, d)
    (row,) = out.collect()
    # scores: (a,b)=1e6//2, (b,a)=1e6//1, (a,c)=1e6//2 -> mean = 2e6//3
    assert row["n_bigrams"] == 3
    assert row["lm_score"] == (500_000 + 1_000_000 + 500_000) // 3


# ---------------------------------------------------------------------------
# dq_fk_orphans — constructed orphans must be counted, clean FKs pass
# ---------------------------------------------------------------------------


def test_fk_orphans_detects_constructed_orphans(spark, sf_small, tmp_path):
    d = os.path.join(str(tmp_path), "sfW")
    os.makedirs(d, exist_ok=True)
    # copy the real sf0.001 tables, then plant one orphaned order
    # (o_custkey not in customer) and one null-FK order (not counted).
    from etl_pricenow_to_leukerbadb_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        src = os.path.join(sf_small, f"{t}.parquet")
        if os.path.exists(src):
            load_table(spark, sf_small, t).write.mode("overwrite").parquet(
                os.path.join(d, f"{t}.parquet")
            )
    orders = load_table(spark, sf_small, "orders")
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    # two new rows: one orphaned custkey, one NULL custkey (the NULL is
    # excluded from the audit by contract).
    extra = (
        orders.limit(2)
        .withColumn("rn", F.row_number().over(Window.orderBy("o_orderkey")))
        .withColumn("o_orderkey", F.col("o_orderkey") + max_key + F.col("rn"))
        .withColumn(
            "o_custkey",
            F.when(F.col("rn") == 1, F.lit(-999_999)).otherwise(
                F.lit(None).cast("long")
            ),
        )
        .drop("rn")
    )
    orders.unionByName(extra).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    out = REGISTRY["dq_fk_orphans"].fn(spark, d)
    rows = {r["fk"]: r for r in out.collect()}
    oc = rows["orders.o_custkey->customer"]
    assert oc["n_orphans"] == 1 and not oc["ok"]
    # null-FK row excluded from n_rows; orphan row included
    assert oc["n_rows"] == orders.filter(F.col("o_custkey").isNotNull()).count() + 1
    # untouched edges still pass
    assert rows["nation.n_regionkey->region"]["ok"]


def test_fk_orphans_clean_on_shipped_testdata(spark, sf_small):
    out = REGISTRY["dq_fk_orphans"].fn(spark, sf_small)
    rows = out.collect()
    assert len(rows) == 8
    assert all(r["ok"] for r in rows), [r["fk"] for r in rows if not r["ok"]]


# ---------------------------------------------------------------------------
# merge_upsert_evolve — schema-evolution guards and null padding
# ---------------------------------------------------------------------------


def test_evolve_merge_pads_and_merges(spark):
    from etl_pricenow_to_leukerbadb_spark.sinks.upsert import merge_upsert_evolve

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, old string")
    upd = spark.createDataFrame([(2, 99), (3, 42)], "k long, new long")
    out = {r["k"]: (r["old"], r["new"]) for r in
           merge_upsert_evolve(base, upd, keys=["k"]).collect()}
    assert out == {1: ("a", None), 2: (None, 99), 3: (None, 42)}


def test_evolve_merge_rejects_type_change(spark):
    from etl_pricenow_to_leukerbadb_spark.sinks.upsert import merge_upsert_evolve

    base = spark.createDataFrame([(1, 5)], "k long, v long")
    upd = spark.createDataFrame([(1, "five")], "k long, v string")
    with pytest.raises(ValueError, match="type-changed"):
        merge_upsert_evolve(base, upd, keys=["k"])


def test_evolve_merge_rejects_missing_key(spark):
    from etl_pricenow_to_leukerbadb_spark.sinks.upsert import merge_upsert_evolve

    base = spark.createDataFrame([(1, 5)], "k long, v long")
    upd = spark.createDataFrame([(1,)], "other long")
    with pytest.raises(ValueError, match="missing"):
        merge_upsert_evolve(base, upd, keys=["k"])


# ---------------------------------------------------------------------------
# dq_drift_tvd — invariants
# ---------------------------------------------------------------------------


def test_drift_tvd_invariants(spark, sf_small):
    rows = REGISTRY["dq_drift_tvd"].fn(spark, sf_small).collect()
    assert 1 <= len(rows) <= 10
    tvds = {r["tvd_ppm"] for r in rows}
    assert len(tvds) == 1  # global TVD repeated on every bin row
    tvd = tvds.pop()
    assert 0 <= tvd <= 1_000_000
    # TVD = half the L1 distance of the per-bin shares
    assert tvd == sum(r["drift_ppm"] for r in rows) // 2
    # shares are ppm integers that sum to ~1e6 (floor-division slack
    # strictly less than one ppm per bin)
    s_ref = sum(r["share_ref_ppm"] for r in rows)
    s_cur = sum(r["share_cur_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < s_ref <= 1_000_000
    assert 1_000_000 - len(rows) < s_cur <= 1_000_000
