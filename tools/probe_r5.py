"""Round-5 inflation probes: j8_salted_join under a synthetic hot key,
and k8-style small-file compaction at 16x data.

Companion to the probe table in SCALE.md ("Operator-level probes on
deterministically inflated inputs"). Run:

    python -m tools.probe_r5

j8: the salted join exists for the case AQE's runtime skew-split can
NOT handle (the join feeds a co-partitioned downstream op that must
not be re-split), so the probe disables AQE skew handling and
broadcast to make the plain sort-merge join actually suffer the
straggler, then measures plain vs salted on the same data, and checks
the row counts agree.

k8: compaction is coalesce-based (no shuffle), so its cost must track
DATA volume linearly and be flat in the file-count dimension; the
probe compacts the same row count fragmented into 64 vs 1024 files,
then 16x the rows.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def probe_salted_join(spark, n_fact: int, hot_share: float = 0.8, n_salts: int = 16):
    """Plain vs salted join, hot key holding `hot_share` of fact rows,
    AQE skew-split and broadcast disabled (the salted join's target
    regime). Inputs are MATERIALIZED to parquet first so the timing
    covers only the join (generating the synthetic fact inline would
    dominate and mask the straggler). The join is followed by a
    per-key count so the reduce side actually processes every joined
    row. Returns (plain_sec, salted_sec, rows)."""
    from etl_pricenow_to_leukerbadb_spark.operators.skew import salted_join

    n_dim = 20_000
    root = tempfile.mkdtemp(prefix="probe_salt_")
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        (
            spark.range(n_fact)
            .select(
                F.when(
                    F.pmod(F.hash("id", F.lit(1)), F.lit(1000))
                    < int(hot_share * 1000),
                    F.lit(7),
                )
                .otherwise(F.pmod(F.hash("id"), F.lit(n_dim)))
                .alias("k"),
                (F.col("id") % 1000).cast("double").alias("v"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(root, "fact"))
        )
        (
            spark.range(n_dim)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("label_"), F.col("id")).alias("label"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(root, "dim"))
        )
        fact = spark.read.parquet(os.path.join(root, "fact"))
        dim = spark.read.parquet(os.path.join(root, "dim"))

        def plain():
            return (
                fact.join(dim, ["k"]).groupBy("k").agg(F.sum("v")).count()
            )

        def salted():
            return (
                salted_join(fact, dim, ["k"], n_salts=n_salts)
                .groupBy("k")
                .agg(F.sum("v"))
                .count()
            )

        for k, v in confs.items():
            spark.conf.set(k, v)
        # warm both plans once (codegen), then time
        plain(), salted()
        n_plain, t_plain = timed(plain)
        n_salted, t_salted = timed(salted)
        assert n_plain == n_salted, (n_plain, n_salted)
        return t_plain, t_salted, n_plain
    finally:
        shutil.rmtree(root, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def probe_compaction(spark, n_rows: int, n_files: int, target_files: int = 8):
    """Write n_rows fragmented into n_files, compact, return seconds."""
    from etl_pricenow_to_leukerbadb_spark.sinks.layout import (
        compact_parquet,
        parquet_file_count,
    )

    root = tempfile.mkdtemp(prefix="probe_compact_")
    path = os.path.join(root, "events")
    try:
        (
            spark.range(n_rows)
            .select(
                F.col("id").alias("event_id"),
                F.pmod(F.hash("id"), F.lit(5000)).alias("user_id"),
                (F.col("id") % 7).cast("string").alias("event_type"),
                (F.col("id") % 1000).cast("double").alias("value"),
            )
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(path)
        )
        before = parquet_file_count(path)
        got, sec = timed(lambda: compact_parquet(spark, path, target_files))
        rows = spark.read.parquet(path).count()
        assert rows == n_rows, (rows, n_rows)
        return before, got, sec
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_pagerank(spark, n_edges: int, n_nodes: int):
    """Synthetic power-law-ish directed graph: src skewed toward low
    ids (hubs), dst uniform. Times 2 fixed iterations end-to-end
    (edge materialization + unrolled plan)."""
    from etl_pricenow_to_leukerbadb_spark.operators.graph import pagerank_fixed_iters

    edges = spark.range(n_edges).select(
        F.pmod(F.hash("id"), F.lit(n_nodes)).cast("long").alias("__r"),
        F.col("id"),
    ).select(
        # square the uniform draw so low ids get quadratically more
        # out-edges — a hub-heavy graph, the PageRank-hostile shape
        # (long arithmetic: int32 would overflow under ANSI at 100k^2).
        # dst hashes the ROW id, not the bucket, so the distinct edge
        # count genuinely tracks n_edges instead of saturating at
        # n_nodes deterministic pairs.
        (F.col("__r") * F.col("__r") / n_nodes).cast("long").alias("src"),
        F.pmod(F.hash("id", F.lit(7)), F.lit(n_nodes)).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))

    def run():
        return pagerank_fixed_iters(edges, n_iters=2).count()

    n = run()  # warm
    _, sec = timed(run)
    return sec, n


def probe_expectations(spark, n_rows: int):
    """All four scalar rules + one FK rule over a synthetic batch;
    single-scan compilation means the cost must track row count ~
    linearly regardless of rule count."""
    from etl_pricenow_to_leukerbadb_spark.operators.expectations import (
        Expectation,
        check_expectations,
    )

    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 997).cast("double").alias("value"),
        F.pmod(F.hash("id"), F.lit(30_000)).alias("fk"),
    )
    dim = spark.range(20_000).select(F.col("id").alias("key"))
    rules = [
        Expectation("nn", "not_null", ("id",)),
        Expectation("uq", "unique", ("id",)),
        Expectation("rg", "in_range", ("value",), lo=0, hi=500),
        Expectation("av", "accepted_values", ("value",), values=tuple(range(100))),
        Expectation("fk", "referential", ("fk",), ref_df=dim, ref_col="key"),
    ]

    def run():
        return check_expectations(df, rules).count()

    run()  # warm
    _, sec = timed(run)
    return sec


def main():
    spark = get_spark(app_name="probe_r5")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    print("== j8_salted_join hot-key probe (AQE skew-split OFF, no broadcast) ==")
    for n in (1_000_000, 16_000_000):
        tp, ts, rows = probe_salted_join(spark, n, hot_share=0.8)
        print(
            f"fact={n:,} rows (80% on one key): plain={tp:.2f}s "
            f"salted={ts:.2f}s ratio={tp / ts:.2f}x groups={rows:,}"
        )

    print("== k8 compaction probe (coalesce path) ==")
    for n_rows, n_files in ((1_000_000, 64), (1_000_000, 1024), (16_000_000, 64)):
        before, after, sec = probe_compaction(spark, n_rows, n_files)
        print(
            f"rows={n_rows:,} files {before}->{after}: {sec:.2f}s"
        )

    print("== gr_pagerank probe (2 iterations, hub-heavy synthetic graph) ==")
    for n_edges in (1_000_000, 16_000_000):
        sec, n_nodes_out = probe_pagerank(spark, n_edges, n_nodes=100_000)
        print(f"edges={n_edges:,}: {sec:.2f}s ({n_nodes_out:,} ranked nodes)")

    print("== dq_expectations probe (5 rules, one scan + one FK anti-join) ==")
    for n_rows in (1_000_000, 16_000_000):
        sec = probe_expectations(spark, n_rows)
        print(f"rows={n_rows:,}: {sec:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
