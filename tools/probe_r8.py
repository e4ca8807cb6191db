"""Round-8 probes: point-probe layout at scale, serving-compaction
cost, and the handle-cache per-search overhead drop.

Companion to the probe table in SCALE.md ("Operator-level probes on
deterministically inflated inputs"). Run:

    python -m tools.probe_r8

point-probe: the partitioned dedup-index layout (``bucket_prefix_len
> 0``) claims the serving shape — a small probe's corpus-side scan is
pruned to the directories its buckets can live in. The claim was
plan-asserted (PartitionFilters) but not scale-measured; this probe
builds flat and partitioned indexes over a 16x-inflated corpus and
compares 1-doc and bulk probe latency plus the BYTES under the scanned
directories (pruned vs full band table).

serving-compaction: ``compact_index_serving`` buys reader isolation by
compacting a COPY of the live generation (plus byte-copying the small
artifacts) and keeping the previous generation for one interval. The
probe times it against the in-place ``compact_index`` on identical
fragmented indexes and reports the wall ratio and the storage factor —
the rent the zero-downtime swap pays.

handle-cache: every search re-validated meta + codebook + (IVFADC)
centroids with 3-5 small driver jobs; the generation-keyed cache cuts
a hit to ONE commit-marker job. The probe times N repeated searches
cold (cache invalidated per call) vs warm and reports per-search
overhead drop.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def _inflate_docs(spark, factor: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    big = docs
    for k in range(1, factor):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(int(k * span))).alias("doc_id"),
                # perturb so inflated copies are not exact dups
                F.concat(F.col("text"), F.lit(f" copymark{k}")).alias("text"),
            )
        )
    return big, span * factor


def probe_point_probe_scale(spark) -> dict:
    """Flat vs partitioned layout at 16x corpus: probe latency and the
    bytes under the directories each probe's corpus scan touches."""
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        _bp,
        build_dedup_index,
        compact_dedup_index,
        load_dedup_index,
        query_dedup_candidates,
    )

    geom = dict(k_shingle=3, n_hashes=8, bands=4, allow_short=True)
    results: dict = {}
    with tempfile.TemporaryDirectory() as tmp:
        corpus, hi = _inflate_docs(spark, 64)
        results["corpus_rows"] = corpus.count()
        one_doc = corpus.filter(F.col("doc_id") == 17).select("doc_id", "text")
        bulk = corpus.filter(F.col("doc_id") % 100 == 3).select("doc_id", "text")
        flat, part = f"{tmp}/flat", f"{tmp}/part"
        build_dedup_index(corpus, flat, **geom)
        build_dedup_index(corpus, part, bucket_prefix_len=2, **geom)
        # compact both to the maintained shape first: a fresh 32-task
        # build leaves tiny per-task files whose fixed footer overhead
        # would dominate the bytes comparison at probe-bench scale
        compact_dedup_index(spark, flat)
        compact_dedup_index(spark, part)

        for label, probe in {"one_doc": one_doc, "bulk_1pct": bulk}.items():
            probe = probe.localCheckpoint(eager=True)
            row: dict = {"probe_rows": probe.count()}
            for layout, path in {"flat": flat, "part": part}.items():
                # untimed warm-up (codegen), then min-of-3
                query_dedup_candidates(spark, path, probe).count()
                samples = []
                for _ in range(3):
                    _, sec = timed(
                        lambda: query_dedup_candidates(spark, path, probe).count()
                    )
                    samples.append(sec)
                row[f"{layout}_probe_sec"] = round(min(samples), 3)
            # bytes the corpus-side scan can touch: full band table for
            # the flat layout; only the probed bp directories for the
            # partitioned one (the PartitionFilters prune, recomputed
            # here from the probe's buckets)
            from etl_pricenow_to_leukerbadb_spark.operators.dedup import (
                band_table,
                minhash_signatures,
            )

            _, params = load_dedup_index(spark, part)
            sigs = minhash_signatures(
                probe, "doc_id", "text", params["k_shingle"], params["n_hashes"]
            )
            buckets = band_table(
                sigs, "doc_id", params["n_hashes"], params["bands"]
            ).withColumn("bp", _bp(2))
            prefixes = [
                r["bp"] for r in buckets.select("bp").distinct().collect()
            ]
            row["flat_scan_bytes"] = _dir_bytes(f"{flat}/bands")
            row["part_scan_bytes"] = sum(
                _dir_bytes(f"{part}/bands/bp={p}") for p in prefixes
            )
            row["bp_dirs_touched"] = len(prefixes)
            row["bp_dirs_total"] = 256
            row["bytes_ratio_flat_over_part"] = round(
                row["flat_scan_bytes"] / max(1, row["part_scan_bytes"]), 1
            )
            results[label] = row
    return results


def probe_serving_compaction(spark) -> dict:
    """In-place vs serving compaction on identical fragmented indexes:
    wall ratio + the storage factor the one-generation grace costs."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_pq_index,
        compact_index,
        compact_index_serving,
        migrate_index_to_serving,
    )

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    results: dict = {"corpus_rows": base.count()}
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set(key, "false")
        try:
            # fragment the codes table the way a micro-batch ingest does
            build_pq_index(base.repartition(128), f"{tmp}/inplace")
            build_pq_index(base.repartition(128), f"{tmp}/serving")
        finally:
            spark.conf.set(key, prev)
        _, sec_inplace = timed(lambda: compact_index(spark, f"{tmp}/inplace"))
        migrate_index_to_serving(spark, f"{tmp}/serving")
        size_single = _dir_bytes(f"{tmp}/serving")
        _, sec_serving = timed(
            lambda: compact_index_serving(spark, f"{tmp}/serving")
        )
        size_double = _dir_bytes(f"{tmp}/serving")  # old gen retained
        results["inplace_sec"] = round(sec_inplace, 3)
        results["serving_sec"] = round(sec_serving, 3)
        results["wall_ratio_serving_over_inplace"] = round(
            sec_serving / sec_inplace, 2
        )
        results["storage_factor_during_grace"] = round(
            size_double / size_single, 2
        )
    return results


def probe_handle_cache(spark) -> dict:
    """N repeated persisted-index searches, cache cold (invalidated per
    call) vs warm: the per-search driver-job overhead the cache cuts."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        invalidate_index_handles,
        search_ivfpq_index,
    )

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = base.filter(F.col("vec_id") < 3).localCheckpoint(eager=True)
    n = 10
    results: dict = {"searches": n}
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/idx"
        build_ivfpq_index(base, path, n_centroids=16)

        def run(cold: bool) -> float:
            t0 = time.perf_counter()
            for _ in range(n):
                if cold:
                    invalidate_index_handles()
                search_ivfpq_index(
                    spark, path, queries, base, n_probe=4, k=5
                ).count()
            return time.perf_counter() - t0

        run(cold=True)  # untimed warm-up (codegen for both variants)
        results["cold_sec_total"] = round(run(cold=True), 3)
        results["warm_sec_total"] = round(run(cold=False), 3)
        results["per_search_saving_ms"] = round(
            (results["cold_sec_total"] - results["warm_sec_total"]) / n * 1000, 1
        )
    return results


def probe_prefix_scan_skew(spark) -> dict:
    """Window-per-group vs ``grouped_running_sum`` on a dominant-group
    layout (one group holds 99% of rows): the window form computes the
    big group's running sum in ONE task regardless of core count; the
    two-level scan bounds every window partition by a range block.
    Rows sized so the serialized task is the visible cost on local[32].
    Equality of outputs is pytest-pinned (tests/test_prefix.py); this
    probe measures only the wall ratio and the parallelism achieved."""
    from pyspark.sql import Window, functions as F

    from etl_pricenow_to_leukerbadb_spark.operators.prefix import (
        grouped_running_sum,
    )

    # measured series (SCALE.md): 3M/12M locally favor the window
    # (serialized sort at memory speed vs two extra parallel passes);
    # at 48M (SPARK_GRAFT_PROBE_ROWS=48000000, SPARK_DRIVER_MEMORY=48g)
    # the dominant group's single window partition spills and the scan
    # wins, 1.13x — the cliff that only deepens with size
    n = int(os.environ.get("SPARK_GRAFT_PROBE_ROWS", 3_000_000))
    df = (
        spark.range(0, n)
        .select(
            F.when(F.col("id") % 100 < 99, F.lit("web"))
            .otherwise(F.concat(F.lit("s"), F.col("id") % 11))
            .alias("source"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 997 + 1).alias("n_tokens"),
        )
        .localCheckpoint()  # measure the scans, not the generator
    )

    w = Window.partitionBy("source").orderBy("doc_id")
    windowed = df.withColumn(
        "cum", F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    _, t_window = timed(lambda: windowed.agg(F.sum("cum")).collect())

    _, t_scan = timed(
        lambda: grouped_running_sum(
            df, ["source"], ["doc_id"], "n_tokens", out_col="cum"
        )
        .agg(F.sum("cum"))
        .collect()
    )

    blocks_big = (
        df.repartitionByRange(32, F.col("source"), F.col("doc_id"))
        .withColumn("p", F.spark_partition_id())
        .filter(F.col("source") == "web")
        .select("p")
        .distinct()
        .count()
    )
    return {
        "rows": n,
        "dominant_share": 0.99,
        "window_sec": round(t_window, 3),
        "scan_sec": round(t_scan, 3),
        "ratio": round(t_window / t_scan, 2),
        "dominant_group_blocks": blocks_big,
    }


def main() -> None:
    spark = get_spark(app_name="probe-r8")
    out = {
        "sf_dir": SF_DIR,
        "point_probe_scale": probe_point_probe_scale(spark),
        "serving_compaction": probe_serving_compaction(spark),
        "handle_cache": probe_handle_cache(spark),
        "prefix_scan_skew": probe_prefix_scan_skew(spark),
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
