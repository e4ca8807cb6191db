#!/usr/bin/env python
"""Interleaved same-session A/B for the r13 LSH self-join
optimization (materialize the hashed frame once, guide §1.2/§2.4).

Cross-session bench comparisons this round are confounded by a ~1.5x
host calibration offset (BENCH_FULL_r13 floors: 0.081 committed
baseline vs 0.122 today), so the honest relative measurement is
old-vs-new ALTERNATING in one session: per round, run OLD then NEW
(then NEW then OLD the next round) and report medians. OLD is the
pre-r13 plan shape reconstructed inline (the exact code this round
replaced); NEW is the shipped operator. Both arms end in a noop-sink
count of the same result, and results are asserted identical once.

Usage: python tools/probe_r13_opt.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_pricenow_to_leukerbadb_spark.operators.dedup import (  # noqa: E402
    band_table,
    lsh_candidate_pairs,
    minhash_signatures,
)
from etl_pricenow_to_leukerbadb_spark.operators.similarity import (  # noqa: E402
    lsh_near_dup_pairs,
    norm_sq,
    cosine_prenormed,
    sign_lsh_buckets_long,
)
from etl_pricenow_to_leukerbadb_spark.plans.analytics_llm import (  # noqa: E402
    _hi_twin_corpus,
)
from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.sources.tables import (  # noqa: E402
    fan_out,
    load_table,
)


def old_lsh_candidate_pairs(signatures, id_col, n_hashes=8, bands=4):
    """Pre-r13 shape: banded self-join over the LAZY signature plan —
    the signature pipeline evaluates once per join side."""
    banded = band_table(signatures, id_col, n_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def old_lsh_near_dup_pairs(
    corpus, id_col="vec_id", vec_col="embedding",
    threshold=0.4, n_planes=4, n_tables=16, dim=64,
):
    """Pre-r13 shape: bucket self-join over the LAZY bucket plan."""
    b = sign_lsh_buckets_long(
        fan_out(corpus), id_col, vec_col, n_planes, n_tables, dim
    )
    cand = (
        b.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
        .join(
            b.select(F.col(id_col).alias("id_b"), "tbl", "bucket"),
            ["tbl", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__n"),
    )
    return (
        cand.join(vecs, cand.id_a == vecs.__vid)
        .select(
            "id_a", "id_b", F.col("__v").alias("__va"), F.col("__n").alias("__na")
        )
        .join(vecs, F.col("id_b") == vecs.__vid)
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__v"), F.col("__na"), F.col("__n")
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-r13-opt")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    hi_corpus = _hi_twin_corpus(emb)

    def run_minhash_old():
        sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
        old_lsh_candidate_pairs(sigs, "doc_id").write.format("noop").mode(
            "overwrite"
        ).save()

    def run_minhash_new():
        sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
        lsh_candidate_pairs(sigs, "doc_id").write.format("noop").mode(
            "overwrite"
        ).save()

    def run_hi_old():
        old_lsh_near_dup_pairs(
            hi_corpus, "vec_id", "embedding", 0.9, 12, 8
        ).write.format("noop").mode("overwrite").save()

    def run_hi_new():
        lsh_near_dup_pairs(
            hi_corpus, "vec_id", "embedding", threshold=0.9, n_planes=12, n_tables=8
        ).write.format("noop").mode("overwrite").save()

    # results identical (one-time assertion, not timed)
    sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    a = {tuple(r) for r in old_lsh_candidate_pairs(sigs, "doc_id").collect()}
    b = {tuple(r) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert a == b, f"minhash pair sets differ: {len(a)} vs {len(b)}"
    a = {tuple(r) for r in old_lsh_near_dup_pairs(
        hi_corpus, "vec_id", "embedding", 0.9, 12, 8).collect()}
    b = {tuple(r) for r in lsh_near_dup_pairs(
        hi_corpus, "vec_id", "embedding",
        threshold=0.9, n_planes=12, n_tables=8).collect()}
    assert a == b, f"near-dup pair sets differ: {len(a)} vs {len(b)}"
    print("# results identical on both operators")

    cases = {
        "dd_minhash_lsh pairs": (run_minhash_old, run_minhash_new),
        "dd_embedding_near_dup_hi": (run_hi_old, run_hi_new),
    }
    for name, (old, new) in cases.items():
        old(); new()  # untimed warm-up (codegen)
        t_old, t_new = [], []
        for i in range(reps):
            order = [(old, t_old), (new, t_new)]
            if i % 2:
                order.reverse()  # alternate which arm eats any drift
            for fn, sink in order:
                t0 = time.perf_counter()
                fn()
                sink.append(time.perf_counter() - t0)
        mo, mn = statistics.median(t_old), statistics.median(t_new)
        print(
            f"{name}: old median {mo:.3f}s  new median {mn:.3f}s  "
            f"({mn / mo:.2f}x)  old={['%.3f' % v for v in t_old]} "
            f"new={['%.3f' % v for v in t_new]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
