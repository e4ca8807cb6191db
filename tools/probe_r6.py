"""Round-6 inflation probes: j9_interval_overlap at 16x BOTH sides
(256x the pair space), and blocked-vs-exact embedding near-dup at the
production threshold (the dd_embedding_near_dup_hi shape).

Companion to the probe table in SCALE.md ("Operator-level probes on
deterministically inflated inputs"). Run:

    python -m tools.probe_r6

j9: the binned interval-overlap join must scale with EMITTED pairs,
never with the |A| x |B| pair space — the probe inflates both sides
16x over the SAME time range (so pair space grows 256x and true
overlaps grow with it), times the join + per-window count, and
asserts the plan stays an equi-join (no nested-loop/cartesian).

near-dup: at the corpus's forced-low 0.4 threshold SCALE.md documents
why blocking cannot beat broadcast all-pairs; this probe measures the
regime the operator exists for — a ~0.995-cosine twin-augmented
corpus at threshold 0.9 — where the bucket join passes a
near-constant candidate set while the exact baseline still scores
every pair. Results must agree exactly (the blocked path's recall on
the planted twins is part of the check).
"""

from __future__ import annotations

import os
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


def _intervals(spark, n: int, length_h: int, span_days: int, path: str) -> None:
    """n half-open intervals of `length_h` hours, starts scattered
    deterministically over `span_days`, materialized to parquet so the
    probe times only the join."""
    (
        spark.range(n)
        .select(
            F.col("id"),
            (
                F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                + F.make_dt_interval(
                    F.lit(0), F.lit(0), F.lit(0),
                    ((F.col("id") * 7919) % (span_days * 86400)).cast("double"),
                )
            ).alias("start"),
        )
        .select(
            "id",
            "start",
            (F.col("start") + F.expr(f"INTERVAL {length_h} HOUR")).alias("end"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def probe_interval_overlap(spark, n_left: int, n_right: int, k: int):
    """(base_sec, base_pairs, infl_sec, infl_pairs) for 1x vs kx BOTH
    sides over the same 30-day range — pair space grows k^2."""
    from etl_pricenow_to_leukerbadb_spark.operators.interval_join import (
        interval_overlap_join,
    )

    root = tempfile.mkdtemp(prefix="probe_j9_")
    results = []
    for mult in (1, k):
        lp, rp = f"{root}/l{mult}", f"{root}/r{mult}"
        _intervals(spark, n_left * mult, 3, 30, lp)
        _intervals(spark, n_right * mult, 6, 30, rp)
        left = spark.read.parquet(lp)
        right = spark.read.parquet(rp).select(
            F.col("id").alias("rid"),
            F.col("start").alias("rstart"),
            F.col("end").alias("rend"),
        )

        def run():
            joined = interval_overlap_join(
                left, "start", "end", right, "rstart", "rend", bin="hour"
            )
            return joined.groupBy("rid").count().agg(
                F.sum("count").alias("pairs")
            ).collect()[0]["pairs"]

        run()  # warm
        pairs, sec = timed(run)
        plan = (
            interval_overlap_join(
                left, "start", "end", right, "rstart", "rend", bin="hour"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
        results.append((sec, pairs))
    (b_sec, b_pairs), (i_sec, i_pairs) = results
    print(
        f"j9 interval-overlap: base {n_left}x{n_right} -> {b_pairs} pairs "
        f"{b_sec:.2f}s; {k}x BOTH sides ({k * k}x pair space) -> "
        f"{i_pairs} pairs {i_sec:.2f}s ({i_sec / b_sec:.1f}x time, "
        f"{i_pairs / max(b_pairs, 1):.0f}x output)"
    )
    return results


def probe_blocked_near_dup_hi(spark, sf_dir: str, k_inflate: int = 8):
    """Blocked (sign-LSH, 16x4) vs exact all-pairs near-dup at
    threshold 0.9 — the dd_embedding_near_dup_hi shape — at 1x and at
    ``k_inflate``x the corpus.

    Inflation keeps the TRUE-pair count constant (copy c rotates every
    embedding by c positions, which decorrelates it from every other
    copy — rotations of near-orthogonal vectors stay near-orthogonal —
    and the planted twins exist only in copy 0), so the exact path's
    work grows k^2 while the answer doesn't: exactly the regime LSH
    blocking exists for. At 1x local scale the blocked path LOSES
    (its multi-stage bucket join costs more than one codegen'd
    broadcast cross product over a toy corpus) — that number is
    reported too, because the honest claim is a crossover, not a
    universal win."""
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        embedding_near_dup_pairs,
        lsh_near_dup_pairs,
    )
    from etl_pricenow_to_leukerbadb_spark.plans.analytics_llm import (
        _hi_twin_corpus,
    )
    from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table

    root = tempfile.mkdtemp(prefix="probe_dd_hi_")
    base = _hi_twin_corpus(load_table(spark, sf_dir, "embeddings"))

    def rotated(df, c: int):
        if c == 0:
            return df
        return df.select(
            (F.col("vec_id") + c * 20_000_000).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), c + 1, 64 - c),
                F.slice(F.col("embedding"), 1, c),
            ).alias("embedding"),
        )

    out = {}
    for mult in (1, k_inflate):
        corpus_df = rotated(base, 0)
        for c in range(1, mult):
            corpus_df = corpus_df.unionByName(rotated(base, c))
        path = f"{root}/corpus{mult}"
        corpus_df.write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)

        def run_blocked():
            return sorted(
                (r.id_a, r.id_b)
                for r in lsh_near_dup_pairs(
                    corpus, "vec_id", "embedding",
                    threshold=0.9, n_planes=12, n_tables=8,
                ).collect()
            )

        def run_exact():
            return sorted(
                (r.id_a, r.id_b)
                for r in embedding_near_dup_pairs(
                    corpus, "vec_id", "embedding", threshold=0.9
                ).collect()
            )

        if mult == 1:
            run_blocked(); run_exact()  # warm (sub-second runs, JIT matters)
        blocked, b_sec = timed(run_blocked)
        exact, e_sec = timed(run_exact)
        assert blocked == exact, (
            f"{mult}x: blocked/exact disagree: "
            f"{len(blocked)} vs {len(exact)} pairs"
        )
        n = corpus.count()
        print(
            f"dd near-dup @0.9 [{mult}x]: corpus {n} vecs, "
            f"{len(exact)} true pairs — exact all-pairs {e_sec:.2f}s vs "
            f"LSH-blocked {b_sec:.2f}s ({e_sec / b_sec:.1f}x), "
            "identical pair sets (recall 1.0)"
        )
        out[mult] = (b_sec, e_sec, len(exact))
    return out


if __name__ == "__main__":
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    probe_interval_overlap(spark, 1000, 800, 16)
    probe_blocked_near_dup_hi(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
