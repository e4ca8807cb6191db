"""Round-9 probes: incremental cluster maintenance delta cost vs the
full recompute across corpus inflations, and the residual-IVFADC
recall lever vs corpus size.

Companion to the probe table in SCALE.md. Run:

    python -m tools.probe_r9            # both probes
    python -m tools.probe_r9 clusters   # just the cluster probe
    python -m tools.probe_r9 recall     # just the recall probe

``merge_cluster_delta`` claims O(delta + log): merging a fixed-size
delta's candidate pairs into the persisted clustering should cost the
same whether the standing corpus is 1x or 16x, while the full
pairs-then-components recompute it replaces grows with the corpus.
This probe builds a near-dup index + clustering over deterministically
inflated copies of the sf0.1 documents table (each replica's text
salted with a replica token so texts — and therefore shingle sets and
pairs — don't collide across replicas), then times, per inflation:

- FULL: minhash + LSH pairs + connected_components over the whole
  union (the O(corpus) loop step the module removes);
- INCR: ``ingest_and_update_clusters`` for a fixed 250-doc delta
  (near-dup copies of replica-0 documents under fresh ids, so the
  merge genuinely touches existing clusters).

Equivalence of the two results is pytest-pinned
(tests/test_cluster_index.py); this probe measures only cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
INFLATIONS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_PROBE_INFLATIONS", "1,4,16"
).split(",")]
DELTA_DOCS = 250


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def residual_recall_probe(spark) -> dict:
    """Recall@5 of the trained IVFADC index, raw vs residual encoding,
    at the sf0.1 corpus (2 k vectors, 20 queries): measures the
    recall lever's growth with corpus size — the gate corpus (500
    vectors) reads 0.92 vs 0.94 where quantization error barely
    matters; here the within-list code budget pays visibly."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        _sq_l2_fp,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    qq = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q"))
    cc = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__c"))
    ex = (
        cc.crossJoin(F.broadcast(qq))
        .filter("neighbor_id != query_id")
        .select("query_id", "neighbor_id", _sq_l2_fp(F.col("__q"), F.col("__c")).alias("d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("neighbor_id").asc())
    exact: dict = {}
    for r in ex.withColumn("rank", F.row_number().over(w)).filter("rank<=5").collect():
        exact.setdefault(r[0], set()).add(r[1])
    tmp = tempfile.mkdtemp(prefix="probe_r9_recall_")
    out = {"probe": "residual_recall", "corpus_vectors": emb.count(), "n_queries": len(exact)}
    try:
        for res in (False, True):
            path = f"{tmp}/i_{res}"
            build_ivfpq_index(emb, path, n_centroids=16, train=True, residual=res)
            got: dict = {}
            for r in search_ivfpq_index(
                spark, path, q, emb, n_probe=4, k=5
            ).select("query_id", "neighbor_id").collect():
                got.setdefault(r[0], set()).add(r[1])
            rec = sum(len(got.get(k, set()) & exact[k]) / 5 for k in exact) / len(exact)
            out["residual" if res else "raw"] = round(rec, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        build_cluster_assignments,
        ingest_and_update_clusters,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup import (
        connected_components_twophase,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        build_dedup_index,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark(app_name="probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("recall", "both"):
        print(json.dumps(residual_recall_probe(spark)))
        if which == "recall":
            spark.stop()
            return
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    offset = 10 ** (len(str(n_docs)) + 2)

    def replica(k: int):
        # per-replica text salt: identical texts across replicas would
        # pair every copy with every copy (N^2 blowup); a leading salt
        # token shifts every shingle instead
        return docs.select(
            (F.col("doc_id") + F.lit(k * offset)).alias("doc_id"),
            F.concat(F.lit(f"replica{k}salt "), F.col("text")).alias("text"),
        )

    results = []
    for infl in INFLATIONS:
        corpus = replica(0)
        for k in range(1, infl):
            corpus = corpus.unionByName(replica(k))
        corpus = corpus.localCheckpoint()
        n_corpus = corpus.count()
        # fixed-size delta: near-dup copies of replica-0 docs under
        # fresh ids — the merge genuinely lands inside existing clusters
        delta = (
            replica(0)
            .filter(F.col("doc_id") % (n_docs // DELTA_DOCS) == 0)
            .select(
                (F.col("doc_id") + F.lit(INFLATIONS[-1] * offset * 2)).alias(
                    "doc_id"
                ),
                "text",
            )
            .localCheckpoint()
        )
        n_delta = delta.count()

        work = tempfile.mkdtemp(prefix=f"probe_r9_{infl}x_")
        try:
            index_path = f"{work}/ddx"
            clusters_path = f"{work}/cl"
            build_dedup_index(corpus, index_path, allow_short=True)
            sigs = minhash_signatures(corpus, "doc_id", "text", 3, 8)
            labels = connected_components_twophase(
                lsh_candidate_pairs(sigs, "doc_id", 8, 4)
            )
            build_cluster_assignments(labels, clusters_path)

            union = corpus.unionByName(delta)
            _, t_full = timed(
                lambda: connected_components_twophase(
                    lsh_candidate_pairs(
                        minhash_signatures(union, "doc_id", "text", 3, 8),
                        "doc_id",
                        8,
                        4,
                    )
                ).count()
            )
            stats, t_incr = timed(
                lambda: ingest_and_update_clusters(
                    delta, index_path, clusters_path, allow_short=True
                )
            )
            row = {
                "inflation": infl,
                "corpus_docs": n_corpus,
                "delta_docs": n_delta,
                "full_recompute_sec": round(t_full, 3),
                "incremental_sec": round(t_incr, 3),
                "speedup": round(t_full / t_incr, 2),
                "merge_stats": stats,
            }
            results.append(row)
            print(json.dumps(row), file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "cluster_incremental_vs_full", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
