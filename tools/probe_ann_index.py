"""Round-5 inflation probe: persisted PQ index search vs the
from-scratch scorer on a 32x-inflated corpus.

Companion to the persisted-index row in SCALE.md (Similarity search
section). Run:

    python -m tools.probe_ann_index

The claim under test: after ``build_pq_index`` runs the O(N)
quantization once, every subsequent search skips it — so from-scratch
and persisted search must diverge as the corpus grows, and the
no-rerank path (``corpus=None``) must be cheaper still (no raw-vector
join at all). The corpus is written to parquet first so the probe
times scans, not the in-memory union.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (  # noqa: E402
    build_pq_index,
    search_pq_index,
)
from etl_pricenow_to_leukerbadb_spark.operators.similarity import (  # noqa: E402
    pq_adc_topk,
)
from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table  # noqa: E402

INFLATE = 32


def best3(fn) -> float:
    fn().count()  # untimed warm-up (codegen)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().count()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    spark = get_spark(app_name="probe_ann_index")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    n_base = base.count()
    big = base
    for i in range(1, INFLATE):
        big = big.unionByName(
            base.select((F.col("vec_id") + n_base * i).alias("vec_id"), "embedding")
        )
    d = tempfile.mkdtemp()
    try:
        big.write.parquet(f"{d}/corpus")
        corpus = spark.read.parquet(f"{d}/corpus")
        print(f"corpus: {corpus.count()} vectors ({INFLATE}x sf inflation)")
        queries = base.filter(F.col("vec_id") < 50)
        t0 = time.perf_counter()
        build_pq_index(corpus, f"{d}/pq")
        print(f"build once: {time.perf_counter() - t0:.2f}s")
        print(
            "from-scratch pq_adc_topk: "
            f"{best3(lambda: pq_adc_topk(corpus, queries, k=5, rerank_factor=20)):.2f}s"
        )
        print(
            "persisted search (exact re-rank): "
            f"{best3(lambda: search_pq_index(spark, f'{d}/pq', queries, corpus, k=5, rerank_factor=20)):.2f}s"
        )
        print(
            "persisted search (no re-rank, corpus=None): "
            f"{best3(lambda: search_pq_index(spark, f'{d}/pq', queries, None, k=5)):.2f}s"
        )
        # trained vs fixed codebook at the same corpus: the build pays
        # one extra Lloyd refinement, search cost is identical by
        # construction (same code-scan shape), recall is what changes
        t0 = time.perf_counter()
        build_pq_index(corpus, f"{d}/pq_trained", train=True)
        print(f"build trained: {time.perf_counter() - t0:.2f}s")
        print(
            "persisted trained search (no re-rank): "
            f"{best3(lambda: search_pq_index(spark, f'{d}/pq_trained', queries, None, k=5)):.2f}s"
        )
    finally:
        shutil.rmtree(d)


if __name__ == "__main__":
    main()
