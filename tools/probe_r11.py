"""Round-11 probe: composed daily-curation cost vs standing-corpus
size — the measured basis for calling ``curate_corpus_daily`` (and its
streaming twin) O(delta) end to end.

Companion to the r11 bullet in SCALE.md. Run:

    python -m tools.probe_r11

The composed job runs six stages (gate, scrub, index ingest,
probe+merge, keep table, snapshot). The scale claim is that a FIXED
delta costs the same against a 1x, 4x, and 16x standing corpus for
every stage except the ones that are linear BY CONTRACT (the keep
table when fed the full corpus — here fed the delta, production shape
for incremental keep-lists — and the snapshot publish, which rewrites
the resolved table and is therefore threshold-gated in the loops).
This probe:

- builds a standing corpus of N x the sf0.1 documents table
  (per-replica-salted texts so collision structure is unchanged),
  curates it once into a fresh index + clustering + snapshot (the
  standing state, untimed at each scale);
- then times ``curate_corpus_daily`` of a FIXED ~250-doc delta against
  each standing scale, with the per-stage split the job itself
  reports (``stage_timings``), snapshot threshold high so the timed
  runs measure the production skip path;
- prints one JSON line per scale.

Expected shape (and what r11 measured): gate/scrub flat (delta-sized
expressions), index ingest flat (delta hashing + one ranged guard),
probe+merge near-flat (the corpus-side band scan is partition-pruned
to the delta's buckets; the endpoint resolve is min/max-pruned into
the node-sorted base), keep flat (delta-fed), snapshot-skip flat (one
provenance read + one resolved count — the count IS linear in
clustered nodes, the reason the loops gate publishes on a row
threshold instead of publishing per batch).

Correctness of every stage is pytest-pinned (tests/test_orchestrate.py
incl. stream-vs-batch equivalence); this probe measures only cost.
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

from etl_pricenow_to_leukerbadb_spark.orchestrate import (  # noqa: E402
    curate_corpus_daily,
)
from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_PROBE_SCALES", "1,4,16").split(",")
]
DELTA_DOCS = int(os.environ.get("SPARK_GRAFT_PROBE_DELTA", "250"))


def main() -> None:
    spark = get_spark(app_name="probe_r11")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    work = tempfile.mkdtemp(prefix="probe_r11_")
    try:
        for scale in SCALES:
            # standing corpus: `scale` salted replicas with disjoint ids
            # (salt keeps the shingle sets distinct across replicas, so
            # the collision structure matches the 1x corpus per replica)
            standing = None
            for r in range(scale):
                rep = docs.select(
                    (F.col("doc_id") + F.lit(r * (max_id + 1))).alias(
                        "doc_id"
                    ),
                    F.concat(
                        F.col("text"), F.lit(f" replica{r}")
                    ).alias("text"),
                )
                standing = rep if standing is None else standing.unionByName(rep)
            base_path = f"{work}/base_{scale}"
            standing.write.parquet(base_path)
            standing = spark.read.parquet(base_path)

            idx = f"{work}/idx_{scale}"
            cl = f"{work}/cl_{scale}"
            snap = f"{work}/snap_{scale}"
            t0 = time.perf_counter()
            curate_corpus_daily(
                standing, idx, cl, snap, snapshot_min_rows_behind=10**9
            )
            build_sec = time.perf_counter() - t0

            # fixed delta: fresh ids, texts sampled from the corpus so
            # they have real near-dup partners in the standing state
            delta = (
                docs.orderBy("doc_id")
                .limit(DELTA_DOCS)
                .select(
                    (
                        F.col("doc_id") + F.lit(scale * (max_id + 1))
                    ).alias("doc_id"),
                    "text",
                )
            )
            delta_path = f"{work}/delta_{scale}"
            delta.write.parquet(delta_path)
            delta = spark.read.parquet(delta_path)

            stage_sec: dict[str, float] = {}
            t0 = time.perf_counter()
            audit = curate_corpus_daily(
                delta,
                idx,
                cl,
                snap,
                snapshot_min_rows_behind=10**9,
                stage_timings=stage_sec,
            )
            delta_sec = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "scale": scale,
                        "standing_docs": n_docs * scale,
                        "standing_build_sec": round(build_sec, 2),
                        "delta_docs": DELTA_DOCS,
                        "delta_curate_sec": round(delta_sec, 2),
                        "stages_sec": {
                            k: round(v, 2) for k, v in stage_sec.items()
                        },
                        "pairs": audit["pairs"],
                        "new_nodes": audit["merge"]["new_nodes"],
                        "snapshot_published": audit["snapshot"]["published"],
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
