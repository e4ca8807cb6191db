"""Round-12 probe: embedding-side composed daily-curation cost vs
standing-corpus size — the measured basis for calling
``curate_corpus_daily_vec`` (and the streaming
``stream_vec_dedup_cluster_job`` it twins) O(delta) end to end, the
vector counterpart of ``tools/probe_r11.py``.

Run:

    python -m tools.probe_r12

Shape of the experiment, mirroring the text probe:

- builds a standing corpus of N x the sf0.1 embeddings table. Each
  replica's vectors go through a per-replica deterministic coordinate
  sign-flip (an orthogonal transform, applied identically to every
  vector of the replica): intra-replica near-dup structure is
  preserved EXACTLY (cosines are invariant under a shared orthogonal
  map), while cross-replica cosines scramble to ~0 in 64 dims — the
  vector analog of probe_r11's per-replica text salt, preventing the
  16x corpus from being 16 exact copies whose buckets collide
  wholesale (which would grow pairs quadratically and measure a
  corpus no one ships);
- curates the standing corpus once into a fresh sign-LSH index +
  clustering + snapshot (untimed at each scale);
- then times ``curate_corpus_daily_vec`` of a FIXED ~250-vector delta
  (fresh ids, replica-0 vectors, so it has real near-dup partners in
  the standing state) against each standing scale, with the job's own
  per-stage split, snapshot threshold high so the timed runs measure
  the production skip path;
- prints one JSON line per scale.

Expected shape: validity gate flat (delta-sized expressions), index
ingest flat (delta bucketing + one ranged guard), probe+merge
near-flat in corpus size (the corpus-side bucket scan is pruned to
the delta's buckets; cost tracks emitted pairs), keep flat
(delta-fed), snapshot-skip flat. Correctness of every stage is
pytest-pinned (tests/test_orchestrate.py); this probe measures only
cost.
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
    curate_corpus_daily_vec,
)
from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_PROBE_SCALES", "1,4,16").split(",")
]
DELTA_VECS = int(os.environ.get("SPARK_GRAFT_PROBE_DELTA", "250"))


def _replica(vecs, r: int, max_id: int):
    """Replica ``r`` with disjoint ids and a per-replica orthogonal
    sign flip: coordinate j is negated iff ``(j+1)*(r+3) % 97 < 48``
    — a distinct flip pattern per replica (r up to dozens). Replica 0
    is the IDENTITY: the probe's fixed delta carries raw corpus
    vectors, and they must be true near-dups of replica 0's standing
    vectors (a flipped replica 0 would leave the delta with only
    chance-collision pairs, measuring a workload that never exercises
    the true-partner merge path)."""
    ids = (F.col("vec_id") + F.lit(r * (max_id + 1))).alias("vec_id")
    if r == 0:
        return vecs.select(ids, "embedding")
    flip = lambda x, j: x * F.when(  # noqa: E731
        F.pmod((j + F.lit(1)) * F.lit(r + 3), F.lit(97)) < F.lit(48),
        F.lit(-1.0),
    ).otherwise(F.lit(1.0))
    return vecs.select(
        ids,
        F.transform("embedding", flip).cast("array<float>").alias("embedding"),
    )


def main() -> None:
    spark = get_spark(app_name="probe_r12")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n_vecs = vecs.count()
    max_id = vecs.agg(F.max("vec_id")).collect()[0][0]
    work = tempfile.mkdtemp(prefix="probe_r12_")
    try:
        for scale in SCALES:
            standing = None
            for r in range(scale):
                rep = _replica(vecs, r, max_id)
                standing = rep if standing is None else standing.unionByName(rep)
            base_path = f"{work}/base_{scale}"
            standing.write.parquet(base_path)
            standing = spark.read.parquet(base_path)

            idx = f"{work}/idx_{scale}"
            cl = f"{work}/cl_{scale}"
            snap = f"{work}/snap_{scale}"
            t0 = time.perf_counter()
            curate_corpus_daily_vec(
                standing, idx, cl, snap, snapshot_min_rows_behind=10**9
            )
            build_sec = time.perf_counter() - t0

            # fixed delta: fresh ids, replica-0 vectors — real near-dup
            # partners exist in the standing state at every scale
            delta = (
                vecs.orderBy("vec_id")
                .limit(DELTA_VECS)
                .select(
                    (
                        F.col("vec_id") + F.lit(scale * (max_id + 1))
                    ).alias("vec_id"),
                    "embedding",
                )
            )
            delta_path = f"{work}/delta_{scale}"
            delta.write.parquet(delta_path)
            delta = spark.read.parquet(delta_path)

            stage_sec: dict[str, float] = {}
            t0 = time.perf_counter()
            audit = curate_corpus_daily_vec(
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
                        "standing_vecs": n_vecs * scale,
                        "standing_build_sec": round(build_sec, 2),
                        "delta_vecs": DELTA_VECS,
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
