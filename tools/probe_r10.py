"""Round-10 probe: remap-log size vs resolution cost — the measured
basis for ``LOG_COMPACT_THRESHOLD`` (the auto-compaction the r10
loops now run unattended).

Companion to the r10 bullet in SCALE.md. Run:

    python -m tools.probe_r10

``resolve_cluster_assignments`` is ``base LEFT JOIN broadcast(log)``;
the module claims this is "one broadcast join" only while the log is
broadcast-sized, and the streaming loop previously let the log grow
without bound. This probe builds a real cluster layout over a
synthetic base (default 2M nodes), then writes remap logs of
increasing size into it (the state a merge-heavy stream accumulates)
and times, per log size:

- RESOLVE: a full resolution read (count of the resolved table);
- MERGE: one ``merge_cluster_delta`` of a fixed tiny delta — the
  per-micro-batch cost a stream pays, which composes the log twice
  (endpoint resolve + log rewrite);

then folds the log (``compact_cluster_assignments``) and re-times the
resolve, showing the flat post-fold baseline the auto-compaction
restores. Log entries use labels disjoint from live components (the
stale-key shape a long-lived log actually has — every key a label
merged away long ago), so resolution OUTPUT is identical across sizes
and the measured growth is purely the broadcast build + probe cost.

Correctness of merge/compaction is pytest-pinned
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

N_NODES = int(os.environ.get("SPARK_GRAFT_PROBE_NODES", "2000000"))
LOG_SIZES = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_PROBE_LOG_SIZES", "0,100000,500000,2000000,8000000"
    ).split(",")
]


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        build_cluster_assignments,
        compact_cluster_assignments,
        merge_cluster_delta,
        resolve_cluster_assignments,
    )

    spark = get_spark(app_name="probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="probe_r10_")
    results = []
    try:
        # synthetic clustering: pairs (2i, 2i+1) -> component = even id;
        # node ids are even/odd longs below 2*N_NODES
        labels = (
            spark.range(N_NODES)
            .select(
                F.explode(
                    F.array(F.col("id") * 2, F.col("id") * 2 + 1)
                ).alias("node"),
                (F.col("id") * 2).alias("component"),
            )
        )
        for n_log in LOG_SIZES:
            path = f"{work}/cl_{n_log}"
            build_cluster_assignments(labels, path, target_files=8)
            if n_log:
                # stale-key log entries: labels merged away long ago
                # (keys/values far above any live id, disjoint by
                # construction) — output identical, cost is the join
                base_off = 10 * N_NODES
                log = spark.range(n_log).select(
                    (F.col("id") + base_off).alias("old_label"),
                    (F.col("id") + 2 * base_off).alias("new_label"),
                )
                shutil.rmtree(f"{path}/remap")
                log.coalesce(max(1, n_log // 2_000_000)).write.parquet(
                    f"{path}/remap"
                )
            # warm-up read (footers, codegen), then timed
            resolve_cluster_assignments(spark, path).count()
            _, t_resolve = timed(
                lambda: resolve_cluster_assignments(spark, path).count()
            )
            delta = spark.createDataFrame(
                [(0, 2), (4, 6)], "id_a long, id_b long"
            )
            _, t_merge = timed(
                lambda: merge_cluster_delta(spark, path, delta)
            )
            _, t_fold = timed(
                lambda: compact_cluster_assignments(spark, path)
            )
            _, t_resolve_folded = timed(
                lambda: resolve_cluster_assignments(spark, path).count()
            )
            row = {
                "log_rows": n_log,
                "resolve_sec": round(t_resolve, 2),
                "merge_sec": round(t_merge, 2),
                "fold_sec": round(t_fold, 2),
                "resolve_after_fold_sec": round(t_resolve_folded, 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(path, ignore_errors=True)
        print(
            json.dumps(
                {"probe": "remap_log_cost", "n_nodes": N_NODES, "rows": results}
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def snapshot_probe() -> None:
    """Cost basis for ``snapshot_if_stale``: on the same synthetic
    clustering as the main probe, time one full snapshot publish
    (resolve + linear rewrite + count-verify + pointer swap) against
    the skip path (meta read + one resolved count) and against the
    re-publish a small merge triggers. Run:

        python -m tools.probe_r10 snapshot
    """
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        build_cluster_assignments,
        merge_cluster_delta,
        snapshot_if_stale,
    )

    spark = get_spark(app_name="probe-r10-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="probe_r10_snap_")
    try:
        labels = spark.range(N_NODES).select(
            F.explode(F.array(F.col("id") * 2, F.col("id") * 2 + 1)).alias(
                "node"
            ),
            (F.col("id") * 2).alias("component"),
        )
        path, out = f"{work}/cl", f"{work}/snap"
        build_cluster_assignments(labels, path, target_files=8)
        rep, t_publish = timed(lambda: snapshot_if_stale(spark, path, out))
        assert rep["published"]
        rep, t_skip = timed(lambda: snapshot_if_stale(spark, path, out))
        assert not rep["published"]
        delta = spark.createDataFrame(
            [(4 * N_NODES, 4 * N_NODES + 1)], "id_a long, id_b long"
        )
        merge_cluster_delta(spark, path, delta)
        rep, t_republish = timed(lambda: snapshot_if_stale(spark, path, out))
        assert rep["published"] and rep["rows_behind"] == 2
        print(
            json.dumps(
                {
                    "probe": "snapshot_if_stale_cost",
                    "n_rows": 2 * N_NODES,
                    "publish_sec": round(t_publish, 2),
                    "skip_sec": round(t_skip, 2),
                    "republish_after_tiny_merge_sec": round(t_republish, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "snapshot":
        snapshot_probe()
    else:
        main()
