"""Storage-layout operators: partitioned writes, small-file
compaction, and range clustering — the table-layout levers that decide
whether a 100 TB table is scannable.

- **Partitioned writes** (`write_partitioned`): hive-style
  ``partitionBy`` directories so date/tenant predicates prune whole
  partitions at planning time (``PartitionFilters`` in the scan,
  verified in tests) instead of reading and discarding rows.
- **Compaction** (`compact_parquet`): streaming ingests and keyed
  upserts accumulate small files; a scan pays per-file open cost and
  the driver pays per-file planning cost. Compaction rewrites a
  partition to ~target-sized files with one job. At 100 TB this runs
  per-partition (bounded work), never whole-table.
- **Range clustering** (`write_range_clustered`): sorts rows into
  disjoint per-file value ranges so parquet min/max statistics skip
  files/row-groups for predicates on the cluster column (verified
  from the written footers in tests) — partition pruning's
  fine-grained sibling for high-cardinality columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a hive-partitioned parquet table. ``max_records_per_file``
    bounds file size without an extra repartition job."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-CLUSTERED on ``cluster_col``: rows are
    range-partitioned into ``n_files`` buckets and sorted within each,
    so every output file covers a (nearly) disjoint value range.

    This is the data-skipping layout: parquet stores per-row-group
    min/max statistics, and a clustered table lets a point or range
    predicate on ``cluster_col`` skip every file/row-group whose
    [min, max] misses the predicate — at 100 TB the difference between
    touching one file and scanning the table. (Same idea as
    Delta/Iceberg OPTIMIZE ... ZORDER with one dimension; multi-dim
    z-ordering trades per-dimension locality for multi-predicate
    skipping and would layer on an interleaved-bits key the same way.)

    ``repartitionByRange`` samples the column to pick balanced
    boundaries (skew-tolerant); the within-partition sort makes
    row-group stats tight, not just file stats."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def parquet_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession, path: str, target_files: int, partition: str | None = None
) -> int:
    """Rewrite a parquet directory (or one hive partition of it) down
    to ``target_files`` files. Returns the resulting file count.

    The rewrite goes through a temp dir + atomic-ish swap so readers
    never see a half-written table — same pattern as the upsert sink.
    """
    from .upsert import replace_dir

    target_path = os.path.join(path, partition) if partition else path
    df = spark.read.parquet(target_path)
    tmp = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(target_path.rstrip("/")))
    # coalesce, not repartition: narrowing to fewer files needs no shuffle
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # crash-safe backup-aside swap (also clears stale backups from a
    # prior crash, which the old unconditional rename tripped over)
    replace_dir(tmp, target_path)
    return parquet_file_count(target_path)
