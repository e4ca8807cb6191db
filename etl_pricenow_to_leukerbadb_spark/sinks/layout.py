"""Storage-layout operators: partitioned writes, small-file
compaction, and range/Z-order clustering — the table-layout levers
that decide whether a 100 TB table is scannable.

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
- **Z-order clustering** (`write_zorder_clustered`): interleaves the
  bits of TWO cluster columns into one sort key so BOTH columns'
  min/max footer stats stay tight per file — a single-column range
  cluster makes the second column's stats useless (every file spans
  its full range), while the z-layout skips files for predicates on
  either or both columns (the Delta/Iceberg OPTIMIZE ZORDER idea,
  built from plain ``shiftleft``/``bitwise`` expressions +
  ``repartitionByRange`` — verified from footers in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def zorder_key(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    bucket ids into one Z-value (Morton code): bit i of ``col_a`` lands
    at position 2i+1, bit i of ``col_b`` at 2i. Walking the Z-curve in
    sort order keeps BOTH dimensions locally clustered, which is what
    makes per-file min/max stats tight in both columns.

    Pure JVM bitwise expressions (shiftleft/shiftright/&/|-free form
    using bitwise ops) — no UDF; cost is ~2*bits codegen'd ops per row.
    Callers bucket raw values first (see ``write_zorder_clustered``)."""
    z = F.lit(0).cast("long")
    a = col_a.cast("long")
    b = col_b.cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
        )
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ORDER clustered on two numeric columns.

    Each column is first mapped to a ``2^bits``-cell grid with
    ``width_bucket`` over its observed [min, max] (one tiny aggregate
    to fetch the bounds — at 100 TB this is a metadata-cheap pass or a
    known-domain constant), the two cell ids are bit-interleaved into
    a Morton key, and rows are range-partitioned + sorted by that key.
    Every output file then covers a small rectangle of the
    (col_a, col_b) plane, so parquet min/max stats skip files for
    predicates on EITHER column — unlike ``write_range_clustered``,
    which leaves the non-cluster column's stats spanning the full
    range in every file. The z-key is a transient sort key only; the
    written schema is unchanged."""
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    n_cells = 2 ** bits

    def cell(c: str, lo, hi) -> Column:
        if lo is None or hi is None or lo == hi:
            # constant or all-null column: one cell (degenerate but valid
            # — the other dimension still clusters)
            return F.lit(0).cast("long")
        # width_bucket returns 1..n+1; clamp into 0..n-1 cell ids
        return F.least(
            F.lit(n_cells - 1),
            F.width_bucket(F.col(c), F.lit(lo), F.lit(hi), F.lit(n_cells)) - 1,
        )
    keyed = df.withColumn(
        "__z", zorder_key(cell(col_a, lo_a, hi_a), cell(col_b, lo_b, hi_b), bits)
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
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
    Staging, the swap, and the final count all go through the path's
    own Hadoop filesystem (``..fs``), so the compaction works on any
    scheme Spark can write to, not just local disk.
    """
    import uuid

    from ..fs import basename, fs_delete, parent, parquet_file_count_fs
    from .upsert import replace_dir

    target_path = f"{path.rstrip('/')}/{partition}" if partition else path
    df = spark.read.parquet(target_path)
    # DOT-prefixed temp dir: when compacting one partition the staging
    # dir lands inside the table root, and a visible name would be
    # picked up by concurrent readers (partition discovery fails or
    # rows double-count) and, after a crash, permanently break every
    # read of the table. Hidden (., _) paths are ignored by Spark's
    # file index; stale ones from prior crashes are swept here, where
    # single-writer is the caller's contract. Staging lives under a
    # PER-TARGET directory (.compact/<basename>/<rand>): single-writer
    # is per-TABLE, so a whole-table compaction (staging in the
    # directory shared by sibling tables) must not delete a concurrent
    # sibling compaction's live staging dir. A flat name-prefix sweep
    # cannot guarantee that — '.compact_events_*' also matches
    # '.compact_events_v2_<rand>' because mkdtemp's suffix alphabet
    # includes '_' — whereas directory boundaries are unambiguous:
    # sweeping .compact/events/ can never touch .compact/events_v2/.
    staging_root = f"{parent(target_path)}/.compact/{basename(target_path)}"
    fs_delete(spark, staging_root)  # stale from prior crash
    tmp = f"{staging_root}/stage_{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: narrowing to fewer files needs no shuffle
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # crash-safe backup-aside swap (also clears stale backups from a
    # prior crash, which the old unconditional rename tripped over)
    replace_dir(spark, tmp, target_path)
    fs_delete(spark, staging_root)
    return parquet_file_count_fs(spark, target_path)
