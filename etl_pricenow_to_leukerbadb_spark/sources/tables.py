"""Loaders for the local testdata parquet tables.

Scans stay fully declarative (``spark.read.parquet``) so Catalyst
applies column pruning and predicate pushdown; the only normalization
is the ``events.ts`` column, which is stored as parquet
TIMESTAMP(NANOS) — Spark's vectorized reader rejects that type, so we
read it as int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``) and
convert to a microsecond timestamp (same truncation DuckDB applies,
keeping oracle comparisons exact).
"""

from __future__ import annotations

import math
import os
import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    apply_runtime_confs(spark)
    try:
        return spark.read.parquet(path)
    except Exception:
        # Fallback for sessions where the nanos legacy conf cannot be
        # applied: go through pyarrow -> pandas -> createDataFrame.
        # Only viable at test scale; the primary path is the native scan.
        import pyarrow.parquet as pq

        pdf = pq.read_table(path).to_pandas()
        return spark.createDataFrame(pdf)


_SIZE_UNITS = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _byte_conf(spark: SparkSession, key: str, default: int) -> int:
    try:
        v = spark.conf.get(key, None)
    except Exception:
        return default
    if v is None:
        return default
    m = re.fullmatch(r"(\d+)\s*([a-zA-Z]*)", v.strip())
    if not m:
        return default
    return int(m.group(1)) * _SIZE_UNITS.get(m.group(2).lower(), 1)


def _estimated_scan_partitions(spark: SparkSession, files: list[str]) -> int | None:
    """Estimate how many partitions a file scan will actually produce,
    replicating Spark's split sizing (FilePartition.maxSplitBytes):
    tiny files are bin-packed together (openCostInBytes padding), big
    files are split at maxPartitionBytes — so neither raw file count
    nor raw byte count alone is a usable bound. Returns None when any
    file size is unknown (non-local URI)."""
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        try:
            sizes.append(os.path.getsize(u.path or f))
        except OSError:
            return None
    if not sizes:
        return None
    maxpb = _byte_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    opencost = _byte_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    par = max(spark.sparkContext.defaultParallelism, 1)
    padded_total = sum(sizes) + len(sizes) * opencost
    max_split = min(maxpb, max(opencost, padded_total // par)) or 1
    return max(1, math.ceil(padded_total / max_split))


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition a narrow input before compute-heavy fan-out work.

    Use ONLY upstream of operators whose per-row cost dwarfs a shuffle
    of the input (shingle explosion + salted hashing, per-vector math):
    the testdata tables are single-row-group parquet files, so their
    scans yield 1-3 partitions and the expensive map stage would run
    on one core. For narrow scan->aggregate plans this would be a
    pessimization (the vectorized partial agg beats a full-row
    shuffle), so ``load_table`` deliberately does NOT call it. When the
    scan is already at least as parallel as the cluster (the 100 TB
    case: thousands of splits) this is a no-op.

    The parallelism probe is plan-level: ``df.inputFiles()`` (driver-side
    file listing, no job) plus a bytes-based estimate of the scan's
    actual partition count that mirrors Spark's split packing — a raw
    file count would overestimate parallelism for many-tiny-file
    sources, which Spark bin-packs into far fewer partitions. Sources
    with no listable files (in-memory fixtures, remote FS whose sizes
    can't be read locally) are left untouched: adding a shuffle on a
    guess is worse than trusting the source's parallelism, real
    100 TB inputs are always file-backed so the estimate path covers
    them, and probing via ``df.rdd`` would force plan analysis plus a
    Python RDD wrapper per call just to serve test fixtures.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    est = _estimated_scan_partitions(spark, files) if files else None
    if est is None or est >= target:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing timestamp columns."""
    df = _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so operators can also be expressed in SQL."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
