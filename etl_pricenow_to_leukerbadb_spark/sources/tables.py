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

import os

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
    file listing, no job and no plan-to-RDD conversion — the old
    ``df.rdd.getNumPartitions()`` re-planned the query as RDDs each
    call). File count lower-bounds scan partitions (big files split
    further), so ``>= target`` file sources are left untouched; only
    non-file sources (in-memory fixtures) fall back to the RDD probe,
    where the conversion cost is proportional to their small plans.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0 and df.rdd.getNumPartitions() >= target:
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
