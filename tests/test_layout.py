"""Storage-layout tests: partition pruning must reach the scan, and
compaction must shrink file counts without changing data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.sinks.layout import (
    compact_parquet,
    parquet_file_count,
    read_partitioned,
    write_partitioned,
)
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes_partitions(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])
    got = read_partitioned(spark, path).filter(F.col("day") == "2024-01-03")
    plan = _plan(got)
    assert "PartitionFilters" in plan
    # the day predicate must appear as a partition filter, not a data filter
    assert "day" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = ev.filter(F.col("day") == "2024-01-03").count()
    assert got.count() == expected > 0


def test_compaction_shrinks_files_preserves_data(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").limit(5000)
    path = str(tmp_path / "fragmented")
    # simulate a fragmented ingest: many tiny files
    ev.repartition(37).write.parquet(path)
    assert parquet_file_count(path) >= 37
    before = ev.count()
    before_sum = ev.agg(F.sum("event_id")).collect()[0][0]
    n_files = compact_parquet(spark, path, target_files=4)
    assert n_files <= 4
    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.agg(F.sum("event_id")).collect()[0][0] == before_sum
