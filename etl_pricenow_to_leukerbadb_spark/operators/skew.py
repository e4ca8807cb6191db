"""Skew-mitigation operators: salted aggregation and bucketed joins.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in ``session.py``), but two techniques remain worth owning
explicitly at 100 TB:

- **Salted two-stage aggregation** for heavy-hitter GROUP BY keys:
  stage 1 aggregates on ``(key, salt)`` so a hot key's rows spread
  over ``n_salts`` reducers; stage 2 merges the partials per key.
  Results are identical to a plain groupBy for any algebraic
  aggregate (sum/count/min/max) — the registry query proves it
  against the plain-SQL oracle.
- **Bucketed tables** for repeated co-located joins: write both fact
  tables bucketed by the join key; Spark then sort-merge-joins
  bucket-to-bucket with NO exchange on either side (verified in
  tests by asserting the join plan has no shuffle). At 100 TB this
  converts every subsequent join/agg on the bucket key from a full
  shuffle into a local merge.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | Column,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """GROUP BY ``key_cols`` computing sum+count through a salted
    two-stage aggregation.

    The salt is derived from a high-cardinality hash of the whole row
    (``spark_partition_id`` + a per-row monotonic component would be
    nondeterministic under retries; a hash of all columns is stable),
    so hot keys fan out over ``n_salts`` partial groups. Exact for
    algebraic aggregates; decimal accumulation keeps the sum
    order-independent so salting cannot change the result.

    Domain contract of the decimal(25,6) accumulator: values must fit
    19 integral digits (|v| < 10^19 — money-like measures do by
    orders of magnitude) and are rounded to 6 decimal places. Outside
    that domain the per-value cast overflows (NULL non-ANSI, error
    under ANSI) and the "identical to a plain groupBy" claim no
    longer holds — this is the same deliberate precision/range trade
    every decimal-accumulated oracle query in plans/ makes, not a
    salting artifact. Widening to decimal(38,6) would lift the value
    bound but leave the SUM no growth headroom (sum of decimal(38,_)
    stays 38 digits), which is the worse failure at scale.

    Caveat: rows that are *bit-identical duplicates* of each other
    hash to the same salt, so a hot key whose rows are all identical
    does not spread. For that shape, pre-aggregate identical rows to
    (row, multiplicity) first — that group-by is itself skew-free
    because the full row is the key.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    # pmod, not abs(hash) % n: abs(Integer.MIN_VALUE) overflows negative,
    # and a negative salt for non-power-of-two n_salts would still merge
    # correctly here (salt is only a partial-group key) but pmod keeps the
    # fan-out uniform and matches salted_join, where sign matters.
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias(
        "__salt"
    )
    partial = (
        df.select(*key_cols, value.alias("__v"), salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            F.sum(F.col("__v").cast("decimal(25,6)")).alias("__ps"),
            F.count(F.lit(1)).alias("__pc"),
        )
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.sum("__ps").cast("double").alias(sum_alias),
            F.sum("__pc").alias(count_alias),
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defusing equi-join: the fact side gets a deterministic
    per-row salt, the dim side is replicated ``n_salts`` times, and the
    join runs on ``on + [salt]`` — a hot fact key's rows spread over
    ``n_salts`` reducers instead of landing in one straggler task.

    Result-identical to ``fact.join(dim, on, how)`` for inner/left
    joins (every fact row still meets every matching dim row exactly
    once — its one salt replica). Use when the dim side is too big to
    broadcast AND AQE's runtime skew-split cannot kick in (e.g. the
    skewed join feeds a co-partitioned downstream op that must not be
    re-split). Cost: dim side inflated ``n_salts``x — keep n_salts
    near the straggler factor, not higher. The salt hashes ALL fact
    columns, so bit-identical duplicate rows share a salt (same caveat
    as ``salted_sum_count``)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: unsupported how={how!r}")
    # pmod, not abs(hash) % n: hash() can return Integer.MIN_VALUE, whose
    # abs overflows to a negative value; for non-power-of-two n_salts the
    # salt would then be negative, never matching the dim side's 0..n-1
    # replicas — silently dropping that fact row (inner) or null-extending
    # it (left). pmod is non-negative for any hash value and any n_salts.
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).alias(
        "__salt"
    )
    fact_s = fact.select("*", salt)
    dim_s = dim.select(
        "*",
        F.explode(
            F.array(*[F.lit(i).cast("int") for i in range(n_salts)])
        ).alias("__salt"),
    )
    return fact_s.join(dim_s, [*on, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) table.

    Joins and aggregations on ``bucket_cols`` between tables bucketed
    with the same count read bucket-to-bucket with no exchange.

    ``path`` makes the table EXTERNAL at that location — callers that
    must not depend on the process working directory (the default
    managed warehouse is ``$CWD/spark-warehouse``) pass an explicit
    scratch path.

    Re-run safe across *sessions*: a table written by a previous
    session leaves its directory on disk while the new session's
    in-memory catalog has no entry for it, and ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS (overwrite mode only covers
    tables the catalog knows). Drop the catalog entry if present, then
    clear the orphaned location.

    The orphan cleanup is a LOCAL-filesystem ``rmtree`` of
    ``<warehouse>/<table>``, which is only the table's real location
    for an unqualified name in a local warehouse — so this helper
    requires exactly that and raises otherwise (a db-qualified name
    lives under ``<db>.db/``, and an hdfs/s3 warehouse can't be
    cleaned with local file ops; pass an explicit ``path`` for those).
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is not None:
        shutil.rmtree(path, ignore_errors=True)
    else:
        if "." in table:
            raise ValueError(
                "write_bucketed: db-qualified table names are only supported "
                "with an explicit path= (the managed-warehouse orphan cleanup "
                f"assumes an unqualified name): {table!r}"
            )
        parsed = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
        if parsed.scheme not in ("", "file"):
            raise ValueError(
                "write_bucketed: orphaned-location cleanup only supports a "
                "local warehouse dir; pass an explicit path= for "
                f"{parsed.scheme}:// warehouses"
            )
        if parsed.path:
            shutil.rmtree(
                os.path.join(parsed.path, table.lower()), ignore_errors=True
            )
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket key — plans as a
    shuffle-free sort-merge join when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
