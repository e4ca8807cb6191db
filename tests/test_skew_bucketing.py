"""Skew/bucketing operators: salted agg equivalence and the
no-exchange property of bucketed joins."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.operators.skew import (
    bucketed_join,
    salted_sum_count,
    write_bucketed,
)
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_agg_equals_plain_agg_under_extreme_skew(spark):
    # 90% of rows share one key — the worst case salting exists for
    rows = [(1 if i % 10 else i, float(i % 97)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "k long, v double")
    salted = {
        (r.k): (round(r.sum_value, 6), r.n)
        for r in salted_sum_count(df, ["k"], "v", n_salts=8).collect()
    }
    plain = {
        (r.k): (round(r.s, 6), r.n)
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(25,6)")).cast("double").alias("s"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    # (warehouse dir is a static conf -> default cwd/spark-warehouse;
    # tables are uniquely named and dropped below)
    # below the autoBroadcast threshold a broadcast join would hide the
    # point; force sort-merge so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"od_b_{suffix}"
    try:
        write_bucketed(
            load_table(spark, sf_small, "lineitem"), lt, ["l_orderkey"], 8,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            load_table(spark, sf_small, "orders").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ), rt, ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        )
        joined = bucketed_join(spark, lt, rt, on=["l_orderkey"])
        plan = _formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
        # and it computes the right thing
        n = joined.count()
        li = load_table(spark, sf_small, "lineitem")
        od = load_table(spark, sf_small, "orders")
        expected = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert n == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_join_matches_plain_join(spark):
    from etl_pricenow_to_leukerbadb_spark.operators.skew import salted_join

    # 90% of fact rows hit one key; key 999 has no dim match
    fact = spark.createDataFrame(
        [(1 if i % 10 else 999, float(i)) for i in range(5_000)], "k long, v double"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k long, label string")

    plain_inner = sorted(tuple(r) for r in fact.join(dim, ["k"]).collect())
    salted_inner = sorted(tuple(r) for r in salted_join(fact, dim, ["k"]).collect())
    assert salted_inner == plain_inner

    # left join: unmatched fact rows survive exactly once with null dim
    plain_left = sorted(
        tuple(r) for r in fact.join(dim, ["k"], "left").collect()
    )
    salted_left = sorted(
        tuple(r) for r in salted_join(fact, dim, ["k"], how="left").collect()
    )
    assert salted_left == plain_left

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported how"):
        salted_join(fact, dim, ["k"], how="full")


def test_salted_join_non_power_of_two_salts(spark):
    """Non-power-of-two n_salts is exactly where the old
    abs(hash) % n salt could go negative (hash == Integer.MIN_VALUE)
    and silently drop the row; pmod keeps every salt in 0..n-1. Pin
    both the result identity at n_salts=3 and the pmod expression."""
    from etl_pricenow_to_leukerbadb_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1 if i % 7 else 2, float(i)) for i in range(3_000)], "k long, v double"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k long, label string")
    for n_salts in (3, 5):
        plain = sorted(tuple(r) for r in fact.join(dim, ["k"], "left").collect())
        salted = sorted(
            tuple(r)
            for r in salted_join(fact, dim, ["k"], n_salts=n_salts, how="left").collect()
        )
        assert salted == plain, n_salts
    analyzed = str(
        salted_join(fact, dim, ["k"], n_salts=3)._jdf.queryExecution().analyzed()
    )
    assert "pmod" in analyzed


def test_write_bucketed_rejects_qualified_name_without_path(spark):
    import pytest as _pytest

    df = spark.range(4)
    with _pytest.raises(ValueError, match="db-qualified"):
        write_bucketed(df, "somedb.sometable", ["id"], 4)
