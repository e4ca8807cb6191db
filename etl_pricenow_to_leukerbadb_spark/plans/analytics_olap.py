"""OLAP/analytic query surface: window ranking, pivot, rollup, distinct
counting, multi-way joins, and merge semantics — the standard-aggregate
extension SURVEY §2.4 calls for (the reference itself has none of
these; Spark supplies them natively and each gets a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sinks.upsert import merge_upsert_df
from .analytics import DEC, DECQ, _t, register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "a2_topk_per_group",
    tags=("A2", "R1"),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders) t
WHERE rnk <= 3
""",
)
def a2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — per-group sort via window row_number
    (the scalable form of reference A2's per-group sorting, py:214)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "a4_pivot_event_matrix",
    tags=("A1",),
    oracle="""
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY user_id
""",
)
def a4_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user, one column per event type."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


@register(
    "a5_rollup_summary",
    tags=("A1",),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def a5_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup with grouping indicators."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        )
    )


@register(
    "a6_count_distinct",
    tags=("A3",),
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def a6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting per group (expand + two-phase agg in
    Spark; approx_count_distinct is the 100 TB variant, benched
    separately since engines' sketches differ)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "q3_shipping_priority",
    headline=True,
    tags=("J1", "A1", "R1", "R2"),
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1996-07-01' AND l_shipdate > DATE '1996-07-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join + agg + top-10."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@register(
    "q5_region_revenue",
    headline=True,
    tags=("J1", "A1"),
    oracle=f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way star join: big facts joined on shuffle
    keys, small dims broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "k1_upsert_merge",
    tags=("K1", "K2", "K3"),
    oracle=f"""
WITH updates AS (
  SELECT o_orderkey AS okey,
         CAST(CAST(o_totalprice AS {DEC}) * 2 AS DOUBLE) AS price,
         'upd' AS src
  FROM orders WHERE o_orderkey % 3 = 0
), base AS (
  SELECT o_orderkey AS okey, o_totalprice AS price, 'base' AS src FROM orders
)
SELECT okey, price, src FROM updates
UNION ALL
SELECT b.okey, b.price, b.src FROM base b
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.okey = b.okey)
""",
)
def k1_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed merge semantics (K1, reference py:98-112) as a relational
    expression: updates win, unmatched base rows survive — exercised
    through the engine's merge_upsert_df operator."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.lit("base").alias("src"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            (F.col("o_totalprice").cast(DEC) * 2).cast("double").alias("price"),
            F.lit("upd").alias("src"),
        )
    )
    return merge_upsert_df(base, updates, keys=["okey"])
