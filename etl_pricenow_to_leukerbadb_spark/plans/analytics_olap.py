"""OLAP/analytic query surface: window ranking, pivot, rollup, distinct
counting, multi-way joins, and merge semantics — the standard-aggregate
extension SURVEY §2.4 calls for (the reference itself has none of
these; Spark supplies them natively and each gets a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sinks.upsert import merge_upsert_df, merge_upsert_partitioned
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
        .withColumn("rnk", F.row_number().over(w).cast("long"))
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
    "a11_grouping_sets",
    tags=("A1",),
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
""",
)
def a11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE compile
    to): per-(priority, status) cells, per-status margins, and the
    grand total in one aggregation pass. Spark expands the sets and
    runs a single hash aggregate (one shuffle keyed on the expanded
    grouping id) — same cost model as a plain group-by; grouping
    indicators are engine-portable GROUPING() bits, not the
    engine-specific grouping_id packing."""
    return (
        _t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_price"),
        )
    )


@register(
    "a12_cube",
    tags=("A1",),
    oracle=f"""
SELECT event_type, dow,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(dow) AS INT) AS g_dow,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM (SELECT event_type, CAST(isodow(ts) AS INT) AS dow, value FROM events) t
GROUP BY CUBE(event_type, dow)
""",
)
def a12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, ISO weekday): all four margin
    combinations in one aggregation pass — completes the
    rollup (a5) / grouping-sets (a11) / cube family. Spark expands the
    cube and runs a single hash aggregate keyed on the expanded
    grouping id — one shuffle, same cost model as a plain group-by at
    any scale. Weekday is ISO (Mon=1..Sun=7: Spark ``weekday()+1`` ==
    DuckDB ``isodow``) because the engines' default ``dayofweek``
    origins differ."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.weekday("ts") + F.lit(1)).cast("int").alias("dow"),
        "value",
    )
    return ev.cube("event_type", "dow").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("dow").cast("int").alias("g_dow"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


@register(
    "a13_unpivot",
    tags=("A1", "T2"),
    oracle=f"""
SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
         CAST(l_quantity AS DOUBLE) AS value FROM lineitem WHERE l_orderkey < 1000
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
         CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_orderkey < 1000
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount',
         CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey < 1000
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax',
         CAST(l_tax AS DOUBLE) FROM lineitem WHERE l_orderkey < 1000
) t
""",
)
def a13_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of the lineitem measure columns —
    the inverse of a4's pivot and the standard reshape feeding
    per-measure ML feature pipelines. ``DataFrame.unpivot`` compiles
    to a single Expand node over one scan (each input row emitted once
    per measure) — no join, no shuffle; the oracle is the portable
    UNION ALL spelling. Values are cast to double (the common
    supertype) as unpivot requires; the orderkey filter keeps the
    long output bounded for the driver compare while exercising
    pushdown through Expand."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.col("l_discount").cast("double").alias("l_discount"),
            F.col("l_tax").cast("double").alias("l_tax"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
    )


@register(
    "w6_w7_window_functions",
    tags=("A2",),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist,
       first_value(o_totalprice) OVER wf AS top_price,
       last_value(o_totalprice) OVER wf AS bottom_price,
       nth_value(o_totalprice, 2) OVER wf AS second_price,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
       wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def w6_w7_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window-function battery — rank family (rank /
    dense_rank / ntile / percent_rank / cume_dist) AND value family
    (first/last/nth_value, lag/lead) — per customer over order value,
    in ONE query (the round-6 consolidation of w6_rank_functions +
    w7_value_functions: both used the identical window spec, so two
    registry slots bought nothing the combined plan doesn't). The
    ordering key includes o_orderkey so ranks are total and the ratio
    functions engine-deterministic (rounded to 6 dp). The value
    functions use an explicit full-partition ROWS frame — without it
    last_value/nth_value read the engine-default RANGE-to-current-row
    frame and the engines would legitimately disagree; lag/lead are
    frame-independent by definition (Spark refuses an explicit frame
    on them). Everything compiles into ONE window exec over ONE
    exchange — per-key sorted stream, no global sort."""
    order = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    framed = order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(order).cast("long").alias("rnk"),
        F.dense_rank().over(order).cast("long").alias("drnk"),
        F.ntile(4).over(order).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(order), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(order), 6).alias("cdist"),
        F.first("o_totalprice").over(framed).alias("top_price"),
        F.last("o_totalprice").over(framed).alias("bottom_price"),
        F.nth_value("o_totalprice", 2).over(framed).alias("second_price"),
        F.lag("o_totalprice", 1).over(order).alias("prev_price"),
        F.lead("o_totalprice", 1).over(order).alias("next_price"),
    )


@register(
    "dq_anomaly_zscore",
    tags=("DQ", "A1"),
    oracle="""
WITH v AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_fp
  FROM events
),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(v_fp) AS s1,
         SUM(CAST(v_fp AS DECIMAL(38,0)) * v_fp) AS s2
  FROM v GROUP BY event_type
),
z AS (
  SELECT v.event_id, v.event_type, v.v_fp,
         ROUND(
           (CAST(v.v_fp AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)
           / sqrt(CAST(s.s2 AS DOUBLE) / s.n
                  - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n)),
           6) AS zscore
  FROM v JOIN s USING (event_type)
)
SELECT event_id, event_type,
       CAST(v_fp AS DOUBLE) / 1000000 AS value, zscore
FROM z WHERE abs(zscore) > 2.5
""",
)
def dq_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier detection — the data-quality screen a
    training pipeline runs over numeric telemetry before ingestion.
    Engine-exact by construction: values are 1e-6 fixed-point BIGINTs,
    per-group sum and sum-of-squares accumulate in exact integer
    arithmetic (DECIMAL(38,0) for the squares — v_fp^2 alone is ~1e18,
    a BIGINT sum would overflow), and only the final mean/sigma/z step
    runs in double on identical inputs, so both engines execute the
    same float ops in the same order. Two shuffles (group-by on type,
    broadcast-sized stats joined back); the population-variance z uses
    a broadcast join so the fact table is never reshuffled."""
    v = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fp"),
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_fp").alias("s1"),
        F.sum(F.col("v_fp").cast("decimal(38,0)") * F.col("v_fp")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = F.round(
        (F.col("v_fp").cast("double") - mean) / F.sqrt(var), 6
    ).alias("zscore")
    return (
        v.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            "event_type",
            (F.col("v_fp").cast("double") / 1_000_000).alias("value"),
            z,
        )
        .filter(F.abs(F.col("zscore")) > 2.5)
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
    "j4_anti_join",
    tags=("J3",),
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders (completes the join
    family beyond the reference's inner/semi shapes)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "w1_running_total",
    tags=("A2",),
    oracle=f"""
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS {DEC})) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
""",
)
def w1_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total over event time — cumulative window frame
    (decimal accumulation so the sum is order-independent exact)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("run_sum"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


@register(
    "w2_lag_delta",
    tags=("A2",),
    oracle="""
SELECT event_id, user_id,
       value - lag(value) OVER w AS delta_value,
       CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def w2_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag deltas: value change and seconds since the previous
    event (single IEEE subtraction — engine-portable without rounding)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )


@register(
    "w3_sessionize",
    tags=("A1", "A2"),
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end_s
FROM sess GROUP BY user_id, session_id
""",
)
def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): mark session
    starts with lag(), number sessions with a cumulative sum, then
    aggregate per session. The batch twin of the streaming
    session-window operator; one shuffle on user_id feeds both
    windows and the final group-by."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = _t(spark, sf_dir, "events").withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start_s"),
        F.unix_timestamp(F.max("ts")).alias("session_end_s"),
    )


@register(
    "q6_revenue_forecast",
    tags=("A1", "T4"),
    oracle=f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {DECQ}) * CAST(l_discount AS {DECQ})) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped selective scan-aggregate: every predicate is
    sargable and pushes to the parquet scan; no shuffle at all beyond
    the final single-row reduce."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DECQ) * F.col("l_discount").cast(DECQ))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q10_returned_items",
    tags=("J1", "A1", "R1"),
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: returned-item revenue by customer, top 20.
    Facts join on shuffle keys; the nation dim broadcasts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q9_product_profit",
    headline=True,
    tags=("J1", "A1"),
    oracle=f"""
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))
                - CAST(p_retailprice AS {DECQ}) * CAST(l_quantity AS {DECQ})) AS DOUBLE) AS profit
FROM lineitem, orders, part, supplier, nation
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND p_type LIKE '%ECO%'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped 5-way join: profit by supplier nation and order
    year for a part-type family. The lineitem fact joins orders on the
    shuffle key; part (filtered by LIKE before the join), supplier,
    and nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").like("%ECO%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").cast(DECQ) * (
        F.lit(1) - F.col("l_discount").cast(DECQ)
    ) - F.col("p_retailprice").cast(DECQ) * F.col("l_quantity").cast(DECQ)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "q18_large_volume",
    tags=("J1", "A1", "R1"),
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       o_totalprice,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: orders whose total quantity exceeds a
    threshold (HAVING feeding a semi join), top-100 by price. The
    HAVING aggregate runs once and semi-joins back into the fact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "a7_percentiles",
    tags=("A1",),
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the
    same p*(n-1) linear interpolation; rounded to 4 decimals). The
    100 TB variant is approx_percentile — a8, rows-only, since
    engines' sketches differ."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {p})"), 4).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.99)
        ]
    )


@register(
    "a9_portable_stats",
    tags=("A1",),
    oracle=f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS {DEC}) * CAST(l_quantity AS {DEC})) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS {DEC}) * CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty,
       round((sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_qty_price
FROM m
""",
)
def a9_portable_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev and Pearson correlation from decimal moments.

    Built-in stddev/corr use Welford-style streaming updates whose
    float error depends on partitioning — not reproducible across
    engines (or even across two Spark runs with different partition
    counts). Summing the moments as decimals (exact, order-independent)
    and applying the closed-form in double precision makes the result
    bit-stable and oracle-comparable."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(DEC)
    y = F.col("l_extendedprice").cast(DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("std_qty"),
        F.round(
            (sxy - sx * sy / n) / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            6,
        ).alias("corr_qty_price"),
    )


@register("a8_approx_sketches", tags=("A1", "A3"))  # sketch-based: rows-only
def a8_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale forms of a6/a7: HLL++ approximate distinct count
    and quantile-sketch percentiles per event type. No SQL oracle —
    sketch values are engine-specific; bounds asserted in pytest.
    Percentiles are projected to scalar q50/q99 columns (not an array)
    so the driver's rows-only canonicalizer can sort the frame."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.expr("approx_percentile(value, array(0.5, 0.99), 10000)").alias("value_q"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_q")[0].alias("q50"),
            F.col("value_q")[1].alias("q99"),
            "n_events",
        )
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


@register(
    "k5_partition_merge",
    tags=("K1", "K3"),
    oracle=f"""
WITH base AS (
  SELECT o_orderkey AS okey, o_totalprice AS price, 'base' AS src,
         CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS part_year
  FROM orders
), upd AS (
  SELECT okey, CAST(CAST(price AS {DEC}) * 2 AS DOUBLE) AS price, 'upd' AS src, part_year
  FROM base WHERE okey % 3 = 0 AND part_year = 1995
)
SELECT okey, price, src, part_year FROM upd
UNION ALL
SELECT b.okey, b.price, b.src, b.part_year FROM base b
WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.okey = b.okey)
""",
)
def k5_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE through the real sink: orders written as
    a hive-partitioned parquet table (by order year), then an update
    batch touching ONLY the 1995 partition merged via
    ``merge_upsert_partitioned`` — the base scan prunes to the touched
    partition and dynamic partition overwrite rewrites just that
    directory (untouched years keep their files byte-for-byte; asserted
    in tests). Read back and checked against a plain SQL merge."""
    import os

    from ..session import session_scratch_dir
    from ..sinks.layout import write_partitioned

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.lit("base").alias("src"),
        F.year(F.col("o_orderdate").cast("date")).alias("part_year"),
    )
    target = os.path.join(session_scratch_dir(spark, "k5"), "orders_merged")
    write_partitioned(base, target, ["part_year"])
    updates = base.filter((F.col("okey") % 3 == 0) & (F.col("part_year") == 1995)).select(
        "okey",
        (F.col("price").cast(DEC) * 2).cast("double").alias("price"),
        F.lit("upd").alias("src"),
        "part_year",
    )
    merge_upsert_partitioned(
        spark, updates, target, keys=["okey"], partition_cols=["part_year"]
    )
    return spark.read.parquet(target)


@register(
    "a10_salted_agg",
    tags=("A1",),
    oracle=f"""
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
       COUNT(*) AS n
FROM events GROUP BY user_id
""",
)
def a10_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation for heavy-hitter keys: partial agg
    on (key, salt) spreads a hot key over 16 reducers, final agg
    merges partials. Decimal accumulation makes it bit-identical to
    the plain GROUP BY oracle — salting is a pure physical rewrite."""
    from ..operators.skew import salted_sum_count

    return salted_sum_count(
        _t(spark, sf_dir, "events"), ["user_id"], "value", n_salts=16
    )


@register(
    "q12_priority_by_flag",
    tags=("A1", "T4"),
    oracle="""
SELECT l_returnflag,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
""",
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped conditional aggregation: priority-class counts
    per return flag (CASE inside COUNT, one shuffle)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_share",
    tags=("A1", "J1"),
    oracle=f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))
                             ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1996-06-01' AND l_shipdate < DATE '1996-07-01'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped ratio-of-sums: promo revenue share for one
    month; the part dim broadcasts, the division happens once on the
    decimal sums (exact), cast to double on BOTH sides before the
    ratio so no engine-specific decimal-division scale rules leak into
    the result."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DECQ))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q20_correlated_max",
    tags=("A1", "J1"),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
)
def q20_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL API: each customer's
    max-price order(s). Catalyst decorrelates this into an aggregate +
    join — no per-row re-execution (the plan contains a single
    aggregate over orders, not a nested loop)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q20_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM q20_orders o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM q20_orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q21_suppliers_waiting",
    tags=("J1", "J3", "A1", "R1"),
    oracle="""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM supplier s JOIN lo l1 ON s.s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped "suppliers who kept orders waiting": late
    lineitems on finalized multi-supplier orders where the supplier was
    the ONLY late one — EXISTS as a left-semi join, NOT EXISTS as a
    left-anti join, both with a non-equi residual (different supplier)
    on the orderkey equi-join. The synthetic schema has no commit/
    receipt dates, so "late" is shipdate > orderdate + 60 days.

    Scale shape: the late-flag table is built once; the semi and anti
    probes hash-partition on the same l_orderkey as the build, so AQE
    reuses one exchange across all three joins, and the supplier
    dimension is broadcast. No correlated re-execution survives in the
    physical plan."""
    li = _t(spark, sf_dir, "lineitem")
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    l1 = lo.filter(F.col("late"))
    l2 = lo.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = l1.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "j6_range_join",
    tags=("J2", "A1"),
    headline=True,
    oracle="""
WITH win AS (
  SELECT event_id AS window_id, ts AS w_start,
         ts + INTERVAL 6 HOUR AS w_end
  FROM events WHERE event_id % 199 = 0
)
SELECT w.window_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(floor(epoch(MIN(e.ts))) AS BIGINT) AS first_event_s,
       CAST(floor(epoch(MAX(e.ts))) AS BIGINT) AS last_event_s
FROM win w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.window_id
""",
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: every event falling inside 6-hour
    analysis windows anchored at sampled events, aggregated per
    window. The oracle states the raw range predicate; the Spark plan
    runs ``interval_join`` — hour-binned equi-join + residual bounds
    filter — because a bare range predicate has no equi-key and plans
    as a nested-loop join (O(|events| x |windows|)) that dies at
    scale. The window side is broadcast here (windows are sampled,
    dimension-sized); with a large interval side the same operator
    hash-partitions both sides on the bin key."""
    from ..operators.interval_join import interval_join

    ev = _t(spark, sf_dir, "events")
    windows = F.broadcast(
        ev.filter(F.col("event_id") % 199 == 0).select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("w_end"),
        )
    )
    return (
        interval_join(
            ev.select("event_id", "ts", "user_id"),
            "ts",
            windows,
            "w_start",
            "w_end",
            bin="hour",
        )
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.unix_timestamp(F.min("ts")).alias("first_event_s"),
            F.unix_timestamp(F.max("ts")).alias("last_event_s"),
        )
    )


@register(
    "j7_bucketed_join",
    tags=("J1", "A1", "K1"),
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def j7_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-fact join via bucketed tables: both sides are
    written ``bucketBy(8, orderkey)`` + sorted, then joined
    bucket-to-bucket — Spark plans a sort-merge join with NO exchange
    on either side (the no-shuffle property is plan-asserted in
    ``test_skew_bucketing.py``; this registry entry makes the end
    result driver-verifiable too). This is the 100 TB pattern for
    repeated co-located joins: pay one bucketed write, then every
    join/agg on the bucket key skips its shuffle. Table names are
    per-sf and overwritten on re-run; the warehouse dir is the
    session-local default."""
    import os

    from ..operators.skew import bucketed_join, write_bucketed

    from ..session import session_scratch_dir

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    lt, ot = f"j7_li_{tag}", f"j7_od_{tag}"
    # external tables under the session scratch dir: the default
    # managed warehouse lives in $CWD/spark-warehouse, which would make
    # this query depend on whatever directory the driver runs from
    scratch = session_scratch_dir(spark, f"j7_bucketed_{tag}")
    write_bucketed(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        lt,
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=os.path.join(scratch, lt),
    )
    write_bucketed(
        _t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
        ),
        ot,
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=os.path.join(scratch, ot),
    )
    rev = F.col("l_extendedprice").cast(DECQ) * (
        F.lit(1) - F.col("l_discount").cast(DECQ)
    )
    return (
        bucketed_join(spark, lt, ot, on=["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "j9_interval_overlap",
    tags=("J2", "A1"),
    oracle="""
WITH a AS (
  SELECT event_id AS a_id, ts AS a_start, ts + INTERVAL 3 HOUR AS a_end
  FROM events WHERE event_id % 97 = 0
), b AS (
  SELECT event_id AS b_id, ts AS b_start, ts + INTERVAL 6 HOUR AS b_end
  FROM events WHERE event_id % 131 = 0
)
SELECT b_id, COUNT(*) AS n_overlaps,
       CAST(floor(epoch(MIN(a_start))) AS BIGINT) AS first_a_s
FROM a JOIN b ON a_start < b_end AND b_start < a_end
GROUP BY b_id
""",
)
def j9_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-x-interval overlap join: 3-hour activity windows vs
    6-hour analysis windows, counted per analysis window. The oracle
    states the raw overlap predicate; the Spark plan runs
    ``interval_overlap_join`` — both sides hour-binned, equi-join on
    the bin, each pair claimed once by the later-start's bin — because
    a bare two-sided range predicate has no equi-key and plans as a
    nested-loop join. Analysis-window side broadcast
    (dimension-sized by the sampling)."""
    from ..operators.interval_join import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("a_end"),
    )
    b = F.broadcast(
        ev.filter(F.col("event_id") % 131 == 0).select(
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_start"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("b_end"),
        )
    )
    return (
        interval_overlap_join(
            a, "a_start", "a_end", b, "b_start", "b_end", bin="hour"
        )
        .groupBy("b_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.unix_timestamp(F.min("a_start")).alias("first_a_s"),
        )
    )


@register(
    "j8_salted_join",
    tags=("J1", "A1"),
    oracle=f"""
SELECT p_brand,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def j8_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim equi-join (hot fact keys spread over 8 salted
    reducers, dim replicated 8x) proven result-identical to the plain
    join by the plain-SQL oracle — the manual skew tool for when the
    dim is too big to broadcast and AQE's runtime skew split cannot
    apply. Completes the skew toolbox next to salted aggregation
    (a10) and bucketed joins (j7)."""
    from ..operators.skew import salted_join

    rev = F.col("l_extendedprice").cast(DECQ) * (
        F.lit(1) - F.col("l_discount").cast(DECQ)
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    return (
        salted_join(li, part, on=["l_partkey"], n_salts=8)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "k8_compaction",
    tags=("K1", "T12"),
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def k8_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction through the real sink path: the events
    table is written fragmented (64 files — the shape a streaming
    sink leaves behind), compacted down to 4 with the atomic
    backup-aside swap, and read back — the oracle proves compaction
    is content-preserving row for row. ``coalesce``, not
    ``repartition``: narrowing to fewer files needs no shuffle, so at
    100 TB the per-partition compaction cost is a local rewrite of
    just the fragmented directory."""
    from ..session import session_scratch_dir
    from ..sinks.layout import compact_parquet, parquet_file_count

    cols = ["event_id", "user_id", "event_type", "value"]
    path = session_scratch_dir(spark, "k8_compact") + "/events_frag"
    _t(spark, sf_dir, "events").select(*cols).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    n_before = parquet_file_count(path)
    n_after = compact_parquet(spark, path, target_files=4)
    if not (n_after < n_before and n_after <= 4):
        raise RuntimeError(
            f"compaction did not shrink file count: {n_before} -> {n_after}"
        )
    return spark.read.parquet(path).select(*cols)


@register(
    "q2_min_cost_supplier",
    tags=("J1", "A1", "R1"),
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pc AS (
  SELECT c.l_partkey AS partkey, eu.s_name, eu.s_acctbal, eu.n_name,
         c.unit_cost
  FROM cost c JOIN eu ON c.l_suppkey = eu.s_suppkey
), best AS (
  SELECT partkey, MIN(unit_cost) AS best_cost FROM pc GROUP BY partkey
)
SELECT p.p_partkey, p.p_brand, pc.s_name, pc.n_name, pc.s_acctbal,
       pc.unit_cost
FROM pc
JOIN best b ON pc.partkey = b.partkey AND pc.unit_cost = b.best_cost
JOIN part p ON pc.partkey = p.p_partkey
WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
ORDER BY pc.s_acctbal DESC, pc.n_name, pc.s_name, p.p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped "minimum-cost supplier": for every small
    STANDARD part, the European supplier(s) offering the lowest unit
    cost. The synthetic schema has no partsupp table, so supply cost is
    derived as MIN(l_extendedprice / l_quantity) per (part, supplier)
    observed in lineitem — exact on both engines because IEEE division
    and MIN are bit-deterministic (no float accumulation anywhere).

    Scale shape: the reference's correlated MIN subquery is expressed
    as a per-part aggregate joined back on (partkey, cost) — both sides
    of that join come out of the same cost table, so AQE reuses its
    exchange; supplier/nation/region and the filtered part subset are
    broadcast dimensions. One data-sized shuffle (the cost group-by on
    partkey) carries the whole query."""
    li = _t(spark, sf_dir, "lineitem")
    cost = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pc = cost.join(F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey")).select(
        "partkey", "s_name", "s_acctbal", "n_name", "unit_cost"
    )
    best = pc.groupBy("partkey").agg(F.min("unit_cost").alias("best_cost"))
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand")
    )
    return (
        pc.withColumnRenamed("partkey", "pk")
        .join(
            best,
            (F.col("pk") == F.col("partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(parts, F.col("pk") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "w4_linear_interp",
    tags=("T6", "A2"),
    oracle=f"""
WITH chg AS (
  SELECT user_id, CAST(ts AS DATE) AS cd, ts, event_id, value
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
    AND CAST(ts AS DATE) >= DATE '{{GS}}' AND CAST(ts AS DATE) <= DATE '{{GE}}'
), dedup AS (
  SELECT user_id, cd, value FROM (
    SELECT user_id, cd, value,
           row_number() OVER (PARTITION BY user_id, cd
                              ORDER BY cd DESC, ts DESC, event_id DESC) AS rn
    FROM chg) t WHERE rn = 1
), grid AS (
  SELECT u.user_id, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM dedup) u,
       LATERAL generate_series(DATE '{{GS}}', DATE '{{GE}}', INTERVAL 1 DAY) g(d)
), anch AS (
  SELECT g.user_id, g.day,
         last_value(d.value IGNORE NULLS) OVER wa AS prev_v,
         last_value(d.cd IGNORE NULLS) OVER wa AS prev_d,
         first_value(d.value IGNORE NULLS) OVER wd AS next_v,
         first_value(d.cd IGNORE NULLS) OVER wd AS next_d
  FROM grid g LEFT JOIN dedup d ON g.user_id = d.user_id AND g.day = d.cd
  WINDOW wa AS (PARTITION BY g.user_id ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wd AS (PARTITION BY g.user_id ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day, round(CASE
         WHEN next_v IS NULL THEN prev_v
         WHEN next_d = prev_d THEN prev_v
         ELSE prev_v + (next_v - prev_v)
              * (CAST(date_diff('day', prev_d, day) AS DOUBLE)
                 / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
       END, 6) AS value
FROM anch WHERE prev_v IS NOT NULL
""".replace("{GS}", "2024-01-10").replace("{GE}", "2024-02-10"),
)
def w4_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with linear interpolation between purchase change
    points (the hypertable-style twin of the t6 forward-fill):
    value = prev + (next - prev) * elapsed/span; trailing days hold
    the last anchor. One key shuffle feeds both window scans."""
    from ..operators.forward_fill import linear_interpolate_daily

    ev = _t(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("cd"), "ts", "event_id", "value"
    )
    return linear_interpolate_daily(
        changes,
        key_cols=["user_id"],
        date_col="cd",
        value_col="value",
        grid_start="2024-01-10",
        grid_end="2024-02-10",
        tie_break_cols=["ts", "event_id"],
    )


@register(
    "w5_rolling_revenue",
    tags=("A1", "A2"),
    oracle=f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY 1
)
SELECT day, revenue,
       CAST(SUM(CAST(revenue AS DECIMAL(25,6))) OVER w AS DOUBLE) AS revenue_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window
FROM daily
WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
""",
)
def w5_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day revenue over the daily series — a RANGE-framed
    window (calendar days, robust to gaps, unlike a ROWS frame). Spark
    ranges over an integer day index (datediff from epoch) which is
    exactly DuckDB's RANGE INTERVAL semantics. The single global
    window runs on the tiny post-aggregation daily series, never on
    raw lineitem — aggregate first, window the small thing."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    daily = (
        li.groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .withColumn("day_idx", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
    )
    w = Window.orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(25,6)")).over(w).cast("double").alias("revenue_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


@register(
    "q4_order_priority",
    tags=("J3", "A1"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS semi join: orders with at least one
    late-shipping line, counted per priority. The EXISTS predicate
    correlates on both the key and a non-equi date comparison — Spark
    plans it as a left-semi join with the date condition in the join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q22_global_sales",
    tags=("J3", "A1"),
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""",
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped composite: scalar-subquery threshold (average
    positive balance, broadcast as a 1-row cross join) + NOT EXISTS
    anti join (customers who never ordered) + aggregation. Average is
    computed as decimal-sum / count so both engines divide the same
    exact numbers."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double").alias("total_bal"),
        )
    )


@register(
    "q15_top_supplier",
    tags=("A1", "J1"),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped view + aggregate-on-aggregate: quarterly
    revenue per supplier as a temp view, then the supplier(s) whose
    revenue equals the view's max — the revenue aggregation is
    computed once and reused for both the max and the equality probe
    (Spark reuses the exchange across the self-reference)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    revenue.createOrReplaceTempView("q15_revenue")
    supp = _t(spark, sf_dir, "supplier")
    supp.createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, total_revenue
        FROM q15_supplier, q15_revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT MAX(total_revenue) FROM q15_revenue)
        """
    )


# --------------------------------------------------------------------------
# Round-2 OLAP battery fill-ins: q7/q8/q11/q13/q16/q17/q19 shapes
# (adapted to the testdata columns — no partsupp/commitdate/shipmode)
# --------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    tags=("J1", "A1"),
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
FROM lineitem, orders, customer, supplier, nation n1, nation n2
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(o_orderdate) AS INT)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: shipping volume between a nation pair by year.
    Two broadcast nation dims with a disjunctive pair predicate; the
    fact-fact joins shuffle on their keys."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    tags=("J1", "A1"),
    oracle=f"""
SELECT o_year,
       CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         SUM(CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))
                  ELSE 0 END) AS nation_rev,
         SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS total_rev
  FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND l_suppkey = s_suppkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY CAST(year(o_orderdate) AS INT)) t
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped: one nation's supplier market share inside a
    customer region, per year. Conditional aggregation over one join
    tree (no second pass); the share divides two exact decimal sums
    cast to double, so it is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n2_region") == F.col("r_regionkey"),
        )
    )
    agg = base.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))).alias(
            "nation_rev"
        ),
        F.sum(rev).alias("total_rev"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_rev").cast("double") / F.col("total_rev").cast("double")).alias(
            "mkt_share"
        ),
    )


@register(
    "q11_important_stock",
    tags=("A1", "J3"),
    oracle=f"""
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS {DECQ}) * CAST(p_retailprice AS {DECQ})) AS part_value
  FROM lineitem, part, supplier, nation
  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
    AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
  GROUP BY l_partkey
), tot AS (SELECT SUM(part_value) AS total_value FROM val)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM val, tot
WHERE CAST(part_value AS DOUBLE) > 0.001 * CAST(total_value AS DOUBLE)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: parts whose inventory value from one nation's
    suppliers exceeds a fraction of the total — group-by with a
    HAVING threshold against a broadcast scalar aggregate (aggregate
    of an aggregate, no second scan of the fact)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    val = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_quantity").cast(DECQ) * F.col("p_retailprice").cast(DECQ)
            ).alias("part_value")
        )
    )
    tot = val.agg(F.sum("part_value").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_value").cast("double")
            > F.lit(0.001) * F.col("total_value").cast("double")
        )
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


@register(
    "q13_order_distribution",
    tags=("J1", "A1"),
    oracle="""
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
""",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: distribution of per-customer order counts,
    keeping zero-order customers — left outer join with a predicate in
    the join condition (not a post-filter, which would drop the
    unmatched rows), then an aggregate of an aggregate."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (~orders.o_orderpriority.startswith("1")),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q16_supplier_variety",
    tags=("A3", "A1"),
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_size
""",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped: distinct supplier counts per part attribute
    slice (exclusion predicate + IN-list, two-column distinct agg)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity",
    tags=("J1", "A1"),
    oracle=f"""
WITH pq AS (
  SELECT l_partkey AS agg_partkey,
         COUNT(*) AS n_li,
         SUM(CAST(l_quantity AS {DECQ})) AS sum_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS {DECQ})) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part, pq
WHERE p_partkey = l_partkey AND agg_partkey = l_partkey
  AND p_brand = 'Brand#12'
  AND 5 * CAST(l_quantity AS {DECQ}) * n_li < sum_qty
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: revenue from below-average-quantity orders of
    one brand. The correlated per-part average becomes one pre-agg
    joined back to the fact; the 20%-of-average test is rearranged to
    exact integer/decimal arithmetic (5*qty*n < sum) so no
    engine-dependent float average sits on the filter boundary."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    pq = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.count("*").alias("n_li"),
        F.sum(F.col("l_quantity").cast(DECQ)).alias("sum_qty"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == F.col("agg_partkey"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast(DECQ) * F.col("n_li")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DECQ)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q19_discounted_revenue",
    tags=("T4", "A1"),
    oracle=f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: disjunction of conjunctive brand/size/quantity
    ranges — Catalyst pushes the common p_partkey equi-key into the
    join and evaluates the OR-of-ANDs as a residual filter."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DECQ) * (F.lit(1) - F.col("l_discount").cast(DECQ))
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "k6_cdc_merge",
    tags=("K1", "K3"),
    oracle=f"""
WITH base AS (
  SELECT o_orderkey AS okey, o_totalprice AS price, 'base' AS src FROM orders
), oplog AS (
  SELECT o_orderkey AS okey,
         CAST(CAST(o_totalprice AS {DEC}) * 2 AS DOUBLE) AS price,
         'cdc' AS src, 'U' AS op, 1 AS seq
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'cdc', 'U', 1 FROM orders WHERE o_orderkey % 4 = 1
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'cdc', 'D', 2 FROM orders WHERE o_orderkey % 4 = 1
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'cdc', 'D', 1 FROM orders WHERE o_orderkey % 4 = 2
  UNION ALL
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS {DEC}) * 3 AS DOUBLE),
         'cdc', 'I', 2
  FROM orders WHERE o_orderkey % 4 = 2
), latest AS (
  SELECT okey, price, src, op FROM (
    SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) AS rn
    FROM oplog) t WHERE rn = 1
)
SELECT okey, price, src FROM latest WHERE op <> 'D'
UNION ALL
SELECT b.okey, b.price, b.src FROM base b
WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.okey = b.okey)
""",
)
def k6_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC op-log fold onto a base table via ``apply_cdc``: per key
    the latest op wins — updates (okey%4=0), update-then-delete nets
    to a delete (okey%4=1), delete-then-insert resurrects with a new
    value (okey%4=2), untouched keys pass through (okey%4=3). One
    window + one anti-join; no iterative replay."""
    from ..sinks.upsert import apply_cdc

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.lit("base").alias("src"),
    )
    def op_rows(mod: int, price_col, op: str, seq: int):
        return orders.filter(F.col("o_orderkey") % 4 == mod).select(
            F.col("o_orderkey").alias("okey"),
            price_col.alias("price"),
            F.lit("cdc").alias("src"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
        )

    p = F.col("o_totalprice")
    ops = (
        op_rows(0, (p.cast(DEC) * 2).cast("double"), "U", 1)
        .unionByName(op_rows(1, p, "U", 1))
        .unionByName(op_rows(1, p, "D", 2))
        .unionByName(op_rows(2, p, "D", 1))
        .unionByName(op_rows(2, (p.cast(DEC) * 3).cast("double"), "I", 2))
    )
    return apply_cdc(base, ops, keys=["okey"], seq_col="seq", op_col="op")


@register(
    "j10_asof_forward",
    tags=("J2",),
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, value, event_id FROM (
    SELECT user_id, ts, value, event_id,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') t
  WHERE rn = 1
)
SELECT c.event_id, c.user_id, p.value AS asof_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
)
def j10_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click picks up the EARLIEST
    same-or-later purchase value for its user ("next event after") —
    the direction='forward' mode of the union-tag operator, same
    single key-partitioned window plan with time ordered descending.
    Oracle is DuckDB's native ASOF JOIN with the <= comparison."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    return asof_join(
        clicks,
        purch,
        on=["user_id"],
        ts_col="ts",
        value_cols=["value"],
        right_tie_break="event_id",
        direction="forward",
    ).select("event_id", "user_id", "asof_value")


@register(
    "j5_asof_two_table",
    tags=("J2",),
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, value, event_id FROM (
    SELECT user_id, ts, value, event_id,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') t
  WHERE rn = 1
)
SELECT c.event_id, c.user_id, p.value AS asof_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def j5_asof_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General two-table as-of join through the union-tag operator
    (``operators/asof.py``): each click picks up the latest
    same-or-earlier purchase value for its user, null when none.
    ONE key-partitioned shuffle — not a range join, which Spark would
    plan as a per-key nested loop. The oracle uses DuckDB's native
    ASOF JOIN, pinning the semantics to the industry meaning."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    return asof_join(
        clicks,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        on=["user_id"],
        ts_col="ts",
        value_cols=["value"],
        right_tie_break="p_event_id",
    ).select("event_id", "user_id", F.col("asof_value").cast("double").alias("asof_value"))


@register(
    "k7_scd2_history",
    tags=("K1", "A2"),
    oracle="""
WITH chg AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value, event_id FROM (
    SELECT user_id, ts, value, event_id,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
    WHERE event_type = 'purchase' AND user_id IS NOT NULL AND value IS NOT NULL) t
  WHERE rn = 1
)
SELECT user_id, value,
       d AS valid_from,
       lead(d) OVER (PARTITION BY user_id ORDER BY d) AS valid_to,
       lead(d) OVER (PARTITION BY user_id ORDER BY d) IS NULL AS is_current
FROM chg
""",
)
def k7_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: one daily
    change row per (user, day) (last-wins within the day, same
    tie-break as the forward-fill), then validity intervals via a
    per-key lead() — half-open [valid_from, valid_to), open-ended
    current row flagged. This is how the reference's snapshot-upsert
    tables become auditable history in a warehouse; one window, one
    shuffle on the key, O(1) state per key."""
    ev = _t(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w_dedup = Window.partitionBy("user_id", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    chg = (
        ev.filter(F.col("event_type") == "purchase")
        .na.drop(subset=["user_id", "value"])
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("user_id", day.alias("valid_from"), "value")
    )
    w = Window.partitionBy("user_id").orderBy("valid_from")
    return chg.select(
        "user_id",
        "value",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


@register(
    "dq_expectations",
    headline=True,
    tags=("DQ", "A1", "J3"),
    oracle="""
SELECT 'ev_event_id_not_null' AS rule, 'not_null' AS kind,
       COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS n_violations,
       COUNT(CASE WHEN event_id IS NULL THEN 1 END) = 0 AS passed
FROM events
UNION ALL
SELECT 'ev_event_id_unique', 'unique',
       COUNT(event_id) - COUNT(DISTINCT event_id),
       COUNT(event_id) - COUNT(DISTINCT event_id) = 0
FROM events
UNION ALL
SELECT 'ev_value_in_range', 'in_range',
       COUNT(CASE WHEN value < 0 OR value > 1000 THEN 1 END),
       COUNT(CASE WHEN value < 0 OR value > 1000 THEN 1 END) = 0
FROM events
UNION ALL
SELECT 'ev_type_accepted', 'accepted_values',
       COUNT(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
             ('click', 'error', 'purchase', 'signup', 'view') THEN 1 END),
       COUNT(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
             ('click', 'error', 'purchase', 'signup', 'view') THEN 1 END) = 0
FROM events
UNION ALL
SELECT 'ev_user_ref_customer', 'referential',
       (SELECT COUNT(*) FROM events e
        WHERE e.user_id IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = e.user_id)),
       (SELECT COUNT(*) FROM events e
        WHERE e.user_id IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = e.user_id)) = 0
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the events batch: not-null,
    uniqueness, range, accepted-values, and referential-integrity
    rules, compiled so ALL scalar rules share ONE aggregate over ONE
    scan and the FK rule adds a single broadcast anti-join — rule
    count never multiplies scan count (the Deequ execution model; see
    operators/expectations.py). No counterpart in the reference (its
    validity checking is the dropna at scripts/pricenow_etl.py:60-66);
    this is the ingest gate a 100 TB pipeline runs per batch."""
    from ..operators.expectations import Expectation, check_expectations

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    rules = [
        Expectation("ev_event_id_not_null", "not_null", ("event_id",)),
        Expectation("ev_event_id_unique", "unique", ("event_id",)),
        Expectation("ev_value_in_range", "in_range", ("value",), lo=0, hi=1000),
        Expectation(
            "ev_type_accepted",
            "accepted_values",
            ("event_type",),
            values=EVENT_TYPES,
        ),
        Expectation(
            "ev_user_ref_customer",
            "referential",
            ("user_id",),
            ref_df=cust,
            ref_col="c_custkey",
        ),
    ]
    return check_expectations(ev, rules)


@register(
    "gr_pagerank",
    headline=True,
    multi_action=True,  # localCheckpoint materializations + final action
    tags=("GR", "A1", "J1"),
    oracle="""
WITH eraw AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
e AS (SELECT c AS src, s AS dst FROM eraw
      UNION ALL SELECT s AS src, c AS dst FROM eraw),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
c1 AS (SELECT e.dst AS node,
              SUM(((r0.rank * 85) // 100) // o.outdeg) AS in_sum
       FROM e JOIN r0 ON r0.node = e.src JOIN outdeg o ON o.src = e.src
       GROUP BY e.dst),
r1 AS (SELECT n.node,
              CAST(150000000 + COALESCE(c1.in_sum, 0) AS BIGINT) AS rank
       FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
c2 AS (SELECT e.dst AS node,
              SUM(((r1.rank * 85) // 100) // o.outdeg) AS in_sum
       FROM e JOIN r1 ON r1.node = e.src JOIN outdeg o ON o.src = e.src
       GROUP BY e.dst),
r2 AS (SELECT n.node,
              CAST(150000000 + COALESCE(c2.in_sum, 0) AS BIGINT) AS rank
       FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
top AS (SELECT node, rank FROM r2 ORDER BY rank DESC, node ASC LIMIT 100)
SELECT CASE WHEN node % 2 = 0 THEN 'C' || CAST(node // 2 AS VARCHAR)
            ELSE 'S' || CAST(node // 2 AS VARCHAR) END AS node,
       rank
FROM top
""",
)
def gr_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-analysis quality signal: 2-iteration damped PageRank over
    the customer<->supplier trade graph (distinct edges from
    orders x lineitem, symmetrized), top-100 nodes. Exact fixed-point
    BIGINT arithmetic makes the iterative computation a pure function
    of the edge list — hash-verifiable against unrolled SQL CTEs and
    byte-stable under AQE repartitioning (see operators/graph.py).
    The corpus-pipeline use is identical in shape: rank documents by
    their near-dup/link graph and weight training samples by rank.

    Perf shape: nodes carry NUMERIC ids end-to-end (customer 2k,
    supplier 2k+1 — every shuffle/sort keys on a BIGINT, not a
    string; measured 2x on the whole query), the pair list is
    deduplicated BEFORE symmetrizing (the two directions can't
    collide, so the doubled list needs no second distinct), and the
    human-readable C#/S# labels are decoded AFTER the top-k, on 100
    rows instead of the node set. Per iteration: one shuffle on dst;
    top-k via TakeOrderedAndProject, never a global sort."""
    from ..operators.graph import pagerank_fixed_iters

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pair = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pair.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pair.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank_fixed_iters(
        edges, n_iters=2, assume_distinct=True, symmetric=True
    )
    top = ranks.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(100)
    label = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("C"), F.expr("node div 2"))
    ).otherwise(F.concat(F.lit("S"), F.expr("node div 2")))
    return top.select(label.alias("node"), "rank")


@register(
    "gr_triangle_count",
    tags=("GR", "J1", "A1"),
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
e AS (SELECT DISTINCT a.s AS u, b.s AS v
      FROM li a JOIN li b ON a.o = b.o AND a.s < b.s),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
corners AS (SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
SELECT node, COUNT(*) AS triangles FROM corners GROUP BY node
""",
)
def gr_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the supplier co-occurrence graph
    (two suppliers are adjacent when they ship lines of the same
    order) — the clustering-coefficient building block a corpus
    pipeline runs over its near-dup/link graph to find tightly knit
    template families. Graph construction is itself bounded: lineitem
    groups are per-order (<= 7 lines in TPC-H-shaped data), so the
    same-order pair join emits O(|lines|^2) per order, never a global
    cross. Counting uses degree-oriented wedge enumeration
    (operators/graph.py:triangle_counts): every triangle is found
    exactly once from its lowest-(degree, id) corner, capping wedge
    fan-out at O(sqrt(|E|)) per node — the hub-proof form. The oracle
    enumerates the same triangles by plain id-ordering (a < b < c);
    both count each triangle once, so the per-node sums must agree
    bit-for-bit.
    """
    from ..operators.graph import triangle_counts

    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    pairs = li.alias("a").join(
        li.alias("b"),
        (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
    ).select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
    return triangle_counts(pairs)


@register(
    "ts_ohlc_rollup",
    tags=("A1", "A2", "T7"),
    oracle="""
WITH b AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
         event_type, value, ts, event_id
  FROM events),
r AS (
  SELECT bucket, event_type, value,
         row_number() OVER (PARTITION BY bucket, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY bucket, event_type) AS n
  FROM b)
SELECT bucket, event_type,
       MAX(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(CASE WHEN rn = n THEN value END) AS close,
       MIN(value) AS low,
       MAX(value) AS high,
       CAST(SUM(CAST(value AS DECIMAL(15,3))) AS DOUBLE) AS vol,
       COUNT(*) AS n_events
FROM r GROUP BY bucket, event_type
""",
)
def ts_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: hourly OHLC bars per event
    type — the continuous-aggregate shape (TimescaleDB rollup /
    InfluxDB downsample) that turns a raw event stream into the
    compact bar table dashboards and models read. One shuffle total:
    the row_number window and the group-by share the same
    (bucket, event_type) partitioning, so Catalyst reuses the exchange
    and the aggregate runs on already-partitioned data. Determinism:
    open/close pick STORED doubles via a (ts, event_id)-tie-broken
    row_number (no float arithmetic), min/max pass through stored
    values, and the volume sum accumulates in DECIMAL before a single
    cast to double (module determinism rules). Bucket is emitted as a
    formatted string — never a raw timestamp — per the same rules. At
    100 TB this is the textbook map-side-combine aggregate: cardinality
    collapses from |events| to |buckets x types|, and a coarser or
    finer grain is the same plan with a different date_trunc unit.
    """
    ev = _t(spark, sf_dir, "events")
    keys = ["bucket", "event_type"]
    w = Window.partitionBy(*keys).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wall = Window.partitionBy(*keys)
    r = (
        ev.withColumn(
            "bucket",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
    )
    return r.groupBy(*keys).agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias("close"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("vol"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "ts_ewma_smooth",
    tags=("TS", "A1", "A2"),
    oracle="""
WITH f AS (
  SELECT user_id, ts, event_id,
         CAST(floor(greatest(value, 0) * 1000000) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND user_id IS NOT NULL),
g AS (
  SELECT user_id,
         list(v ORDER BY ts ASC, event_id ASC) AS vs,
         COUNT(*) AS n_events
  FROM f GROUP BY user_id)
SELECT user_id, n_events,
       CAST(list_reduce(vs, (acc, x) -> acc - acc // 4 + x // 4) AS BIGINT)
         AS ewma_fixed
FROM g
""",
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values —
    an ORDER-DEPENDENT sequential fold no plain aggregate can express
    (e_0 = v_0; e_i = e_{i-1} - e_{i-1} div 4 + v_i div 4, i.e.
    alpha = 1/4 in integer fixed point). Runs entirely JVM-side via
    higher-order functions: collect_list -> array_sort ->
    F.aggregate — one shuffle on user_id, zero Python UDFs, codegen'd
    lambda per group. Determinism: values clamp to >= 0 and quantize
    to 1e-6 fixed point BEFORE the fold (floor(value*1e6) is the same
    double->int map in every IEEE engine), the fold is pure BIGINT
    arithmetic, and the ordering key (ts, event_id) is unique — the
    result is a pure function of the group's rows, hash-verifiable
    against DuckDB's list_reduce (which seeds from the first element,
    exactly e_0 = v_0).

    100 TB note: per-group state is that user's event list — the same
    bounded-group contract as tx_pack_sequences (document caps /
    per-user event counts are pipeline-bounded). For genuinely
    unbounded keys the same recurrence runs as an
    applyInPandasWithState streaming fold (streaming/stateful.py);
    this batch form is the backfill path."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    v = F.floor(F.greatest(F.col("value"), F.lit(0.0)) * 1000000).cast("long")
    grouped = (
        ev.select("user_id", "ts", "event_id", v.alias("v"))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "v"))
            ).alias("evs"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    vs = F.transform(F.col("evs"), lambda s: s["v"])
    seed = F.element_at(vs, 1)
    rest = F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0)))
    # acc stays <= max(v) <= 1e9 by induction (convex combination), so
    # the double division below is exact (< 2^53) and cast('long')
    # truncation == floor on the non-negative domain.
    ewma = F.aggregate(
        rest,
        seed,
        lambda acc, x: acc
        - (acc / F.lit(4)).cast("long")
        + (x / F.lit(4)).cast("long"),
    )
    return grouped.select("user_id", "n_events", ewma.alias("ewma_fixed"))


@register(
    "dq_fk_orphans",
    tags=("DQ", "J3", "A1"),
    oracle="""
SELECT 'orders.o_custkey->customer' AS fk,
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL) AS n_rows,
       (SELECT COUNT(*) FROM orders o WHERE o_custkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
         AS n_orphans,
       (SELECT COUNT(*) FROM orders o WHERE o_custkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
         = 0 AS ok
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l_orderkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT COUNT(*) FROM lineitem l WHERE l_orderkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NOT NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l_partkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
       (SELECT COUNT(*) FROM lineitem l WHERE l_partkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) = 0
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NOT NULL),
       (SELECT COUNT(*) FROM lineitem l WHERE l_suppkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
       (SELECT COUNT(*) FROM lineitem l WHERE l_suppkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) = 0
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NOT NULL),
       (SELECT COUNT(*) FROM customer c WHERE c_nationkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
       (SELECT COUNT(*) FROM customer c WHERE c_nationkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
         = 0
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       (SELECT COUNT(*) FROM supplier WHERE s_nationkey IS NOT NULL),
       (SELECT COUNT(*) FROM supplier s WHERE s_nationkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)),
       (SELECT COUNT(*) FROM supplier s WHERE s_nationkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
         = 0
UNION ALL
SELECT 'nation.n_regionkey->region',
       (SELECT COUNT(*) FROM nation WHERE n_regionkey IS NOT NULL),
       (SELECT COUNT(*) FROM nation n WHERE n_regionkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
       (SELECT COUNT(*) FROM nation n WHERE n_regionkey IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
         = 0
UNION ALL
SELECT 'events.user_id->customer',
       (SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL),
       (SELECT COUNT(*) FROM events e WHERE user_id IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)),
       (SELECT COUNT(*) FROM events e WHERE user_id IS NOT NULL AND NOT
          EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) = 0
""",
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide referential-integrity audit: every FK edge of the
    warehouse star schema checked in ONE query — the cross-table
    companion to dq_expectations' single-edge referential rule (that
    one gates a batch; this one fingerprints the whole warehouse after
    a load). Per edge: child rows with a non-null FK are left-joined to
    the parent key and counted (total + unmatched) in one aggregate —
    Catalyst plans the dim-sized parents (nation, region, customer,
    supplier, part) as broadcast joins, and the two fact-sized edges
    (lineitem->orders at ~4:1, events->customer) as shuffle joins that
    AQE right-sizes. The eight edge checks are independent branches of
    a union — on a cluster they run concurrently; no branch scans a
    table it doesn't need (verified: each scan's ReadSchema is just
    the FK column). Result is 8 rows — safe to collect, alert on, or
    journal per batch."""
    edges = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ]
    out = None
    for fk_name, child, fk, parent, pk in edges:
        c = (
            _t(spark, sf_dir, child)
            .select(F.col(fk).alias("k"))
            .filter(F.col("k").isNotNull())
        )
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("p")).distinct()
        row = (
            c.join(p, c["k"] == p["p"], "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(F.col("p").isNull(), 1)).alias("n_orphans"),
            )
            .select(
                F.lit(fk_name).alias("fk"),
                "n_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "k9_evolve_merge",
    tags=("K1", "K2"),
    oracle=f"""
WITH base AS (
  SELECT o_orderkey AS okey, o_totalprice AS price, 'base' AS src,
         CAST(NULL AS BIGINT) AS score
  FROM orders
), upd AS (
  SELECT o_orderkey AS okey,
         CAST(CAST(o_totalprice AS {DEC}) * 2 AS DOUBLE) AS price,
         CAST(NULL AS VARCHAR) AS src,
         (o_orderkey % 100) + 1 AS score
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT okey, price, src, score FROM upd
UNION ALL
SELECT b.okey, b.price, b.src, b.score FROM base b
WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.okey = b.okey)
""",
)
def k9_evolve_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution merge: the update feed ADDED a column (score)
    and DROPPED one (src) relative to the base table — the shape every
    long-lived table hits when an upstream service ships a new field.
    merge_upsert_evolve pads both sides with typed NULLs and runs the
    standard keyed merge (updates win, unmatched base survives): old
    rows read NULL score, updated rows read NULL src, and a TYPE
    change on a shared column raises instead of silently casting
    (pytest-pinned). Same single anti-join + union plan as k1 — the
    padding is projection-only."""
    from ..sinks.upsert import merge_upsert_evolve

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.lit("base").alias("src"),
    )
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("okey"),
        (F.col("o_totalprice").cast(DEC) * 2).cast("double").alias("price"),
        ((F.col("o_orderkey") % 100) + 1).alias("score"),
    )
    return merge_upsert_evolve(base, updates, keys=["okey"])


@register(
    "dq_drift_tvd",
    tags=("DQ", "A1"),
    oracle="""
WITH b AS (
  SELECT CAST(least(greatest(floor(value / 100), 0), 9) AS BIGINT) AS bin,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
mid AS (SELECT (MIN(s) + MAX(s)) // 2 AS m FROM b),
c AS (
  SELECT bin,
         COUNT(CASE WHEN s <  (SELECT m FROM mid) THEN 1 END) AS c_ref,
         COUNT(CASE WHEN s >= (SELECT m FROM mid) THEN 1 END) AS c_cur
  FROM b GROUP BY bin),
t AS (
  SELECT bin, c_ref, c_cur,
         (c_ref * 1000000) // (SELECT SUM(c_ref) FROM c) AS share_ref_ppm,
         (c_cur * 1000000) // (SELECT SUM(c_cur) FROM c) AS share_cur_ppm
  FROM c)
SELECT bin, CAST(c_ref AS BIGINT) AS c_ref, CAST(c_cur AS BIGINT) AS c_cur,
       CAST(share_ref_ppm AS BIGINT) AS share_ref_ppm,
       CAST(share_cur_ppm AS BIGINT) AS share_cur_ppm,
       CAST(abs(share_cur_ppm - share_ref_ppm) AS BIGINT) AS drift_ppm,
       CAST((SELECT SUM(abs(share_cur_ppm - share_ref_ppm)) FROM t) // 2
            AS BIGINT) AS tvd_ppm
FROM t
""",
)
def dq_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two batches: events split at
    the midpoint of their time range (reference half vs current half),
    `value` bucketed into 10 fixed-width bins, and the shift reported
    per bin plus as a single total-variation distance — the
    batch-over-batch drift gate a feature/training pipeline runs
    before accepting a new snapshot (the PSI monitor shape, but in
    EXACT integer arithmetic: shares in ppm via integer division, TVD
    = half the L1 distance — no logs, no ulp drift, hash-verifiable).

    Scale shape: one scan computes the (min, max) time envelope (tiny
    broadcast scalar), a second computes all per-bin conditional
    counts in ONE aggregate (bin cardinality is fixed at 10 —
    map-side combine collapses everything before the shuffle); shares
    and the global TVD are arithmetic over those 10 rows (a window
    over a 10-row frame, not over data). Cost is two scans of the
    batch regardless of bin count or volume; the same plan monitors
    any column at any scale by swapping the bucketing expression."""
    b = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.least(
                F.greatest(F.floor(F.col("value") / 100), F.lit(0)), F.lit(9)
            )
            .cast("long")
            .alias("bin"),
            F.unix_timestamp("ts").alias("s"),
        )
    )
    env = b.agg(F.expr("(min(s) + max(s)) div 2").alias("m"))
    c = (
        b.crossJoin(F.broadcast(env))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("s") < F.col("m"), 1)).alias("c_ref"),
            F.count(F.when(F.col("s") >= F.col("m"), 1)).alias("c_cur"),
        )
    )
    # shares + TVD are arithmetic over the 10 bin rows: the window
    # frame is bins, not data — a constant-size driver-side-free step.
    wall = Window.partitionBy()
    t = c.select(
        "bin",
        "c_ref",
        "c_cur",
        F.expr(
            "(c_ref * 1000000) div sum(c_ref) over ()"
        ).alias("share_ref_ppm"),
        F.expr(
            "(c_cur * 1000000) div sum(c_cur) over ()"
        ).alias("share_cur_ppm"),
    )
    drift = F.abs(F.col("share_cur_ppm") - F.col("share_ref_ppm"))
    return t.select(
        "bin",
        "c_ref",
        "c_cur",
        "share_ref_ppm",
        "share_cur_ppm",
        drift.cast("long").alias("drift_ppm"),
        F.expr(
            "sum(abs(share_cur_ppm - share_ref_ppm)) over () div 2"
        ).alias("tvd_ppm"),
    )
