"""Oracle-paired query registry.

Every operator from SURVEY §2 (plus the LLM-data-pipeline extensions)
is exposed here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash at sf0.01.

Determinism rules (so Spark and DuckDB hash identically):

- outputs use only BIGINT/INT/DATE/VARCHAR/BOOLEAN/DOUBLE;
- every DOUBLE either passes through stored values untouched or is
  produced by *exact* decimal arithmetic then a single cast to double
  (float summation order is engine-dependent; decimal sums are not);
- ordered/limited queries always tie-break on a unique key;
- no raw timestamps in outputs (engines disagree on tz/precision) —
  only dates or formatted strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import SeasonConfig
from ..functions.scalar import active_flag, days_left_expr, parse_duration_days
from ..operators.calendar import date_grid
from ..operators.forward_fill import forward_fill_daily
from ..session import tiny_local_df
from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False  # run in bench.py at sf0.1
    tags: tuple[str, ...] = field(default_factory=tuple)
    # multi_action: the query runs >1 Spark job per call (iterative
    # driver loop with localCheckpoint / convergence counts). bench.py
    # gives these an untimed warm-up + median-of-5 instead of min-of-3:
    # min-of-N is meaningless when per-run JIT/checkpoint noise is the
    # same order as the value (BENCH_r04: dd_cluster_components spread
    # 3.16 s on a 3.36 s reading).
    multi_action: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
    multi_action: bool = False,
):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(
            fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tags,
            multi_action=multi_action,
        )
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# exact money/measure arithmetic: cast to decimal before any +/*/sum,
# cast the final aggregate back to double (see module docstring).
DEC = "decimal(15,3)"
DECQ = "decimal(10,2)"  # narrower, for 3-factor products that must fit p<=38


def _dsum(col: F.Column) -> F.Column:
    return F.sum(col.cast(DEC)).cast("double")


# --------------------------------------------------------------------------
# T6/J2/A1/A2 — flagship: forward-fill daily densification over events
# (reference forward_fill_daily_grid, pricenow_etl.py:199-240)
# --------------------------------------------------------------------------

GRID_START, GRID_END = "2024-01-10", "2024-02-10"


@register(
    "t6_forward_fill_daily",
    headline=True,
    tags=("T6", "J2", "A1", "A2", "T7"),
    oracle=f"""
WITH chg AS (
  SELECT user_id, CAST(ts AS DATE) AS cd, ts, event_id, value
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND value IS NOT NULL
    AND CAST(ts AS DATE) <= DATE '{GRID_END}'
), clamped AS (
  SELECT user_id, GREATEST(cd, DATE '{GRID_START}') AS day, cd, ts, event_id, value
  FROM chg
), dedup AS (
  SELECT user_id, day, value FROM (
    SELECT user_id, day, value,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY cd DESC, ts DESC, event_id DESC) AS rn
    FROM clamped) t WHERE rn = 1
), grid AS (
  SELECT u.user_id, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM chg) u,
       LATERAL generate_series(DATE '{GRID_START}', DATE '{GRID_END}', INTERVAL 1 DAY) g(d)
)
SELECT user_id, day, price FROM (
  SELECT g.user_id, g.day,
         last_value(d.value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
  FROM grid g LEFT JOIN dedup d ON g.user_id = d.user_id AND g.day = d.day
) f WHERE price IS NOT NULL
""",
)
def t6_forward_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse purchase events -> dense per-user daily price series.

    Exercises seed lookback (changes before {GRID_START} participate),
    leading-null suppression, and same-day last-wins tie-breaking —
    the full reference T6 semantics at testdata scale.
    """
    ev = _t(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("cd"), "ts", "event_id", "value"
    )
    out = forward_fill_daily(
        changes,
        key_cols=["user_id"],
        date_col="cd",
        value_col="value",
        grid_start=GRID_START,
        grid_end=GRID_END,
        tie_break_cols=["ts", "event_id"],
    )
    return out.select("user_id", "day", F.col("value").alias("price"))


@register(
    "t7_calendar_grid",
    tags=("T7",),
    oracle=f"""
SELECT CAST(g.d AS DATE) AS day,
       CAST(date_diff('day', DATE '{GRID_START}', CAST(g.d AS DATE)) AS INT) AS day_index,
       CAST(EXTRACT(month FROM CAST(g.d AS DATE)) AS INT) AS month
FROM generate_series(DATE '{GRID_START}', DATE '{GRID_END}', INTERVAL 1 DAY) g(d)
""",
)
def t7_calendar_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense inclusive daily calendar (reference py:193-197)."""
    return date_grid(spark, GRID_START, GRID_END).select(
        F.col("day"),
        F.datediff(F.col("day"), F.lit(GRID_START).cast("date")).alias("day_index"),
        F.month("day").alias("month"),
    )


# --------------------------------------------------------------------------
# T3/T8/T9 — scalar derivations (duration grammar, active flag)
# --------------------------------------------------------------------------


@register(
    "t3_duration_parse",
    tags=("T3",),
    oracle="""
SELECT p_partkey, duration_str,
       CASE WHEN duration_str = '4h' THEN 1
            ELSE CAST(regexp_replace(duration_str, 'd$', '') AS INT) END AS duration_days
FROM (
  SELECT p_partkey,
         CASE WHEN p_size % 7 = 0 THEN '4h'
              ELSE CAST(p_size AS VARCHAR) || 'd' END AS duration_str
  FROM part) t
""",
)
def t3_duration_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-grammar parse ('4h'->1, '13d'->13; reference py:315-318),
    applied to a duration string synthesized from part.p_size."""
    part = _t(spark, sf_dir, "part")
    dur = F.when(F.col("p_size") % 7 == 0, F.lit("4h")).otherwise(
        F.concat(F.col("p_size").cast("string"), F.lit("d"))
    )
    df = part.select("p_partkey", dur.alias("duration_str"))
    return df.withColumn("duration_days", parse_duration_days("duration_str"))


SEASON_TEST = SeasonConfig(
    start=__import__("datetime").date(1995, 1, 1),
    end=__import__("datetime").date(2001, 12, 31),
    day_overrides={
        __import__("datetime").date(1998, 12, 25): 2,
        __import__("datetime").date(1998, 12, 26): 1,
    },
    closed_open_intervals=[
        (__import__("datetime").date(1998, 12, 26), __import__("datetime").date(1999, 1, 5))
    ],
)


@register(
    "t8_active_flag",
    tags=("T8", "T9"),
    oracle="""
SELECT o_orderkey, valid_from, days_left, duration_days,
       days_left >= duration_days AS active
FROM (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS valid_from,
         CASE WHEN CAST(o_orderdate AS DATE) = DATE '1998-12-25' THEN 2
              WHEN CAST(o_orderdate AS DATE) = DATE '1998-12-26' THEN 1
              WHEN CAST(o_orderdate AS DATE) > DATE '1998-12-26'
               AND CAST(o_orderdate AS DATE) < DATE '1999-01-05' THEN 0
              ELSE CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS INT) + 1
         END AS days_left,
         CAST(substr(o_orderpriority, 1, 1) AS INT) * 365 AS duration_days
  FROM orders) t
""",
)
def t8_active_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-flag derivation with closure-calendar overrides
    (reference py:349-367), parameterized via SeasonConfig."""
    orders = _t(spark, sf_dir, "orders")
    vf = F.col("o_orderdate").cast("date")
    dur = F.substring("o_orderpriority", 1, 1).cast("int") * F.lit(365)
    df = orders.select(
        "o_orderkey",
        vf.alias("valid_from"),
        days_left_expr(vf, SEASON_TEST).alias("days_left"),
        dur.alias("duration_days"),
    )
    return df.withColumn("active", active_flag(F.col("days_left"), F.col("duration_days")))


# --------------------------------------------------------------------------
# T4/T5 — predicate + null-validity filters
# --------------------------------------------------------------------------


@register(
    "t4_t5_filter_valid",
    tags=("T4", "T5"),
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'purchase' AND user_id IS NOT NULL AND value IS NOT NULL
""",
)
def t4_t5_filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter + null-validity drop (reference py:322, py:204-208).
    Both predicates push down to the parquet scan."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .na.drop(subset=["user_id", "value"])
        .select("event_id", "user_id", "value")
    )


# --------------------------------------------------------------------------
# S5 — payload/JSON normalization
# --------------------------------------------------------------------------


@register(
    "s5_json_extract",
    tags=("S5",),
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
""",
)
def s5_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured field extraction from a JSON payload column
    (envelope probing analog of reference py:153-161)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


# --------------------------------------------------------------------------
# J1/J3 — joins
# --------------------------------------------------------------------------


@register(
    "j1_broadcast_join",
    headline=True,
    tags=("J1",),
    oracle=f"""
SELECT p.p_brand AS brand,
       CAST(SUM(CAST(l.l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (1 - CAST(l.l_discount AS {DEC}))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def j1_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join of the fact table to a small dimension
    (reference duration_map probe, py:320/349/424) + grouped rollup."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "j2_asof_join",
    headline=True,
    tags=("J2",),
    oracle="""
SELECT event_id, user_id, purchase_value FROM (
  SELECT event_id, user_id, event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_value
  FROM events) t
WHERE event_type = 'click' AND purchase_value IS NOT NULL
""",
)
def j2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward, inclusive) join: each click picks up the most
    recent purchase value of the same user (reference J2 two-pointer
    merge, py:216-231). One window, one shuffle — no join at all."""
    ev = _t(spark, sf_dir, "events")
    marker = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("purchase_value", F.last(marker, ignorenulls=True).over(w))
        .filter((F.col("event_type") == "click") & F.col("purchase_value").isNotNull())
        .select("event_id", "user_id", "purchase_value")
    )


@register(
    "j3_semi_join",
    tags=("J3", "T13"),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
""",
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: facts restricted to keys from a filtered dimension
    (reference's collected-id-list pushdown, py:324/439/145 — expressed
    relationally instead of via driver collect)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# A1/A3 + standard aggregate surface
# --------------------------------------------------------------------------


@register(
    "a1_pricing_summary",
    headline=True,
    tags=("A1",),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ}))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS {DECQ}) * (1 - CAST(l_discount AS {DECQ})) * (1 + CAST(l_tax AS {DECQ}))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregate battery (SURVEY §2.4 notes the
    reference has no numeric aggregates; Spark supplies them natively)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz")
    )
    q = F.col("l_quantity").cast(DEC)
    ep = F.col("l_extendedprice").cast(DEC)
    epq = F.col("l_extendedprice").cast(DECQ)
    disc = F.col("l_discount").cast(DECQ)
    tax = F.col("l_tax").cast(DECQ)
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(q).cast("double").alias("sum_qty"),
        F.sum(ep).cast("double").alias("sum_base_price"),
        F.sum(epq * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.sum(epq * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
        (F.sum(q).cast("double") / n).alias("avg_qty"),
        (F.sum(ep).cast("double") / n).alias("avg_price"),
        (_dsum(F.col("l_discount")) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "a3_distinct_keys",
    tags=("A3",),
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def a3_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-key accumulation (reference py:291/324/439)."""
    return _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# --------------------------------------------------------------------------
# R1/R2 — sort + limit; U1 — union
# --------------------------------------------------------------------------


@register(
    "r1_r2_sort_limit",
    tags=("R1", "R2"),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def r1_r2_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (reference delegates ordering to the server,
    py:116-122; Spark does a TakeOrderedAndProject — no full sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "u1_u2_set_ops",
    tags=("U1", "R2"),
    oracle="""
SELECT 'page:' || event_type AS side, COUNT(*) AS n FROM (
  SELECT event_type FROM events WHERE event_id < 2000
  UNION ALL
  SELECT event_type FROM events WHERE event_id >= 2000 AND event_id < 4000
) t GROUP BY event_type
UNION ALL
SELECT 'only_buyers' AS side, COUNT(*) AS n FROM (
  SELECT DISTINCT o_custkey FROM orders
  EXCEPT
  SELECT DISTINCT user_id FROM events) t
UNION ALL
SELECT 'both' AS side, COUNT(*) AS n FROM (
  SELECT DISTINCT o_custkey FROM orders
  INTERSECT
  SELECT DISTINCT user_id FROM events) t
""",
)
def u1_u2_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-operation battery in one registry entry (round-6
    consolidation of u1_union_pages + u2_except_intersect): union-all
    of page batches counted per type (the reference's page
    accumulation, py:186), plus EXCEPT and INTERSECT over the
    buyer/actor key domains — every branch labeled into one
    (side, n) schema. UNION ALL is a zero-shuffle concatenation;
    EXCEPT/INTERSECT hash-shuffle the deduplicated key domains only
    (dimension-sized), never the fact rows."""
    ev = _t(spark, sf_dir, "events")
    p1 = ev.filter(F.col("event_id") < 2000).select("event_type")
    p2 = ev.filter((F.col("event_id") >= 2000) & (F.col("event_id") < 4000)).select(
        "event_type"
    )
    pages = (
        p1.unionByName(p2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat(F.lit("page:"), F.col("event_type")).alias("side"), "n")
    )
    buyers = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    actors = ev.select(F.col("user_id").alias("k")).distinct()
    only = buyers.exceptAll(actors).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_buyers").alias("side"), "n"
    )
    both = buyers.intersect(actors).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("side"), "n"
    )
    return pages.unionByName(only).unionByName(both)


_E2_PAYLOAD = """
{"data": [
  {"name": "skitickets", "productDefinitions": [
    {"id": 1, "attributes": {"age": {"value": "adult"},       "duration": {"value": "1d"}}},
    {"id": 2, "attributes": {"age": {"value": "child"},       "duration": {"value": "13d"}}},
    {"id": 3, "attributes": {"age": {"value": "small_child"}, "duration": {"value": "1d"}}}]},
  {"name": "wintercard", "productDefinitions": [
    {"id": 4, "attributes": {"age": {"value": "adult"},       "duration": {"value": "4h"}}},
    {"id": 5, "attributes": {"age": {"value": "child"},       "duration": {"value": "2d"}}}]}
]}
"""


@register(
    "e2_products_flatten",
    tags=("E2", "S5", "T1", "T2", "T3", "T4"),
    oracle="""
SELECT CAST(product_id AS BIGINT) AS product_id, category, age, duration,
       CAST(duration_days AS INT) AS duration_days
FROM (VALUES
  (1, 'skitickets', 'adult', '1d', 1),
  (2, 'skitickets', 'child', '13d', 13),
  (4, 'wintercard', 'adult', '4h', 1),
  (5, 'wintercard', 'child', '2d', 2)
) AS t(product_id, category, age, duration, duration_days)
""",
)
def e2_products_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's E2 products pipeline end-to-end on a canonical
    payload: envelope probe (S5) -> explode productDefinitions (T1) ->
    nested attribute projection (T2) -> duration grammar '4h'->1 /
    '<n>d'->n (T3) -> small_child filter (T4). Oracle is the
    hand-derived expected table (reference py:287-326)."""
    import datetime as _dt

    from .pricenow import build_products

    return build_products(
        spark, [_E2_PAYLOAD], _dt.datetime(2026, 1, 1, 6, 0, 0)
    ).drop("updated_at")


@register(
    "e3_prices_daily",
    tags=("E3", "T6", "J1", "T8", "T12"),
    oracle=f"""
WITH chg AS (
  SELECT user_id, CAST(ts AS DATE) AS cd, ts, event_id, value
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND value IS NOT NULL
    AND CAST(ts AS DATE) <= DATE '{GRID_END}'
), clamped AS (
  SELECT user_id, GREATEST(cd, DATE '{GRID_START}') AS day, cd, ts, event_id, value
  FROM chg
), dedup AS (
  SELECT user_id, day, value FROM (
    SELECT user_id, day, value,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY cd DESC, ts DESC, event_id DESC) AS rn
    FROM clamped) t WHERE rn = 1
), grid AS (
  SELECT u.user_id, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM chg) u,
       LATERAL generate_series(DATE '{GRID_START}', DATE '{GRID_END}', INTERVAL 1 DAY) g(d)
), filled AS (
  SELECT user_id, day, price FROM (
    SELECT g.user_id, g.day,
           last_value(d.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
    FROM grid g LEFT JOIN dedup d ON g.user_id = d.user_id AND g.day = d.day
  ) x WHERE price IS NOT NULL
), dim AS (
  SELECT c_custkey AS user_id, CAST(c_custkey % 13 + 1 AS INT) AS duration_days
  FROM customer
)
SELECT f.user_id, f.day AS valid_from, f.price,
       (CASE WHEN f.day = DATE '{GRID_START}' + INTERVAL 2 DAY THEN 2
             WHEN f.day = DATE '{GRID_START}' + INTERVAL 3 DAY THEN 1
             WHEN f.day > DATE '{GRID_START}' + INTERVAL 3 DAY
              AND f.day < DATE '{GRID_START}' + INTERVAL 6 DAY THEN 0
             ELSE date_diff('day', f.day, DATE '{GRID_END}') + 1
        END) >= d.duration_days AS active
FROM filled f JOIN dim d ON f.user_id = d.user_id
""",
)
def e3_prices_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's E3 prices pipeline end-to-end at testdata scale:
    forward-fill densification (T6) -> broadcast duration-dim join (J1,
    the reference's duration_map dict) -> season/closure active flag
    (T8, with day overrides and a closed interval) -> sink projection
    (T12). Reference py:329-376."""
    import datetime as _dt

    from ..config import SeasonConfig
    from ..functions.scalar import active_flag, days_left_expr
    from ..operators.forward_fill import forward_fill_daily

    gs = _dt.date.fromisoformat(GRID_START)
    ge = _dt.date.fromisoformat(GRID_END)
    season = SeasonConfig(
        start=gs,
        end=ge,
        day_overrides={
            gs + _dt.timedelta(days=2): 2,
            gs + _dt.timedelta(days=3): 1,
        },
        closed_open_intervals=[
            (gs + _dt.timedelta(days=3), gs + _dt.timedelta(days=6))
        ],
    )
    ev = _t(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("cd"), "ts", "event_id", "value"
    )
    filled = forward_fill_daily(
        changes,
        key_cols=["user_id"],
        date_col="cd",
        value_col="value",
        grid_start=gs,
        grid_end=ge,
        tie_break_cols=["ts", "event_id"],
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        ((F.col("c_custkey") % 13) + 1).cast("int").alias("duration_days"),
    )
    return (
        filled.join(F.broadcast(dim), "user_id")
        .withColumn("days_left", days_left_expr(F.col("day"), season))
        .select(
            "user_id",
            F.col("day").alias("valid_from"),
            F.col("value").alias("price"),
            active_flag(F.col("days_left"), F.col("duration_days")).alias("active"),
        )
    )


@register(
    "s2_rest_pushdown_scan",
    tags=("S1", "S2", "S3", "S5", "S6", "S7", "R2"),
    oracle="""
SELECT CAST((i % 8) + 1 AS BIGINT) AS product_definition_id,
       strftime(DATE '2025-12-01' + INTERVAL (i % 45) DAY, '%Y-%m-%d') AS valid_at,
       CAST(1000 + i AS BIGINT) AS price
FROM generate_series(0, 249) g(i)
WHERE (i % 8) + 1 IN (2, 3)
  AND strftime(DATE '2025-12-01' + INTERVAL (i % 45) DAY, '%Y-%m-%d') >= '2025-12-10'
  AND strftime(DATE '2025-12-01' + INTERVAL (i % 45) DAY, '%Y-%m-%d') <= '2025-12-31'
""",
)
def s2_rest_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paginated REST connector as a registered Spark 4 Python
    DataSource, read with predicates that push down onto API query
    parameters (id IN-list -> ids CSV, date bounds -> date_from/to;
    reference py:145,165-168). The deterministic fixture transport
    serves the reference API's shape (token endpoint, bearer auth,
    page/pageSize, envelope) so the scan itself — auth, pagination,
    envelope probing, pushdown — is oracle-checked, not just the
    post-scan relational ops."""
    from ..sources.rest_datasource import RestPricesDataSource

    spark.dataSource.register(RestPricesDataSource)
    df = (
        spark.read.format("pricenow_prices")
        .option(
            "transport",
            "etl_pricenow_to_leukerbadb_spark.sources.rest_fixtures:fixture_transport",
        )
        .option("base_url", "https://api.example.test")
        .option("auth_url", "https://auth.example.test/token")
        .option("client_id", "id")
        .option("client_secret", "secret")
        .option("page_size", "32")
        .option("max_pages", "8")
        .load()
    )
    return df.filter(
        F.col("product_definition_id").isin(2, 3)
        & (F.col("valid_at") >= "2025-12-10")
        & (F.col("valid_at") <= "2025-12-31")
    )


@register(
    "e1_full_pipeline",
    tags=("E1", "T10", "T11", "K1", "K2", "K3"),
    oracle="""
WITH chg(product_id, valid_at, price, seq) AS (
  VALUES (1, DATE '2026-01-05', 100, 1), (1, DATE '2026-01-15', 110, 2),
         (2, DATE '2026-01-12', 200, 1),
         (3, DATE '2026-01-10', 999, 1),
         (4, DATE '2026-01-10', 400, 1), (4, DATE '2026-01-10', 410, 2),
         (4, DATE '2026-01-18', 420, 3)
), dim(product_id, duration_days) AS (
  VALUES (1, 1), (2, 13), (4, 1), (5, 2)
), clamped AS (
  SELECT product_id, GREATEST(valid_at, DATE '2026-01-10') AS day, valid_at, seq, price
  FROM chg WHERE valid_at <= DATE '2026-01-20'
), dedup AS (
  SELECT product_id, day, price FROM (
    SELECT product_id, day, price,
           row_number() OVER (PARTITION BY product_id, day
                              ORDER BY valid_at DESC, seq DESC) AS rn
    FROM clamped) t WHERE rn = 1
), grid AS (
  SELECT d.product_id, CAST(g.d AS DATE) AS day
  FROM dim d,
       LATERAL generate_series(DATE '2026-01-10', DATE '2026-01-20', INTERVAL 1 DAY) g(d)
), filled AS (
  SELECT product_id, day, price FROM (
    SELECT g.product_id, g.day,
           last_value(dd.price IGNORE NULLS) OVER (
             PARTITION BY g.product_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
    FROM grid g LEFT JOIN dedup dd ON g.product_id = dd.product_id AND g.day = dd.day
  ) x WHERE price IS NOT NULL
)
SELECT CAST(f.product_id AS BIGINT) AS product_id, f.day AS valid_from,
       CAST(f.price AS BIGINT) AS price,
       (CASE WHEN f.day = DATE '2026-01-12' THEN 2
             WHEN f.day = DATE '2026-01-13' THEN 1
             WHEN f.day > DATE '2026-01-13' AND f.day < DATE '2026-01-16' THEN 0
             ELSE date_diff('day', f.day, DATE '2026-01-20') + 1
        END) >= d.duration_days AS active,
       TIMESTAMP '2026-01-01 06:00:00' AS updated_at
FROM filled f JOIN dim d ON f.product_id = d.product_id
""",
)
def e1_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 end-to-end (reference py:426-453): E2 products from the
    canonical payload, E3 prices from deterministic change points
    (pre-season seed, leading nulls, same-day tie-break, an id not in
    the product dim, a product with no changes), one snapshot
    timestamp (T11), keyed upserts into parquet tables with PK guards
    (K1-K3, write order prices-then-products), read back the prices
    table. Oracle recomputes the expected table from the same VALUES."""
    import datetime as _dt

    from ..config import SeasonConfig
    from ..session import session_scratch_dir
    from .pricenow import run_pipeline

    changes = tiny_local_df(
        spark,
        [
            (1, "2026-01-05", 100, 1),
            (1, "2026-01-15", 110, 2),
            (2, "2026-01-12", 200, 1),
            (3, "2026-01-10", 999, 1),
            (4, "2026-01-10", 400, 1),
            (4, "2026-01-10", 410, 2),
            (4, "2026-01-18", 420, 3),
        ],
        "productDefinitionId long, validAt string, price long, seq long",
    )
    season = SeasonConfig(
        start=_dt.date(2026, 1, 10),
        end=_dt.date(2026, 1, 20),
        day_overrides={_dt.date(2026, 1, 12): 2, _dt.date(2026, 1, 13): 1},
        closed_open_intervals=[(_dt.date(2026, 1, 13), _dt.date(2026, 1, 16))],
    )
    out = run_pipeline(
        spark,
        payloads=[_E2_PAYLOAD],
        changes=changes,
        season=season,
        out_dir=session_scratch_dir(spark, "e1"),
        run_ts=_dt.datetime(2026, 1, 1, 6, 0, 0),
    )
    return spark.read.parquet(out["pricenow_prices"])


@register(
    "e4_season_reference_2025",
    tags=("E3", "T8", "T9", "T6"),
    oracle="""
WITH chg(product_id, valid_at, price, seq) AS (
  VALUES (1, DATE '2025-12-01', 500, 1), (1, DATE '2026-01-15', 550, 2),
         (2, DATE '2025-12-16', 900, 1),
         (3, DATE '2026-05-01', 777, 1),
         (4, DATE '2025-12-13', 100, 1), (4, DATE '2025-12-13', 110, 2),
         (4, DATE '2026-04-12', 120, 3),
         (9, DATE '2025-12-20', 404, 1)
), dim(product_id, duration_days) AS (
  VALUES (1, 1), (2, 13), (3, 2), (4, 100)
), clamped AS (
  SELECT product_id, GREATEST(valid_at, DATE '2025-12-13') AS day, valid_at, seq, price
  FROM chg WHERE valid_at <= DATE '2026-04-12'
    AND product_id IN (SELECT product_id FROM dim)
), dedup AS (
  SELECT product_id, day, price FROM (
    SELECT product_id, day, price,
           row_number() OVER (PARTITION BY product_id, day
                              ORDER BY valid_at DESC, seq DESC) AS rn
    FROM clamped) t WHERE rn = 1
), grid AS (
  SELECT d.product_id, CAST(g.d AS DATE) AS day
  FROM dim d,
       LATERAL generate_series(DATE '2025-12-13', DATE '2026-04-12', INTERVAL 1 DAY) g(d)
), filled AS (
  SELECT product_id, day, price FROM (
    SELECT g.product_id, g.day,
           last_value(dd.price IGNORE NULLS) OVER (
             PARTITION BY g.product_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
    FROM grid g LEFT JOIN dedup dd ON g.product_id = dd.product_id AND g.day = dd.day
  ) x WHERE price IS NOT NULL
)
SELECT CAST(f.product_id AS BIGINT) AS product_id, f.day AS valid_from,
       CAST(f.price AS BIGINT) AS price,
       (CASE WHEN f.day = DATE '2025-12-13' THEN 2
             WHEN f.day = DATE '2025-12-14' THEN 1
             WHEN f.day > DATE '2025-12-14' AND f.day < DATE '2025-12-19' THEN 0
             ELSE date_diff('day', f.day, DATE '2026-04-12') + 1
        END) >= d.duration_days AS active,
       TIMESTAMP '2026-01-02 06:00:00' AS updated_at
FROM filled f JOIN dim d ON f.product_id = d.product_id
""",
)
def e4_season_reference_2025(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 under the reference's exact hardcoded 2025/26 season
    (reference py:331-332, py:353-358 — lifted into
    ``SeasonConfig.reference_2025()``): opening-day override 12-13 -> 2
    days left, 12-14 -> 1, closure interval (12-14, 12-19) forcing 0.
    The fixture change set exercises every quirk against that calendar:
    a pre-season seed, a first change inside the closed interval, a
    post-season change (dropped), a same-day seq tie-break on opening
    day, a last-day change, and an id missing from the product dim.
    The oracle recomputes the table from the same VALUES, making the
    reference's override semantics their own green driver row instead
    of riding inside e1/e3 variants."""
    import datetime as _dt

    from .pricenow import build_prices

    changes = tiny_local_df(
        spark,
        [
            (1, "2025-12-01", 500, 1),
            (1, "2026-01-15", 550, 2),
            (2, "2025-12-16", 900, 1),
            (3, "2026-05-01", 777, 1),
            (4, "2025-12-13", 100, 1),
            (4, "2025-12-13", 110, 2),
            (4, "2026-04-12", 120, 3),
            (9, "2025-12-20", 404, 1),
        ],
        "productDefinitionId long, validAt string, price long, seq long",
    )
    products = tiny_local_df(
        spark,
        [(1, 1), (2, 13), (3, 2), (4, 100)],
        "product_id long, duration_days int",
    )
    return build_prices(
        products,
        changes,
        SeasonConfig.reference_2025(),
        _dt.datetime(2026, 1, 2, 6, 0, 0),
    )
