"""Physical-plan regression tests: the scale-critical plan properties
documented in SCALE.md must survive refactors. A correctness-green
change that reintroduces a cartesian product or drops a pushdown is a
perf regression these tests catch at sf0.001 cost."""

from __future__ import annotations

import pytest

from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY


def plan_of(spark, sf_small, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_small)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scans_push_filters_and_prune_columns(spark, sf_small):
    plan = plan_of(spark, sf_small, "q6_revenue_forecast")
    assert "PushedFilters: [" in plan
    # date + discount + quantity predicates reach the scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # pruned read schema: no orderkey/partkey/suppkey columns read
    assert "l_orderkey" not in plan.split("ReadSchema")[1]


def test_dim_joins_broadcast(spark, sf_small):
    plan = plan_of(spark, sf_small, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum
    plan_j1 = plan_of(spark, sf_small, "j1_broadcast_join")
    assert "BroadcastHashJoin" in plan_j1


def test_forward_fill_has_single_window_exchange(spark, sf_small):
    plan = plan_of(spark, sf_small, "t6_forward_fill_daily")
    # the window fill shuffles ONCE on the key; a second non-broadcast
    # exchange would mean the union/grid path re-shuffles
    n_exchanges = plan.count("+- Exchange") + plan.count(": +- Exchange")
    assert n_exchanges <= 2, plan  # key shuffle (+ AQE final agg at most)
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered_not_global_sort(spark, sf_small):
    plan = plan_of(spark, sf_small, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_lsh_join_is_blocked_not_cartesian(spark, sf_small):
    for name in ("dd_minhash_lsh", "dd_ngram_jaccard"):
        plan = plan_of(spark, sf_small, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_ann_bruteforce_broadcasts_query_side_only(spark, sf_small):
    plan = plan_of(spark, sf_small, "ann_topk_bruteforce")
    # the corpus side must NOT be broadcast; the (tiny) query side is
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
