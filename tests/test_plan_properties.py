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


def test_pii_scrub_is_pure_map(spark, sf_small):
    plan = plan_of(spark, sf_small, "tx_pii_scrub")
    assert "Exchange" not in plan  # chained regexp_replace: zero shuffle
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_source_window(spark, sf_small):
    plan = plan_of(spark, sf_small, "tx_pack_sequences")
    assert "Window" in plan
    # one hash exchange for the per-source window, nothing else
    n_exchanges = plan.count("+- Exchange") + plan.count(": +- Exchange")
    assert n_exchanges <= 1, plan
    assert "rangepartitioning" not in plan.lower()  # no global sort


def test_near_dup_pair_join_is_blocked(spark, sf_small):
    plan = plan_of(spark, sf_small, "dd_embedding_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dq_profile_single_scan(spark, sf_small):
    plan = plan_of(spark, sf_small, "dq_profile")
    # one parquet scan feeds all three column profiles (each scan node
    # carries exactly one Location line in the formatted plan)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_asof_two_table_is_window_not_range_join(spark, sf_small):
    plan = plan_of(spark, sf_small, "j5_asof_two_table")
    assert "BroadcastNestedLoopJoin" not in plan  # never a range join
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_unpivot_is_single_expand_no_exchange(spark, sf_small):
    plan = plan_of(spark, sf_small, "a13_unpivot")
    assert "Expand" in plan
    assert "Exchange" not in plan, plan  # melt never shuffles
    assert "Join" not in plan  # and never joins


def simple_plan_of(spark, sf_small, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_small)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_cube_is_one_expand_one_exchange(spark, sf_small):
    plan = simple_plan_of(spark, sf_small, "a12_cube")
    assert "Expand" in plan
    # the expanded grouping-id aggregate shuffles exactly once
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pq_and_ivf_assignments_hash_aggregate(spark, sf_small):
    # the packed-BIGINT argmin/argmax must keep these HashAggregate;
    # a struct-buffer min_by/max_by regresses to SortAggregate, which
    # sorts the full corpus x codebook expansion on both shuffle sides
    for name in ("emb_pq_codes_battery", "ann_ivf_lists"):
        plan = plan_of(spark, sf_small, name)
        assert "SortAggregate" not in plan, name


def test_dq_anomaly_stats_join_is_broadcast(spark, sf_small):
    plan = simple_plan_of(spark, sf_small, "dq_anomaly_zscore")
    assert "BroadcastHashJoin" in plan
    # the fact table is never hash-repartitioned for the join; the only
    # exchange is the per-type stats aggregation feeding the broadcast
    assert plan.count("Exchange hashpartitioning") == 1, plan


# Queries whose plans legitimately contain a BroadcastNestedLoopJoin /
# CartesianProduct: declared exact all-pairs baselines, 16-row centroid
# crossJoins (the IVF/k-means assignment shape), and single-row scalar-
# aggregate broadcasts (HAVING-vs-scalar, corpus-size constants).
_INTENTIONAL_UNKEYED_JOINS = {
    "ann_topk_bruteforce",  # exact all-pairs baseline by declaration
    "dd_embedding_cosine",  # exact all-pairs near-dup baseline
    "ann_ivf_lists",        # corpus x 16-centroid broadcast assignment
    "ann_ivf_topk",         # same + query x centroid probe
    "ann_ivfpq_topk",       # same coarse-probe shape
    "ann_ivfpq_trained_e2e",  # persisted-index twin of the same shape
    "emb_kmeans_assign",    # corpus x centroid Lloyd assignment
    "q11_important_stock",  # single-row scalar-agg broadcast (HAVING)
    "q22_global_sales",     # single-row scalar avg subquery
    "tx_tfidf_topk",        # single-row corpus-size constant
    "dq_drift_tvd",         # single-row time-envelope scalar broadcast
}


def test_no_unintended_unkeyed_joins_anywhere(spark, sf_small):
    """Whole-registry regression net: no query may grow a nested-loop
    or cartesian join beyond the pinned intentional set — the exact
    failure mode (an equi-key silently lost to a refactor) that turns
    a scale-safe plan into an O(n x m) one."""
    flagged = set()
    for name, spec in REGISTRY.items():
        plan = simple_plan_of(spark, sf_small, name)
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            flagged.add(name)
    assert flagged <= _INTENTIONAL_UNKEYED_JOINS, (
        f"new unkeyed joins appeared: {sorted(flagged - _INTENTIONAL_UNKEYED_JOINS)}"
    )
    # and the pinned ones should still exist (a stale allowlist hides drift)
    assert {"ann_topk_bruteforce", "ann_ivf_lists"} <= flagged


def test_pagerank_iterations_read_checkpoint_not_source(spark, sf_small):
    """gr_pagerank materializes edges/nodes/degrees once via
    localCheckpoint; without that every unrolled iteration re-derives
    the edge subtree from parquet (regressed plan showed 80 source
    scans). The final plan must read checkpointed RDD blocks, never
    the parquet tables."""
    plan = plan_of(spark, sf_small, "gr_pagerank")
    assert "Scan parquet" not in plan, plan
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_expectations_scalar_rules_share_one_scan(spark, sf_small):
    """All scalar dq_expectations rules compile into ONE aggregate over
    ONE events scan; the referential rule adds exactly one more events
    scan (anti-join probe) plus the customer key scan. (The formatted
    plan prints each scan twice — tree and node detail — so count the
    numbered detail headers.)"""
    import re

    plan = plan_of(spark, sf_small, "dq_expectations")
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans <= 3, plan
    assert "LeftAnti" in plan, plan
