from .analytics import REGISTRY, QuerySpec, register  # noqa: F401
from . import analytics_llm  # noqa: F401,E402  (registers queries on import)
from . import analytics_olap  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The correctness driver verifies the FIRST 50 registry entries in insertion
# order each round.  The window is rotated per round so that every registry
# entry keeps a green driver row at most two rounds old:
#   r1: first 50 as-registered (CORRECTNESS_r01.json)
#   r2: the 45 then-unverified entries + anchors (CORRECTNESS_r02.json)
#   r3: the two r2 reds (both fixed that round) + new round-3 queries + the
#       42 entries whose last green row was r1 + the four SURVEY §2 anchors.
#   r4 (this file): the 7 round-3 late additions that registered after r3's
#       window was sealed (a11_grouping_sets, w6_rank_functions, emb_pq_codes,
#       q2_min_cost_supplier, j6_range_join, tx_dedup_keep_best,
#       ann_pq_adc_topk — all driver-sim-verified locally), the r3 red
#       ann_ivf_lists (oracle HUGEINT dtype bug, fixed this round), and 42 of
#       the 44 entries whose last green row is r2.  Two r2-green entries do
#       not fit the 50-slot window this round (e4_season_reference_2025,
#       u2_except_intersect — both static/deterministic and untouched since
#       r2); they are driver-sim-verified locally this round and MUST be
#       front-loaded in r5 together with any round-4 late additions.
#   r5 (next): e4_season_reference_2025, u2_except_intersect, the round-4
#       late additions (ann_ivfpq_topk, a12_cube, a13_unpivot,
#       w7_value_functions, dq_anomaly_zscore, st_stream_stream_join,
#       j7_bucketed_join, st_incremental_agg, j8_salted_join,
#       k8_compaction, j9_interval_overlap, dd_ngram_containment,
#       j10_asof_forward — all oracle-parity-tested locally at sf0.001
#       incl. pandas-dtype check, and driver-sim verified at sf0.01),
#       then the entries whose last green row is r3.
# Names not listed keep their registration order after the pinned block.
# Pinning is by name: a listed name that does not exist is ignored (keeps
# this list safe while queries are being added).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # r3 red, fixed this round (oracle CAST(SUM(..) AS BIGINT) dtype fix)
    "ann_ivf_lists",
    # round-3 late additions — first-ever driver rows
    "a11_grouping_sets",
    "w6_rank_functions",
    "emb_pq_codes",
    "q2_min_cost_supplier",
    "j6_range_join",
    "tx_dedup_keep_best",
    "ann_pq_adc_topk",
    # r2-green block whose last driver row is two rounds old
    "w1_running_total",
    "w2_lag_delta",
    "w3_sessionize",
    "w4_linear_interp",
    "w5_rolling_revenue",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_by_flag",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_discounted_revenue",
    "q20_correlated_max",
    "q22_global_sales",
    "a7_percentiles",
    "a9_portable_stats",
    "a10_salted_agg",
    "k1_upsert_merge",
    "k5_partition_merge",
    "k6_cdc_merge",
    "k7_scd2_history",
    "j5_asof_two_table",
    "dd_embedding_near_dup",
    "dd_minhash_lsh",
    "ann_lsh_buckets",
    "emb_kmeans_assign",
    "emb_source_centroids",
    "tx_pii_scrub",
    "tx_tfidf_topk",
    "tx_vocab_topk",
    "tx_repetition",
    "tx_contamination",
    "tx_quality_filter",
    "dq_profile",
)


def _reorder_registry(priority: tuple[str, ...]) -> None:
    rest = dict(REGISTRY)
    REGISTRY.clear()
    for name in priority:
        if name in rest:
            REGISTRY[name] = rest.pop(name)
    REGISTRY.update(rest)


_reorder_registry(_DRIVER_WINDOW_FIRST)
