from .analytics import REGISTRY, QuerySpec, register  # noqa: F401
from . import analytics_llm  # noqa: F401,E402  (registers queries on import)
from . import analytics_olap  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The correctness driver verifies the FIRST 50 registry entries in insertion
# order each round.  Round 1 verified the first 50 as-registered (see
# CORRECTNESS_r01.json); the queries pinned below were outside that window,
# so they are rotated to the front for round 2 to earn their own green rows.
# e1/e2/e3 + t6 stay inside the window as the SURVEY §2 anchors.  Names not
# listed keep their registration order after the pinned block.  Pinning is
# by name: a listed name that does not exist is ignored (keeps this list
# safe while queries are being added).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # round-1 unverified block (registered past index 50 last round)
    "u2_except_intersect",
    "w1_running_total",
    "w2_lag_delta",
    "w3_sessionize",
    "w4_linear_interp",
    "w5_rolling_revenue",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_by_flag",
    "q14_promo_share",
    "q15_top_supplier",
    "q18_large_volume",
    "q20_correlated_max",
    "q22_global_sales",
    "a7_percentiles",
    "a8_approx_sketches",
    "a9_portable_stats",
    "a10_salted_agg",
    "k1_upsert_merge",
    # new in round 2 (no prior driver row)
    "dd_embedding_near_dup",
    "ann_lsh_buckets",
    "e4_season_reference_2025",
    "k5_partition_merge",
    "k6_cdc_merge",
    "j5_asof_two_table",
    "tx_pii_scrub",
    "tx_pack_sequences",
    "tx_tfidf_topk",
    "dq_profile",
    "q7_nation_volume",
    "q8_market_share",
    "q11_important_stock",
    "q13_order_distribution",
    "q16_supplier_variety",
    "q17_small_quantity",
    "q19_discounted_revenue",
    "tx_vocab_topk",
    "tx_repetition",
    "tx_contamination",
    "tx_quality_filter",
    "emb_source_centroids",
    "k7_scd2_history",
    "emb_kmeans_assign",
    # SURVEY §2 anchors (green in round 1; keep hard signal every round)
    "t6_forward_fill_daily",
    "e1_full_pipeline",
    "e2_products_flatten",
    "e3_prices_daily",
    # round-1-green refreshers filling the remaining window slots
    # (everything else got its green row in CORRECTNESS_r01.json)
    "dd_minhash_lsh",
)


def _reorder_registry(priority: tuple[str, ...]) -> None:
    rest = dict(REGISTRY)
    REGISTRY.clear()
    for name in priority:
        if name in rest:
            REGISTRY[name] = rest.pop(name)
    REGISTRY.update(rest)


_reorder_registry(_DRIVER_WINDOW_FIRST)
