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
#   r4: the 7 round-3 late additions + the fixed r3 red ann_ivf_lists + 42
#       of the 44 entries whose last green row was r2 (CORRECTNESS_r04.json:
#       49/49 green on oracle-paired rows). Process lesson from r4, now
#       enforced by test: ann_pq_adc_topk (no_oracle by construction) was
#       pinned and burned a hard-signal slot — no-oracle entries are NEVER
#       pinned again.
#   r5 (this file): the two entries whose last green row is r2
#       (e4_season_reference_2025, u2_except_intersect — driver-sim
#       verified each round since), the 12 ORACLE-PAIRED round-4 late
#       additions (ann_ivfpq_topk is no_oracle and deliberately NOT
#       pinned), then 34 of the 48 oracle-paired entries whose last green
#       row is r3 — prioritizing everything touched by this round's
#       cosine/salt/streaming fixes (ann_topk_bruteforce,
#       dd_embedding_cosine, dd_cluster_components, llm_prep_pipeline)
#       and all SURVEY §2 anchors — and the seven queries REGISTERED this
#       round (dq_expectations, gr_pagerank, gr_triangle_count,
#       ts_ohlc_rollup, ts_ewma_smooth, dq_fk_orphans,
#       tx_ngram_lm_score, st_ewma_fold, k9_evolve_merge, dq_drift_tvd),
#       pinned immediately so they get first-contact driver rows in
#       their own round instead of becoming next round's late-addition
#       backlog (the r4 lesson). To make room, six r3-green entries
#       (q21_suppliers_waiting, tx_lang_id, tx_fingerprint,
#       q3_shipping_priority, q5_region_revenue, dd_exact) moved to the
#       r6 block — age 3 = exactly the staleness budget, enforced
#       below.
#   r6 (next): the 16 r3-green entries that did not fit this window —
#       mm_binary_meta, mm_fake_decode, mm_resize, mm_frame_sample,
#       st_windowed_counts, st_stream_static_join, st_dedup_keys,
#       st_sessionize, tx_chunk_windows, tx_hash_sample,
#       tx_cap_per_source, tx_pack_sequences, dd_ngram_jaccard,
#       dd_simhash, tx_token_count, tx_quality_score (all
#       static/deterministic and untouched in r5), plus the six
#       displaced above (q21_suppliers_waiting, tx_lang_id,
#       tx_fingerprint, q3_shipping_priority, q5_region_revenue,
#       dd_exact) —
#       then the entries whose last green row is r4.
#       The staleness guard in tests/test_oracle_parity.py fails the suite
#       if any pin list would let an oracle-paired entry go >3 rounds
#       without a driver row.
#   r6 (this file): the pre-committed plan above, landed with one
#       amendment — the round-6 consolidation merged the four mm_*
#       entries into mm_media_pipeline, w6+w7 into
#       w6_w7_window_functions, and u1+u2 into u1_u2_set_ops (registry
#       127 -> 124 net of the two new registrations
#       emb_pq_codes_trained and dd_embedding_near_dup_hi), so the
#       merged names enter as first-contact pins and the freed slots
#       backfill r4-green entries (through k5_partition_merge;
#       a10_salted_agg onward displaced to r7, age 2 -> 3, within
#       budget).
#   r7 (next): the 22 entries whose last green is r4 — age 3 = exactly
#       the staleness budget, so they MUST head the window:
#       a10_salted_agg, j5_asof_two_table, j6_range_join,
#       k5_partition_merge, k6_cdc_merge, k7_scd2_history,
#       q11_important_stock, q12_priority_by_flag,
#       q13_order_distribution, q14_promo_share, q15_top_supplier,
#       q16_supplier_variety, q17_small_quantity,
#       q19_discounted_revenue, q20_correlated_max, q22_global_sales,
#       q2_min_cost_supplier, q4_order_priority, q7_nation_volume,
#       q8_market_share, w4_linear_interp, w5_rolling_revenue —
#       plus any r7 registrations (pinned immediately, as always),
#       then backfill the ~28 remaining slots from the 47 r5-green
#       entries in registration order. The ~19 r5-greens that do not
#       fit reach age 3 in r8 and must head THAT window; with the
#       registry at 125 the cycle stays inside the budget only if
#       every round lands its full 50 — prefer consolidation over
#       registration if the count grows.
# Names not listed keep their registration order after the pinned block.
# Pinning is by name: a listed name that does not exist is ignored (keeps
# this list safe while queries are being added).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # registered/merged this round — first-contact driver rows now (the r4
    # lesson); the four consolidations (mm quartet -> mm_media_pipeline,
    # w6+w7, u1+u2) count as never-rowed new names
    "u1_u2_set_ops",
    "dd_embedding_near_dup_hi",
    "mm_media_pipeline",
    "emb_pq_codes_trained",
    "w6_w7_window_functions",
    "tx_token_budget_mix",
    # last green r3 — age 3 = exactly the staleness budget; the 22-entry
    # debt pre-committed in the r5 plan (16 window leftovers + 6
    # displaced), minus the 4 mm entries now folded into mm_media_pipeline
    # above
    "tx_token_count",
    "tx_quality_score",
    "tx_lang_id",
    "tx_fingerprint",
    "dd_exact",
    "dd_ngram_jaccard",
    "dd_simhash",
    "st_windowed_counts",
    "st_stream_static_join",
    "st_dedup_keys",
    "st_sessionize",
    "tx_chunk_windows",
    "tx_hash_sample",
    "tx_cap_per_source",
    "tx_pack_sequences",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q21_suppliers_waiting",
    # last green r4 — oldest remaining; fills the window
    "dd_minhash_lsh",
    "dd_embedding_near_dup",
    "ann_lsh_buckets",
    "tx_pii_scrub",
    "tx_tfidf_topk",
    "dq_profile",
    "tx_vocab_topk",
    "tx_repetition",
    "tx_contamination",
    "tx_quality_filter",
    "emb_source_centroids",
    "emb_kmeans_assign",
    "ann_ivf_lists",
    "emb_pq_codes",
    "tx_dedup_keep_best",
    "a11_grouping_sets",
    "w1_running_total",
    "w2_lag_delta",
    "w3_sessionize",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q9_product_profit",
    "q18_large_volume",
    "a7_percentiles",
    "a9_portable_stats",
    "k1_upsert_merge",
)


def _reorder_registry(priority: tuple[str, ...]) -> None:
    rest = dict(REGISTRY)
    REGISTRY.clear()
    for name in priority:
        if name in rest:
            REGISTRY[name] = rest.pop(name)
    REGISTRY.update(rest)


_reorder_registry(_DRIVER_WINDOW_FIRST)
