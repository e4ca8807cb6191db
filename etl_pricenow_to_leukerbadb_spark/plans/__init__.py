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
#   r7: the pre-committed plan landed as written — the 22
#       entries whose last green is r4 (age 3 = exactly the staleness
#       budget) head the window, then backfill from the 47 r5-green
#       entries in registration order. Per the r6 verdict's cycle-math
#       ask, this round CONSOLIDATES instead of registering: the four
#       per-document scalar scorers (tx_token_count, tx_quality_score,
#       tx_lang_id, tx_fingerprint — one scan each) merge into
#       tx_doc_profile (one scan computing all four — strictly better
#       at 100 TB), and emb_pq_codes + emb_pq_codes_trained merge into
#       emb_pq_codes_battery (both codebooks, one tagged table).
#       Oracle-paired count 119 -> 115, cycle 115/50 = 2.3 rounds vs
#       the 3-round budget. Merged names are never-rowed -> pinned
#       first; the backfill takes the first 26 r5-greens.
#   r8 (this file): the pre-committed plan landed as written — the 21
#       entries whose last green is r5 (age 3 = exactly the staleness
#       budget) head the window, then backfill to 50 from the 44
#       r6-green entries in registration order (first 29). No new
#       oracle-paired registrations this round (r7 verdict: cycle is at
#       2.3 rounds vs the 3-round budget; hold unless matched by
#       consolidation). The only r8 registration, dd_index_probe, is
#       no_oracle by design (persisted-index probe benched as a
#       headline; probe ≡ in-memory is pytest-proven) and therefore
#       never pinned, per the r4 lesson/test.
#   r9 (this file): the pre-committed plan landed as written — the 15
#       r6-green entries that did not fit the r8 window
#       (a11_grouping_sets … q21_suppliers_waiting, list below) reach
#       age 3 = exactly the staleness budget and head the window, then
#       backfill to 50 from the 50 r7-green entries in REGISTRATION_ORDER
#       (first 35). No new oracle-paired registrations this round
#       (r8 verdict: hold the 115/50 = 2.3-round cycle unless matched by
#       consolidation); the residual-IVFPQ work lands as a pytest-gated
#       upgrade of the existing no_oracle ann_ivfpq_* entries, and the
#       incremental-cluster work as pytest equivalence vs
#       dd_cluster_components — neither consumes a window slot.
#   r10 (this file): the pre-committed plan landed as written — the 15
#       r7-green entries that did not fit the r9 window
#       (w4_linear_interp … k7_scd2_history, list below) reach age 3 =
#       exactly the staleness budget and head the window, then backfill
#       to 50 from the 50 r8-green entries in REGISTRATION_ORDER (first
#       35). No new oracle-paired registrations this round (r9 verdict:
#       hold the 115/50 = 2.3-round cycle unless matched by
#       consolidation); the only r10 registration, dd_cluster_merge, is
#       no_oracle by design (the O(delta) persisted-cluster loop benched
#       as a headline per the dd_index_probe precedent; merge ≡ full
#       recompute is pytest-pinned in test_cluster_index.py) and
#       therefore never pinned, per the r4 lesson/test.
#   r11 (this file): the pre-committed plan landed as written — the 15
#       r8-green entries that did not fit the r10 window
#       (a6_count_distinct … dq_drift_tvd, list below) reach age 3 =
#       exactly the staleness budget and head the window, then backfill
#       to 50 from the 50 r9-green entries in REGISTRATION_ORDER (first
#       35). No new oracle-paired registrations this round (r10
#       verdict: hold the 115/50 = 2.3-round cycle unless matched by
#       consolidation); the only r11 registration, llm_curation_e2e, is
#       no_oracle by design (the composed persisted daily-curation
#       pipeline benched as a headline per the dd_cluster_merge
#       precedent; per-stage audit counts and idempotency are
#       pytest-pinned in test_orchestrate.py) and therefore never
#       pinned, per the r4 lesson/test.
#   r12 (this file): the pre-committed plan landed as written — the 15
#       r9-green entries that did not fit the r11 window
#       (q6_revenue_forecast … q2_min_cost_supplier, list below) reach
#       age 3 = exactly the staleness budget and head the window, then
#       backfill to 50 from the 50 r10-green entries in
#       REGISTRATION_ORDER (first 35). No new registrations this round
#       at all (r11 verdict: hold the 115/50 = 2.3-round cycle unless
#       matched by consolidation; no-oracle headlines only with a
#       dd_cluster_merge-style justification — none needed: the r12
#       work is the bench-record repair, the curation-job hardening
#       from ADVICE r11, the claim-contention pin, and RUNBOOK.md).
#   r13 (this file): the pre-committed plan landed as written — the 15
#       r10-green entries that did not fit the r12 window
#       (w4_linear_interp … k7_scd2_history, list below) reach age 3 =
#       exactly the staleness budget and head the window, then backfill
#       to 50 from the 50 r11-green entries in REGISTRATION_ORDER
#       (first 35). No new registrations this round at all (r12
#       verdict: hold the 115/50 = 2.3-round cycle unless matched by
#       consolidation; no-oracle headlines only with a
#       dd_cluster_merge-style justification — none needed: the r13
#       work is the two ADVICE fixes — the vec job's dim gate now reads
#       the standing index's recorded dim, and the bench tail-salvage
#       regex accepts scientific notation — plus bench-record
#       provenance per the r12 verdict).
#   r14 (this file): the pre-committed plan landed as written — the 15
#       r11-green entries that did not fit the r13 window
#       (w2_lag_delta … dq_drift_tvd, list below) reach age 3 =
#       exactly the staleness budget and head the window, then backfill
#       to 50 from the 50 r12-green entries in REGISTRATION_ORDER
#       (first 35 — the exact list precomputed end-of-r13 and landed
#       verbatim below). No new registrations this round at all (r13
#       verdict: r14 is the second OPTIMIZATION round — the work is the
#       LSH materialization fix, observation-fused loop counts, the
#       ingest-guard fusion, and bench-record self-documentation; no
#       query surface changes).
#   r15 (next): the 15 r12-green entries that did not fit this window —
#       q6_revenue_forecast, q10_returned_items, q9_product_profit,
#       q18_large_volume, a7_percentiles, a9_portable_stats,
#       k1_upsert_merge, k5_partition_merge, a10_salted_agg,
#       q12_priority_by_flag, q14_promo_share, q20_correlated_max,
#       q21_suppliers_waiting, j6_range_join, q2_min_cost_supplier —
#       reach age 3 in r15 and MUST head that window, plus any r15
#       registrations, then backfill the ~35 remaining slots from the
#       50 r13-green entries in REGISTRATION_ORDER. Precomputed
#       end-of-r14, the backfill is: t6_forward_fill_daily,
#       t7_calendar_grid, t3_duration_parse, t8_active_flag,
#       t4_t5_filter_valid, s5_json_extract, j1_broadcast_join,
#       j2_asof_join, j3_semi_join, a1_pricing_summary,
#       a3_distinct_keys, r1_r2_sort_limit, e2_products_flatten,
#       e3_prices_daily, s2_rest_pushdown_scan, e1_full_pipeline,
#       e4_season_reference_2025, tx_doc_profile,
#       dd_cluster_components, dd_ngram_containment,
#       ann_topk_bruteforce, dd_embedding_cosine, st_incremental_agg,
#       st_stream_stream_join, st_ewma_fold, llm_prep_pipeline,
#       emb_pq_codes_battery, tx_ngram_lm_score, a11_grouping_sets,
#       w6_w7_window_functions, a6_count_distinct,
#       q3_shipping_priority, q5_region_revenue, j4_anti_join,
#       w1_running_total — leaving the 15 remaining r13-greens
#       (w4_linear_interp, w5_rolling_revenue, q4_order_priority,
#       q22_global_sales, q15_top_supplier, q7_nation_volume,
#       q8_market_share, q11_important_stock, q13_order_distribution,
#       q16_supplier_variety, q17_small_quantity,
#       q19_discounted_revenue, k6_cdc_merge, j5_asof_two_table,
#       k7_scd2_history) as the r16 age-3 heads.
# Names not listed keep their registration order after the pinned block.
# Pinning is by name: a listed name that does not exist is ignored (keeps
# this list safe while queries are being added).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # last green r11 — age 3 = exactly the staleness budget; the
    # 15-entry debt pre-committed in the r13 plan MUST head the window
    "w2_lag_delta",
    "w3_sessionize",
    "j7_bucketed_join",
    "j9_interval_overlap",
    "j8_salted_join",
    "k8_compaction",
    "j10_asof_forward",
    "dq_expectations",
    "gr_pagerank",
    "gr_triangle_count",
    "ts_ohlc_rollup",
    "ts_ewma_smooth",
    "dq_fk_orphans",
    "k9_evolve_merge",
    "dq_drift_tvd",
    # last green r12 — backfill in REGISTRATION_ORDER (the first 35 of
    # the 50 r12-green entries; the remaining 15 head the r15 window)
    "u1_u2_set_ops",
    "dd_exact",
    "dd_minhash_lsh",
    "dd_ngram_jaccard",
    "dd_simhash",
    "dd_embedding_near_dup",
    "dd_embedding_near_dup_hi",
    "ann_lsh_buckets",
    "mm_media_pipeline",
    "st_windowed_counts",
    "st_stream_static_join",
    "st_dedup_keys",
    "st_sessionize",
    "tx_chunk_windows",
    "tx_hash_sample",
    "tx_cap_per_source",
    "tx_token_budget_mix",
    "tx_pii_scrub",
    "tx_pack_sequences",
    "tx_tfidf_topk",
    "dq_profile",
    "tx_vocab_topk",
    "tx_repetition",
    "tx_contamination",
    "tx_quality_filter",
    "emb_source_centroids",
    "emb_kmeans_assign",
    "ann_ivf_lists",
    "tx_dedup_keep_best",
    "a2_topk_per_group",
    "a4_pivot_event_matrix",
    "a5_rollup_summary",
    "a12_cube",
    "a13_unpivot",
    "dq_anomaly_zscore",
)


# Registration order as the modules declared it, captured BEFORE the
# driver-window reorder below.  Window planning ("backfill from the
# r{N}-green entries in registration order") keys off this tuple, so
# the plan survives any number of past reorders.
REGISTRATION_ORDER: tuple[str, ...] = tuple(REGISTRY)


def _reorder_registry(priority: tuple[str, ...]) -> None:
    rest = dict(REGISTRY)
    REGISTRY.clear()
    for name in priority:
        if name in rest:
            REGISTRY[name] = rest.pop(name)
    REGISTRY.update(rest)


_reorder_registry(_DRIVER_WINDOW_FIRST)
