"""Unified named-query catalog: the driver contract surface.

QUERIES maps name -> (spark, sf_dir) -> DataFrame.
ORACLES maps name -> DuckDB SQL over the pre-registered testdata views.
Every QUERIES key without an ORACLES entry gets the driver's weaker
rows-only check (documented per query).
"""

from __future__ import annotations

import json
import os

from big_data_flight_analytics_spark.plans.analytic_queries import (
    ANALYTIC_ORACLES,
    ANALYTIC_QUERIES,
)
from big_data_flight_analytics_spark.plans.extension_queries import (
    EXTENSION_ORACLES,
    EXTENSION_QUERIES,
)
from big_data_flight_analytics_spark.plans.relational_queries import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)

_ALL_QUERIES = {**RELATIONAL_QUERIES, **EXTENSION_QUERIES, **ANALYTIC_QUERIES}
ORACLES = {**RELATIONAL_ORACLES, **EXTENSION_ORACLES, **ANALYTIC_ORACLES}

# The driver's oracle gate checks the FIRST 50 catalog entries per
# round, so ORDER is DERIVED least-recently-driver-verified first: the
# stalest entries always lead the window, and whichever green rows fell
# past the window rotate back to the front next round automatically.
# New queries (no recorded round) lead everything. tools/selfcheck.py
# still verifies all entries every round regardless of position.
#
# Maintenance contract: after each round's CORRECTNESS_r{N}.json lands,
# bump every name that got a green row to N — run
#   python tools/record_verified.py CORRECTNESS_r0N.json N
# which rewrites verified_rounds.json. A name missing from the file is
# treated as never-verified (round 0) and leads the order. When a
# query's plan or oracle is EDITED, its old green row no longer attests
# the current code — run
#   python tools/invalidate_verified.py name [...]
# so the edited queries lead the next window like new entries.
_VERIFIED_PATH = os.path.join(os.path.dirname(__file__), "verified_rounds.json")
try:
    with open(_VERIFIED_PATH) as _fh:
        LAST_DRIVER_VERIFIED: dict[str, int] = json.load(_fh)
except (OSError, json.JSONDecodeError):
    # Missing/corrupt rotation state (e.g. packaged without data files)
    # must not break imports; {} = everything never-verified, which is
    # the safe direction (all queries lead the driver window).
    LAST_DRIVER_VERIFIED = {}

# Fixed tie-break within a verification round so the derived order is
# deterministic; freshly-added simple queries intentionally sit late in
# their group (they just got checked, so falling out next round is the
# cheapest possible staleness).
_TIE_BREAK = [
    "l1_customer_balance_norm",
    "l2_user_top_event",
    "l3_flights_lookup",
    "f1_hhmm_histogram",
    "j1_enrich_orders",
    "j3_dedup_supplier_join",
    "j7_geo_radius",
    "j8_semi_anti_customers",
    "k1_salted_counts",
    "k2_skewed_brand_counts",
    "i1_incremental_priority_revenue",
    "o3_topk_orders",
    "a6_distinct_event_types",
    "w2_top3_per_priority",
    "s2_windowed_distinct_users",
    "a7_price_percentiles",
    "s3_sliding_window_users",
    "t1_text_stats",
    "t3_gopher_metrics",
    "t4_tfidf_top_terms",
    "t5_ngram_counts",
    "t6_stratified_sample",
    "t7_winnow_fingerprints",
    "t8_source_quality",
    "t9_pii_scrub",
    "t10_mixture_sample",
    "t11_pack_sequences",
    "t12_rare_token_score",
    "d1_exact_dedup",
    "d11_paragraph_dedup",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "d4_simhash",
    "v1_cosine_topk",
    "v2_lsh_topk",
    "d5_embedding_neardup",
    "d6_dedup_clusters",
    "d7_decontamination",
    "d8_curated_corpus",
    "d9_cross_source_overlap",
    "d10_winnow_jaccard",
    "m1_multimodal_features",
    "j9_asof_events_orders",
    "s4_user_sessions",
    "a8_rollup_revenue",
    "r4_pivot_order_status",
    "v3_ivf_topk",
    "f2_props_json",
    "w3_running_revenue",
    "w4_order_gaps",
    "j10_interval_join",
    "t2_train_val_split",
    "q1_supplier_stats",
    "q2_status_priority_delays",
    "q3_busiest_customers",
    "q4_weekly_orders",
    "q5_measure_averages",
    "q6_dow_events",
    "q7_price_buckets",
    "q8_problematic_segments",
    "q9_part_attributes",
    "s5_session_windows",
    "m2_frame_sample",
    "h1_scd2_customer_segment",
    "w6_trailing_revenue",
    "u1_priority_overlap",
    "w5_balance_quartiles",
    "c1_cube_revenue",
    "p1_profile_orders",
    "q10_region_revenue",
    "t13_chunk_documents",
    "d12_keep_longest",
    "b1_funnel_steps",
    "b2_weekly_retention",
    "b3_event_transitions",
    "a9_grouping_sets",
    "t14_lexical_diversity",
    "s6_first_touch",
    "v4_knn_graph",
    "q11_cheapest_suppliers",
    "d13_semantic_prune",
    "ts1_gap_fill",
    "ts2_interpolate",
    "d14_dedup_ensemble",
    "i2_dedup_delta",
    "ts3_rolling_zscore",
    "b4_top_paths",
    "q12_small_quantity_revenue",
    "v5_quantized_topk",
    "h2_cdc_snapshot",
    "q13_dominant_suppliers",
    "m3_frame_dedup",
    "d15_repeated_spans",
    "d16_excise_spans",
    "u2_activity_reconciliation",
    "p2_constraint_report",
    "a10_brand_price_qty_corr",
    "b5_conversion_latency",
    "d17_source_dedup_report",
    "s7_windowed_topk",
    "v6_pq_topk",
    "g1_knn_pagerank",
    "q14_dormant_high_balance",
    "t15_bpe_merges",
    "f3_bag_key_stats",
    "t16_bpe_tokenize",
    "v7_pq_trained_topk",
    "v8_ivfpq_topk",
    "t17_bm25_topk",
    "f4_variant_extract",
    "t18_dsir_weights",
    "d18_semdedup_clusters",
    "i3_embedding_delta",
    "t19_lm_perplexity",
    "i4_minhash_delta",
    "g2_knn_triangles",
    "d19_sparse_cosine",
    "d20_containment_decon",
    "d21_decon_excise",
    "t20_langid",
    "d22_sketch_containment",
    "t21_perceptron_quality",
    "i5_langid_profile_delta",
    "a11_histogram_quantiles",
    "i6_histogram_delta",
    "a12_grouped_quantiles",
    "a13_kmv_distinct",
    "i7_kmv_delta",
    "a14_cms_heavy_terms",
    "i8_cms_delta",
    "j11_bloom_semi_join",
    "a15_sketch_overlap",
    "t22_cdc_chunks",
    "d23_cdc_dedup",
    "ts4_ohlc_bars",
    "j12_fuzzy_match",
    "a16_quantile_binning",
    "p3_k_anonymity",
    "i9_ohlc_delta",
    "a17_grouped_cms",
    "i10_kanon_delta",
    "a18_join_size_estimate",
    "i11_session_delta",
    "t23_leakage_safe_split",
    "t24_corpus_assembly",
    "j13_advised_semi_join",
    "t25_dataset_card",
    "i12_dataset_card_delta",
    "t26_boilerplate_excision",
    "i13_boilerplate_delta",
    "j14_asof_tolerance",
    "c2_rollup_revenue",
    "j15_geo_radius_counts",
    "j16_geo_nearest_k",
    "c3_grouping_sets_revenue",
    "v9_rrf_fusion",
    "i14_geo_count_delta",
    "t27_tokenizer_fertility",
    "i15_fertility_delta",
    "q15_blame_suppliers",
    "h3_point_in_time_join",
    "v10_mmr_rerank",
    "v11_retrieval_pipeline",
    "w7_revenue_mom_growth",
    "h4_segment_migration",
    "ts5_ewma",
    "q16_large_volume_customers",
    "t28_ngram_novelty",
    "v12_filtered_ann",
    "i16_bm25_stats_delta",
    "q17_trade_flows",
    "u3_repeat_priority_slots",
    "i17_novelty_delta",
    "v13_lsh_recall",
    "j17_asof_forward",
    "i18_topk_delta",
    "q18_top_suppliers_with_ties",
    "d24_simhash_referee",
    "r5_pivot_multi_agg",
]

_unknown_verified = set(LAST_DRIVER_VERIFIED) - set(_ALL_QUERIES)
if _unknown_verified:
    raise ValueError(
        f"LAST_DRIVER_VERIFIED names unknown queries: {sorted(_unknown_verified)}"
    )
_missing_tiebreak = set(_ALL_QUERIES) - set(_TIE_BREAK)
if _missing_tiebreak:
    raise ValueError(
        "query modules define entries missing from _TIE_BREAK "
        f"(add them, typically near the tail): {sorted(_missing_tiebreak)}"
    )
_unknown_tiebreak = set(_TIE_BREAK) - set(_ALL_QUERIES)
if _unknown_tiebreak:
    raise ValueError(
        f"_TIE_BREAK names unknown queries: {sorted(_unknown_tiebreak)}"
    )

_rank = {name: i for i, name in enumerate(_TIE_BREAK)}
ORDER = sorted(
    _ALL_QUERIES,
    key=lambda n: (LAST_DRIVER_VERIFIED.get(n, 0), _rank[n]),
)

QUERIES = {name: _ALL_QUERIES[name] for name in ORDER}

if not set(ORACLES) <= set(QUERIES):
    raise ValueError(
        f"oracle without a query: {sorted(set(ORACLES) - set(QUERIES))}"
    )
