"""Unified named-query catalog: the driver contract surface.

QUERIES maps name -> (spark, sf_dir) -> DataFrame.
ORACLES maps name -> DuckDB SQL over the pre-registered testdata views.
Every QUERIES key without an ORACLES entry gets the driver's weaker
rows-only check (documented per query).
"""

from __future__ import annotations

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

# Explicit catalog order. The driver's oracle gate checks the FIRST 50
# entries per round, so ordering is least-recently-driver-verified
# first: entries that have never (or not recently) had a driver
# CORRECTNESS row lead, and the longest-green relational veterans
# (hash-green in rounds 1-3) sit at the tail where falling outside the
# window costs nothing. tools/selfcheck.py still verifies all entries
# every round regardless of position.
ORDER = [
    # new in round 4 — never driver-checked
    "s5_session_windows",
    "m2_frame_sample",
    # never driver-checked before round 4
    "h1_scd2_customer_segment",
    "w6_trailing_revenue",
    "u1_priority_overlap",
    # green in r2, pushed out of the window in r3
    "w5_balance_quartiles",
    "c1_cube_revenue",
    "p1_profile_orders",
    "q10_region_revenue",
    # checked in r3
    "l1_customer_balance_norm",
    "l2_user_top_event",
    "l3_flights_lookup",
    "f1_hhmm_histogram",
    "j1_enrich_orders",
    "j3_dedup_supplier_join",
    "j7_geo_radius",
    "j8_semi_anti_customers",
    "k1_salted_counts",
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
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "d4_simhash",
    "v1_cosine_topk",
    "v2_lsh_topk",
    "d5_embedding_neardup",
    "d6_dedup_clusters",
    "d7_decontamination",
    "d8_curated_corpus",
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
    # hash-green in every round so far — tail
    "q1_supplier_stats",
    "q2_status_priority_delays",
    "q3_busiest_customers",
    "q4_weekly_orders",
    "q5_measure_averages",
    "q6_dow_events",
    "q7_price_buckets",
    "q8_problematic_segments",
    "q9_part_attributes",
]

assert set(ORDER) == set(_ALL_QUERIES), (
    "ORDER out of sync with query modules: "
    f"missing={set(_ALL_QUERIES) - set(ORDER)} "
    f"unknown={set(ORDER) - set(_ALL_QUERIES)}"
)

QUERIES = {name: _ALL_QUERIES[name] for name in ORDER}

assert set(ORACLES) <= set(QUERIES), "oracle without a query"
