"""The driver checks a fixed-size prefix of queries() — pin its contents.

Round-1 evidence: CORRECTNESS_r01.json contained exactly the first 50
registry entries in insertion order.  DRIVER_PRIORITY is the curated
prefix.  The driver-verification ledger was finished in round 4 (every
registered key has a driver CORRECTNESS row).  The round-11 rotation
(VERDICT r10 items 1+3): pinned flagship core, then
``embedding_dim_range_by_label`` (the r10 red row — an oracle
float32-typing artifact, oracle fixed, must be refuted this round; it
was NOT in the pre-pinned R11_QUEUE, so it displaces the last stale-r5
slot), then the 14 round-9 leftovers (first driver rows) and the 31
stalest round-5-cohort keys.  Keys rotated out stay locally
oracle-checked by tests/test_workload_parity.py.

Rotation-debt invariant (VERDICT r9 item 5 / r10 item 6): each round
pins the NEXT round's queue machine-readably before it closes, so the
next rotation is mechanical and CORRECTNESS_r{N+1}'s expected contents
are derivable from the repo alone.
"""

from __future__ import annotations

import re
from pathlib import Path

from metadata_driven_etl_spark import workloads

DRIVER_SUBSET_SIZE = 50

# Flagship core: driver-checked every round, never rotated.
CORE = [
    "agg_daily_sales", "merge_upsert", "dq_metrics_single_pass",
    "corpus_clean_pipeline",
]

# The 14 round-9 additions that did NOT fit the r10 prefix — their
# FIRST driver check is round 11 (registration order).
R10_LEFTOVER = [
    "demand_variability_xyz", "scd2_point_in_time_join",
    "theil_sen_slope_daily", "knn_geo_topk", "seasonal_strength_dow",
    "runs_test_daily", "max_drawdown_daily", "durbin_watson_daily",
    "term_burstiness_vmr", "join_asof_nearest",
    "embedding_sim_histogram_intra_label", "hourly_load_profile",
    "safety_stock_reorder_point", "dwell_time_by_type",
]

# Stale refresh for r11: after the r10 rotation the oldest driver rows
# are the round-5 cohort (37 keys; registration order).  The shipped
# r11 prefix takes the FIRST 31 (one fewer than the pre-pinned 32 —
# the r10 red-row key claims that slot); the 6 rolled keys lead
# R12_QUEUE's stale tail.
STALE_R5_COHORT = [
    "agg_customer_summary", "agg_product_perf", "agg_count",
    "pivot_linestatus", "approx_count_distinct",
    "window_tumbling_events", "doc_fingerprint", "text_token_count",
    "text_quality", "text_lang_id", "dedup_lsh_bucket_capped",
    "dedup_ngram_jaccard", "dedup_simhash", "similarity_topk",
    "similarity_ann_lsh_exact", "embedding_near_dup",
    "window_lag_lead", "window_rank_ntile", "window_running_sum",
    "setop_intersect", "setop_except", "multimodal_features",
    "similarity_ann_ivf_exact", "tpch_q3_topk",
    "tpch_q5_region_revenue", "agg_grouping_sets", "dedup_cluster_cc",
    "dedup_incremental_lsh", "text_pii_redact",
    "agg_approx_percentile", "pack_sequences",
    "decontaminate_ngram_overlap", "embedding_random_projection",
    "text_feature_hash_embed", "funnel_strict_from_first",
    "embedding_quantize_int8", "text_bigram_lm_pruned",
]

# The queue as pinned BEFORE r10 closed (VERDICT r9 item 5).  The
# shipped prefix deviates by exactly one planned substitution:
# embedding_dim_range_by_label (the r10 red row, ordered into the r11
# prefix by VERDICT r10 item 1) displaces STALE_R5_COHORT[31], which
# rolls to R12_QUEUE.  test_r11_prefix_derivable_from_pinned_queue
# asserts exactly this relationship.
R11_QUEUE = CORE + R10_LEFTOVER + STALE_R5_COHORT[:32]

# The shipped r11 driver prefix.
R11_PREFIX = (
    CORE
    + ["embedding_dim_range_by_label"]
    + R10_LEFTOVER
    + STALE_R5_COHORT[:31]
)


# Round-10 post-prefix additions in REGISTRATION ORDER (mirrors
# COVERAGE.md "Round-10 wave" sections; derived from list(QUERIES) and
# pinned here).  Their first driver check is round 12.
R10_ADDITIONS_ORDERED = [
    # wave 1: hypothesis testing / effect size / robust stats
    "kendall_tau_revenue_volume", "brown_forsythe_variance_test",
    "effect_size_cohens_d", "mood_median_test", "jackknife_loo_monthly",
    "ridge_regression_price_quantity",
    # wave 2: retail economics / ETL reconciliation
    "unit_value_index_monthly_brand", "promo_uplift_did",
    "shift_share_nation_growth", "reconcile_order_totals",
    "growth_accounting_monthly", "forecast_mase_naive",
    "partition_skew_report",
    # wave 3: diversity selection / sources / sampling
    "mmr_diverse_topk", "scan_text_lines", "scan_binary_files",
    "systematic_sample_every_k",
    # wave 4: ML features / privacy / interpolation
    "target_encode_loo_brand", "kfold_assignment_balance",
    "anonymization_ladder", "resample_linear_interp_daily",
    # wave 5: robust location / schema evolution / outage detection
    "trimmed_mean_price_by_flag", "scan_parquet_schema_evolution",
    "silence_record_alerts",
    # wave 6: parameter sensitivity + malformed ingestion
    "funnel_window_sensitivity", "dedup_threshold_curve",
    "scan_csv_malformed",
    # wave 7: ML evaluation
    "rand_index_kmeans_labels", "precision_recall_at_threshold",
    "roc_auc_urgent_price",
]
R10_ADDITIONS = set(R10_ADDITIONS_ORDERED)

# Round-6-stale cohort: keys whose LATEST driver CORRECTNESS row is
# round 6 (derived from CORRECTNESS_r01..r10; registration order).
# The first 10 fill R12_QUEUE's tail; the rest queue for r13+.
R6_STALE_COHORT = [
    "scan_parquet", "scan_csv", "scan_json", "project_select",
    "filter_date_param", "filter_not_null", "filter_regex",
    "filter_expr", "case_when_flag", "join_inner", "join_anti",
    "join_semi", "join_left_flag", "join_self_groupcount",
    "join_salted_skew", "fuzzy_match_levenshtein", "distinct_keys",
    "approx_count_distinct_bounded", "window_row_number_dedup",
    "topk_order_limit", "topk_per_group", "sort_by", "union_all",
    "snapshot_diff_orders", "incremental_agg_orders",
    "window_sliding_events", "tpch_q10_returned_topk",
    "tpch_q12_priority_counts", "agg_approx_percentile_bounded",
    "decontaminate_bloom_prefilter", "split_leakage_safe",
    "split_by_dedup_cluster", "tpch_q4_priority_exists",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit", "tpch_q11_important_stock",
    "semantic_dedup", "interval_overlap_orders",
    "outlier_zscore_group", "text_bm25_score", "domain_mix_weights",
    "collocation_pmi_topk", "outlier_mad_group",
]

# Machine-readable r12 queue (VERDICT r10 item 6): pinned BEFORE r11
# closes.  Core + the 30 round-10 additions (first driver rows, in
# registration order) + the 6 stale-r5 keys rolled out of the r11
# prefix + the 10 stalest round-6-cohort keys = exactly one prefix.
R12_QUEUE = (
    CORE
    + R10_ADDITIONS_ORDERED
    + STALE_R5_COHORT[31:]
    + R6_STALE_COHORT[:10]
)


# Round-11 post-prefix additions in registration order (extended as
# each wave lands; mirrors COVERAGE.md "Round-11 wave" sections).
# They queue behind R12_QUEUE for their first driver rows (r13).
R11_ADDITIONS_ORDERED = [
    # wave 1: agreement / interval / paired-sample statistics
    "cohens_kappa_status_priority", "matthews_corrcoef_urgent_price",
    "wilson_ci_status_by_priority", "wilcoxon_signed_rank_yoy",
    "friedman_test_daily_type", "poisson_rate_ci_by_type",
    # wave 2: financial / retail analytics
    "daily_return_stats", "value_at_risk_daily",
    "bollinger_band_breaks", "abc_xyz_matrix",
    "customer_concentration_topk",
    # wave 3: ETL / data-platform audits
    "referential_integrity_audit", "source_fingerprint_audit",
    "scan_jsonl_corrupt_records", "out_of_order_arrival_stats",
    "l_diversity_audit",
    # wave 4: LLM-corpus / embedding analytics
    "token_budget_decile_curve", "embedding_interlabel_centroid_dist",
    # wave 5: operations / forecasting / distribution
    "error_burst_stats", "theil_u2_forecast",
    "exact_quartiles_price_by_flag", "part_adoption_monthly",
    # wave 6: shipping logistics / promotion response
    "ship_latency_quartiles_by_priority", "discount_band_volume",
    # wave 7: order / catalog profiling
    "order_size_histogram", "cold_start_parts",
    "unit_price_dispersion_by_brand", "price_ending_profile",
    # wave 8: classic reporting / decomposition
    "seasonal_dow_additive", "abc_class_migration_halves",
    "z_chart_monthly_revenue",
    # wave 9: engagement / lifecycle distributions
    "session_duration_quartiles", "customer_order_frequency_histogram",
    "part_staleness_profile",
]
R11_ADDITIONS = set(R11_ADDITIONS_ORDERED)


# Round-12 post-prefix additions in registration order (mirrors
# COVERAGE.md "Round-12 wave" sections).  They queue behind R13_QUEUE
# for their first driver rows (r14) — 11 keys, well under the ≤34
# debt-policy cap (COVERAGE.md).
R12_ADDITIONS_ORDERED = [
    # wave 1: ETL surrogate-key / sequence / payment audits
    "surrogate_key_gap_islands", "linenumber_sequence_audit",
    "duplicate_payment_screen",
    # wave 2: SPC + calendar artifacts
    "p_chart_return_rate_monthly", "month_end_closing_spike",
    # wave 3: tokenizer / lexical diagnostics
    "token_len_histogram", "stopword_share_by_source",
    "token_simpson_diversity_by_source",
    # wave 4: embedding sparsity profile
    "embedding_active_dims_quartiles",
    # wave 5: engagement depth + order-book operations
    "active_days_histogram", "order_backlog_depth_daily",
    # wave 6: operator-quality evaluation
    "langid_confusion_matrix",
]
R12_ADDITIONS = set(R12_ADDITIONS_ORDERED)


# Machine-readable r13 queue (rotation-debt invariant, VERDICT r11
# item 1): pinned BEFORE r12 closes.  Core + the 34 round-11 additions
# (first driver rows, registration order) + the next 12 stale
# round-6-cohort keys = exactly one prefix.
R13_QUEUE = (
    CORE
    + R11_ADDITIONS_ORDERED
    + R6_STALE_COHORT[10:22]
)


def test_r12_additions_registered_oracle_paired_and_queued():
    """Every round-12 addition is registered, hash-checkable, NOT in
    the r12 driver prefix, and NOT colliding with the pinned r13
    queue (their first driver check is r14)."""
    assert R12_ADDITIONS <= set(workloads.QUERIES)
    assert R12_ADDITIONS <= set(workloads.ORACLES)
    assert not (R12_ADDITIONS & set(workloads.DRIVER_PRIORITY))
    assert not (R12_ADDITIONS & set(R13_QUEUE))
    assert len(R12_ADDITIONS) == len(R12_ADDITIONS_ORDERED)
    assert len(R12_ADDITIONS) <= 34  # the COVERAGE.md debt-policy cap
    reg_order = [k for k in workloads.QUERIES if k in R12_ADDITIONS]
    assert reg_order == R12_ADDITIONS_ORDERED


def test_r11_additions_registered_oracle_paired_and_queued():
    """Every round-11 addition is registered, hash-checkable, NOT in
    the r12 driver prefix (their first driver check is r13, via
    R13_QUEUE)."""
    assert R11_ADDITIONS <= set(workloads.QUERIES)
    assert R11_ADDITIONS <= set(workloads.ORACLES)
    assert not (R11_ADDITIONS & set(workloads.DRIVER_PRIORITY))
    assert not (R11_ADDITIONS & set(R12_QUEUE))
    assert len(R11_ADDITIONS) == len(R11_ADDITIONS_ORDERED)
    reg_order = [k for k in workloads.QUERIES if k in R11_ADDITIONS]
    assert reg_order == R11_ADDITIONS_ORDERED


def test_r10_additions_registered_oracle_paired_and_queued():
    """Every round-10 addition is registered, hash-checkable, and IN
    the r12 driver prefix (this round creates their first driver
    rows)."""
    assert R10_ADDITIONS <= set(workloads.QUERIES)
    assert R10_ADDITIONS <= set(workloads.ORACLES)
    assert R10_ADDITIONS <= set(workloads.DRIVER_PRIORITY)
    assert len(R10_ADDITIONS) == 30
    assert len(R10_ADDITIONS_ORDERED) == 30
    # pinned order matches the prefix order (core first, then the 30)
    prefix_order = [
        k for k in workloads.DRIVER_PRIORITY if k in R10_ADDITIONS
    ]
    assert prefix_order == R10_ADDITIONS_ORDERED


def test_priority_is_dedup_and_registered():
    names = workloads.DRIVER_PRIORITY
    assert len(names) == len(set(names)), "duplicate priority keys"
    missing = set(names) - set(workloads.QUERIES)
    assert not missing, f"priority keys not registered: {missing}"


def test_priority_fills_driver_subset():
    assert len(workloads.DRIVER_PRIORITY) == DRIVER_SUBSET_SIZE


def test_queries_emit_priority_first():
    prefix = list(workloads.QUERIES)[:DRIVER_SUBSET_SIZE]
    assert prefix == workloads.DRIVER_PRIORITY


def test_core_keys_never_rotate():
    assert workloads.DRIVER_PRIORITY[: len(CORE)] == CORE


def test_rotation_matches_r12_plan():
    """The shipped r12 prefix is exactly the queue pinned before r11
    closed — zero substitutions: core, the 30 r10 additions, the 6
    rolled r5 keys, the 10 stalest r6 keys."""
    assert workloads.DRIVER_PRIORITY == R12_QUEUE


def test_r11_prefix_derivable_from_pinned_queue():
    """VERDICT r10 item 1 ordered exactly one substitution into the
    pre-pinned R11_QUEUE: the red-row key enters right after core, the
    last stale-r5 slot rolls to r12.  Nothing else moved."""
    assert len(R11_QUEUE) == DRIVER_SUBSET_SIZE
    rolled = STALE_R5_COHORT[31]
    assert set(R11_PREFIX) == (
        set(R11_QUEUE) - {rolled} | {"embedding_dim_range_by_label"}
    )
    assert rolled in R12_QUEUE


def test_r12_queue_pinned():
    """The r12 queue (pinned before r11 closed) is well-formed and is
    now the SHIPPED prefix — the rotation landed with zero
    substitutions."""
    assert len(R12_QUEUE) == DRIVER_SUBSET_SIZE
    assert len(set(R12_QUEUE)) == DRIVER_SUBSET_SIZE
    assert set(R12_QUEUE) <= set(workloads.QUERIES)
    assert set(R12_QUEUE) <= set(workloads.ORACLES)
    assert workloads.DRIVER_PRIORITY == R12_QUEUE
    assert len(STALE_R5_COHORT) == 37
    assert len(R6_STALE_COHORT) == 46
    assert set(R6_STALE_COHORT) <= set(workloads.QUERIES)


def test_r13_queue_pinned():
    """Rotation-debt invariant: the r13 rotation is pinned
    machine-readably before r12 closes — exactly one driver prefix,
    every key registered and oracle-paired, disjoint from the shipped
    r12 prefix outside core (these are the keys whose attestations
    r13 must create or refresh: the 34 round-11 additions get their
    FIRST driver rows, plus the next 12 stale-r6 keys)."""
    assert len(R13_QUEUE) == DRIVER_SUBSET_SIZE
    assert len(set(R13_QUEUE)) == DRIVER_SUBSET_SIZE
    assert set(R13_QUEUE) <= set(workloads.QUERIES)
    assert set(R13_QUEUE) <= set(workloads.ORACLES)
    assert not (set(R13_QUEUE) - set(CORE)) & set(workloads.DRIVER_PRIORITY)


def test_every_registry_key_is_hash_gated():
    """VERDICT r9 item 3 closed: zero rows-only keys. Every registered
    query has a DuckDB oracle, so no future CORRECTNESS artifact can
    contain a ``no_oracle`` row."""
    assert set(workloads.QUERIES) == set(workloads.ORACLES)
    retired = {"similarity_ann_lsh", "similarity_ann_ivf"}
    assert not (retired & set(workloads.QUERIES))


def test_oracles_subset_of_queries():
    assert set(workloads.ORACLES) <= set(workloads.QUERIES)


def test_readme_counts_match_registry():
    # VERDICT r8 item 8: the README's stated registry counts must not
    # drift from the actual registry as it grows.
    readme = Path(__file__).resolve().parents[1] / "README.md"
    text = readme.read_text(encoding="utf-8")
    m = re.search(
        r"(\d+)-entry workload registry \((\d+) DuckDB-oracle-checked", text
    )
    assert m, (
        "README must state '<N>-entry workload registry "
        "(<M> DuckDB-oracle-checked'"
    )
    assert int(m.group(1)) == len(workloads.QUERIES)
    assert int(m.group(2)) == len(workloads.ORACLES)


def test_coverage_counts_match_registry():
    coverage = Path(__file__).resolve().parents[1] / "COVERAGE.md"
    text = coverage.read_text(encoding="utf-8")
    m = re.search(
        r"Registry count: (\d+) registered workloads "
        r"\((\d+) oracle-paired\)", text
    )
    assert m, (
        "COVERAGE.md must state 'Registry count: <N> registered workloads "
        "(<M> oracle-paired)'"
    )
    assert int(m.group(1)) == len(workloads.QUERIES)
    assert int(m.group(2)) == len(workloads.ORACLES)
