"""Plan-shape pins for the LLM-data-pipeline operator family.

SCALE.md makes structural claims about these plans (banded equi-joins,
broadcast small sides, map-only text ops). test_tpch_plans.py pins the
TPC-H shapes; this module pins the training-data ones, so a regression
that silently degrades a plan (a lost broadcast, a cartesian pair
generator, a stray shuffle in a map-only op) fails CI rather than
surfacing as a 100x slowdown at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_driven_etl_spark import workloads


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- pair generators must never be cartesian --------------------------------

PAIR_GENERATORS = [
    "dedup_minhash_lsh",
    "dedup_lsh_bucket_capped",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_near_dup",
    "fuzzy_join_tables",
    "multimodal_phash_dedup",
    "dedup_incremental_lsh",
    "fuzzy_match_levenshtein",
]


@pytest.mark.parametrize("name", PAIR_GENERATORS)
def test_pair_generator_is_equi_join(spark, sf_dir, name):
    plan = _plan(workloads.QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


# --- broadcast small sides ---------------------------------------------------


def test_decontaminate_broadcasts_eval_shingles(spark, sf_dir):
    """The eval-set side (small by construction) must broadcast; the
    corpus side must not shuffle before the per-doc count."""
    plan = _plan(workloads.QUERIES["decontaminate_ngram_overlap"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_bloom_decontaminate_prefilter_plan(spark, sf_dir):
    """The Bloom bitmap reaches the corpus as a broadcast (the one-row
    map frame), never a cartesian pair pass; the only BNLJ allowed is
    the unconditioned 1-row scalar-subquery crossJoin itself."""
    plan = _plan(workloads.QUERIES["decontaminate_bloom_prefilter"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_is_equi_join(spark, sf_dir):
    """Salting must keep the join an equi-join on (key, salt) — a lost
    salt column degenerates to a hot-key shuffle or a cartesian."""
    plan = _plan(workloads.QUERIES["join_salted_skew"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_topk_broadcasts_queries(spark, sf_dir):
    plan = _plan(workloads.QUERIES["similarity_topk"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ann_exact_variants_stay_bucketed_broadcast_joins(spark, sf_dir):
    """The full-probe exact variants must run the SAME machinery as the
    approximate settings — the CORPUS-side join is a broadcast hash
    equi-join on the bucket/cell key, never a cartesian scoring pass.
    (IVF's query×centroid scoring join IS an unconditioned broadcast
    nested loop — q × n_cells rows, both sides tiny and bounded by
    construction — so BNLJ is asserted absent only for the LSH variant,
    whose every join is an equi-join.)"""
    lsh = _plan(workloads.QUERIES["similarity_ann_lsh_exact"](spark, sf_dir))
    assert "BroadcastExchange" in lsh
    assert "CartesianProduct" not in lsh
    assert "BroadcastNestedLoopJoin" not in lsh

    ivf = _plan(workloads.QUERIES["similarity_ann_ivf_exact"](spark, sf_dir))
    assert "BroadcastHashJoin" in ivf  # corpus ⋈ probed cells, equi on _cell
    assert "CartesianProduct" not in ivf


def test_bucket_cap_is_broadcast_anti_join(spark, sf_dir):
    """The oversized-bucket drop list is tiny by construction (buckets
    beyond the cap are rare) — it must reach the bands as a broadcast
    left-anti join, never a shuffled one."""
    plan = _plan(workloads.QUERIES["dedup_lsh_bucket_capped"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_corpus_clean_decontamination_is_broadcast_anti(spark, sf_dir):
    # The full pipeline's final plan is truncated at the keep-best
    # materialization (r12), so the decontamination stage is pinned on
    # the exposed pre-dedup survivors frame — the stage whose anti join
    # must be broadcast.
    plan = _plan(workloads._corpus_clean_survivors(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the assembled pipeline must never degrade to a cartesian /
    # nested-loop tail past the materialization boundary
    full = _plan(workloads.QUERIES["corpus_clean_pipeline"](spark, sf_dir))
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full


# --- map-only text ops: zero data shuffles ----------------------------------
# The only allowed Exchange is the RoundRobin repartition from the
# parallelism floor on single-file test inputs (a no-op at real scale —
# see catalog.load_table); any hashpartitioning/range Exchange means the
# op gained a real shuffle.

MAP_ONLY = [
    "text_quality",
    "text_lang_id",
    "text_token_count",
    "doc_fingerprint",
    "text_pii_redact",
    "text_chunk_windows",
    "embedding_random_projection",
    "text_feature_hash_embed",
    "embedding_quantize_int8",
]


@pytest.mark.parametrize("name", MAP_ONLY)
def test_text_op_is_map_only(spark, sf_dir, name):
    plan = _plan(workloads.QUERIES[name](spark, sf_dir))
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not data_shuffles, f"{name} gained a data shuffle: {data_shuffles}"


# --- single-shuffle aggregation ops ------------------------------------------


@pytest.mark.parametrize("name", ["dedup_exact", "text_repetition"])
def test_single_pass_ops_have_at_most_one_data_shuffle(spark, sf_dir, name):
    """dedup_exact: one shuffle on the content hash. text_repetition:
    shuffle-free per-row expressions (r3) — allow <=1 to keep the pin
    robust to AQE variations, but any second data shuffle is a regression."""
    plan = _plan(workloads.QUERIES[name](spark, sf_dir))
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "RoundRobinPartitioning" not in ln
        and "BroadcastExchange" not in ln
    ]
    assert len(data_shuffles) <= 1, f"{name}: {data_shuffles}"


# --- scoring ops must prune the payload --------------------------------------


def test_multimodal_features_prunes_payload_for_metadata_agg(spark, sf_dir):
    """Aggregating typed metadata must not drag the binary payload through
    the shuffle (ReadSchema/project should drop it before the Exchange)."""
    df = workloads.QUERIES["multimodal_features"](spark, sf_dir)
    plan = _plan(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "payload" not in ln, ln


def test_bigram_lm_pruned_same_plan_shape(spark, sf_dir):
    """The min_freq floor is a filter on the model aggregate — it must not
    change the plan family (no cartesian, no extra data shuffle class)."""
    plan = _plan(workloads.QUERIES["text_bigram_lm_pruned"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_lm_no_cartesian_and_broadcast_free_model_join(spark, sf_dir):
    """SCALE.md: bigram formation is map-side; the scoring join is an
    equi-join on the bigram key — never cartesian. (Exchange count is not
    pinned: the model side legitimately shuffles once, and AQE may turn
    the scoring join into a broadcast at small SF.)"""
    plan = _plan(workloads.QUERIES["text_bigram_lm_score"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """The rank-filter rewrite must stay active: WindowGroupLimit pushes
    a per-group top-k heap below the shuffle, so map tasks forward at
    most k rows per group instead of whole groups."""
    plan = _plan(workloads.QUERIES["topk_per_group"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_quota_sample_uses_window_group_limit(spark, sf_dir):
    """sample_fixed_quota_per_group routes through the same rank-filter
    rewrite: the md5-order quota draw must carry O(groups·k) through the
    shuffle, not the corpus."""
    plan = _plan(
        workloads.QUERIES["sample_fixed_quota_per_group"](spark, sf_dir)
    )
    assert "WindowGroupLimit" in plan


def test_incremental_agg_plan_shape(spark, sf_dir):
    """SCALE.md incremental-view-maintenance row: the delta path is two
    equi-joins (snapshot diff on the row key, delta-apply on the group
    key) — never a cartesian — and the per-group delta aggregation sits
    ABOVE the changed-row filter, so only change rows reach the
    aggregation shuffle."""
    plan = _plan(workloads.QUERIES["incremental_agg_orders"](spark, sf_dir))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("FullOuter") == 2  # diff join + delta-apply join
    # the signed-delta aggregate consumes the explode of the changed rows,
    # not a raw table scan: in the printed tree, consumers sit ABOVE
    # (earlier than) their inputs, so the partial aggregate must precede
    # the Generate, and no scan may sit between them
    explode_at = plan.find("Generate explode")
    agg_at = plan.find("partial_sum(__sign")
    assert explode_at != -1 and agg_at != -1
    assert agg_at < explode_at, "delta agg not above the changed-row explode"
    assert "FileScan" not in plan[agg_at:explode_at]


def test_interval_overlap_is_equi_join(spark, sf_dir):
    """The interval-overlap join must plan as a hash equi-join on
    (key, bin) — the naive theta encoding falls to
    BroadcastNestedLoop/Cartesian, which is |L|x|R| at scale."""
    plan = _plan(workloads.QUERIES["interval_overlap_orders"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_semantic_dedup_pair_gen_is_blocked_equi_join(spark, sf_dir):
    """SemDeDup pair generation stays label-blocked (equi-join), and the
    keep-best window is guarded by WindowGroupLimit's rank-filter push."""
    plan = _plan(workloads.QUERIES["semantic_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_outlier_zscore_broadcasts_group_stats(spark, sf_dir):
    """Per-group moments (rows = |groups|) must come back to the fact
    scan as a broadcast — a shuffle join or a window over the fact table
    would add a corpus-wide sort at 100 TB."""
    plan = _plan(workloads.QUERIES["outlier_zscore_group"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_bm25_is_map_only_scoring_plus_scalar_stats(spark, sf_dir):
    """BM25 scoring must stay map-side: no window, no per-term explode
    join, no sort-merge; the only nested-loop is the unconditioned 1-row
    corpus-stats crossJoin (the scalar-subquery shape)."""
    plan = _plan(workloads.QUERIES["text_bm25_score"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


# --- round-6 operators -------------------------------------------------------


def test_domain_mix_weights_single_corpus_pass(spark, sf_dir):
    """One partial-aggregated groupBy(source) over the corpus; the
    totals come back as a broadcast one-row frame (the scalar-subquery
    crossJoin shape) — never a second corpus scan or a window."""
    plan = _plan(workloads.QUERIES["domain_mix_weights"](spark, sf_dir))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row totals join
    # exactly one data shuffle: the per-domain aggregate
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(data_shuffles) <= 1, data_shuffles


def test_collocation_pmi_no_cartesian_no_window(spark, sf_dir):
    """Unigram counts attach to bigram counts via plain equi-joins (a
    real vocabulary is millions of words — broadcast would be wrong at
    scale, cartesian catastrophic); final top-k must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(workloads.QUERIES["collocation_pmi_topk"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row N crossJoin
    assert "TakeOrderedAndProject" in plan


def test_outlier_mad_group_broadcasts_stats(spark, sf_dir):
    """Both stats frames (median, then median+MAD — rows = |groups|)
    re-join the fact via broadcast; no window over the fact table (a
    corpus-wide per-group sort at 100 TB)."""
    plan = _plan(workloads.QUERIES["outlier_mad_group"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_bounded_sketch_contracts_single_aggregation(spark, sf_dir):
    """agg_approx_percentile_bounded: sketch and exact percentile buffers
    merge in ONE aggregation pass — no join of two scans, no window.

    approx_count_distinct_bounded is DELIBERATELY the opposite since r12:
    a combined aggregation plans the exact distincts via Expand and then
    buffers an HLL sketch once per (gid, distinct value) partial-agg
    entry (measured 27.8s vs 1.7s split at sf0.1) — so it must stay TWO
    aggregations recombined on the tiny group key, with no Expand
    touching the sketch agg and still no window."""
    plan = _plan(
        workloads.QUERIES["agg_approx_percentile_bounded"](spark, sf_dir)
    )
    assert "Join" not in plan
    assert "Window" not in plan

    acd = _plan(
        workloads.QUERIES["approx_count_distinct_bounded"](spark, sf_dir)
    )
    assert "Window" not in acd
    assert "CartesianProduct" not in acd
    assert "BroadcastNestedLoopJoin" not in acd
    # split shape: the expand (exact multi-distinct) exists exactly once,
    # on the exact side only — the sketch agg is expand-free
    assert acd.count("Expand") == 1


def test_join_asof_tolerance_same_single_shuffle_plan(spark, sf_dir):
    """Direction/tolerance must not change the as-of plan family: one
    union + one key-partitioned window; tolerance is a map-side CASE —
    never a theta join (BNLJ/cartesian) and no extra data shuffle vs
    the backward form."""
    fwd = _plan(workloads.QUERIES["join_asof_tolerance"](spark, sf_dir))
    bwd = _plan(workloads.QUERIES["join_asof"](spark, sf_dir))
    for plan, name in ((fwd, "forward"), (bwd, "backward")):
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert plan.count("Window") >= 1, name

    def n_data_shuffles(plan):
        return sum(
            1
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        )

    assert n_data_shuffles(fwd) == n_data_shuffles(bwd)


def test_copurchase_no_self_join(spark, sf_dir):
    """Market-basket pairs must come from per-basket array expansion
    (groupBy + map-side combinations), NEVER a fact self-join — at 100 TB
    a lineitem⋈lineitem equi-join shuffles the fact twice and a theta
    join is quadratic. Top-k must be TakeOrderedAndProject."""
    plan = _plan(workloads.QUERIES["copurchase_part_pairs"](spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_transition_matrix_one_window_broadcast_totals(spark, sf_dir):
    """ONE user-keyed window (lag) in the pair stage; in the full
    operator the counts frame is materialized ONCE (lineage truncated —
    the window never re-executes for the totals consumer) and the
    |types|²-row totals frame joins back via broadcast — the corpus is
    never re-shuffled for the row-share normalization."""
    from metadata_driven_etl_spark.operators import cooccur

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pair_plan = _plan(
        cooccur.transition_pairs(events, "user_id", "event_type", "ts",
                                 tiebreak=("event_id",))
    )
    assert pair_plan.count("Window") == 1
    assert pair_plan.count("Exchange") == 1

    plan = _plan(workloads.QUERIES["event_transition_matrix"](spark, sf_dir))
    # Counts materialized once: both consumers read the checkpointed RDD,
    # so no Window (and no re-shuffled corpus) survives in the final plan.
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cluster_sizes_pure_aggregation(spark, sf_dir):
    """Two nested hash aggregations; no join, no window, and the first
    shuffle carries content HASHES, not document text."""
    plan = _plan(workloads.QUERIES["dedup_cluster_sizes"](spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_top_terms_rank_filter_is_window_group_limit(spark, sf_dir):
    """The per-doc top-k rank filter must run as WindowGroupLimit
    (per-partition group limits before the doc shuffle); pair generation
    is tf⋈df on the term key — never cartesian."""
    plan = _plan(workloads.QUERIES["text_top_terms_per_doc"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row N crossJoin


def test_doc_cosine_postings_materialized_once_no_cartesian(spark, sf_dir):
    """The postings frame feeds df-prune, norms, and BOTH pair-join sides
    — it must be materialized once (Scan ExistingRDD), the pair join must
    be an equi-join on the term key (never CartesianProduct), and the
    norm joins happen AFTER pair aggregation (they shuffle the candidate-
    pair frame, not postings)."""
    plan = _plan(workloads.QUERIES["text_doc_sim_cosine"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gaps_islands_single_window_shuffle(spark, sf_dir):
    """day - row_number rewrite: no self-join, no recursion; the island
    aggregate reuses the window's user-clustered distribution, so the
    whole query is the distinct shuffle + ONE user-keyed exchange."""
    plan = _plan(workloads.QUERIES["gaps_islands_daily"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert plan.count("Exchange") <= 2  # distinct + window repartition


def test_winsorize_fact_never_shuffles(spark, sf_dir):
    """The clip is map-side: one Exchange total (the stats aggregation's
    partials), stats broadcast back, no sort-merge join, no fact
    shuffle."""
    plan = _plan(workloads.QUERIES["winsorize_clip_group"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    data_shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(data_shuffles) == 1


def test_heavy_hitters_sketch_broadcast(spark, sf_dir):
    """The exact side is one partial-aggregated count; the 1-row sketch
    frame joins via broadcast (BNL on a single-row build side is the
    1-row crossJoin shape, same as the bounded-sketch contracts)."""
    plan = _plan(workloads.QUERIES["heavy_hitters_bounded"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_pagerank_edges_materialized_once_no_cartesian(spark, sf_dir):
    """The degree-annotated edge list is materialized ONCE (Scan
    ExistingRDD) and reused by every round; each round is an equi-join +
    partial-aggregated sum — never cartesian, and the final plan contains
    only the LAST round's join (prior rounds are truncated behind
    checkpoints, so plan depth is O(1) in iteration count)."""
    plan = _plan(workloads.QUERIES["pagerank_copurchase"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_prefix_is_equi_join_materialized_once(spark, sf_dir):
    """The only pair generator is the prefix-postings equi-join on the
    token key — never cartesian; the shingle-set frame is materialized
    once (Scan ExistingRDD) and feeds the df counts, the prefix index,
    and both verify sides."""
    plan = _plan(workloads.QUERIES["dedup_jaccard_prefix"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan


def test_item_cf_counts_broadcast_back(spark, sf_dir):
    """The per-item basket-count frames are |items| rows — they must
    reach the pair aggregate as broadcasts (the pair frame never
    re-shuffles for normalization), and the basket frame is materialized
    once for both consumers."""
    plan = _plan(workloads.QUERIES["copurchase_item_cf"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_chisq_single_cell_shuffle_broadcast_totals(spark, sf_dir):
    """ONE map-side-combinable cell aggregation is the only corpus
    shuffle; row/col/grand totals derive from the materialized cell frame
    and broadcast back (never a sort-merge join)."""
    plan = _plan(workloads.QUERIES["chisq_cells_flag_status"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # cells materialized once


def test_gini_window_distribution_reused_by_aggregate(spark, sf_dir):
    """The rank window's group partitioning must be reused by the final
    aggregation — ONE data shuffle for the whole query."""
    plan = _plan(workloads.QUERIES["gini_quantity_by_flag"](spark, sf_dir))
    data_shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(data_shuffles) == 1, data_shuffles
    assert "Join" not in plan


def test_cumulative_users_window_is_on_date_frame(spark, sf_dir):
    """The single-partition running-sum window must run over the tiny
    per-day frame (AFTER two aggregations), never the event stream: the
    plan's window input comes from a HashAggregate, and the corpus
    shuffles only for the per-user first-seen aggregate."""
    plan = _plan(workloads.QUERIES["cumulative_unique_users"](spark, sf_dir))
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_moving_median_single_window_shuffle(spark, sf_dir):
    """One customer-keyed window shuffle; the bounded ROWS frame keeps
    per-frame buffers O(5), never an unbounded per-key buffer."""
    plan = _plan(workloads.QUERIES["window_moving_median"](spark, sf_dir))
    assert plan.count("Window") == 1
    data_shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(data_shuffles) == 1, data_shuffles


def test_triangle_counts_equi_joins_only(spark, sf_dir):
    """Degree orientation makes every pair generator an EQUI-join (on the
    shared wedge vertex, then on the closing (t2, t3) pair) — the wedge
    inequality rides the join condition, never a cartesian/BNL. The
    per-node expansion is a map-side Generate (explode) of the triangle
    frame."""
    plan = _plan(workloads.QUERIES["triangle_count_copurchase"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Generate explode" in plan


def test_ra_link_prediction_equi_joins_topk(spark, sf_dir):
    """Candidate pairs generate ONLY through the shared-neighbor equi-join
    (z = z); existing edges leave via anti-join; global top-k is
    TakeOrderedAndProject, never a full sort."""
    plan = _plan(
        workloads.QUERIES["link_predict_copurchase_ra"](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "LeftAnti" in plan


def test_ewma_single_window_shuffle(spark, sf_dir):
    """The 8 lag() terms share ONE WindowExec over one o_custkey
    Exchange — the weighted sum is map-side arithmetic, not 8 window
    passes."""
    plan = _plan(workloads.QUERIES["window_ewma_smooth"](spark, sf_dir))
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan


def test_rrf_fusion_topk_shape(spark, sf_dir):
    """Fusion is union + one aggregation + TakeOrderedAndProject; the
    only join machinery belongs to the input retrievers (broadcast for
    the dense query side)."""
    plan = _plan(workloads.QUERIES["search_hybrid_rrf"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_ohlc_bars_single_agg_no_window(spark, sf_dir):
    """The whole bar (open/high/low/close via min_by/max_by struct
    ordering) is ONE map-side-combinable aggregation: exactly one
    Exchange, ZERO Window nodes — the per-row rank/sort formulation is
    the scale trap this operator avoids."""
    plan = _plan(workloads.QUERIES["ohlc_bars_daily"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 0
    assert "partial_min_by" in plan and "partial_max_by" in plan


def test_twap_window_distribution_reused(spark, sf_dir):
    """The lead() successor lookup is the ONLY shuffle: the TWAP
    aggregation groups on the window's partition keys, so it reuses the
    hash distribution (one Exchange total, one Window)."""
    plan = _plan(workloads.QUERIES["twap_event_value_daily"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_mannwhitney_domain_frame_shape(spark, sf_dir):
    """The fact table shuffles ONCE (groupBy value → the domain frame);
    the rank window and rank-sum run over that frame, and the totals
    side reaches the result as a broadcast — one hashpartitioning
    Exchange on the fact path, no sort-merge join."""
    plan = _plan(
        workloads.QUERIES["mannwhitney_u_price_by_flag"](spark, sf_dir)
    )
    assert "Scan ExistingRDD" in plan  # domain frame materialized once
    fact_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(cents" in ln
    ]
    assert len(fact_shuffles) == 0, fact_shuffles
    assert "SortMergeJoin" not in plan


def test_benford_single_digit_agg_broadcast_total(spark, sf_dir):
    """The 9-row digit frame is materialized ONCE (it feeds cells and
    the total — without it the corpus scans twice) and the totals side
    broadcasts back; no sort-merge join, no second corpus shuffle."""
    plan = _plan(workloads.QUERIES["benford_digit_orders"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan  # digit frame materialized once
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(data_shuffles) == 0, data_shuffles
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_phrase_search_postings_equi_joins(spark, sf_dir):
    """Postings materialize once (both phrase positions probe them) and
    every positional join is an equi-join on (doc, anchor pos) — never
    a cartesian/BNL pair pass."""
    plan = _plan(workloads.QUERIES["text_phrase_search"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan  # postings materialized once
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_covariance_single_pass(spark, sf_dir):
    """All 45 moments come from ONE aggregation pass — partial then
    final HashAggregate, no joins, no window, at most the single
    aggregate-state Exchange."""
    plan = _plan(workloads.QUERIES["embedding_covariance"](spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert len(data_shuffles) <= 1, data_shuffles


def test_running_sum_clamped_one_exchange(spark, sf_dir):
    """The stacked prefix windows (running sum, then running min over
    it) share one partitioning+ordering — ONE Exchange for the whole
    sequential-fold rewrite, and the suppkey slice reaches the scan as
    a pushed filter."""
    plan = _plan(workloads.QUERIES["running_sum_clamped"](spark, sf_dir))
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert len(data_shuffles) == 1, data_shuffles
    assert "PushedFilters: [IsNotNull(l_suppkey), LessThan(l_suppkey,50)]" in plan


def test_largest_remainder_single_fact_shuffle(spark, sf_dir):
    """One map-side-combinable groupBy is the only corpus shuffle; the
    |groups|-row frame is materialized once and everything downstream
    (total broadcast, rank window, leftover) is metadata-size."""
    plan = _plan(
        workloads.QUERIES["allocate_largest_remainder"](spark, sf_dir)
    )
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_cuped_units_frame_materialized_once(spark, sf_dir):
    """One corpus shuffle (groupBy unit); the units frame feeds the
    global-moment AND per-variant aggregations from one materialization;
    the 1-row global frame broadcasts."""
    plan = _plan(workloads.QUERIES["cuped_adjusted_spend"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    fact_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(o_custkey" in ln
    ]
    assert len(fact_shuffles) == 0, fact_shuffles  # inside the checkpoint


def test_best_split_domain_frame_shape(spark, sf_dir):
    """The KS domain-frame shape again: fact shuffles once into the
    |distinct q|-row frame (materialized once), threshold evaluation is
    metadata-size."""
    plan = _plan(
        workloads.QUERIES["best_split_gini_quantity"](spark, sf_dir)
    )
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_survival_life_table_domain_frame(spark, sf_dir):
    """Per-order durations come from one join+groupBy; the life-table
    window runs over the once-materialized |durations|-row domain
    frame with a broadcast total — no second corpus shuffle."""
    plan = _plan(workloads.QUERIES["survival_life_table"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_rolling_active_users_dedup_before_explode(spark, sf_dir):
    """The 7× coverage explode must run on DISTINCT (user, day), bounding
    the expansion at 7× user-days, not 7× events. The workload's
    materialization hides the dedup behind 'Scan ExistingRDD', so the
    pin rebuilds the same expression WITHOUT the checkpoint and asserts
    the aggregate sits below the Generate in that plan (a reviewer found
    the earlier workload-plan version matched the broadcast max-day
    aggregate instead — vacuous)."""
    ev = workloads._t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    )
    plan = _plan(cover)
    gen = plan.index("Generate explode")
    below = plan[gen:]
    assert "HashAggregate" in below and "keys=[user_id" in below, (
        "the (user, day) dedup aggregate must sit BELOW the explode"
    )

    wplan = _plan(workloads.QUERIES["rolling_active_users"](spark, sf_dir))
    assert "Scan ExistingRDD" in wplan  # user-day frame materialized once
    assert "CartesianProduct" not in wplan


def test_rolling_active_users_equals_sliding_distinct(spark):
    """Value-level identity check against the naive sliding
    COUNT(DISTINCT) reference on a hand-built frame with re-appearing
    users, gaps, and window-boundary days."""
    import datetime as dt

    rows = []
    d0 = dt.date(2024, 1, 1)
    activity = {
        1: [0, 0, 3, 10],       # dup same day, gap, reappears
        2: [0, 7, 8],           # exactly one window apart
        3: [2],                 # single day
    }
    for u, days in activity.items():
        for d in days:
            rows.append(
                (u, dt.datetime.combine(d0 + dt.timedelta(days=d),
                                        dt.time(12)))
            )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    ud = df.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = ud.agg(F.max("day").alias("d1"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    )
    got = {
        r.day: r.wau
        for r in cover.crossJoin(F.broadcast(bounds))
        .filter(F.col("win_day") <= F.col("d1"))
        .groupBy(F.col("win_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .collect()
    }
    # brute force: for each day in [min, max], distinct users active in
    # the trailing 7 days
    days_active = {
        (u, d0 + dt.timedelta(days=d)) for u, ds in activity.items()
        for d in ds
    }
    d_max = d0 + dt.timedelta(days=10)
    for off in range(0, 11):
        day = d0 + dt.timedelta(days=off)
        want = len(
            {
                u
                for (u, d) in days_active
                if day - dt.timedelta(days=6) <= d <= day
            }
        )
        assert got.get(day, 0) == want, (day, got.get(day), want)
    assert max(got) == d_max


def test_pareto_abc_revenue_frame_materialized(spark, sf_dir):
    """One corpus shuffle into the |parts|-row revenue frame,
    materialized once (cumulative window + totals); class rollup is
    metadata-size."""
    plan = _plan(workloads.QUERIES["pareto_abc_parts"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_time_decay_attribution_binned_equi_join(spark, sf_dir):
    """The (purchase, touch) pair generator is the day-binned equi-join
    on (user, bin) — never the per-user theta space (the DuckDB oracle
    IS the theta formulation, so the hash match doubles as brute-force
    equivalence). The workload plan's only BNLJ is the unconditioned
    1-row totals crossJoin (the bloom-prefilter precedent); the pair
    stage itself is pinned on the operator plan (it sits behind the
    checkpoint in the workload plan)."""
    from metadata_driven_etl_spark.operators import temporal as t_ops

    ev = workloads._t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_type"
    )
    pairs_plan = _plan(
        t_ops.range_join_binned(
            purchases, touches, key="user_id", left_ts="pts",
            right_ts="ts", lower_seconds=7 * 86400, upper_seconds=0,
            bin_seconds=86400,
        )
    )
    assert "CartesianProduct" not in pairs_plan
    assert "BroadcastNestedLoopJoin" not in pairs_plan

    plan = _plan(workloads.QUERIES["attribution_time_decay"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_trailing_range_sum_single_window(spark, sf_dir):
    """One event_type-keyed window with a RANGE frame (RangeFrame in the
    spec) — no join, no second shuffle."""
    df = workloads.QUERIES["window_trailing_range_sum"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Window") == 1
    assert "RangeFrame" in plan
    assert "Join" not in plan


def test_geo_radius_join_is_cell_equi_join(spark, sf_dir):
    """Candidates meet only in the 3×3 cell equi-join — never the
    |S|×|C| theta space (the DuckDB oracle IS the theta form, so the
    hash match proves the binning loses no pair)."""
    plan = _plan(workloads.QUERIES["geo_radius_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    joins = [ln for ln in plan.splitlines() if "Join" in ln and "_cell" in ln]
    assert joins, "cell equi-join missing from plan"


def test_hierarchy_rollup_single_shuffle(spark, sf_dir):
    """Materialized-path rollup: the ≤7× ancestor explode is map-side
    (Generate above the scan-side aggregate), and the subtree groupBy
    is the only post-explode shuffle — depth-independent, no iteration,
    no join."""
    plan = _plan(workloads.QUERIES["hierarchy_rollup_prefix"](spark, sf_dir))
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_skyline_domain_frame_shape(spark, sf_dir):
    """One map-side-combinable groupBy into the |distinct prices|-row
    domain frame; the prefix-max window runs over that frame — no join
    anywhere."""
    plan = _plan(workloads.QUERIES["skyline_price_quantity"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_weighted_median_window_shares_group_partition(spark, sf_dir):
    """Cumulative and per-group total windows both partition on the
    group key over the domain frame — ONE hashpartitioning class on the
    fact path, no join."""
    plan = _plan(
        workloads.QUERIES["weighted_median_price_by_flag"](spark, sf_dir)
    )
    assert "Join" not in plan
    shuffles = {
        ln.split("hashpartitioning(")[1].split(",")[0]
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    }
    assert shuffles <= {"l_returnflag#" + s.split("#")[1] for s in shuffles}
    assert len(shuffles) <= 2, shuffles  # cents-agg + group windows


def test_rfm_units_frame_materialized_once(spark, sf_dir):
    """The per-customer summary feeds the anchor aggregate AND the
    quintile windows — must be materialized once."""
    plan = _plan(workloads.QUERIES["rfm_segments"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_session_metrics_reuses_user_distribution(spark, sf_dir):
    """The sessionizer's user window is the only corpus shuffle; the
    per-(user, session) aggregation reuses the user distribution prefix
    (no second user-keyed Exchange); the day rollup shuffles |sessions|
    rows."""
    plan = _plan(workloads.QUERIES["session_metrics_daily"](spark, sf_dir))
    user_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    assert len(user_shuffles) == 1, user_shuffles
    assert "Join" not in plan


def test_rfm_quintiles_have_no_single_partition_data_exchange(spark, sf_dir):
    """VERDICT r7 item 2: the three quintile scores must NOT be bare
    unpartitioned ntile windows (single-partition sort of |customers|
    rows).  With windows.distributed_ntile the final plan shows no ntile
    at all, no data-frame Window (the only Window is the ~#partitions-row
    offsets cumsum), and at most ONE Exchange SinglePartition — fed by
    the metadata-sized count-per-partition aggregate, never by data.
    (Chained ntiles checkpoint, so the final plan is the last ntile's —
    the operator's own shape is pinned below on an un-checkpointed
    equivalent.)"""
    plan = _plan(workloads.QUERIES["rfm_segments"](spark, sf_dir))
    assert "ntile" not in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    # the lone Window is the offsets cumsum over _dnt_pid
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert all("_dnt_pid" in ln for ln in win_lines), win_lines


def test_distributed_ntile_operator_plan_shape(spark):
    """The operator itself: after the (checkpoint-hidden) range exchange,
    the data path is map-only — one metadata-sized hashpartitioning
    exchange (the per-partition counts aggregate), one ~#partitions-row
    SinglePartition cumsum, one broadcast hash join; never a sort-merge
    join or a data-frame window."""
    from pyspark.sql import functions as F

    from metadata_driven_etl_spark.operators.windows import (
        distributed_ntile,
    )

    df = spark.range(1000).select((F.col("id") % 13).alias("v"), "id")
    out = distributed_ntile(
        df, 5, [F.col("v").asc(), F.col("id").asc()], "b"
    )
    plan = _plan(out)
    assert "ntile" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "Scan ExistingRDD" in plan  # materialize-once checkpoint


def test_cusum_alerts_one_exchange(spark, sf_dir):
    """CUSUM via the clamp prefix identity: both stacked windows share
    one (event_type, ts, event_id) partitioning+ordering — ONE Exchange
    total, alert filter map-side above the windows."""
    plan = _plan(workloads.QUERIES["cusum_alerts_by_type"](spark, sf_dir))
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert len(data_shuffles) == 1, data_shuffles


def test_decile_lift_no_builtin_ntile(spark, sf_dir):
    """The decile cut must ride distributed_ntile (range shuffle +
    broadcast offsets), never a bare ntile window; the lift table's own
    windows run on the 10-row decile frame only."""
    plan = _plan(workloads.QUERIES["decile_lift_table"](spark, sf_dir))
    assert "ntile" not in plan, plan
    assert "SortMergeJoin" not in plan
    assert "Scan ExistingRDD" in plan  # units + decile frames checkpoint


def test_assoc_rules_no_fact_self_join(spark, sf_dir):
    """Rules generate from ONE basket gather (materialized once): no
    second lineitem scan, no sort-merge join anywhere — item counts and
    the basket total broadcast back onto the pair aggregate."""
    df = workloads.QUERIES["assoc_rules_copurchase"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Scan parquet") <= 1, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3  # ia, ib, total


def test_rake_candidates_materialized_once_no_cartesian(spark, sf_dir):
    """The kept-candidate frame feeds word stats AND phrase assembly —
    materialized once; the phrase⋈word-stats join is an equi-join
    (never a cross product)."""
    plan = _plan(workloads.QUERIES["keyword_rake_topk"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_srm_check_single_aggregation(spark, sf_dir):
    """One map-side-combinable aggregation over the fact scan — at most
    one data Exchange, no join, no window."""
    plan = _plan(workloads.QUERIES["srm_check_by_priority"](spark, sf_dir))
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "RoundRobinPartitioning" not in ln
        and "BroadcastExchange" not in ln
    ]
    assert len(data_shuffles) <= 1, data_shuffles
    assert "Join" not in plan and "Window" not in plan


def test_neyman_single_fact_shuffle(spark, sf_dir):
    """The moment groupBy is the only corpus shuffle; weights frame is
    materialized once and everything downstream (total broadcast, rank
    window, leftover) runs on the |strata|-row frame."""
    plan = _plan(workloads.QUERIES["neyman_allocation_strata"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_session_funnel_user_prefix_shuffles(spark, sf_dir):
    """Sessionizer + funnel windows both key on the user prefix; the
    depth rollup is 4 rows. No join anywhere in the Spark plan (the
    oracle's join is a DuckDB artifact of the shared sessionizer CTE)."""
    plan = _plan(workloads.QUERIES["session_funnel_depth"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan


def test_rolling_zscore_one_window_shuffle(spark, sf_dir):
    """All three moment aggregates share one WindowExec frame over one
    event_type Exchange; the alert filter is map-side above it."""
    plan = _plan(workloads.QUERIES["window_rolling_zscore"](spark, sf_dir))
    data_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert len(data_shuffles) == 1, data_shuffles
    assert plan.count("Window [") == 1, plan


def test_centroid_drift_single_pass_broadcast_global(spark, sf_dir):
    """One aggregation pass (d+1 decimal states per group); the 1-row
    global frame broadcasts back. No sort-merge join, no window."""
    plan = _plan(workloads.QUERIES["embedding_centroid_drift"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan or "Exchange SinglePartition" in plan


def test_mode_per_group_no_window(spark, sf_dir):
    """Mode = two stacked hash aggregations (value counts, then the
    max_by argmax) — never a window over the fact."""
    plan = _plan(workloads.QUERIES["agg_mode_per_group"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "Join" not in plan


def test_equi_depth_histogram_distributed_cut(spark, sf_dir):
    """The bucket cut is distributed_ntile over the FULL fact — no bare
    ntile window, no single-partition sort of lineitem."""
    plan = _plan(workloads.QUERIES["histogram_equi_depth"](spark, sf_dir))
    assert "ntile" not in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Scan ExistingRDD" in plan


def test_rank_movers_materializes_rank_frame_once(spark, sf_dir):
    """The ranked |parts x 2 months| frame feeds both month slices —
    materialized once; the movers join is an equi-join on the part key."""
    plan = _plan(workloads.QUERIES["rank_movers_monthly"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_audience_overlap_no_user_self_join_blowup(spark, sf_dir):
    """Pairs expand map-side from per-user distinct segment arrays (the
    basket machinery) — never a row-level user×user join; segment sizes
    come off the SAME materialized basket frame (one fact scan) and
    broadcast back."""
    plan = _plan(workloads.QUERIES["audience_overlap_jaccard"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert plan.count("Scan parquet") == 0, plan  # baskets checkpointed
    assert "Scan ExistingRDD" in plan


def test_distinctive_terms_single_corpus_pass(spark, sf_dir):
    """Both sources' term counts come from ONE aggregation pass
    (conditional sums); the totals broadcast back; top-k is
    TakeOrderedAndProject."""
    plan = _plan(
        workloads.QUERIES["distinctive_terms_by_source"](spark, sf_dir)
    )
    assert "Scan ExistingRDD" in plan  # counts materialized once
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_bfs_frontier_joins_are_equi_joins(spark, sf_dir):
    """Every BFS level is frontier ⋈ edges on the src key + an anti join
    against the visited set — no cartesian anywhere; per-level frontiers
    materialize once (lineage truncation)."""
    plan = _plan(workloads.QUERIES["bfs_levels_copurchase"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_percent_of_parent_single_fact_aggregation(spark, sf_dir):
    """One fact aggregation feeds both hierarchy levels and the total;
    dims broadcast into the fact scan; no sort-merge join, no second
    fact scan."""
    plan = _plan(workloads.QUERIES["percent_of_parent_rollup"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan  # nation frame materialized once
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") <= 4  # orders + 3 dims, once each


def test_dau_mau_reuses_deduped_user_days(spark, sf_dir):
    """DAU and the MAU coverage explode both read the ONE deduped
    (user, day) frame; the explode sits ABOVE the dedup (never 30x the
    raw events)."""
    plan = _plan(workloads.QUERIES["dau_mau_stickiness"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_new_vs_returning_single_window_no_join(spark, sf_dir):
    """First-day carries via one user window over the deduped frame —
    no join back, one day rollup."""
    plan = _plan(workloads.QUERIES["new_vs_returning_daily"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window [") == 1


def test_sequence_violations_one_window_shuffle(spark, sf_dir):
    """The lag window is the only corpus shuffle; the allowed-set test
    is a map-side literal predicate."""
    plan = _plan(
        workloads.QUERIES["sequence_violations_by_user"](spark, sf_dir)
    )
    assert "Join" not in plan, plan
    assert plan.count("Window [") == 1


def test_k_anonymity_single_aggregation(spark, sf_dir):
    """One groupBy over the table; the violation filter runs on the
    |quasi-id groups| frame — no join, no window."""
    plan = _plan(workloads.QUERIES["k_anonymity_audit"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan


def test_interpurchase_filter_pushed_and_one_window(spark, sf_dir):
    """The purchase filter reaches the scan; one user-keyed lag window;
    one quantile aggregation."""
    plan = _plan(
        workloads.QUERIES["interpurchase_gap_quantiles"](spark, sf_dir)
    )
    assert "PushedFilters" in plan and "purchase" in plan, plan
    assert plan.count("Window [") == 1


def test_cohort_ltv_window_then_domain_frame(spark, sf_dir):
    """Cohort assignment rides one customer window (no join back); the
    cumulative runs on the |cohorts x months| domain frame."""
    plan = _plan(workloads.QUERIES["cohort_ltv_monthly"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window [") == 2  # cohort min + domain cumsum


def test_flesch_is_single_aggregation_no_join(spark, sf_dir):
    """Explode + one per-doc aggregation; no joins, no windows."""
    plan = _plan(workloads.QUERIES["text_readability_flesch"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan


def test_funnel_step_rates_one_user_shuffle(spark, sf_dir):
    """The funnel's user shuffle dominates; the 3-row readout reuses the
    ONE scalar reach aggregate (no per-step fact re-scan)."""
    plan = _plan(workloads.QUERIES["funnel_step_rates"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    user_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    # the depth frame computes once; unions of the 3 literal rows may
    # replicate the 1-row aggregate subtree but never the fact shuffle
    assert len(set(user_shuffles)) <= 1, user_shuffles


def test_hhi_two_stacked_aggregations_broadcast_dim(spark, sf_dir):
    """Supplier dim broadcasts into the fact scan; the HHI rollup is a
    second map-side-combinable aggregation — no sort-merge join."""
    plan = _plan(workloads.QUERIES["supplier_hhi_by_nation"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


# --- round-9 workload plan pins ---------------------------------------------


def _data_shuffles(plan: str) -> list[str]:
    return [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "RoundRobinPartitioning" not in ln
        and "BroadcastExchange" not in ln
    ]


def test_spearman_broadcasts_quantity_ranks(spark, sf_dir):
    """The 50-row quantity rank frame broadcasts; the price-rank carry
    is an equi-join; one final moment aggregation — never a cartesian
    or a fact self-join."""
    plan = _plan(
        workloads.QUERIES["spearman_corr_price_quantity"](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_anova_single_aggregation_no_join(spark, sf_dir):
    """One map-side-combinable groupBy over the fact, then literal-pivot
    arithmetic on the 5-row frame — no join anywhere."""
    plan = _plan(workloads.QUERIES["anova_f_value_by_type"](spark, sf_dir))
    assert "Join" not in plan
    assert len(_data_shuffles(plan)) <= 2, _data_shuffles(plan)


def test_gini_domain_frame_no_join(spark, sf_dir):
    """Customer rollup → |distinct revenue| domain frame → cumulative
    window → scalar: aggregations and one domain window only."""
    plan = _plan(
        workloads.QUERIES["gini_concentration_revenue"](spark, sf_dir)
    )
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_iqr_outliers_broadcast_stats(spark, sf_dir):
    """The 5-row quartile frame broadcasts back over the scan — never a
    sort-merge join of fact against stats."""
    plan = _plan(workloads.QUERIES["outlier_iqr_group"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_substitutes_one_scan_no_smj(spark, sf_dir):
    """Baskets gather once (materialized); candidates are the literal
    top-m cross (broadcast nested loop over 50-row frames is the
    DESIGN); observed counts and the basket total broadcast back —
    never a fact self-join."""
    plan = _plan(
        workloads.QUERIES["market_basket_substitutes"](spark, sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan
    assert "SortMergeJoin" not in plan
    assert "Scan ExistingRDD" in plan


def test_concurrent_peak_day_partitioned_sweep(spark, sf_dir):
    """The endpoint sweep window partitions by DAY — no unpartitioned
    (single-task) running sum over all endpoints."""
    plan = _plan(
        workloads.QUERIES["sessions_concurrent_peak_daily"](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan.replace(
        "Exchange SinglePartition, EXECUTOR_BROADCAST", ""
    ), plan


def test_doc_length_deciles_no_builtin_ntile(spark, sf_dir):
    """The global length cut rides distributed_ntile — never a bare
    single-partition ntile window."""
    plan = _plan(
        workloads.QUERIES["doc_length_deciles_by_source"](spark, sf_dir)
    )
    assert "ntile" not in plan, plan


def test_lorenz_deciles_no_builtin_ntile(spark, sf_dir):
    """Same contract for the Lorenz cut; the cumulative-share window
    runs on the 10-row decile frame only."""
    plan = _plan(workloads.QUERIES["lorenz_deciles_revenue"](spark, sf_dir))
    assert "ntile" not in plan, plan


def test_ab_ztest_single_rollup(spark, sf_dir):
    """One user-day aggregation, one 1-row conditional rollup — no
    join."""
    plan = _plan(
        workloads.QUERIES["ab_test_proportions_ztest"](spark, sf_dir)
    )
    assert "Join" not in plan
    assert len(_data_shuffles(plan)) <= 2, _data_shuffles(plan)


def test_token_coverage_materializes_rank_frame(spark, sf_dir):
    """The scalar coverage frame materializes ONCE before the 3-row
    literal unpivot (an un-checkpointed union would replay the
    tokenize + rank pipeline per row)."""
    plan = _plan(workloads.QUERIES["token_coverage_topk"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_surrogate_key_islands_rank_is_distributed(spark, sf_dir):
    """The r12 gaps-islands audit ranks an ENTITY-growing key frame —
    must ride distributed_rank, never a bare row_number: no row_number
    in the plan, every surviving Window is the _dnt_pid offsets cumsum,
    at most one SinglePartition exchange."""
    plan = _plan(
        workloads.QUERIES["surrogate_key_gap_islands"](spark, sf_dir)
    )
    assert "row_number" not in plan, plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert all("_dnt_pid" in ln for ln in win_lines), win_lines
    # two legitimate SinglePartition exchanges: the metadata-sized
    # offsets cumsum AND the final 1-row scalar rollup (both fed by
    # partial aggregates, never by the data frame)
    assert plan.count("Exchange SinglePartition") <= 2, plan


def test_token_coverage_rank_is_distributed(spark, sf_dir):
    """VERDICT r11 item 2: the |vocab| frame is corpus-growing under
    Heaps' law, NOT a value-bounded domain — the head-token rank must
    ride windows.distributed_rank (range exchange + broadcast
    per-partition offsets), never a bare unpartitioned row_number that
    funnels every distinct type through one task.  Pinned: no
    row_number in the plan (rank is offset+local-index arithmetic),
    every surviving Window is the metadata-sized _dnt_pid offsets
    cumsum, at most ONE SinglePartition exchange."""
    plan = _plan(workloads.QUERIES["token_coverage_topk"](spark, sf_dir))
    assert "row_number" not in plan, plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert all("_dnt_pid" in ln for ln in win_lines), win_lines
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_acf_lag_join_on_tiny_daily_frame(spark, sf_dir):
    """The lag self-join runs on the materialized |days| frame (never
    the fact); the moment frame broadcasts."""
    plan = _plan(workloads.QUERIES["acf_daily_revenue"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_burstiness_one_window_one_rollup(spark, sf_dir):
    """One event_type-keyed lag window + one map-side-combinable moment
    aggregation — no join."""
    plan = _plan(workloads.QUERIES["interarrival_burstiness"](spark, sf_dir))
    assert "Join" not in plan
    assert len(_data_shuffles(plan)) <= 2, _data_shuffles(plan)


def test_mix_drift_pivot_no_join(spark, sf_dir):
    """(month, priority) aggregation → literal pivot → 1-row global mix
    broadcast: no sort-merge join, no cartesian beyond the broadcast
    1-row frame."""
    plan = _plan(workloads.QUERIES["mix_drift_monthly_chi2"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_trailing_rate_window_on_days_domain(spark, sf_dir):
    """The ROWS window runs over the |days| domain frame AFTER the day
    aggregation — the fact never enters a window."""
    plan = _plan(
        workloads.QUERIES["trailing_7d_purchase_rate"](spark, sf_dir)
    )
    assert plan.count("Window") >= 1
    # the window's input is the aggregated frame: exactly one hash
    # aggregate pair sits below it (no window directly over the scan)
    assert "CartesianProduct" not in plan


def test_clustering_coefficient_single_edge_materialization(
    spark, sf_dir
):
    """Edges materialize once and feed the triangle operator AND the
    degree count; the wedge total broadcasts."""
    plan = _plan(
        workloads.QUERIES["graph_clustering_coefficient"](spark, sf_dir)
    )
    assert "Scan ExistingRDD" in plan
    assert plan.count("Scan parquet") <= 1, plan
    assert "CartesianProduct" not in plan


def test_numeric_density_map_side_rollup(spark, sf_dir):
    """Tokenize + digit test are map-side; one source rollup — at most
    one data Exchange, no join."""
    plan = _plan(
        workloads.QUERIES["text_numeric_density_by_source"](spark, sf_dir)
    )
    assert "Join" not in plan
    assert len(_data_shuffles(plan)) <= 1, _data_shuffles(plan)


def test_cross_source_matrix_no_fact_self_join(spark, sf_dir):
    """The pair join runs on the materialized |cluster x source| frame,
    never the documents fact: one parquet scan, cluster frame reused."""
    plan = _plan(
        workloads.QUERIES["dedup_cross_source_matrix"](spark, sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_fertility_and_packing_single_rollup(spark, sf_dir):
    """Both corpus readouts are map-side counters + one rollup — at
    most one data Exchange, no join."""
    for key in ("token_fertility_by_lang", "pack_efficiency_by_source"):
        plan = _plan(workloads.QUERIES[key](spark, sf_dir))
        assert "Join" not in plan, key
        assert len(_data_shuffles(plan)) <= 1, (key, _data_shuffles(plan))


def test_activation_effort_one_window_pass(spark, sf_dir):
    """Both anchor carries share the user window; one quantile rollup —
    no join."""
    plan = _plan(
        workloads.QUERIES["events_before_first_purchase"](spark, sf_dir)
    )
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_tenure_value_matrix_no_builtin_ntile(spark, sf_dir):
    """Both quartile cuts ride distributed_ntile (chained, the
    rfm_segments shape) — never a bare single-partition ntile."""
    plan = _plan(workloads.QUERIES["tenure_value_matrix"](spark, sf_dir))
    assert "ntile" not in plan, plan
    assert "SortMergeJoin" not in plan


def test_entry_exit_minby_no_session_sort(spark, sf_dir):
    """Entry/exit come from min_by/max_by extremum state (the OHLC
    idiom) — one aggregation after the sessionizer, no rank window over
    sessions."""
    plan = _plan(
        workloads.QUERIES["session_entry_exit_matrix"](spark, sf_dir)
    )
    assert "row_number" not in plan
    assert "CartesianProduct" not in plan


# --- round-9 second wave ------------------------------------------------


def test_single_pass_moment_tests_no_join(spark, sf_dir):
    """Welch t and Cramér's V are each ONE conditional-moment
    aggregation to a single row — no join, no window, and only the
    partial→final aggregate exchange."""
    for key in ("welch_ttest_price_by_flag", "cramers_v_flag_status"):
        plan = _plan(workloads.QUERIES[key](spark, sf_dir))
        assert "Join" not in plan, key
        assert "Window" not in plan, key
        assert len(_data_shuffles(plan)) <= 1, (key, _data_shuffles(plan))


def test_kruskal_wallis_domain_frame_rank_carry(spark, sf_dir):
    """Ranks come from the |distinct cents| domain frame; the carry
    back onto the fact is an equi-join (never cartesian); the 5-group
    readout is a literal pivot (no per-group join fan-out)."""
    plan = _plan(
        workloads.QUERIES["kruskal_wallis_value_by_type"](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "ntile" not in plan


def test_mann_kendall_pairs_on_date_domain_only(spark, sf_dir):
    """The quadratic sign join runs on the checkpointed |days| domain
    frame (broadcast nested-loop by design — both sides are
    calendar-sized), NEVER on the fact: one parquet scan total."""
    plan = _plan(
        workloads.QUERIES["mann_kendall_trend_daily"](spark, sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_crosscorr_lag_join_on_daily_frame(spark, sf_dir):
    """The 8-lag alignment self-join reads the materialized daily frame
    (the ACF shape): one parquet scan, reuse via the checkpoint."""
    plan = _plan(
        workloads.QUERIES["crosscorr_revenue_volume"](spark, sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_rsi_windows_after_day_aggregation(spark, sf_dir):
    """Diff/rolling windows run over the |days| domain frame AFTER the
    day aggregation — the fact never enters a window; no join."""
    plan = _plan(workloads.QUERIES["rsi_14d_daily"](spark, sf_dir))
    assert "Join" not in plan
    assert len(_data_shuffles(plan)) <= 2, _data_shuffles(plan)


def test_changepoint_takeordered_never_global_sort(spark, sf_dir):
    """The argmax is TakeOrderedAndProject(1) over the |days| score
    frame; the daily aggregation materializes once for both the prefix
    window and the global total."""
    plan = _plan(
        workloads.QUERIES["changepoint_mean_shift_daily"](spark, sf_dir)
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan


def test_hellinger_pivot_no_sort_merge_join(spark, sf_dir):
    """(month, priority) aggregation → literal pivot → 1-row global
    mix broadcast — the mix_drift plan with a sqrt readout."""
    plan = _plan(
        workloads.QUERIES["hellinger_drift_monthly"](spark, sf_dir)
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_single_gram_materialization(spark, sf_dir):
    """The trigram frame materializes once (first-claimant build and
    scoring both read the checkpoint); the claimant carry is an
    equi-join — never cartesian."""
    plan = _plan(
        workloads.QUERIES["ngram_novelty_by_source"](spark, sf_dir)
    )
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vocab_growth_distributed_ntile_broadcast_cut(spark, sf_dir):
    """The decile cut rides distributed_ntile (no bare ntile window);
    the 10-row cut map reaches both token rollups as broadcasts."""
    plan = _plan(workloads.QUERIES["vocab_growth_deciles"](spark, sf_dir))
    assert "ntile" not in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_broadcast_centroids_one_scan(spark, sf_dir):
    """The k=8 centroid frame broadcasts into a nested-loop assign
    stage (k-bounded map work, never a shuffle); the quantized fact
    materializes once for seeding, assignment, and recompute."""
    plan = _plan(
        workloads.QUERIES["kmeans_assign_recompute"](spark, sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_norm_outliers_single_fold_broadcast_moments(spark, sf_dir):
    """The 64-dim fold runs once (checkpointed 3-column norm frame);
    the |labels|-row moment frame broadcasts back — no sort-merge
    join, one parquet scan."""
    plan = _plan(
        workloads.QUERIES["embedding_norm_outliers"](spark, sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_retail_economics_broadcast_part_dim(spark, sf_dir):
    """Both brand readouts broadcast the part dimension into the fact
    aggregation — never a sort-merge join on the fact."""
    for key in ("arc_elasticity_monthly_brand", "demand_variability_xyz"):
        plan = _plan(workloads.QUERIES[key](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, key
        assert "SortMergeJoin" not in plan, key
        assert "CartesianProduct" not in plan, key


def test_scd2_point_in_time_equi_join(spark, sf_dir):
    """The AS OF read is an equi-join on the dimension key with the
    interval predicate as a residual — never a range-only theta join
    (no cartesian, no BNLJ); the dim broadcasts."""
    plan = _plan(
        workloads.QUERIES["scd2_point_in_time_join"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_theil_sen_pairs_on_date_domain_only(spark, sf_dir):
    """The pairwise slope join runs on the checkpointed |days| frame
    (the Mann-Kendall regime): one parquet scan total."""
    plan = _plan(workloads.QUERIES["theil_sen_slope_daily"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_knn_geo_window_group_limit(spark, sf_dir):
    """Grid equi-join candidates, then the k=3 cut pushes below the
    per-probe sort (WindowGroupLimit) — no probe's candidate list
    fully materializes; never cartesian. (The only nested-loop in the
    plan is grid_radius_join's 9-row literal offsets explode — a
    broadcast of a constant frame, same as geo_radius_join.)"""
    plan = _plan(workloads.QUERIES["knn_geo_topk"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the cell-id candidate equi-join


def test_seasonal_strength_single_pivot(spark, sf_dir):
    """Day aggregation then ONE single-row pivot aggregation — no join,
    no window."""
    plan = _plan(workloads.QUERIES["seasonal_strength_dow"](spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan
    assert len(_data_shuffles(plan)) <= 2, _data_shuffles(plan)


def test_runs_test_windows_on_daily_domain(spark, sf_dir):
    """Diff/lag windows run over the |days| domain frame after the day
    aggregation; one single-row rollup; no join."""
    plan = _plan(workloads.QUERIES["runs_test_daily"](spark, sf_dir))
    assert "Join" not in plan
    assert len(_data_shuffles(plan)) <= 2, _data_shuffles(plan)


def test_max_drawdown_takeordered(spark, sf_dir):
    """Prefix-sum + running-max share one window sort; the argmax is
    TakeOrderedAndProject(1) — never a global sort of the fact."""
    plan = _plan(workloads.QUERIES["max_drawdown_daily"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan
    assert plan.count("Window") <= 2


def test_durbin_watson_broadcast_coefficients(spark, sf_dir):
    """The 1-row OLS coefficient frame broadcasts back over the daily
    frame (checkpointed once); one parquet scan."""
    plan = _plan(workloads.QUERIES["durbin_watson_daily"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 1, plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_burstiness_vmr_vocabulary_rollup(spark, sf_dir):
    """(term, doc) aggregation → |vocab| rollup → 1-row doc total
    broadcast: no sort-merge join, no cartesian beyond the 1-row
    broadcast."""
    plan = _plan(workloads.QUERIES["term_burstiness_vmr"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_nearest_two_window_passes_no_theta(spark, sf_dir):
    """Each direction is the union + last_value window asof machinery;
    alignment is an equi-join on the purchase id — never a theta join
    over the touches x purchases pair space."""
    plan = _plan(workloads.QUERIES["join_asof_nearest"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim_histogram_blocked_pair_join(spark, sf_dir):
    """Pair generation is an equi-join on the label (the coarse-cell
    posture) over the checkpointed quantized frame — never cartesian;
    one |bins| rollup."""
    plan = _plan(
        workloads.QUERIES["embedding_sim_histogram_intra_label"](
            spark, sf_dir
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan
    assert plan.count("Scan parquet") <= 1, plan


def test_hourly_profile_cell_bounded_rollup(spark, sf_dir):
    """Map-side (dow, hour) extraction, one 168-cell-bounded rollup,
    1-row total broadcast — no sort-merge join."""
    plan = _plan(workloads.QUERIES["hourly_load_profile"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_safety_stock_broadcast_part_dim(spark, sf_dir):
    """The part dimension broadcasts into the (brand, day) fact
    aggregation — never a sort-merge join on the fact."""
    plan = _plan(
        workloads.QUERIES["safety_stock_reorder_point"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dwell_time_single_user_window(spark, sf_dir):
    """ONE user-keyed window shuffle then a |types| rollup — no join."""
    plan = _plan(workloads.QUERIES["dwell_time_by_type"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window") == 1


# --- round-10 scale claims ---------------------------------------------------


def test_theil_sen_rank_is_distributed(spark, sf_dir):
    """SCALE.md r10: the theil-sen median selection rides
    windows.distributed_rank — the plan carries the RANGE exchange (the
    one data shuffle of the rank) and at most ONE SinglePartition
    exchange (the metadata-sized per-partition-count cumsum), never a
    global row_number window over the pair frame."""
    plan = _plan(workloads.QUERIES["theil_sen_slope_daily"](spark, sf_dir))
    # the range exchange lives INSIDE the materialize-once checkpoint
    # (plan shows the checkpointed ranged frame as an RDD scan); the
    # machinery's scratch partition-id column marks the distributed
    # rank, and the only SinglePartition exchange is the
    # partition-count cumsum (metadata-sized by construction)
    assert "_dnt_pid" in plan, plan
    # the pair frame itself never passes a global row_number window
    # (the pre-r10 form); the plan's SinglePartition exchanges are the
    # scalar rollups (n_days/n_pairs, the 2-row median min/max) and
    # the partition-count cumsum — aggregate state, not the pair frame
    assert "row_number" not in plan, plan


def test_systematic_sample_rank_is_distributed(spark, sf_dir):
    """Same contract for the sampling consumer of distributed_rank."""
    plan = _plan(
        workloads.QUERIES["systematic_sample_every_k"](spark, sf_dir)
    )
    assert "_dnt_pid" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_target_encode_fact_never_sort_merges(spark, sf_dir):
    """SCALE.md r10: LOO target encoding is one broadcast dim join +
    one broadcast stats join back — the fact side must never fall into
    a sort-merge join (only aggregate STATE shuffles, for the
    |brands|-row stats frame)."""
    plan = _plan(workloads.QUERIES["target_encode_loo_brand"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_silence_record_single_key_shuffle(spark, sf_dir):
    """SCALE.md r10: the lag and the strictly-earlier running max share
    ONE event_type partitioning — exactly one hash exchange in the
    whole plan."""
    plan = _plan(workloads.QUERIES["silence_record_alerts"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan, plan


# --- round-11 scale claims ----------------------------------------------------


def test_pareto_abc_cumsum_is_distributed(spark, sf_dir):
    """VERDICT r10 item 4: pareto_abc_parts was the last bare global
    window over an entity-growing (|parts|) frame.  It now rides
    windows.distributed_running_sum — the plan carries the machinery's
    scratch partition-id column, every Window over data rows is
    PARTITIONED by _dnt_pid (the unpartitioned ones are the
    ~#partitions-row offsets cumsum), and the grand total rides along
    so the old crossJoin'd 1-row total aggregate is gone."""
    plan = _plan(workloads.QUERIES["pareto_abc_parts"](spark, sf_dir))
    assert "_dnt_pid" in plan, plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert all("_dnt_pid" in ln for ln in win_lines), win_lines
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_abc_xyz_cumsum_is_distributed(spark, sf_dir):
    """The matrix's ABC spine must ride the same distributed_running_sum
    machinery as pareto_abc_parts: scratch pid column present, every
    data-frame Window partitioned by _dnt_pid, at most ONE
    SinglePartition exchange (the metadata-sized offsets cumsum)."""
    plan = _plan(workloads.QUERIES["abc_xyz_matrix"](spark, sf_dir))
    assert "_dnt_pid" in plan, plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert all("_dnt_pid" in ln for ln in win_lines), win_lines
    assert plan.count("Exchange SinglePartition") <= 1, plan
