#!/usr/bin/env python
"""Measured scaling evidence for the dedup/text stack (SCALE.md §6).

Amplifies the sf0.1 documents table Nx (doc_id remapped; a
copy-dependent suffix token on most copies keeps the near-dup structure
realistic instead of purely exact duplication) and times the headline
corpus operators at 1x / 10x / 100x. A near-linear wall-clock curve is
the local falsification test for the scale claims: an accidentally
quadratic pair generator or a driver-side bottleneck shows up as a
super-linear blow-up long before a real cluster would.

Usage: python scripts/scaling_probe.py [--scales 1,10,100]
Prints one JSON line: {"rows": {...}, "seconds": {op: {scale: sec}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from metadata_driven_etl_spark.catalog import load_table  # noqa: E402
from metadata_driven_etl_spark.operators import decontam as decontam_ops  # noqa: E402
from metadata_driven_etl_spark.operators import dedup as dedup_ops  # noqa: E402
from metadata_driven_etl_spark.operators import joins as join_ops  # noqa: E402
from metadata_driven_etl_spark.operators import merge as merge_ops  # noqa: E402
from metadata_driven_etl_spark.operators import similarity as sim_ops  # noqa: E402
from metadata_driven_etl_spark.operators import temporal as temporal_ops  # noqa: E402
from metadata_driven_etl_spark.operators import text as text_ops  # noqa: E402
from metadata_driven_etl_spark.session import get_local_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplify_events(spark, scale: int, out_dir: str) -> str:
    """Write an Nx events table: each copy is a fresh user population
    (user_id/event_id offset per copy, timestamps unchanged) — scaling
    the dimension the window/funnel/cohort ops actually partition by."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    copies = spark.range(scale).select(F.col("id").alias("_copy"))
    amplified = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("_copy") * F.lit(n_ev)).alias("event_id"),
        (F.col("user_id") + F.col("_copy") * F.lit(n_users)).alias("user_id"),
        "event_type",
        "ts",
        "value",
    )
    path = os.path.join(out_dir, f"events_x{scale}.parquet")
    amplified.repartition(max(32, scale)).write.mode("overwrite").parquet(path)
    return path


def amplify(spark, scale: int, out_dir: str) -> str:
    """Write an Nx documents table: doc_id remapped per copy, ~70% of
    copies carry a copy-specific suffix token (near-dups of the
    original), the rest stay exact duplicates."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n = docs.count()
    copies = spark.range(scale).select(F.col("id").alias("_copy"))
    amplified = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_copy") * F.lit(n)).alias("doc_id"),
            F.when(
                (F.col("_copy") > 0) & (F.col("doc_id") % 10 < 7),
                F.concat_ws(
                    " ", F.col("text"), F.concat(F.lit("copytag"), F.col("_copy"))
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    path = os.path.join(out_dir, f"documents_x{scale}.parquet")
    amplified.repartition(max(32, scale)).write.mode("overwrite").parquet(path)
    return path


def amplify_embeddings(spark, scale: int, out_dir: str) -> str:
    """Write an Nx embeddings table: vec_id offset per copy, and each
    copy gets its OWN block-label space (label + n_labels*copy) — block
    SIZE stays constant while block COUNT grows with the corpus, which
    is exactly the IVF-coarse-quantizer posture semantic_dedup documents
    for 100 TB (cells of bounded size, more cells as data grows). Keeping
    the original labels instead would grow every block Nx and make the
    within-block pair space quadratic — a quantizer misconfiguration,
    not a scale test."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n = emb.count()
    n_labels = emb.agg(F.max("label")).first()[0] + 1
    copies = spark.range(scale).select(F.col("id").alias("_copy"))
    amplified = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("_copy") * F.lit(n)).alias("vec_id"),
        "embedding",
        (F.col("label") + F.col("_copy") * F.lit(n_labels))
        .cast("int")
        .alias("label"),
    )
    path = os.path.join(out_dir, f"embeddings_x{scale}.parquet")
    amplified.repartition(max(32, scale)).write.mode("overwrite").parquet(path)
    return path


# Current amplified-table parquet path, set per scale in main() — lets an
# op load a SECOND scan of the same data where distinct lineage is
# required (interval_overlap_join's alias-ref contract).
_CURRENT_PATH: str | None = None




def _rake_probe(df: DataFrame) -> DataFrame:
    """keyword_rake_topk's shape over the amplified corpus — the SHARED
    operator (text.rake_keyphrase_scores), so the measured shape is the
    shipped shape."""
    return text_ops.rake_keyphrase_scores(
        df,
        stopwords=("a", "the", "and", "of", "to", "in", "is", "on"),
        max_phrase=6,
    ).orderBy(F.desc("rake_score"), "phrase").limit(50)


def _token_coverage_probe(df: DataFrame) -> DataFrame:
    """token_coverage_topk's shape: token counts -> distributed_rank
    over the corpus-growing |vocab| frame -> scalar coverage rollup."""
    from metadata_driven_etl_spark.operators import windows as window_ops

    tc = (
        df.select(F.explode(text_ops.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    r = window_ops.distributed_rank(tc, [F.desc("c"), F.asc("tok")], "rnk")
    return r.agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(
            F.when(F.col("rnk") <= 1000, F.col("c")).otherwise(0)
        ).alias("cov1000"),
    )


def _running_sum_zipf_probe(df: DataFrame) -> DataFrame:
    """distributed_running_sum over Zipf-mass cents: value ~ k^-1.1
    with k = doc_id mod 1_000_003 (+1), ordered cents DESC with the
    doc_id tie-break — the pareto/abc consumer shape where the head of
    the order carries most of the grand total."""
    from metadata_driven_etl_spark.operators import windows as window_ops

    base = df.select(
        "doc_id",
        F.floor(
            F.lit(1e12)
            / F.pow((F.col("doc_id") % 1_000_003 + 1).cast("double"), 1.1)
        )
        .cast("long")
        .alias("cents"),
    )
    out = window_ops.distributed_running_sum(
        base,
        [F.desc("cents"), F.asc("doc_id")],
        "cents",
        "cum_cents",
        total_col="total_cents",
    )
    # small rollup so the noop sink doesn't move |rows| wide rows
    return out.agg(
        F.max("cum_cents").alias("max_cum"),
        F.max("total_cents").alias("total"),
    )


def _gap_islands_probe(df: DataFrame) -> DataFrame:
    """surrogate_key_gap_islands' shape over the amplified event_id
    key space: distributed_rank, the key−rank island identity, one
    island-keyed aggregation, a scalar rollup."""
    from metadata_driven_etl_spark.operators import windows as window_ops

    k = df.select(F.col("event_id").alias("k"))
    r = window_ops.distributed_rank(k, [F.asc("k")], "rnk")
    isl = r.groupBy((F.col("k") - F.col("rnk")).alias("island")).agg(
        F.count(F.lit(1)).alias("ilen")
    )
    return isl.agg(
        F.count(F.lit(1)).alias("n_islands"), F.max("ilen").alias("mx")
    )


def _decontam_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """~1% of the amplified corpus acts as the eval suite — so the eval
    side GROWS with scale, which is exactly the regime that separates the
    exact path (broadcast grows with eval grams) from the Bloom path
    (bitmap constant-size)."""
    return (
        df.where(F.col("doc_id") % 101 != 0),
        df.where(F.col("doc_id") % 101 == 0),
    )


OPS = {
    "dedup_exact": lambda df: dedup_ops.exact_dedup_stats(df),
    # uncapped exact-candidate baseline (quadratic in duplicate mass)
    "dedup_minhash_lsh": lambda df: dedup_ops.lsh_candidate_pairs(
        df, max_bucket_size=None
    ),
    # production posture for heavily-duplicated corpora: bucket cap bounds
    # the inherently-quadratic pair output of degenerate buckets (this is
    # the SHIPPED DEFAULT since round 5 — dedup.DEFAULT_MAX_BUCKET_SIZE)
    "dedup_minhash_lsh_cap32": lambda df: dedup_ops.lsh_candidate_pairs(
        df, max_bucket_size=32
    ),
    "dedup_cluster_cc": lambda df: dedup_ops.connected_components(
        df.select("doc_id"), dedup_ops.lsh_candidate_pairs(df)
    ),
    "text_quality": lambda df: text_ops.quality_features(df),
    # the probe calls the SAME implementation the workload ships, so the
    # measured curve always describes the shipped operator
    "text_bigram_lm": lambda df: text_ops.bigram_lm_score(df),
    # KenLM-style model pruning floor: drops the singleton long tail from
    # the frequency model before the scoring join — the 100 TB posture
    # (model/build-side size bound by repeated-bigram mass, not corpus size)
    "text_bigram_lm_minfreq2": lambda df: text_ops.bigram_lm_score(
        df, min_freq=2
    ),
    "decontam_exact": lambda df: decontam_ops.ngram_overlap(
        *_decontam_split(df), n=4
    ),
    # 1 MiB bitmap (1<<23 bits) holds the 100x eval suite at ~7 bits/gram;
    # the broadcast stays constant-size while the exact path's gram-string
    # broadcast grows with the eval suite
    "decontam_bloom": lambda df: decontam_ops.ngram_overlap_bloom(
        *_decontam_split(df), n=4, num_bits=1 << 23, num_hashes=5
    ),
    # diff yesterday's corpus against a simulated today (2% deleted, 4%
    # edited, 2.5% inserted): ONE full-outer join on the id — linear
    "snapshot_diff": lambda df: merge_ops.snapshot_diff(
        df,
        df.where(F.col("doc_id") % 50 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 25 == 1, F.concat(F.col("text"), F.lit(" edit"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            df.where(F.col("doc_id") % 40 == 3).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000_000)
            )
        ),
        keys=["doc_id"],
    ),
    # bounded blocks (~12 docs via dense doc_id div): per-block pair cost
    # is constant, so the equi-join curve must stay linear in corpus size
    "linkage_levenshtein": lambda df: join_ops.blocked_levenshtein_pairs(
        df.select(
            "doc_id",
            F.substring("text", 1, 32).alias("name"),
            F.floor(F.col("doc_id") / 12).alias("blk"),
        ),
        id_col="doc_id",
        text_col="name",
        block_col="blk",
        max_dist=8,
    ),
    # exact all-pairs cosine with the SHIPPED absolute df cap (3-gram
    # shingle space, like the workload): as the corpus amplifies, terms
    # crossing max_df get pruned, so the pair space stays bounded by
    # max_df * |postings| — the absolute cap IS the scalable posture
    # (relativizing it to corpus size re-admits the quadratic, same
    # contract as the LSH bucket cap).
    "doc_cosine_df200": lambda df: text_ops.doc_cosine_pairs(
        df, max_df=200, min_cosine=0.5, shingle_n=3
    ),
    # exact prefix-filter set-similarity sweep at the near-dup threshold:
    # candidate count tracks duplicate MASS (copies share their rarest
    # shingles), so growth is quadratic in per-cluster copy count — which
    # is quadratic in the ANSWER (the copies ARE the near-dup pairs), the
    # same inherent-blow-up class as the uncapped LSH baseline.
    "jaccard_prefix_t07": lambda df: dedup_ops.jaccard_prefix_pairs(
        df, threshold=0.7
    ),
    # r11 (VERDICT r10 item 8): the dedup_threshold_curve shape — ONE
    # prefix-filter candidate pass at the LOOSEST shipped threshold
    # (0.5) plus the <=6-row band rollup.  Looser t admits shorter
    # prefixes (more postings per doc), so its constant sits above the
    # t=0.7 row; the curve class is the same duplicate-mass-quadratic
    # as jaccard_prefix_t07 (copies ARE pairs), measured here with its
    # OWN row instead of reasoning from the t=0.7 probe.
    "dedup_threshold_curve_t05": lambda df: dedup_ops.jaccard_prefix_pairs(
        df, threshold=0.5
    ).groupBy(
        F.floor(F.col("jaccard") * 10).cast("int").alias("sim_band")
    ).count(),
    # r12 (VERDICT r11 item 2): the token_coverage_topk shape after the
    # distributed_rank switch — token counts into the |vocab| frame
    # (which GROWS with the corpus: the amplifier's copy-dependent
    # suffix tokens add ~1 new type per copied doc, the Heaps'-law
    # stand-in), then the range-exchange rank + the coverage rollup.
    # The curve must stay near-linear; the bare row_number it replaced
    # funnels the whole vocab through one task (the 66.4s/26M shape,
    # theil_sen_windowrank row).
    "token_coverage_rank": lambda df: _token_coverage_probe(df),
    # r12 (VERDICT r11 item 7): distributed_running_sum under Zipf-
    # distributed MASS — cents ~ k^-1.1 over ~1M distinct ranks, so the
    # head rows carry most of the total and all land in the FIRST range
    # partition of the cents-DESC order.  repartitionByRange balances
    # ROW counts (sampled bounds over the (cents, doc_id) total order,
    # tie-broken so equal cents split across partitions); value mass
    # per partition is irrelevant to the exchange — the probe exists to
    # prove wall-clock stays linear anyway.
    "running_sum_zipf": lambda df: _running_sum_zipf_probe(df),
    # 3 fixed-point PageRank rounds over a degree-4 multiplicative-
    # permutation graph on the doc ids (|E| = 4|V|, in/out degree ~4):
    # per-round cost is one equi-join + one sum on |E| rows, so the
    # curve must stay linear in corpus size.
    "pagerank_3rounds": lambda df: _pagerank_probe(df),
    # degree-oriented triangle counting on the same degree-8 permutation
    # graph (symmetrized): wedge fan-out is bounded by outdeg^2 with
    # outdeg <= 8 here, so the curve must stay linear in |E| — a
    # super-linear curve would mean the orientation stopped bounding the
    # join (the thing the operator exists to guarantee).
    "triangles_permgraph": lambda df: _triangle_probe(df),
    # RA link prediction on the permutation graph: wedges generate only
    # through shared neighbors (deg <= cap), so candidate pairs grow
    # linearly with |V| at fixed degree.
    "ra_linkpredict_permgraph": lambda df: _ra_probe(df),
    # r8: multi-source BFS levels — frontier-join rounds, same graph
    "bfs_levels_permgraph": lambda df: _bfs_probe(df),
    # r9: dup-flow matrix — the amplifier's copies share 16-token
    # prefixes, so cluster SIZES grow ~Nx (quadratic pair MASS), but
    # counts are closed-form n_a*n_b / C(n,2) over the |cluster x
    # source| frame — cost must stay ~flat while the ANSWER's pair
    # count grows N^2 (the anti-uncapped-LSH demonstration).
    "cross_source_matrix": lambda df: _matrix_probe(df),
    # r7 positional phrase search: postings grow linearly with the
    # corpus and the phrase-token filter keeps the join input to the
    # two tokens' df — the curve must stay scan-linear.
    # r8: RAKE keyphrase extraction — islands window + phrase/word aggs
    "rake_keyphrases": lambda df: _rake_probe(df),
    "phrase_search_2tok": lambda df: text_ops.phrase_match_postings(
        df, ["table", "table"]
    ),
    # r9 second wave: trigram first-claimant novelty — occurrence rows
    # grow linearly; the |distinct grams| domain grows sublinearly
    # (copies share their originals' grams, +1 suffixed gram each), so
    # the curve must stay occurrence-linear like bigram_lm.
    "ngram_novelty": lambda df: _novelty_probe(df),
}


def _novelty_probe(df: DataFrame) -> DataFrame:
    """ngram_novelty_by_source's SHARED operator (text.trigram_novelty
    — the probe measures the shipped implementation); synthetic source
    = doc_id % 20 since the amplified table drops the source column."""
    per = text_ops.trigram_novelty(df, text_col="text", id_col="doc_id")
    return per.groupBy((F.col("doc_id") % 20).alias("source")).agg(
        F.sum("slots").alias("slots"), F.sum("novel").alias("novel")
    )


def _matrix_probe(df: DataFrame) -> DataFrame:
    """dedup_cross_source_matrix's SHARED operator (dedup.dup_flow_matrix
    — the probe measures the shipped implementation) over the amplified
    corpus: fingerprint = md5 of the 16-token prefix (shared across
    copies — the amplifier appends its copytag at the END), source
    synthesized as doc_id % 7."""
    from metadata_driven_etl_spark.operators.text import tokens

    d = df.select(
        F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, 16))).alias("fp"),
        (F.col("doc_id") % 7).alias("source"),
    )
    return dedup_ops.dup_flow_matrix(d, "fp", "source")


def _perm_edges(df: DataFrame) -> DataFrame:
    n = df.count()
    base = df.select("doc_id")
    edges = None
    for k in (3, 5, 7, 11):
        e = base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * k) % n).alias("dst"),
        )
        edges = e if edges is None else edges.union(e)
    return edges


def _triangle_probe(df: DataFrame) -> DataFrame:
    from metadata_driven_etl_spark.operators import graph as graph_ops

    return graph_ops.triangle_counts(_perm_edges(df))


def _ra_probe(df: DataFrame) -> DataFrame:
    from metadata_driven_etl_spark.operators import graph as graph_ops

    return graph_ops.resource_allocation_topk(_perm_edges(df), top_k=100)


def _bfs_probe(df: DataFrame) -> DataFrame:
    """bfs_levels_copurchase's shape on the degree-8 permutation graph:
    3 frontier-join rounds from ~|V|/211 seeds — frontier growth is the
    graph family's explosive axis (here bounded by |V|; real graphs
    bound it with the hub-degree caps)."""
    edges = _perm_edges(df).localCheckpoint(eager=False)
    frontier = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % 211 == 0)
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = frontier.withColumn("level", F.lit(0))
    out = [visited]
    for k in (1, 2, 3):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        lvl = nxt.withColumn("level", F.lit(k))
        out.append(lvl)
        visited = visited.unionByName(lvl)
        frontier = nxt
    res = out[0]
    for lvl in out[1:]:
        res = res.unionByName(lvl)
    return res


def _pagerank_probe(df: DataFrame) -> DataFrame:
    from metadata_driven_etl_spark.operators import graph as graph_ops

    n = df.count()
    base = df.select("doc_id")
    edges = None
    for k in (3, 5, 7, 11):
        e = base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * k) % n).alias("dst"),
        )
        edges = e if edges is None else edges.union(e)
    return graph_ops.pagerank_fixed_point(edges, iterations=3)


def _ivm_prep(df: DataFrame):
    """Snapshot pair + maintained aggregate for the IVM probe, all
    eagerly materialized OUTSIDE the timed region so the measured number
    is the maintenance (or rescan) cost alone. Groups are HIGH
    cardinality (~n/8) — the regime where a full re-aggregation must
    shuffle the whole corpus by group while delta maintenance shuffles
    only the ~6% changed rows. Change mix: 2% deleted, 4% edited, 2.5%
    inserted (same rates as the snapshot_diff probe)."""
    old = df.select(
        "doc_id",
        F.floor(F.col("doc_id") / 8).alias("g"),
        F.length("text").alias("v"),
    ).localCheckpoint(eager=True)
    new = (
        old.where(F.col("doc_id") % 50 != 0)
        .withColumn(
            "v",
            F.when(F.col("doc_id") % 25 == 1, F.col("v") + 1).otherwise(
                F.col("v")
            ),
        )
        .unionByName(
            old.where(F.col("doc_id") % 40 == 3).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000_000)
            )
        )
        .localCheckpoint(eager=True)
    )
    base = (
        old.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .localCheckpoint(eager=True)
    )
    return base, old, new


# Two-phase documents-table ops: prep(df) runs eagerly untimed; build(ctx)
# is the timed plan.  Used where the measured claim is about ONE phase
# (IVM: maintenance cost given existing snapshots/aggregate, vs the full
# rescan of the same new snapshot — the flat-in-corpus-size claim is
# delta maintenance vs re-aggregation at the same scale point).
TWO_PHASE_OPS = {
    "incremental_agg_maintain": {
        "prep": _ivm_prep,
        "build": lambda c: merge_ops.incremental_agg_update(
            c[0], c[1], c[2], keys=["doc_id"], group_keys=["g"],
            sum_cols={"sum_v": "v"},
        ),
    },
    "full_reaggregate": {
        "prep": _ivm_prep,
        "build": lambda c: c[2].groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
        ),
    },
}


def _intervals(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("start"),
        (F.unix_timestamp("ts") + 900).alias("end"),
    )


def _interval_overlap(df: DataFrame, bin_width: int) -> DataFrame:
    # second side re-scanned from parquet: interval_overlap_join requires
    # distinct lineage (see its docstring / ADVICE r5)
    other = df.sparkSession.read.parquet(_CURRENT_PATH)
    pairs = temporal_ops.interval_overlap_join(
        _intervals(df),
        _intervals(other),
        keys=["user_id"],
        start_col="start",
        end_col="end",
        bin_width=bin_width,
    )
    return pairs.filter(F.col("l.event_id") < F.col("r.event_id")).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("ea"),
        F.col("r.event_id").alias("eb"),
    )


# events-table ops (--table events): user-partitioned window shapes
EVENT_OPS = {
    "funnel_steps": lambda df: temporal_ops.funnel_steps(
        df, steps=("view", "click", "purchase"), window="30 minutes"
    ),
    # r11: the new distributed_running_sum machinery (pareto/abc_xyz's
    # cumulative-revenue spine) measured directly on the amplified
    # event frame: global inclusive cumsum over (cents desc, event_id)
    # — the range exchange + pid-partitioned local fold must stay
    # linear; a super-linear curve would mean the fold funneled into
    # one task (the exact failure the operator exists to prevent).
    "distributed_running_sum": lambda df: _running_sum_probe(df),
    # r12: the surrogate_key_gap_islands shape on the amplified
    # event_id key space (keys grow Nx; the amplifier's per-copy
    # offsets leave inter-copy gaps, so islands exist at every scale):
    # distributed_rank + the island groupBy must stay linear — island
    # ids inherit the key distribution, so no hot groups.
    "gap_islands_keys": lambda df: _gap_islands_probe(df),
    "cohort_retention": lambda df: temporal_ops.cohort_retention(df),
    # interval-overlap join, 15-min event windows keyed by user.
    # bin_width sensitivity: = span (each row explodes to ~2 bins, the
    # documented sweet spot) vs span/10 (~11 bins/row — the cost of
    # misconfiguring bin_width an order of magnitude too fine).
    "interval_overlap_bin900": lambda df: _interval_overlap(df, 900),
    "interval_overlap_bin90": lambda df: _interval_overlap(df, 90),
    # r7 timeseries family: both partition by (event_type, day) — the
    # amplified copies share timestamps, so GROUP SIZE grows Nx while
    # group count stays fixed (the hot-bar stress, not the many-bar one)
    "ohlc_bars_daily": lambda df: temporal_ops.ohlc_bars(
        _cents_events(df), ["event_type", "day"], "ts", "cents",
        ("event_id",),
    ),
    "twap_daily": lambda df: temporal_ops.twap(
        _cents_events(df), ["event_type", "day"], "ts", "cents",
        ("event_id",),
    ),
    # r7: user-partitioned ops — amplification adds USERS, the dimension
    # these shuffle on (linear is the expectation)
    "attribution_last_touch": lambda df: _attribution_probe(df),
    "clamped_running_sum": lambda df: _clamp_probe(df),
    # r7 spatial join: points from user-id LCG scatter — user growth
    # grows point DENSITY at fixed grid, so the 9-cell candidate volume
    # per probe grows linearly with the corpus (the honest stress)
    "geo_radius_join": lambda df: _geo_probe(df),
    # r7 materialized-path rollup on user ids: ≤7× explode + one groupBy
    "hierarchy_rollup": lambda df: _hierarchy_probe(df),
    # --- r8 stats-family probes (VERDICT r7 item 6): the exact plan
    # shapes of weighted_median / skyline / survival / cuped /
    # rfm_segments, re-derived over the amplified events table (user =
    # unit/customer, value-cents = money) so the growth curves measure
    # the workloads' shapes on the dimension amplification scales ---
    "weighted_median_shape": lambda df: _wmedian_probe(df),
    "skyline_2d_shape": lambda df: _skyline_probe(df),
    "survival_life_shape": lambda df: _survival_probe(df),
    "cuped_shape": lambda df: _cuped_probe(df),
    "rfm_distributed_ntile": lambda df: _rfm_probe(df),
    # r8 batch-3/4 shapes
    "rolling_zscore_w100": lambda df: _zscore_probe(df),
    "session_funnel": lambda df: _session_funnel_probe(df),
    # --- r9 probes (VERDICT r8 item 2) ---
    # dau_mau_stickiness's shape: the 30x map-side user-day explode is
    # the expansion term — amplification grows USER-DAYS Nx, so the
    # curve must stay linear with a ~30x constant vs the explode-free
    # DAU baseline below.
    "dau_mau_stickiness": lambda df: temporal_ops.stickiness_daily(
        df, window_days=30
    ),
    # explode-free baseline: same dedup + per-day count, no coverage
    # explode — the wall-clock DELTA vs dau_mau_stickiness measures what
    # the 30x expansion actually costs.
    "dau_daily_only": lambda df: (
        df.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    ),
    # assoc_rules' pair space vs the basket-size cap (the LSH-cap-row
    # analogue): baskets are (user, day) — constant size, count grows Nx
    # — EXCEPT 15 degenerate baskets that merge one original user's
    # events across ALL copies, so their size grows ~66N. Uncapped, the
    # degens contribute a quadratic pair space (the blow-up the cap
    # exists to bound); at the shipped DEFAULT cap=1024 they drop out
    # once size > 1024 and the curve returns to basket-count-linear.
    "assoc_rules_uncapped": lambda df: _assoc_probe(df, None),
    "assoc_rules_cap1024": lambda df: _assoc_probe(df, 1024),
    # r9: tie-aware Spearman shape — |distinct x| domain frame grows
    # with the corpus (value cents), rank-carry join back onto the
    # fact; expectation linear (domain window is single-partition but
    # narrow: 2 longs per distinct value).
    "spearman_shape": lambda df: _spearman_probe(df),
    # r9: concurrent-session peak — sessionizer + per-DAY endpoint
    # sweep; users grow 100x, day count fixed, so the sweep partitions
    # grow 100x in SIZE (the hot-partition stress for the running sum).
    "concurrent_peak": lambda df: _concurrent_probe(df),
    # r9 second wave: Mann-Kendall — the pairwise sign join is
    # quadratic in the DATE DOMAIN only (copies share timestamps, so
    # |days| is FIXED while fact rows grow 100x); the curve must track
    # the daily aggregation's linear scan, with the |days|² sign stage
    # a constant tail.
    "mann_kendall_shape": lambda df: _mann_kendall_probe(df),
    # r10 (VERDICT r9 item 7): theil-sen's median-of-pairwise-slopes —
    # here each copy CONTRIBUTES ITS OWN CALENDAR STRETCH (copy-offset
    # HOUR index: the sf0.1 events table spans only 30 days, so hour
    # grain stands in for the multi-year daily domain), so the time
    # domain grows Nx and the pair frame N²x: 1x = 720 points ≈ 259k
    # pairs (well under the documented 3k-day regime), 10x = 7200
    # points ≈ 26M pairs (~6× OVER it). Run with --scales 1,10. Two
    # forms: the SHIPPED distributed_rank median selection vs the
    # former bare global row_number window (single-partition sort of
    # the whole pair frame) — the delta is the number the switch is
    # built on.
    "theil_sen_distrank": lambda df: _theil_sen_probe(df, distributed=True),
    "theil_sen_windowrank": lambda df: _theil_sen_probe(
        df, distributed=False
    ),
    # r10 wave 2: growth accounting — the distinct (user, month) frame
    # and its (u, mi±1) self-joins grow linearly with users (the
    # amplified dimension); expectation linear.
    "growth_accounting": lambda df: _growth_probe(df),
    # r10 wave 4: linear-interp gap fill — grid explode + two
    # ignore-nulls carries partitioned by event_type (5 keys share the
    # calendar, so the per-key grid is FIXED while observed rows grow;
    # the carry windows run over the constant-size grid frame —
    # expectation flat once the daily aggregation saturates).
    "linear_interp_daily": lambda df: _interp_probe(df),
}


def _growth_probe(df: DataFrame) -> DataFrame:
    """growth_accounting_monthly's SHARED operator
    (temporal.growth_accounting — the probe measures the shipped
    implementation) on the amplified events table — users grow Nx,
    months fixed."""
    return temporal_ops.growth_accounting(df, epoch_year=2024)


def _interp_probe(df: DataFrame) -> DataFrame:
    """resample_linear_interp_daily's SHARED operator over the amplified
    events table (the probe measures the shipped implementation):
    sparse observed frame synthesized by keeping ~1/3 of (type, day)
    cells, so every scale point has real gaps to interpolate."""
    obs = (
        df.groupBy(
            F.col("event_type").alias("k"),
            F.to_date("ts").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).alias("v")
        )
        .where(F.dayofmonth("day") % 3 == 0)
    )
    return temporal_ops.resample_linear_interp(
        obs, keys=["k"], day_col="day", value_col="v"
    )


def _theil_sen_probe(df: DataFrame, distributed: bool) -> DataFrame:
    """theil_sen_slope_daily's shape with a copy-expanded time domain:
    per-period frame keyed by copy*100000 + hour-index (|periods| grows
    Nx), broadcast pair join, then median-by-rank — via the SHIPPED
    windows.distributed_rank or the former single-partition window."""
    from pyspark.sql import Window

    from metadata_driven_etl_spark.operators.windows import distributed_rank

    copy = (F.col("user_id") / 1500).cast("long")  # amplifier offset
    hour_ix = F.floor(
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
        )
        / 3600
    ).cast("long")
    daily = (
        df.groupBy((copy * 100_000 + hour_ix).alias("idx"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).alias("x")
        )
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("idx").alias("ia"), F.col("x").alias("xa"))
    b = daily.select(F.col("idx").alias("ib"), F.col("x").alias("xb"))
    p = a.join(F.broadcast(b), F.col("ib") > F.col("ia")).select(
        "ia", "ib",
        (
            (F.col("xb") - F.col("xa")).cast("double")
            / (F.col("ib") - F.col("ia")).cast("double")
        ).alias("slope"),
    )
    if distributed:
        r = distributed_rank(
            p,
            [F.col("slope").asc(), F.col("ia").asc(), F.col("ib").asc()],
            "rn",
            total_col="n_tot",
        )
    else:
        g = p.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
        r = p.select(
            "slope", "ia", "ib",
            F.row_number()
            .over(Window.orderBy("slope", "ia", "ib"))
            .alias("rn"),
        ).crossJoin(F.broadcast(g))
    return r.where(
        (F.col("rn") == F.floor((F.col("n_tot") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n_tot") + 2) / 2))
    ).agg(
        ((F.min("slope") + F.max("slope")) / 2.0).alias("sen_slope_cents")
    )


def _mann_kendall_probe(df: DataFrame) -> DataFrame:
    """mann_kendall_trend_daily's shape on an amplified events table:
    one fact aggregation to |days| (linear term), then the |days|²
    broadcast sign join on the checkpointed domain frame (constant
    term — timestamps are shared across copies)."""
    daily = (
        _cents_events(df)
        .groupBy("day")
        .agg(F.sum("cents").alias("x"))
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    return a.join(F.broadcast(b), F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("xb") > F.col("xa"), 1)
            .when(F.col("xb") < F.col("xa"), -1)
            .otherwise(0)
        ).alias("s_stat")
    )


def _spearman_probe(df: DataFrame) -> DataFrame:
    """spearman_corr_price_quantity's exact shape over the events table
    (x = value cents — distinct count grows with the corpus; y = a
    7-bucket hash — the broadcast side)."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    f = df.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x"),
        (F.col("user_id") % 7).cast("long").alias("y"),
    )

    def ranks(col, out):
        d = f.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return d.select(
            col, (2 * F.sum("c").over(w) - F.col("c") + 1).alias(out)
        )

    j = f.join(ranks("x", "u"), "x").join(F.broadcast(ranks("y", "v")), "y")
    s = j.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("u").cast(d38)).cast(d38).alias("su"),
        F.sum(F.col("v").cast(d38)).cast(d38).alias("sv"),
        F.sum((F.col("u").cast(d38) * F.col("v")).cast(d38)).cast(d38).alias("suv"),
        F.sum((F.col("u").cast(d38) * F.col("u")).cast(d38)).cast(d38).alias("suu"),
        F.sum((F.col("v").cast(d38) * F.col("v")).cast(d38)).cast(d38).alias("svv"),
    )
    num = (F.col("n") * F.col("suv") - F.col("su") * F.col("sv")).cast(d38)
    d1 = (F.col("n") * F.col("suu") - F.col("su") * F.col("su")).cast(d38)
    d2 = (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")).cast(d38)
    return s.select(
        (num.cast("double") / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double")))).alias("rho")
    )


def _concurrent_probe(df: DataFrame) -> DataFrame:
    """sessions_concurrent_peak_daily's SHARED operator
    (temporal.concurrent_session_peaks — the probe measures the shipped
    implementation); day partitions grow 100x in size here."""
    return temporal_ops.concurrent_session_peaks(df, gap_seconds=1800)


def _assoc_probe(df: DataFrame, cap: int | None) -> DataFrame:
    from metadata_driven_etl_spark.operators import cooccur as cooccur_ops

    orig_uid = F.col("user_id") % 1500  # amplify_events offsets by 1500
    bkey = F.when(
        orig_uid < 15,
        F.concat(F.lit("degen_"), orig_uid.cast("string")),
    ).otherwise(
        F.concat_ws("#", F.col("user_id"), F.to_date("ts").cast("string"))
    )
    baskets = df.select(
        bkey.alias("basket"), (F.col("event_id") % 4999).alias("item")
    )
    return cooccur_ops.assoc_rules(
        baskets, "basket", "item", max_basket_size=cap, min_support=2
    )


def _wmedian_probe(df: DataFrame) -> DataFrame:
    """weighted_median_price_by_flag's KS-domain shape: one map-side
    groupBy into the |group x distinct cents| frame, cum/tot windows
    partitioned by group, conditional-min rollup."""
    from pyspark.sql import Window

    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    d = df.groupBy(
        F.col("event_type").alias("g"), cents.alias("cents")
    ).agg(F.count(F.lit(1)).alias("w"))
    wc = Window.partitionBy("g").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("g")
    c = d.select(
        "g", "cents",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("tot"),
    )
    return c.groupBy("g").agg(
        F.min(
            F.when(2 * F.col("cum") >= F.col("tot"), F.col("cents"))
        ).alias("wmedian_cents"),
        F.min("tot").alias("total_weight"),
    )


def _skyline_probe(df: DataFrame) -> DataFrame:
    """skyline_price_quantity's prefix-max rewrite over the
    |distinct cents| domain frame."""
    from pyspark.sql import Window

    d = df.groupBy(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("p")
    ).agg(F.max((F.col("user_id") % 1000).cast("long")).alias("q"))
    wb = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    s = d.withColumn("best_before", F.max("q").over(wb))
    return s.filter(
        F.col("best_before").isNull() | (F.col("q") > F.col("best_before"))
    ).select("p", "q")


def _survival_probe(df: DataFrame) -> DataFrame:
    """survival_life_table's shape: per-unit durations -> |distinct t|
    domain frame -> reverse-cumulative risk set + broadcast total."""
    from pyspark.sql import Window

    per_unit = df.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("long")
        .alias("t"),
        (F.max("user_id") % 4 != 0).cast("long").alias("e"),
    )
    pv = (
        per_unit.groupBy("t")
        .agg(
            F.sum("e").alias("d"),
            F.sum(F.lit(1) - F.col("e")).alias("c"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .localCheckpoint(eager=False)
    )
    tot = pv.agg(F.sum("cnt").alias("n"))
    wb = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    lt = pv.select(
        "t", "d", "c",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("before_t"),
    )
    n_risk = F.col("n") - F.col("before_t")
    return lt.crossJoin(F.broadcast(tot)).select(
        "t", "d", "c", n_risk.alias("n_at_risk"),
        (
            (n_risk - F.col("d")).cast("double") / n_risk.cast("double")
        ).alias("km_factor"),
    )


def _cuped_probe(df: DataFrame) -> DataFrame:
    """cuped_adjusted_spend's shape: one unit aggregation materialized
    once, exact decimal global moments + per-variant sums, 1-row
    broadcast back."""
    d38 = "decimal(38,0)"
    u = (
        df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).alias("y"),
        )
        .withColumn("variant", (F.col("user_id") % 2).cast("int"))
        .localCheckpoint(eager=False)
    )
    g = u.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("tx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("ty"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("x").alias("tx_g"),
        F.sum("y").alias("ty_g"),
    )
    theta = (
        (F.col("n") * F.col("sxy") - F.col("tx") * F.col("ty"))
        .cast(d38).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("tx") * F.col("tx"))
        .cast(d38).cast("double")
    )
    raw_mean = F.col("ty_g").cast("double") / F.col("n_units").cast("double")
    adj = raw_mean - theta * (
        F.col("tx_g").cast("double") / F.col("n_units").cast("double")
        - F.col("tx").cast("double") / F.col("n").cast("double")
    )
    return v.crossJoin(F.broadcast(g)).select(
        "variant", "n_units", raw_mean.alias("raw_mean"),
        adj.alias("adj_mean"),
    )


def _rfm_probe(df: DataFrame) -> DataFrame:
    """rfm_segments' post-r8 shape: per-unit RFM summary, then THREE
    windows.distributed_ntile quintiles (range shuffle + broadcast
    offsets each — no single-partition data exchange) and the segment
    rollup. The probe measures the distributed-ntile chain growing with
    |units| — exactly the axis the old bare-ntile form could not scale."""
    from metadata_driven_etl_spark.operators.windows import distributed_ntile

    u = df.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_d"),
        F.count(F.lit(1)).alias("f"),
        F.sum(
            F.floor(F.col("value") * 100 + 0.5).cast("long")
        ).alias("m"),
    ).localCheckpoint(eager=False)
    a = u.agg(F.max("last_d").alias("anchor"))
    r = u.crossJoin(F.broadcast(a)).select(
        "user_id", "f", "m",
        F.datediff(F.col("anchor"), F.col("last_d")).cast("long").alias("rd"),
    )
    q = distributed_ntile(
        r, 5, [F.col("rd").desc(), F.col("user_id").asc()], "r_q"
    )
    q = distributed_ntile(
        q, 5, [F.col("f").asc(), F.col("user_id").asc()], "f_q"
    )
    q = distributed_ntile(
        q, 5, [F.col("m").asc(), F.col("user_id").asc()], "m_q"
    )
    return q.groupBy(
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("int")
        .alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m").alias("total_cents"),
    )




def _zscore_probe(df: DataFrame) -> DataFrame:
    """window_rolling_zscore's shape: trailing-100-row exact moments per
    event_type, alert filter map-side. Amplified copies share the five
    event types, so PARTITION SIZE grows 100x — the stress axis for the
    sliding-frame accumulator."""
    from pyspark.sql import Window

    x = F.floor(F.col("value") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-99, 0)
    )
    m = df.select("event_type", "event_id", "ts", x.alias("x")).select(
        "event_type", "event_id", "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    z = (
        (F.col("n") * F.col("x") - F.col("s")).cast("double")
        / F.sqrt(var_num.cast("double"))
    )
    return (
        m.filter(var_num > 0)
        .select("event_type", "event_id", z.alias("z"))
        .filter((F.col("z") > 3) | (F.col("z") < -3))
    )


def _session_funnel_probe(df: DataFrame) -> DataFrame:
    """session_funnel_depth's shape: sessionizer window + stacked funnel
    windows on the (user, session) composite; users grow 100x."""
    from metadata_driven_etl_spark.operators import temporal as temporal_ops
    from metadata_driven_etl_spark.operators.windows import sessionize

    s = sessionize(
        df, "user_id", "ts", gap_seconds=1800, tiebreak=["event_id"]
    ).withColumn(
        "_sk", F.concat_ws("#", F.col("user_id"), F.col("session_id"))
    )
    d = temporal_ops.funnel_steps(
        s, ["view", "click", "purchase"], user_col="_sk",
        window="3650 days",
    )
    return d.groupBy("funnel_step").agg(F.count(F.lit(1)).alias("n"))


def _geo_probe(df: DataFrame) -> DataFrame:
    from metadata_driven_etl_spark.operators import spatial as spatial_ops

    m, r = 1_000_003, 50_000
    pts = df.select(
        "user_id",
        ((F.col("user_id") * 48271) % m).alias("cx"),
        ((F.col("user_id") * 16807) % m).alias("cy"),
    ).distinct()
    probes = df.select(
        (F.col("event_id") % 1000).alias("pid")
    ).distinct().select(
        "pid",
        ((F.col("pid") * 69621) % m).alias("sx"),
        ((F.col("pid") * 40692) % m).alias("sy"),
    )
    return (
        spatial_ops.grid_radius_join(
            probes, pts, radius=r, left_xy=("sx", "sy"),
            right_xy=("cx", "cy"), max_coord=m,
        )
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _hierarchy_probe(df: DataFrame) -> DataFrame:
    base = df.groupBy(F.col("user_id").alias("node")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    lvl = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("lvl")
    anc = (
        base.select("node", "cnt", lvl)
        .filter(
            (F.col("node") >= F.pow(F.lit(10), F.col("lvl")).cast("long"))
            | (F.col("lvl") == 0)
        )
        .select(
            F.expr("node DIV CAST(POWER(10, lvl) AS BIGINT)").alias("anc"),
            "cnt",
        )
    )
    return anc.groupBy("anc").agg(F.sum("cnt").alias("subtree"))


def _cents_events(df: DataFrame) -> DataFrame:
    return df.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )


def _running_sum_probe(df: DataFrame) -> DataFrame:
    from metadata_driven_etl_spark.operators.windows import (
        distributed_running_sum,
    )

    return distributed_running_sum(
        _cents_events(df).select("event_id", "cents"),
        [F.col("cents").desc(), F.col("event_id")],
        value_col="cents",
        out_col="cum",
        total_col="total",
    )


def _attribution_probe(df: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    nonp = F.col("event_type") != "purchase"
    t = df.select(
        "event_type",
        "ts",
        F.last(F.when(nonp, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("t_ts"),
        F.last(F.when(nonp, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("t_ch"),
    )
    stale = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("t_ts"))
        > 604_800_000_000
    )
    channel = F.when(
        F.col("t_ts").isNull() | stale, F.lit("direct")
    ).otherwise(F.col("t_ch"))
    return (
        t.filter(F.col("event_type") == "purchase")
        .groupBy(channel.alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )


def _clamp_probe(df: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    delta = F.when(
        F.col("event_type") == "error",
        -F.floor(F.col("value") * 100 + 0.5).cast("long"),
    ).otherwise(F.floor(F.col("value") * 100 + 0.5).cast("long"))
    p = df.select("user_id", "ts", "event_id", delta.alias("delta")).withColumn(
        "psum", F.sum("delta").over(w)
    )
    return p.select(
        "user_id",
        "event_id",
        (F.col("psum") - F.least(F.lit(0), F.min("psum").over(w))).alias(
            "onhand"
        ),
    )

def _semantic_dedup(df: DataFrame) -> DataFrame:
    emb = df.localCheckpoint(eager=False)
    pairs = sim_ops.embedding_near_dup_pairs(
        emb, threshold=0.3, id_col="vec_id"
    )
    clusters = dedup_ops.connected_components(
        emb.select("vec_id"), pairs, id_col="vec_id"
    )
    scored = emb.select(
        "vec_id",
        F.round(sim_ops.norm(F.col("embedding")), 6).alias("kept_score"),
    )
    return dedup_ops.keep_best_per_cluster(clusters, scored, id_col="vec_id")


# embeddings-table ops (--table embeddings): the SemDeDup composition —
# blocked cosine pairs → connected components → keep-one-per-cluster,
# exactly the shipped semantic_dedup workload's operator chain.
def _kmeans_probe(df: DataFrame) -> DataFrame:
    """One Lloyd step (the kmeans_assign_recompute shape): quantize,
    broadcast k=8 centroids, assign by exact integer L2, recompute.
    BINDING term: k·n·d distance multiplies, all map-side behind the
    broadcast — the curve must be scan-linear in n."""
    q = df.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=False)
    cent = (
        q.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
    )
    d = q.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist"),
    )
    a = (
        d.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"))
    )
    return (
        a.join(q, "vec_id")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.element_at("qv", 1)).alias("s1"),
        )
    )


def _sim_hist_probe(df: DataFrame) -> DataFrame:
    """embedding_sim_histogram_intra_label's shape: quantize, block on
    the label, pair within blocks, bin the cosine."""
    q = df.select(
        "vec_id", "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long"),
        ).alias("qv"),
    )
    n = q.select(
        "vec_id", "label", "qv",
        F.aggregate(
            "qv", F.lit(0).cast("long"), lambda acc, v: acc + v * v
        ).alias("n2"),
    ).localCheckpoint(eager=False)
    a = n.select(
        "label", F.col("vec_id").alias("ia"),
        F.col("qv").alias("qa"), F.col("n2").alias("na"),
    )
    b = n.select(
        "label", F.col("vec_id").alias("ib"),
        F.col("qv").alias("qb"), F.col("n2").alias("nb"),
    )
    pairs = a.join(b, "label").where(F.col("ia") < F.col("ib"))
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("na").cast("double"))
        * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        pairs.select(F.floor(cos * 20).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )

def _mmr_probe(df: DataFrame) -> DataFrame:
    """mmr_diverse_topk's SHARED operator (similarity.mmr_select): the
    distributed stage is the relevance top-m over the whole corpus
    (m, k fixed — the re-rank window does not grow with data), so the
    curve must be scan-linear in corpus size."""
    return sim_ops.mmr_select(df, query_id=0, m=32, k=5)


EMB_OPS = {
    "semantic_dedup": _semantic_dedup,
    # r10 wave 3: MMR diverse selection — corpus grows Nx, the m=32
    # re-rank window and k=5 greedy steps are constants.
    "mmr_diverse_select": _mmr_probe,
    # r7: single-pass co-moment matrix — aggregation state is constant
    # (45 decimal cells), so the curve should be pure scan-linear
    "embedding_comoments_d8": lambda df: sim_ops.embedding_comoments(
        df, "embedding", dims=8, scale=10_000
    ),
    # r9 second wave: one Lloyd step, k×n×d map-side distance work
    "kmeans_lloyd_step": _kmeans_probe,
    # r9 sixth wave: within-cell cosine histogram — pair space is
    # Σ_cells |cell|²; the amplifier grows CELL COUNT at constant cell
    # size (the coarse-quantizer posture), so the curve must be linear
    "sim_histogram_blocked": _sim_hist_probe,
}



def run_op(build, df: DataFrame) -> float:
    if isinstance(build, dict):  # two-phase: prep runs eagerly, untimed
        ctx = build["prep"](df)
        build = build["build"]
        df = ctx
    t0 = time.perf_counter()
    build(df).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument(
        "--ops", default="", help="comma-separated OPS subset (default all)"
    )
    ap.add_argument(
        "--table",
        default="documents",
        choices=["documents", "events", "embeddings"],
        help="which table to amplify (selects the matching op set)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    ops = dict(
        {
            "documents": {**OPS, **TWO_PHASE_OPS},
            "events": EVENT_OPS,
            "embeddings": EMB_OPS,
        }[args.table]
    )
    if args.ops:
        wanted = set(args.ops.split(","))
        unknown = wanted - set(ops)
        if unknown:
            ap.error(f"unknown ops: {sorted(unknown)}")
        for op in list(ops):
            if op not in wanted:
                del ops[op]

    # a 100x amplified corpus with ~100-copy clusters correctly implies
    # tens of millions of true pairs — size the single local JVM for it
    # (a real cluster spreads this across executors)
    spark = get_local_spark(
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")
    rows: dict[str, int] = {}
    secs: dict[str, dict[str, float]] = {op: {} for op in ops}
    amp = {
        "documents": amplify,
        "events": amplify_events,
        "embeddings": amplify_embeddings,
    }[args.table]
    global _CURRENT_PATH
    for scale in scales:
        path = amp(spark, scale, tmp)
        _CURRENT_PATH = path
        df = spark.read.parquet(path)
        rows[str(scale)] = df.count()
        # warm the input through the page cache so timings compare compute
        df.write.format("noop").mode("overwrite").save()
        for op, build in ops.items():
            secs[op][str(scale)] = run_op(build, df)
    print(json.dumps({"sf_dir": SF_DIR, "rows": rows, "seconds": secs}))


if __name__ == "__main__":
    main()
