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
from metadata_driven_etl_spark.operators import temporal as temporal_ops  # noqa: E402
from metadata_driven_etl_spark.operators import text as text_ops  # noqa: E402
from metadata_driven_etl_spark.session import get_local_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplify_events(spark, scale: int, out_dir: str) -> str:
    """Write an Nx events table: each copy is a fresh user population
    (user_id/event_id offset per copy, timestamps unchanged) — scaling
    the dimension the window/funnel/cohort ops actually partition by."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    copies = spark.range(scale).select(F.col("id").alias("_copy"))
    amplified = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("_copy") * F.lit(n_ev)).alias("event_id"),
        (F.col("user_id") + F.col("_copy") * F.lit(n_users)).alias("user_id"),
        "event_type",
        "ts",
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
}

# events-table ops (--table events): user-partitioned window shapes
EVENT_OPS = {
    "funnel_steps": lambda df: temporal_ops.funnel_steps(
        df, steps=("view", "click", "purchase"), window="30 minutes"
    ),
    "cohort_retention": lambda df: temporal_ops.cohort_retention(df),
}


def run_op(build, df: DataFrame) -> float:
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
        choices=["documents", "events"],
        help="which table to amplify (selects the matching op set)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    ops = OPS if args.table == "documents" else EVENT_OPS
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
    amp = amplify if args.table == "documents" else amplify_events
    for scale in scales:
        path = amp(spark, scale, tmp)
        df = spark.read.parquet(path)
        rows[str(scale)] = df.count()
        # warm the input through the page cache so timings compare compute
        df.write.format("noop").mode("overwrite").save()
        for op, build in ops.items():
            secs[op][str(scale)] = run_op(build, df)
    print(json.dumps({"sf_dir": SF_DIR, "rows": rows, "seconds": secs}))


if __name__ == "__main__":
    main()
