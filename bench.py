#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — no driver collect overhead) after a
small session warm-up; times are per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metadata_driven_etl_spark.session import get_local_spark  # noqa: E402
from metadata_driven_etl_spark import workloads  # noqa: E402

HEADLINE = [
    "agg_daily_sales",
    "agg_customer_summary",
    "agg_product_perf",
    "join_inner",
    "join_self_groupcount",
    "window_row_number_dedup",
    "merge_upsert",
    "window_tumbling_events",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_quality",
    "text_lang_id",
    "similarity_topk",
    "embedding_near_dup",
    "window_running_sum",
    "agg_cube",
    "dq_metrics_single_pass",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_local_spark(extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/codegen paths once so query 1 isn't charged for session
    # start-up.
    workloads.QUERIES["agg_count"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        df = workloads.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
