#!/usr/bin/env python
"""Capture .explain('formatted') plans (and optionally timings) for named
workloads — the OPTIMIZATION-round evidence artifact (guide §1: measure
first; plans/r12/<q>_before.txt / _after.txt).

Usage:
  python scripts/plan_capture.py --queries a,b,c --out plans/r12 \
      [--suffix before] [--time] [--sf-dir /root/testdata/sf0.1]

Writes <out>/<query>_<suffix>.txt with the formatted physical plan and,
with --time, prints per-query noop-sink wall seconds (2 runs, min) as one
JSON line.  Plans are captured AFTER a noop execution so AQE final plans
are shown in the same session state the bench measures.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from metadata_driven_etl_spark.session import get_local_spark  # noqa: E402
from metadata_driven_etl_spark import workloads  # noqa: E402


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
        ),
        "wscg_spans": len(re.findall(r"WholeStageCodegen", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", default=None, help="dir for plan files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries.split(",")

    spark = get_local_spark(extra_conf={
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    if args.out:
        os.makedirs(args.out, exist_ok=True)

    report: dict[str, dict] = {}
    for name in names:
        fn = workloads.QUERIES[name]
        spark.sparkContext.setJobDescription(f"plan_capture: {name}")
        secs = []
        df = None
        for _ in range(max(1, args.runs if args.time else 1)):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        # Explain the SAME DataFrame that was executed (ADVICE r12): with
        # AQE, explain on an executed df shows the FINAL re-optimized plan
        # (isFinalPlan=true, AQEShuffleRead nodes, runtime join strategy);
        # a freshly rebuilt df would show only the initial plan.
        plan = formatted_plan(df)
        if args.out:
            with open(
                os.path.join(args.out, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        report[name] = {
            **plan_stats(plan),
            **({"sec": min(secs), "runs": secs} if args.time else {}),
        }
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
