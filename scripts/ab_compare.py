#!/usr/bin/env python
"""Same-host interleaved A/B of workload timings between two trees.

The SCALE.md host-state methodology (rounds 4-5): when a bench ratio
exceeds the run-median host factor, the only trustworthy follow-up is an
A/B on the SAME host minutes apart — the suspect tree checked out in a
worktree vs HEAD, identical queries, each (tree, query) timed in a FRESH
subprocess JVM, tree order alternated both ways so position effects
(page cache, CPU frequency ramp) show up as order-dependent deltas
instead of masquerading as code regressions.

Usage:
  python scripts/ab_compare.py --other /path/to/worktree \
      --queries funnel_conversion_steps,training_order \
      [--sf-dir /root/testdata/sf0.1] [--rounds 2] [--cpus 8]

Prints one JSON line: {"seconds": {query: {"head": [...], "other":
[...]}}, "order": [...]}.  Judge the result on the MIN per side (the
noise floor) and on whether the sign of the delta survives both orders.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HEAD = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
tree, sf_dir, cpus, names = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4].split(",")
sys.path.insert(0, tree)
from metadata_driven_etl_spark.session import get_local_spark
from metadata_driven_etl_spark import workloads
spark = get_local_spark(cpus=cpus, extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    fn = workloads.QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, sf_dir: str, cpus: int, names: list[str]) -> dict:
    env = {**os.environ, "PYTHONPATH": tree}
    res = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, sf_dir, str(cpus), ",".join(names)],
        capture_output=True, text=True, env=env, check=True,
    )
    for line in res.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT line from {tree}: {res.stdout[-500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--other", required=True, help="path of the B tree")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    names = args.queries.split(",")
    secs: dict[str, dict[str, list[float]]] = {
        n: {"head": [], "other": []} for n in names
    }
    order: list[str] = []
    for r in range(args.rounds):
        # alternate which tree goes first each round (position control)
        pair = (
            [("head", HEAD), ("other", args.other)]
            if r % 2 == 0
            else [("other", args.other), ("head", HEAD)]
        )
        for side, tree in pair:
            order.append(side)
            got = run_tree(tree, args.sf_dir, args.cpus, names)
            for n, s in got.items():
                secs[n][side].append(s)
    print(json.dumps({"seconds": secs, "order": order}))


if __name__ == "__main__":
    main()
