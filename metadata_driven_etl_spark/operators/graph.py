"""Iterative graph analytics: fixed-point PageRank over an edge list.

The reference has no graph surface at all (SURVEY.md §2: relational
operators only); connected components (dedup.connected_components) was the
engine's first iterative-graph operator — this module adds the ranking
one. Both follow the same discipline: edge-list DataFrames, a bounded
number of join+aggregate rounds, lineage truncated per round so plans stay
shallow, and NO driver-side node loops.

Why fixed-point INTEGER arithmetic: PageRank's textbook form accumulates
floating-point contributions, and a parallel sum of doubles is
order-dependent — the one thing a hash-checked oracle cannot tolerate.
Scaling ranks to integers (rank ≈ probability × ``scale``) makes every
round's math exact: integer floor-division for the per-edge contribution,
exact bigint sums, integer damping via (num·s) div den. Spark and DuckDB
then agree bit-for-bit after ANY number of rounds — the oracle is the same
recurrence unrolled as chained CTEs. The cost is bounded quantization
error (≤ deg per node per round, i.e. ~1e-12 of the mass at the default
scale), which is noise for every ranking use of PageRank.

Scale design (100 TB):
- Per round: ONE shuffle join (ranks ⋈ edges on src — both sides hash-
  partitioned on the same key, so consecutive rounds reuse the edge side's
  partitioning) + one partial-aggregated sum on dst. No |V|×|V| anything.
- The edge list (with out-degrees pre-joined) is materialized ONCE and
  reused every round; rank frames are materialized per round to truncate
  lineage (localCheckpoint locally, durable ``checkpoint_dir`` on a
  cluster — the connected_components seam).
- Overflow headroom: each node's new rank is ≤ base + num·(in-mass)/den
  where total mass stays ≈ |V|·scale; keep num·max_in_mass < 2^63 — at
  the default scale=1e12 that allows in-neighborhood mass up to ~1e17,
  i.e. ~1e5 full-rank in-neighbors on one node; lower ``scale`` for
  denser hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_driven_etl_spark.operators.dedup import (
    _iteration_regime,
    _materialize,
)

DEFAULT_SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over a DIRECTED edge list, ``iterations`` rounds of the
    damped recurrence in exact fixed-point integer arithmetic:

        r'(v) = floor((den-num)·scale / den)
                + floor(num · Σ_{u→v} floor(r(u) / outdeg(u)) / den)

    Nodes are edge-induced: the ranked universe is every id appearing as
    a src OR dst, and EVERY round ranks the whole universe (a node with
    no in-edges holds the teleport base and keeps contributing through
    its out-edges — directed inputs are first-class, not just the
    symmetrized case). Dangling nodes (in-edges only) are ranked but
    re-emit nothing, so their damped mass leaks — the standard
    simplification; symmetrize for undirected graphs and the leak is
    zero by construction. Output: (node, rank) with rank ≈ stationary
    probability × ``scale``.

    Deterministic and engine-exact: see module docstring. The recurrence
    starts from r0 = scale for every node (uniform, un-normalized — the
    standard power-iteration start; ranks converge to the same ORDER as
    the normalized form, scaled by |V|).
    """
    if iterations < 1:
        raise ValueError("pagerank_fixed_point: iterations must be >= 1")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy(F.col("src").alias("_deg_src")).agg(
        F.count(F.lit(1)).alias("_outdeg")
    )
    # Degrees ride along on every edge row so each round joins ONE frame.
    e_deg = _materialize(
        e.join(deg, F.col("src") == F.col("_deg_src")).select(
            "src", "dst", "_outdeg"
        ),
        checkpoint_dir,
    )
    base = ((damping_den - damping_num) * scale) // damping_den
    # Gate the small-graph regime (dedup._iteration_regime) on the edge
    # count; the count also eagerly pays the e_deg materialization the
    # first round would pay. Lazy localCheckpoint compiles each round's
    # physical plan at CALL time, so plans built inside the regime bake
    # the small partitioning in even though execution happens at the
    # caller's action.
    n_edges = e_deg.count()
    with _iteration_regime(e_deg.sparkSession, n_edges) as small_parts:
        if small_parts is not None:
            e_deg = e_deg.coalesce(small_parts)
        nodes = _materialize(
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct(),
            checkpoint_dir,
        )
        ranks = nodes.select(
            "node", F.lit(scale).cast("long").alias("rank")
        )
        for _ in range(iterations):
            # Small regime: ranks/contrib (≤ |nodes| ≤ 2·|edges| rows)
            # ride as broadcasts — zero Exchange per round. Large regime:
            # the shuffling posture, unchanged.
            ranks_j = (
                F.broadcast(ranks) if small_parts is not None else ranks
            )
            contrib = (
                e_deg.join(ranks_j, F.col("src") == F.col("node"))
                .groupBy(F.col("dst").alias("_cnode"))
                .agg(F.sum(F.expr("rank div _outdeg")).alias("_in_mass"))
            )
            contrib_j = (
                F.broadcast(contrib) if small_parts is not None
                else contrib
            )
            # LEFT join from the full universe: a node with no in-mass
            # this round still holds the teleport base (directed-graph
            # contract).
            ranks = _materialize(
                nodes.join(
                    contrib_j, F.col("node") == F.col("_cnode"), "left"
                )
                .select(
                    "node",
                    (
                        F.lit(base).cast("long")
                        + F.expr(
                            f"({damping_num} * coalesce(_in_mass, 0L))"
                            f" div {damping_den}"
                        )
                    ).alias("rank"),
                ),
                checkpoint_dir,
            )
    return ranks


def sql_pagerank_fixed_point(
    edges_cte_body: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB oracle twin: the same integer recurrence unrolled as chained
    CTEs. ``edges_cte_body`` is a SELECT yielding (src, dst) — it becomes
    the ``e`` CTE. DuckDB sums BIGINT into HUGEINT, so every round casts
    back to BIGINT after the damping division (values fit by the operator's
    overflow contract)."""
    base = ((damping_den - damping_num) * scale) // damping_den
    parts = [
        f"WITH e AS ({edges_cte_body})",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg"
        " FROM e GROUP BY 1)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, "
            "CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS in_mass "
            f"FROM e JOIN r{i - 1} r ON e.src = r.node "
            "JOIN deg d ON e.src = d.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node, CAST({base} + "
            f"({damping_num} * COALESCE(in_mass, 0)) // {damping_den}"
            " AS BIGINT) AS rank "
            f"FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT node, rank FROM r{iterations}"
    )
