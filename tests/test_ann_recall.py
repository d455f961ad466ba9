"""Recall@k property tests for the approximate similarity paths.

The ANN workloads are rows-only at the driver (recall < 1 by design), so
this is their hard quality gate: brute-force cosine top-k is the ground
truth, and each approximate path must clear a pinned recall bound at its
DEFAULT probe settings — not merely be exact when probing everything
(that degenerate case is covered by test_operators_props.py).

Bounds leave margin under the measured values (synthetic random 64-d
vectors, deterministic hyperplanes / fixed KMeans seed):

- multi-table multi-probe LSH (4 tables, 4 bits, Hamming-1): measured
  0.99 @ sf0.001 / 0.95 @ sf0.01 → pinned ≥ 0.9. Single-table
  single-probe measures 0.09-0.12 — the multi-table index is what makes
  the operator usable.
- IVF (16 cells, n_probe=6): measured 0.67 @ sf0.001 / 0.79 @ sf0.01 →
  pinned ≥ 0.6. Random vectors are IVF's worst case (no cluster
  structure), which is exactly why the bound is worth pinning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_driven_etl_spark.catalog import load_table
from metadata_driven_etl_spark.operators import similarity as sim

K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def ground_truth(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=K).collect()
    }
    assert len(exact) == N_QUERIES * K
    return emb, queries, exact


def _recall(approx_rows, exact: set) -> float:
    got = {(r.query_id, r.neighbor_id) for r in approx_rows}
    return len(got & exact) / len(exact)


@pytest.mark.slow
def test_lsh_multitable_multiprobe_recall(ground_truth):
    emb, queries, exact = ground_truth
    rows = sim.lsh_topk(
        emb, queries, dim=64, k=K, num_bits=4, num_tables=4, hamming=1
    ).collect()
    recall = _recall(rows, exact)
    assert recall >= 0.9, f"LSH recall@{K} = {recall}"


@pytest.mark.slow
def test_lsh_more_tables_monotone(ground_truth):
    """Adding hash tables must not lose recall (the space/recall trade)."""
    emb, queries, exact = ground_truth
    r4 = _recall(
        sim.lsh_topk(
            emb, queries, dim=64, k=K, num_bits=4, num_tables=4, hamming=1
        ).collect(),
        exact,
    )
    r8 = _recall(
        sim.lsh_topk(
            emb, queries, dim=64, k=K, num_bits=4, num_tables=8, hamming=1
        ).collect(),
        exact,
    )
    assert r8 >= r4


def test_ivf_recall_at_default_probe(ground_truth):
    emb, queries, exact = ground_truth
    rows = sim.ivf_topk(
        emb, queries, k=K, n_cells=16, n_probe=6
    ).collect()
    recall = _recall(rows, exact)
    assert recall >= 0.6, f"IVF recall@{K} = {recall}"


def test_lsh_results_are_true_cosines(ground_truth):
    """Approximation is only in WHICH candidates are scored — every
    returned (pair, score) must match the exact cosine."""
    emb, queries, _ = ground_truth
    rows = sim.lsh_topk(
        emb, queries, dim=64, k=K, num_bits=4, num_tables=4, hamming=1
    )
    brute = sim.brute_force_topk(emb, queries, k=len(emb.collect()))
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine_sim for r in brute.collect()
    }
    for r in rows.collect():
        assert exact_scores[(r.query_id, r.neighbor_id)] == r.cosine_sim


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: pairwise Euclidean distances survive the 64→16
    projection within moderate distortion (uniform-entry variance
    corrected by sqrt(3/k))."""
    import math

    from metadata_driven_etl_spark.catalog import load_table
    from metadata_driven_etl_spark.operators.similarity import random_project

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 30)
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    proj = {r.vec_id: r.projected for r in random_project(emb, 64, 16).collect()}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(orig)
    ratios = [
        dist(proj[ids[i]], proj[ids[i + 1]]) / dist(orig[ids[i]], orig[ids[i + 1]])
        for i in range(0, 20, 2)
    ]
    assert all(0.6 < r < 1.6 for r in ratios), ratios
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
