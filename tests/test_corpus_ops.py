"""Unit tests for the corpus-construction operators added in round 2:
decontamination, repetition scoring, weighted domain sampling, and
keep-best-per-cluster canonical selection (oracle parity is covered by
test_workload_parity; these pin the semantic contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_driven_etl_spark.operators import decontam, sampling
from metadata_driven_etl_spark.operators.dedup import keep_best_per_cluster
from metadata_driven_etl_spark.operators.text import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNgramOverlap:
    def test_exact_copy_is_fully_contaminated(self, spark):
        eval_df = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        train = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon"),  # exact copy
                (2, "zeta eta theta iota kappa"),  # disjoint
                (3, "xx alpha beta gamma delta yy"),  # one shared 4-gram
            ],
        )
        out = {
            r["doc_id"]: (r["n_matched_grams"], r["contaminated"])
            for r in decontam.ngram_overlap(train, eval_df, n=4).collect()
        }
        assert out[1] == (2, True)  # 5 tokens → two 4-grams, both shared
        assert out[2] == (0, False)
        assert out[3] == (1, True)

    def test_short_docs_report_zero(self, spark):
        eval_df = _docs(spark, [(100, "alpha beta gamma delta")])
        train = _docs(spark, [(1, "alpha beta"), (2, "")])
        out = decontam.ngram_overlap(train, eval_df, n=4).collect()
        assert {(r["n_matched_grams"], r["contaminated"]) for r in out} == {
            (0, False)
        }
        assert len(out) == 2  # every train row present even with no grams


class TestRepetitionFeatures:
    def test_known_values(self, spark):
        df = _docs(spark, [(1, "a a a b"), (2, "x y"), (3, "")])
        out = {r["doc_id"]: r for r in repetition_features(df).collect()}
        r1 = out[1]
        assert r1["n_tokens"] == 4
        assert r1["distinct_token_frac"] == 2 / 4
        assert r1["top_token_frac"] == 3 / 4
        # bigrams of "a a a b": aa, aa, ab → 2 distinct of 3 → dup frac 1/3
        assert abs(r1["dup_bigram_frac"] - (1 - 2 / 3)) < 1e-15
        r2 = out[2]
        assert r2["distinct_token_frac"] == 1.0
        assert r2["dup_bigram_frac"] == 0.0
        r3 = out[3]  # empty doc: zero tokens, NULL fractions
        assert r3["n_tokens"] == 0
        assert r3["distinct_token_frac"] is None
        assert r3["dup_bigram_frac"] is None


class TestWeightedDomainSample:
    def test_monotone_nested_samples(self, spark):
        """Raising a domain's weight must only ADD rows (nested samples)."""
        df = spark.createDataFrame(
            [(i, "d0") for i in range(400)], "doc_id long, source string"
        )
        lo = spark.createDataFrame([("d0", 0.2)], "source string, frac double")
        hi = spark.createDataFrame([("d0", 0.6)], "source string, frac double")
        kept_lo = {
            r["doc_id"]
            for r in sampling.weighted_domain_sample(df, lo).collect()
        }
        kept_hi = {
            r["doc_id"]
            for r in sampling.weighted_domain_sample(df, hi).collect()
        }
        assert kept_lo <= kept_hi
        # rates land near targets (hash-uniformity sanity, wide tolerance)
        assert 0.1 < len(kept_lo) / 400 < 0.3
        assert 0.5 < len(kept_hi) / 400 < 0.7

    def test_unknown_domain_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "d0"), (2, "dX")], "doc_id long, source string"
        )
        w = spark.createDataFrame([("d0", 1.0)], "source string, frac double")
        out = sampling.weighted_domain_sample(df, w).collect()
        assert [r["doc_id"] for r in out] == [1]


class TestKeepBestPerCluster:
    def test_argmax_and_tie_break(self, spark):
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
            "doc_id long, cluster_id long",
        )
        scored = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 7), (5, 2), (6, 2)],
            "doc_id long, kept_score long",
        )
        out = {
            r["cluster_id"]: (r["kept_doc_id"], r["kept_score"], r["n_members"])
            for r in keep_best_per_cluster(clusters, scored).collect()
        }
        assert out[1] == (2, 30, 3)  # max score, tie → lowest id
        assert out[4] == (4, 7, 1)
        assert out[5] == (5, 2, 2)
        assert len(out) == 3  # exactly one row per cluster
