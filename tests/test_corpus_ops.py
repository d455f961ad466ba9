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


class TestBloomPrefilter:
    """ngram_overlap_bloom must be bit-identical to the exact path at ANY
    filter sizing — the exact confirm join erases false positives, so a
    deliberately saturated bitmap only costs work, never correctness."""

    ROWS = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "zeta eta theta iota kappa"),
        (3, "xx alpha beta gamma delta yy"),
        (4, "alpha beta"),
        (5, ""),
    ]

    def _both(self, spark, num_bits, num_hashes):
        eval_df = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        train = _docs(spark, self.ROWS)
        exact = decontam.ngram_overlap(train, eval_df, n=4).collect()
        bloom = decontam.ngram_overlap_bloom(
            train, eval_df, n=4, num_bits=num_bits, num_hashes=num_hashes
        ).collect()
        key = lambda r: r["doc_id"]  # noqa: E731
        return sorted(exact, key=key), sorted(bloom, key=key)

    def test_matches_exact_at_default_sizing(self, spark):
        exact, bloom = self._both(spark, num_bits=1 << 17, num_hashes=5)
        assert exact == bloom

    def test_matches_exact_when_saturated(self, spark):
        # 64 bits / 5 hashes for ~8 grams: nearly every probe passes the
        # prefilter; the confirm join must still kill every false positive.
        exact, bloom = self._both(spark, num_bits=64, num_hashes=5)
        assert exact == bloom

    def test_no_false_negatives_single_bit_word(self, spark):
        # One 64-bit word, one hash — the degenerate-but-legal corner.
        exact, bloom = self._both(spark, num_bits=64, num_hashes=1)
        assert exact == bloom


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


class TestSpanDedup:
    def test_repeated_span_kept_once_and_lowest_doc_wins(self, spark):
        from metadata_driven_etl_spark.operators.dedup import span_dedup

        boiler = " ".join(f"b{i}" for i in range(4))
        uniq_a = " ".join(f"a{i}" for i in range(4))
        uniq_c = " ".join(f"c{i}" for i in range(4))
        rows = [
            (1, f"{boiler} {uniq_a}"),  # spans: [boiler, uniq_a]
            (2, boiler),                # entire doc is the duplicate span
            (3, f"{uniq_c} {boiler}"),  # keeps uniq_c, loses boiler
        ]
        out = {
            r.doc_id: r
            for r in span_dedup(
                _docs(spark, rows), span_tokens=4
            ).collect()
        }
        assert out[1].clean_text == f"{boiler} {uniq_a}"
        assert out[1].n_spans_kept == 2 and out[1].n_spans_total == 2
        # doc 2 lost its only span → absent from the output
        assert 2 not in out
        assert out[3].clean_text == uniq_c
        assert out[3].n_spans_kept == 1 and out[3].n_spans_total == 2

    def test_within_doc_repeat_collapses(self, spark):
        from metadata_driven_etl_spark.operators.dedup import span_dedup

        s = "x1 x2 x3 x4"
        out = span_dedup(
            _docs(spark, [(1, f"{s} {s} {s}")]), span_tokens=4
        ).collect()
        assert len(out) == 1
        assert out[0].clean_text == s
        assert out[0].n_spans_kept == 1 and out[0].n_spans_total == 3

    def test_short_tail_span_is_its_own_window(self, spark):
        from metadata_driven_etl_spark.operators.dedup import span_dedup

        out = span_dedup(
            _docs(spark, [(1, "t1 t2 t3 t4 t5")]), span_tokens=4
        ).collect()[0]
        # 5 tokens → one full window + a 1-token tail window
        assert out.n_spans_total == 2 and out.n_spans_kept == 2
        assert out.clean_text == "t1 t2 t3 t4 t5"


class TestTrainingOrder:
    def test_positions_are_a_permutation_and_seed_sensitive(self, spark):
        from metadata_driven_etl_spark.operators.dedup import training_order

        docs = _docs(spark, [(i, f"d{i}") for i in range(100)])
        a = {r.doc_id: r.train_pos for r in training_order(docs, seed=1).collect()}
        assert sorted(a.values()) == list(range(1, 101))
        b = {r.doc_id: r.train_pos for r in training_order(docs, seed=2).collect()}
        assert sorted(b.values()) == list(range(1, 101))
        assert a != b  # different epoch, different order
        a2 = {r.doc_id: r.train_pos for r in training_order(docs, seed=1).collect()}
        assert a == a2  # same seed, same order

    def test_no_single_partition_global_window(self, spark):
        """The plan must not contain a global (empty-partition-spec)
        window — the whole point of the offsets construction."""
        from metadata_driven_etl_spark.operators.dedup import training_order

        docs = _docs(spark, [(i, f"d{i}") for i in range(10)])
        plan = (
            training_order(docs, seed=1)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "windowspecdefinition(" in line.lower() and "_pid" not in line:
                raise AssertionError(f"global window found: {line}")


class TestFuzzyJoin:
    def test_finds_cross_table_near_matches_only(self, spark):
        from metadata_driven_etl_spark.operators.dedup import fuzzy_join

        base = "alpha beta gamma delta epsilon zeta eta theta"
        left = _docs(
            spark,
            [
                (1, base),  # near-identical to ref 100
                (2, "totally different words here none shared at all"),
            ],
        )
        right = _docs(
            spark,
            [
                (100, base + " iota"),  # near match of 1
                (200, "another unrelated reference record entirely"),
            ],
        )
        out = {
            (r.left_doc_id, r.right_doc_id): r.jaccard
            for r in fuzzy_join(left, right, threshold=0.25).collect()
        }
        assert set(out) == {(1, 100)}
        assert 0.25 <= out[(1, 100)] <= 1.0

    def test_no_cross_product_plan(self, spark):
        """Blocking must be an equi-join on (band, bhash) — the plan may
        not contain a cartesian/broadcast nested loop."""
        from metadata_driven_etl_spark.operators.dedup import fuzzy_join

        left = _docs(spark, [(i, f"w{i} x{i} y{i} z{i}") for i in range(5)])
        right = _docs(spark, [(i, f"a{i} b{i} c{i} d{i}") for i in range(5)])
        plan = (
            fuzzy_join(left, right)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestLshBucketCap:
    def test_degenerate_bucket_capped_but_normal_pairs_survive(self, spark):
        """A boilerplate cluster larger than the cap must stop generating
        O(k^2) pairs, while pairs from normal-sized buckets are unaffected
        and max_bucket_size=None restores exact candidate semantics (the
        default has been the capped 100 TB posture since round 5)."""
        from metadata_driven_etl_spark.operators.dedup import (
            lsh_candidate_pairs,
        )

        boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed") for i in range(40)]
        base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20 w21 w22 w23 w24 w25 w26 w27 w28 w29"
        pair_docs = [(100, base + " kappa"), (101, base + " lambda")]
        df = spark.createDataFrame(boiler + pair_docs, "doc_id long, text string")

        uncapped = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(df, max_bucket_size=None).collect()
        }
        assert (100, 101) in uncapped
        assert sum(1 for a, b in uncapped if a < 40 and b < 40) == 40 * 39 // 2

        capped = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(df, max_bucket_size=10).collect()
        }
        assert (100, 101) in capped  # normal bucket untouched
        assert not any(a < 40 and b < 40 for a, b in capped), (
            "degenerate bucket must be dropped by the cap"
        )
