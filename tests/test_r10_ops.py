"""Structural invariants for the round-10 operators — properties the
oracle hash can't express (set-level contracts, interpolation bounds,
selection semantics), following the r9 invariant-test pattern."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_mmr_select_contract(spark_global):
    """MMR selection: k distinct picks from the candidate pool, first
    pick is the pure-relevance argmax, every later pick's score is
    penalized (mmr_score <= rel/2), and the query itself never
    appears."""
    from metadata_driven_etl_spark.operators.similarity import mmr_select

    # 12 deterministic 4-d vectors: id 0 is the query [1,0,0,0]; ids
    # 1-3 are near-clones of the query (top relevance, mutual sim ~1);
    # the rest carry a moderate query component plus a DISTINCT
    # orthogonal direction each, so the diversity penalty can bite.
    rows = [(0, [1.0, 0.0, 0.0, 0.0])]
    for i in range(1, 4):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))  # clone cluster
    for i in range(4, 12):
        v = [0.6, 0.0, 0.0, 0.0]
        v[1 + (i % 3)] = 1.0 if i % 2 else -1.0
        rows.append((i, [float(x) for x in v]))
    emb = spark_global.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = mmr_select(emb, query_id=0, m=10, k=4).collect()
    assert len(out) == 4
    assert [r.select_rank for r in sorted(out, key=lambda r: r.select_rank)] == [
        1, 2, 3, 4,
    ]
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == 4 and 0 not in ids
    by_rank = {r.select_rank: r for r in out}
    # first pick = max relevance (tie-broken by id)
    top_rel = max(out, key=lambda r: (r.rel, -r.vec_id)).rel
    assert by_rank[1].rel >= top_rel - 1e-12
    assert abs(by_rank[1].mmr_score - by_rank[1].rel / 2.0) < 1e-12
    for rank in (2, 3, 4):
        r = by_rank[rank]
        assert r.mmr_score <= r.rel / 2.0 + 1e-12
    # diversity bites: the clone cluster (1-3) cannot fill all of
    # ranks 1-3 even though it has the top relevance scores
    assert not {by_rank[1].vec_id, by_rank[2].vec_id,
                by_rank[3].vec_id} <= {1, 2, 3}


def test_resample_linear_interp_bounds(spark_global):
    """Interpolated values are dense, exact at observed days, strictly
    between the surrounding observations inside a gap, and linear
    (equal steps across an even gap)."""
    from metadata_driven_etl_spark.operators.temporal import (
        resample_linear_interp,
    )

    d = dt.date
    obs = spark_global.createDataFrame(
        [
            ("a", d(2024, 1, 1), 100),
            ("a", d(2024, 1, 4), 400),   # 2-day gap: 1/2, 1/3
            ("a", d(2024, 1, 5), 0),
            ("b", d(2024, 1, 1), 7),     # single-day key: no gaps
        ],
        "k: string, day: date, v: long",
    )
    out = {
        (r.k, r.day): (r.value_filled, r.is_observed)
        for r in resample_linear_interp(
            obs, keys=["k"], day_col="day", value_col="v"
        ).collect()
    }
    # dense calendar per key over its own span
    assert len([1 for (k, _) in out if k == "a"]) == 5
    assert len([1 for (k, _) in out if k == "b"]) == 1
    # observed days exact
    assert out[("a", d(2024, 1, 1))] == (100.0, 1)
    assert out[("a", d(2024, 1, 4))] == (400.0, 1)
    assert out[("b", d(2024, 1, 1))] == (7.0, 1)
    # linear inside the gap: 100 -> 400 over 3 days = +100/day
    assert out[("a", d(2024, 1, 2))] == (200.0, 0)
    assert out[("a", d(2024, 1, 3))] == (300.0, 0)


def test_growth_accounting_flows(spark_global):
    """New/retained/resurrected/churned on a hand-built activity
    pattern, including a skip-month resurrection and trailing churn."""
    from metadata_driven_etl_spark.operators.temporal import (
        growth_accounting,
    )

    t = lambda y, m: dt.datetime(y, m, 15)  # noqa: E731
    rows = [
        # u1: active m0, m1, m2 (new, retained, retained)
        (1, t(2024, 1)), (1, t(2024, 2)), (1, t(2024, 3)),
        # u2: active m0, skips m1, returns m2 (new, resurrected);
        # churn attributed to m1
        (2, t(2024, 1)), (2, t(2024, 3)),
        # u3: active m1 only (new at m1; churn lands on m2)
        (3, t(2024, 2)),
    ]
    ev = spark_global.createDataFrame(rows, "user_id: long, ts: timestamp")
    out = {
        r.month_index: r
        for r in growth_accounting(ev, epoch_year=2024).collect()
    }
    assert out[0].n_new == 2 and out[0].n_churned == 0
    assert out[1].n_new == 1 and out[1].n_retained == 1
    assert out[1].n_resurrected == 0 and out[1].n_churned == 1  # u2 out
    assert out[2].n_retained == 1  # u1
    assert out[2].n_resurrected == 1  # u2 back
    assert out[2].n_churned == 1  # u3 out
    # delta-active identity
    active = {
        mi: r.n_new + r.n_retained + r.n_resurrected
        for mi, r in out.items()
    }
    for mi, r in out.items():
        if mi - 1 in active:
            assert active[mi] == (
                active[mi - 1] + r.n_new + r.n_resurrected - r.n_churned
            )


def test_trimmed_mean_boundary_ties(spark_global):
    """The interval-intersection trim splits boundary ties exactly:
    10 rows of which the extreme values repeat across the trim
    boundary."""
    from metadata_driven_etl_spark import workloads  # noqa: F401
    from pyspark.sql import Window

    # replicate the workload's inc/m logic on a toy frame
    vals = [1, 1, 2, 3, 4, 5, 6, 7, 9, 9]  # n=10, k=1: drop one 1, one 9
    df = spark_global.createDataFrame(
        [("g", v) for v in vals], "g: string, cents: long"
    )
    d = df.groupBy("g", "cents").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("g").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("g")
    w = d.select(
        "g", "cents", "c",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )
    k = F.floor(F.col("n") / 10).cast("long")
    m = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - k)
        - F.greatest(F.col("cum") - F.col("c"), k),
    )
    got = (
        w.select("cents", m.alias("m"))
        .agg(
            F.sum(F.col("cents") * F.col("m")).alias("s"),
            F.sum("m").alias("cnt"),
        )
        .first()
    )
    kept = sorted(vals)[1:-1]  # python reference
    assert got.cnt == len(kept)
    assert got.s == sum(kept)


def test_kw_types_domain_pins_event_types(spark_global, sf_dir):
    """ADVICE r10: brown_forsythe_variance_test (and the KW/ANOVA
    pivots that share the literal _KW_TYPES tuple) build the
    between-group term ONLY from the 5 literal types while k and the
    moment sums aggregate over all groups actually present — a sixth
    event_type would corrupt the F statistic identically on both
    engines, so the oracle hash would PASS and mask it.  Pin the
    testdata domain loudly instead: this test fails on domain drift
    before any silently-wrong-but-matching statistic can ship."""
    from metadata_driven_etl_spark.workloads import _KW_TYPES

    got = {
        r[0]
        for r in spark_global.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .where(F.col("event_type").isNotNull())
        .distinct()
        .collect()
    }
    assert got == set(_KW_TYPES), (
        f"event_type domain drifted: data={sorted(got)} vs "
        f"_KW_TYPES={sorted(_KW_TYPES)} — update _KW_TYPES AND re-check "
        "every pivot that folds per-type literal columns "
        "(brown_forsythe / kruskal_wallis / anova / funnel)"
    )
