"""Single-pass table profiling (data-profiling for the metadata plane).

The reference's metadata surface stops at schema registration (its data
dictionary records names/types only); real metadata-driven platforms also
profile content — null rates, cardinalities, value ranges — to seed DQ
rules and detect drift. This operator computes per-column profiles in ONE
aggregation pass over the table:

- ``n_nulls``: exact null count (conditional count, map-side combinable)
- ``n_distinct``: exact distinct count (Catalyst plans the multi-column
  distinct via a single expand + two-phase aggregate — one shuffle for
  the whole profile, not one per column)
- ``min_value`` / ``max_value``: rendered as strings so one output schema
  covers every column type (numeric min/max semantics are preserved —
  the cast happens after the typed aggregation).

Output: one row per profiled column
(``column_name, n_rows, n_nulls, n_distinct, min_value, max_value``).

At 100 TB: exact distincts are the honest default for profile tables fed
to DQ rules; swap ``approx=True`` for HyperLogLog sketches when profiling
runs per-ingest on wide tables (same output schema, ±2% error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column content profile.

    The exact distinct counts run in their OWN aggregation, separate
    from the null/min/max pass (r12): Catalyst plans multi-column
    distinct via Expand, and any NON-distinct aggregate sharing that
    aggregation is then buffered once per (gid, distinct value) entry in
    the partial-aggregate map — the min/max/null buffers ride along per
    distinct key, which measured 3.6s vs 0.8s+0.3s for the split form on
    the sf0.1 orders profile (the pathology grows with cardinality, so
    the split is also the 100 TB posture). The two one-row aggregates
    recombine with a literal-free 1×1 cross join.
    """
    cols = columns or df.columns
    n_distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    dist = df.agg(*[n_distinct(c).alias(f"_nd_{c}") for c in cols])
    wide = df.agg(*aggs).crossJoin(dist)
    profiles = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.col(f"_nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(profiles).alias("p")).select("p.*")


def sql_profile_table(table: str, columns: list[str]) -> str:
    """DuckDB twin of :func:`profile_table` (exact variant)."""
    selects = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM {table}
        """
        for c in columns
    ]
    return " UNION ALL ".join(selects)


# Exact base types (the part before any '(precision,scale)' suffix) —
# prefix matching would misclassify e.g. 'interval day to second' as
# numeric via startswith('int').
_NUMERIC_BASE_TYPES = frozenset(
    ("tinyint", "smallint", "int", "integer", "bigint", "long", "short",
     "byte", "float", "real", "double", "decimal")
)


def suggest_rules(
    profile: DataFrame,
    numeric_range: bool = True,
    dtypes: dict[str, str] | None = None,
) -> list:
    """Turn a :func:`profile_table` output into suggested DQ rules — the
    metadata-driven loop closed: profile the data, derive the rules the
    data already satisfies, enforce them on future loads so DRIFT (new
    nulls, broken uniqueness, out-of-range values) is caught at ingest.

    Suggestions (all tag-action, for a human to promote to filter/reject):
    - ``not_null`` for every column currently free of nulls
    - ``uniqueness`` for every column whose distinct count equals the row
      count (a candidate key)
    - a range ``expression`` for NUMERIC columns, gated on the source
      column's actual data type via ``dtypes`` (``dict(df.dtypes)``). A
      digit-like STRING column (zero-padded codes '01'..'10') must NOT
      get a numeric range — the implicit string→double cast would change
      comparison semantics vs the column's native string ordering. When
      ``dtypes`` is not supplied the rule falls back to the parse-as-float
      heuristic for backward compatibility (advisory only).

    The profile is one row per column (tiny) — collecting it is a
    metadata read, not a data pass.
    """
    from metadata_driven_etl_spark.config.model import DQRuleConfig

    def _is_numeric(col: str) -> bool:
        if dtypes is None:
            return True  # legacy heuristic: parse check below decides
        base = str(dtypes.get(col, "")).lower().split("(", 1)[0].strip()
        return base in _NUMERIC_BASE_TYPES

    rules: list[DQRuleConfig] = []
    for r in profile.collect():
        c = r["column_name"]
        if r["n_nulls"] == 0:
            rules.append(
                DQRuleConfig(
                    rule_name=f"{c}_not_null",
                    rule_type="not_null",
                    column=c,
                    action_on_failure="tag",
                )
            )
        if r["n_distinct"] == r["n_rows"] and r["n_rows"] > 0:
            rules.append(
                DQRuleConfig(
                    rule_name=f"{c}_unique",
                    rule_type="uniqueness",
                    column=c,
                    columns=(c,),
                    action_on_failure="tag",
                )
            )
        if numeric_range and r["min_value"] is not None and _is_numeric(c):
            try:
                lo, hi = float(r["min_value"]), float(r["max_value"])
            except (TypeError, ValueError):
                continue
            rules.append(
                DQRuleConfig(
                    rule_name=f"{c}_in_range",
                    rule_type="expression",
                    expression=f"{c} >= {lo!r} AND {c} <= {hi!r}",
                    action_on_failure="tag",
                )
            )
    return rules


def _sv_lt(a: str, b: str):
    """Value-aware ``a < b`` over STRING-RENDERED profile min/max: when
    both sides parse as numbers compare numerically (lexicographic order
    is wrong for multi-digit numerics: '102' < '95' as strings), else
    fall back to string order. DECIMAL(38,9) is tried first so bigint
    values beyond 2^53 keep exact order (a double roundtrip would
    collapse adjacent large ids to equal); doubles cover scientific-
    rendered floats outside decimal range. Mirrored exactly by the
    DuckDB twin (both engines parse scientific notation into decimal
    identically — verified)."""
    ad = F.col(a).try_cast("decimal(38,9)")
    bd = F.col(b).try_cast("decimal(38,9)")
    an = F.col(a).try_cast("double")
    bn = F.col(b).try_cast("double")
    return (
        F.when(ad.isNotNull() & bd.isNotNull(), ad < bd)
        .when(an.isNotNull() & bn.isNotNull(), an < bn)
        .otherwise(F.col(a) < F.col(b))
    )


def profile_drift(
    current: DataFrame,
    previous: DataFrame,
    null_rate_jump: float = 0.05,
) -> DataFrame:
    """Compare two :func:`profile_table` outputs (e.g. today's ingest vs
    yesterday's) and flag content drift per column:

    - ``null_rate_drift``: null fraction rose by more than
      ``null_rate_jump`` (absolute)
    - ``cardinality_collapse``: distinct count dropped by >50% while rows
      didn't (a join gone wrong or an upstream default flooding in)
    - ``range_changed``: ANY min/max inequality (fires on contraction too
      — a coverage signal, not an alert)
    - ``range_expanded``: min/max moved OUTSIDE the previous envelope
      (``c_min < p_min OR c_max > p_max``) — the alertable signal. The
      profile renders min/max as strings; the order comparison parses
      both sides back to numbers when possible (lexicographic order is
      wrong for multi-digit numerics) and falls back to string order
      for genuinely textual columns.

    Both inputs are one-row-per-column aggregates, so this is a
    metadata-size join — free at any corpus scale.
    """
    cur = current.select(
        "column_name",
        F.col("n_rows").alias("c_rows"),
        F.col("n_nulls").alias("c_nulls"),
        F.col("n_distinct").alias("c_distinct"),
        F.col("min_value").alias("c_min"),
        F.col("max_value").alias("c_max"),
    )
    prev = previous.select(
        "column_name",
        F.col("n_rows").alias("p_rows"),
        F.col("n_nulls").alias("p_nulls"),
        F.col("n_distinct").alias("p_distinct"),
        F.col("min_value").alias("p_min"),
        F.col("max_value").alias("p_max"),
    )
    j = cur.join(prev, "column_name", "inner")
    c_null_rate = F.col("c_nulls") / F.greatest(F.col("c_rows"), F.lit(1))
    p_null_rate = F.col("p_nulls") / F.greatest(F.col("p_rows"), F.lit(1))
    return j.select(
        "column_name",
        F.round(c_null_rate - p_null_rate, 6).alias("null_rate_delta"),
        (c_null_rate - p_null_rate > null_rate_jump).alias("null_rate_drift"),
        (
            (F.col("c_distinct") * 2 < F.col("p_distinct"))
            & (F.col("c_rows") * 2 >= F.col("p_rows"))
        ).alias("cardinality_collapse"),
        (
            (F.col("c_min") != F.col("p_min"))
            | (F.col("c_max") != F.col("p_max"))
        ).alias("range_changed"),
        (_sv_lt("c_min", "p_min") | _sv_lt("p_max", "c_max")).alias(
            "range_expanded"
        ),
    )


def sql_profile_drift(
    cur_table: str,
    prev_table: str,
    columns: list[str],
    null_rate_jump: float = 0.05,
) -> str:
    """DuckDB twin of :func:`profile_drift` over two profiled tables."""
    cur = sql_profile_table(cur_table, columns)
    prev = sql_profile_table(prev_table, columns)
    return f"""
    WITH cur AS ({cur}), prev AS ({prev})
    SELECT c.column_name,
           round(CAST(c.n_nulls AS DOUBLE) / greatest(c.n_rows, 1)
                 - CAST(p.n_nulls AS DOUBLE) / greatest(p.n_rows, 1), 6)
               AS null_rate_delta,
           (CAST(c.n_nulls AS DOUBLE) / greatest(c.n_rows, 1)
                 - CAST(p.n_nulls AS DOUBLE) / greatest(p.n_rows, 1))
               > {null_rate_jump} AS null_rate_drift,
           (c.n_distinct * 2 < p.n_distinct AND c.n_rows * 2 >= p.n_rows)
               AS cardinality_collapse,
           (c.min_value <> p.min_value OR c.max_value <> p.max_value)
               AS range_changed,
           ((CASE WHEN TRY_CAST(c.min_value AS DECIMAL(38,9)) IS NOT NULL
                   AND TRY_CAST(p.min_value AS DECIMAL(38,9)) IS NOT NULL
                  THEN TRY_CAST(c.min_value AS DECIMAL(38,9))
                       < TRY_CAST(p.min_value AS DECIMAL(38,9))
                  WHEN TRY_CAST(c.min_value AS DOUBLE) IS NOT NULL
                   AND TRY_CAST(p.min_value AS DOUBLE) IS NOT NULL
                  THEN TRY_CAST(c.min_value AS DOUBLE)
                       < TRY_CAST(p.min_value AS DOUBLE)
                  ELSE c.min_value < p.min_value END)
            OR (CASE WHEN TRY_CAST(p.max_value AS DECIMAL(38,9)) IS NOT NULL
                      AND TRY_CAST(c.max_value AS DECIMAL(38,9)) IS NOT NULL
                     THEN TRY_CAST(p.max_value AS DECIMAL(38,9))
                          < TRY_CAST(c.max_value AS DECIMAL(38,9))
                     WHEN TRY_CAST(p.max_value AS DOUBLE) IS NOT NULL
                      AND TRY_CAST(c.max_value AS DOUBLE) IS NOT NULL
                     THEN TRY_CAST(p.max_value AS DOUBLE)
                          < TRY_CAST(c.max_value AS DOUBLE)
                     ELSE p.max_value < c.max_value END))
               AS range_expanded
    FROM cur c JOIN prev p USING (column_name)
    """


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorize/clip ``value_col`` to its per-group [lower_q, upper_q]
    EXACT percentile band — the standard heavy-tail taming step before
    training-feature export or drift-sensitive aggregation (outliers are
    bounded, not dropped, so totals stay interpretable).

    Two-pass by construction (percentiles cannot be clipped against
    before they exist): one grouped percentile aggregation produces a
    |groups|-row stats frame, broadcast-joined back, then the clip is a
    map-side least/greatest. The fact table shuffles ZERO times — the
    only shuffle carries the stats aggregation's partials. Exact
    `percentile` buffers per-group values; at 100 TB swap
    ``approx=True``-style sketches upstream if groups are huge, but keep
    exact for hash-checked parity (Spark `percentile` and DuckDB
    `quantile_cont` share the h=(n-1)q interpolation on doubles —
    bit-identical, see workloads.agg_percentile).
    """
    out_col = out_col or f"{value_col}_clipped"
    if out_col in df.columns:
        raise ValueError(
            f"winsorize: output column {out_col!r} already exists in the "
            "input (refusing to silently replace it)"
        )
    gcols = list(group_cols or [])
    stats = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("_w_lo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("_w_hi"),
    )
    if gcols:
        renamed = stats.select(
            *[F.col(c).alias(f"_w_{c}") for c in gcols], "_w_lo", "_w_hi"
        )
        # eqNullSafe: groupBy emits a stats row for the NULL group, and a
        # plain == join would silently DROP every null-group input row —
        # the opposite of "bounded, not dropped".
        cond = [F.col(c).eqNullSafe(F.col(f"_w_{c}")) for c in gcols]
        joined = df.join(F.broadcast(renamed), cond).drop(
            *[f"_w_{c}" for c in gcols]
        )
    else:
        joined = df.crossJoin(F.broadcast(stats))
    return joined.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.col("_w_lo")), F.col("_w_hi")),
    ).drop("_w_lo", "_w_hi")
