"""Local re-implementation of the driver's Spark-vs-DuckDB comparison.

Used by tests to catch oracle mismatches before the driver does: row count,
column-name set, and order-insensitive value comparison (exact for ints and
strings; exact for floats too, since the engine's aggregation discipline
makes them bit-identical — see functions/__init__.py).
"""

from __future__ import annotations

import datetime
import math

import duckdb

from metadata_driven_etl_spark.catalog import TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql)


def duckdb_result_types(sql: str, sf_dir: str) -> list[str]:
    """Column type names of the oracle result (e.g. ['VARCHAR', 'BIGINT'])."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return [str(t) for t in con.sql(sql).types]


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr gives the shortest round-trip form — equal floats ⇒ equal repr
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:  # Decimal → canonical
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def reject_complex_columns(spark_df, name: str = "?"):
    """Driver-canonicalizer contract: no top-level Array/Map/Struct columns.

    The driver's pandas-based canonicalizer (sort_values → Categorical →
    factorize) dies on list/dict cells with ``TypeError: unhashable type``
    BEFORE any comparison happens — the 4 red rows of CORRECTNESS_r04.
    The local gate historically sorted Python tuples (which CAN compare
    embedded lists), so array outputs passed locally and failed only at
    the driver. This check makes the local harness at least as strict:
    workloads must posexplode arrays / element_at sketches into scalar
    columns. Returns an error string, or None if the schema is clean."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        return (
            f"{name}: top-level complex column(s) {bad} — the driver's "
            "pandas canonicalizer cannot hash list/dict cells; posexplode "
            "to scalar rows (see CORRECTNESS_r04)"
        )
    return None


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    """Return (ok, message) comparing a Spark DF against oracle SQL."""
    complex_err = reject_complex_columns(spark_df, name)
    if complex_err:
        return False, complex_err
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    # Driver's value-hash is dtype-sensitive: DuckDB HUGEINT (int128, the
    # default for SUM over integers) serializes differently from Spark's
    # BIGINT even when every value is equal — the one red row of round 1.
    # Spark never produces int128, so any HUGEINT column is an oracle bug.
    types = duckdb_result_types(oracle_sql, sf_dir)
    hyge = [t for t in types if "HUGEINT" in t]
    if hyge:
        return False, (
            f"{name}: oracle result has {hyge} column(s) — wrap the "
            "aggregate in CAST(... AS BIGINT) to match Spark's long"
        )
    # Same divergence class for FLOAT (float32): the driver's pandas
    # canonicalizer keeps float32, whose repr differs from the double
    # the Spark side emits even when every value is equal — the one red
    # row of round 10 (embedding_dim_range_by_label: MIN/MAX over a
    # float column).  The local checker historically widened both sides
    # through Python floats, so it passed where the driver failed; gate
    # it here like HUGEINT.  float→double widening is exact, so
    # CAST(... AS DOUBLE) in the oracle is always lossless.
    flt = [t for t in types if "FLOAT" in t]
    if flt:
        return False, (
            f"{name}: oracle result has FLOAT column(s) {flt} — the "
            "driver's pandas canonicalizer keeps float32 whose repr "
            "differs from Spark's double (CORRECTNESS_r10); wrap in "
            "CAST(... AS DOUBLE) (exact widening)"
        )
    res = duckdb_run(oracle_sql, sf_dir)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"{name}: column mismatch spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"{name}: row count spark={len(sr)} duckdb={len(dr)}"
    if sr != dr:
        diffs = [
            (a, b) for a, b in zip(sr, dr) if a != b
        ][:5]
        return False, f"{name}: value mismatch, first diffs: {diffs}"
    return True, f"{name}: OK ({len(sr)} rows)"
