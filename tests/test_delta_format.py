"""DeltaFormat runtime coverage.

The reference is Delta-native everywhere (reference
scripts/run_etl_pipeline.py:91-97 session jars, src/modules/gold_layer.py:
184-213 native MERGE, src/utils/db_utils.py:238-253 VACUUM). This harness
ships no delta-spark jars, so the native branch is UNREACHABLE here — these
tests run whenever `delta` is importable (CI with jars) and are skipped,
visibly, without it. The always-run tests below pin the contract the two
implementations must share, and that the seam degrades loudly, not subtly.
"""

from __future__ import annotations

import pytest

from metadata_driven_etl_spark.io.writer import (
    DeltaFormat,
    ParquetFormat,
    delta_available,
    get_table_format,
)

HAVE_DELTA = delta_available()


# --- always-run: seam behavior without jars ----------------------------------


def test_get_table_format_auto_matches_environment():
    fmt = get_table_format("auto")
    assert isinstance(fmt, DeltaFormat if HAVE_DELTA else ParquetFormat)


def test_prefer_parquet_is_always_available():
    assert isinstance(get_table_format("parquet"), ParquetFormat)


@pytest.mark.skipif(HAVE_DELTA, reason="delta importable — failure N/A")
def test_delta_merge_without_jars_fails_loudly(spark):
    """Without delta-spark the native branch must raise ImportError at the
    gated import — never silently write through a wrong path."""
    fmt = DeltaFormat()
    src = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ImportError):
        fmt.merge(spark, "default.delta_nojars", src, keys=["id"])


def test_vacuum_returns_false_on_parquet_table(spark):
    """D6: VACUUM is a no-op (False) on non-Delta tables instead of raising
    — callers can issue maintenance uniformly across formats."""
    from metadata_driven_etl_spark.io.ddl import vacuum_table

    tbl = "default.vac_parquet"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    ParquetFormat().overwrite(
        spark.createDataFrame([(1,)], "id long"), tbl
    )
    assert vacuum_table(spark, tbl) is (True if HAVE_DELTA else False)


# --- delta-only: native branch (runs when jars are present) ------------------

delta_only = pytest.mark.skipif(
    not HAVE_DELTA,
    reason="delta-spark not installed in this harness — native Delta "
    "branch unreachable (documented in VERDICT r1 / COVERAGE.md)",
)


@pytest.fixture(scope="module")
def delta_spark():
    """Session with Delta extensions (only built when jars exist)."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-tests")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    import delta

    return delta.configure_spark_with_delta_pip(builder).getOrCreate()


@delta_only
def test_delta_append_overwrite_roundtrip(delta_spark):
    fmt = DeltaFormat()
    tbl = "default.delta_rt"
    delta_spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    df = delta_spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    fmt.overwrite(df, tbl)
    fmt.append(delta_spark.createDataFrame([(3, "c")], "id long, v string"), tbl)
    assert delta_spark.table(tbl).count() == 3
    assert (
        delta_spark.sql(f"DESCRIBE DETAIL {tbl}").first().format == "delta"
    )


@delta_only
def test_delta_merge_equals_relational_merge(delta_spark):
    """The equivalence contract: Delta's native MERGE and the relational
    emulation must produce identical tables from identical inputs."""
    target_rows = [(1, "old1"), (2, "old2")]
    source_rows = [(2, "new2"), (3, "new3")]
    schema = "id long, v string"

    dfmt, pfmt = DeltaFormat(), ParquetFormat()
    for fmt, tbl in ((dfmt, "default.m_delta"), (pfmt, "default.m_parq")):
        delta_spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        fmt.overwrite(delta_spark.createDataFrame(target_rows, schema), tbl)
        fmt.merge(
            delta_spark, tbl,
            delta_spark.createDataFrame(source_rows, schema), keys=["id"],
        )
    got_d = {tuple(r) for r in delta_spark.table("default.m_delta").collect()}
    got_p = {tuple(r) for r in delta_spark.table("default.m_parq").collect()}
    assert got_d == got_p == {(1, "old1"), (2, "new2"), (3, "new3")}


@delta_only
def test_delta_vacuum_executes(delta_spark):
    from metadata_driven_etl_spark.io.ddl import vacuum_table

    tbl = "default.delta_vac"
    delta_spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    DeltaFormat().overwrite(
        delta_spark.createDataFrame([(1,)], "id long"), tbl
    )
    delta_spark.conf.set(
        "spark.databricks.delta.retentionDurationCheck.enabled", "false"
    )
    assert vacuum_table(delta_spark, tbl, retain_hours=0) is True


@delta_only
def test_delta_path_scan(delta_spark, tmp_path):
    """S7 (reference query_delta_tables.py:34): format('delta').load(path)."""
    path = str(tmp_path / "delta_path")
    df = delta_spark.createDataFrame([(1, "a")], "id long, v string")
    df.write.format("delta").save(path)
    got = delta_spark.read.format("delta").load(path)
    assert [tuple(r) for r in got.collect()] == [(1, "a")]
