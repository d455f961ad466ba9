"""Every workload with an oracle must hash-match DuckDB (the driver's gate)."""

from __future__ import annotations

import pytest

from metadata_driven_etl_spark import workloads
from tests.oracle_check import compare

ORACLE_NAMES = sorted(workloads.ORACLES)
ROWS_ONLY = sorted(set(workloads.QUERIES) - set(workloads.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    df = workloads.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, workloads.ORACLES[name], sf_dir, name)
    assert ok, msg


def test_no_rows_only_keys_remain():
    """Since r10 (VERDICT r9 item 3) every registered key is
    oracle-paired — the former rows-only execution path is permanently
    empty. If a key ever lands here again, give it an oracle (bounded
    contracts exist for approximate ops) instead of reviving the
    weaker check."""
    assert ROWS_ONLY == []


def test_gate_rejects_array_output(spark):
    """The local harness must be at least as strict as the driver's pandas
    canonicalizer: a deliberately array-returning result fails locally."""
    from pyspark.sql import functions as F

    from tests.oracle_check import compare, reject_complex_columns

    df = spark.range(3).select("id", F.array(F.lit(1), F.lit(2)).alias("a"))
    err = reject_complex_columns(df, "fake")
    assert err is not None and "complex column" in err
    ok, msg = compare(df, "SELECT 1 AS id, [1, 2] AS a", "/tmp", "fake")
    assert not ok and "complex column" in msg


def test_gate_rejects_float_oracle(spark, sf_dir):
    """VERDICT r10 item 2: a FLOAT-typed oracle column must fail the
    local gate — the driver's pandas canonicalizer keeps float32, whose
    repr differs from Spark's double even when values are identical
    (the one red row of CORRECTNESS_r10)."""
    from pyspark.sql import functions as F

    from tests.oracle_check import compare

    df = spark.range(1).select(F.lit(1.0).alias("v"))
    ok, msg = compare(df, "SELECT CAST(1 AS FLOAT) AS v", sf_dir, "fake")
    assert not ok and "FLOAT" in msg


def test_all_oracles_float_free(sf_dir):
    """Fast DuckDB-only sweep (no Spark): no registered oracle may carry
    a FLOAT (float32) result column — closes the r10 red-row class at
    registration time, mirroring the HUGEINT scan inside compare()."""
    from tests.oracle_check import duckdb_result_types

    offenders = {}
    for name, sql in workloads.ORACLES.items():
        types = duckdb_result_types(sql, sf_dir)
        flt = [t for t in types if "FLOAT" in t]
        if flt:
            offenders[name] = flt
    assert not offenders, offenders


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


PYTHON_OK = {
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
}


@pytest.mark.parametrize("name", sorted(set(workloads.QUERIES) - PYTHON_OK))
def test_plan_stays_jvm_side(spark, sf_dir, name):
    """SCALE.md §3: every workload except the multimodal pair must compile
    to a plan with NO Python evaluation nodes (whole-stage codegen path)."""
    df = workloads.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan, name
