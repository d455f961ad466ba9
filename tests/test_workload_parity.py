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


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = workloads.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


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
