"""The comparator must actually FAIL on wrong results — a vacuous compare
would green-light every workload while verifying nothing. Mutation tests:
perturb a correct result in each dimension the driver checks (values, row
count, column names, column types rendered through values) and require
compare() to reject it."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_driven_etl_spark import workloads
from tests.oracle_check import compare

NAME = "agg_daily_sales"  # flagship: multi-key groupBy with float + int aggs


def _df(spark, sf_dir):
    return workloads.QUERIES[NAME](spark, sf_dir)


def test_correct_result_passes(spark, sf_dir):
    ok, msg = compare(_df(spark, sf_dir), workloads.ORACLES[NAME], sf_dir, NAME)
    assert ok, msg


def test_value_mutation_detected(spark, sf_dir):
    df = _df(spark, sf_dir)
    numeric = [c for c, t in df.dtypes if t in ("bigint", "double")][0]
    mutated = df.withColumn(
        numeric, F.col(numeric) + F.lit(1).cast(dict(df.dtypes)[numeric])
    )
    ok, msg = compare(mutated, workloads.ORACLES[NAME], sf_dir, NAME)
    assert not ok and "value" in msg.lower()


def test_single_cell_mutation_detected(spark, sf_dir):
    """Even ONE wrong cell in one row must fail the hash compare."""
    df = _df(spark, sf_dir)
    key = df.columns[0]
    first = df.select(key).orderBy(key).first()[0]
    numeric = [c for c, t in df.dtypes if t in ("bigint", "double")][0]
    mutated = df.withColumn(
        numeric,
        F.when(
            F.col(key) == F.lit(first),
            F.col(numeric) + F.lit(1).cast(dict(df.dtypes)[numeric]),
        ).otherwise(F.col(numeric)),
    )
    ok, _ = compare(mutated, workloads.ORACLES[NAME], sf_dir, NAME)
    assert not ok


def test_dropped_row_detected(spark, sf_dir):
    df = _df(spark, sf_dir)
    key = df.columns[0]
    first = df.select(key).orderBy(key).first()[0]
    ok, msg = compare(
        df.filter(F.col(key) != F.lit(first)),
        workloads.ORACLES[NAME],
        sf_dir,
        NAME,
    )
    assert not ok


def test_renamed_column_detected(spark, sf_dir):
    df = _df(spark, sf_dir)
    ok, msg = compare(
        df.withColumnRenamed(df.columns[-1], "wrong_name"),
        workloads.ORACLES[NAME],
        sf_dir,
        NAME,
    )
    assert not ok and ("column" in msg.lower() or "schema" in msg.lower())


def test_type_rendering_mutation_detected(spark, sf_dir):
    """A bigint rendered as double ('7' vs '7.0') must not slip through."""
    df = _df(spark, sf_dir)
    int_cols = [c for c, t in df.dtypes if t == "bigint"]
    if not int_cols:
        return
    mutated = df.withColumn(int_cols[0], F.col(int_cols[0]).cast("double"))
    ok, _ = compare(mutated, workloads.ORACLES[NAME], sf_dir, NAME)
    assert not ok
