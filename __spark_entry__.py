"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``metadata_driven_etl_spark.workloads`` — every operator in
SURVEY.md §2 (plus the training-data extensions) is registered there as a
(Spark builder, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from metadata_driven_etl_spark import workloads  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference gold sales_summary shape) on sf0.001."""
    return workloads.agg_daily_sales(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workloads.ORACLES)
