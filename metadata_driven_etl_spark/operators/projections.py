"""Projection operators (reference: silver SELECT lists, lineage columns).

Reference evidence: silver_config.yaml:10-23 (rename/trim projections),
bronze_layer.py:129-130 (lineage columns), gold_layer.py:119.
Emitting an explicit ``select`` of the config-declared columns is what lets
Catalyst's ColumnPruning reach the parquet scan (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: Mapping[str, Column | str]) -> DataFrame:
    """Select/rename/compute columns: {out_name: source col | Column expr}.

    String values are treated as source column names; Column values as
    computed expressions. Order of ``columns`` is the output column order.
    """
    exprs = []
    for out, src in columns.items():
        col = F.col(src) if isinstance(src, str) else src
        exprs.append(col.alias(out))
    return df.select(*exprs)


def with_lineage(df: DataFrame, source_id: str, ts_col: str = "ingestion_timestamp") -> DataFrame:
    """Append framework lineage columns (reference bronze_layer.py:129-130).

    Nondeterministic by design — excluded from oracle hashes (BASELINE.md).
    """
    return df.withColumn(ts_col, F.current_timestamp()).withColumn(
        "source_id", F.lit(source_id)
    )
