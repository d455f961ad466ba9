"""Sort / limit / top-k operators.

Reference evidence: audit_logger.py:249-285 (ORDER BY timestamp DESC LIMIT n
— Spark plans this as TakeOrderedAndProject, a true distributed top-k, no
full sort), metadata_manager.py:258-270 (full sorts),
dq_engine.py:52-54 (limit+collect sampling).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k. Callers should include a unique tie-break
    column so the selected row set is deterministic."""
    return df.orderBy(*order_by).limit(k)


def sort_by(df: DataFrame, order_by: Sequence[Column]) -> DataFrame:
    """Full (range-partitioned) sort."""
    return df.orderBy(*order_by)


def sample_head(df: DataFrame, n: int = 100):
    """First-n sampling for error reporting (reference dq_engine.py:52-54).
    Spark only computes the partitions it needs for ``limit``."""
    return df.limit(n).collect()
