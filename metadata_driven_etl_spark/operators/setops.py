"""Set operations — absent from the reference (SURVEY.md §2.8: bronze's
append mode is its only implicit union) but part of this engine's surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column NAME (not position) — immune to column-order
    drift between config-declared projections."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
