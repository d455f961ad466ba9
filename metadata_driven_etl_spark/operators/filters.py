"""Filter/predicate operators (reference DQ predicates + parameterized filters).

Reference evidence: dq_engine.py:26-145 (not_null / regex / expression
rules), silver_config.yaml:81 + silver_layer.py:117-119 (textual
``${PROCESSING_DATE}`` substitution — an injection hazard we replace with
bound literals, SURVEY.md §2.14#4).

All predicates are Column expressions, so Catalyst pushes them into the
parquet scan (PushedFilters) — never post-collect Python filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_from_date(df: DataFrame, date_col: str, run_date: str) -> DataFrame:
    """``col >= run_date`` with the parameter bound as a typed literal.

    The reference splices the date string into SQL text
    (silver_layer.py:118); binding ``F.lit(...).cast("date")`` gives the
    same semantics without injection and with an explicit cast instead of
    relying on implicit string/date coercion (SURVEY.md §2.9).
    """
    return df.filter(F.col(date_col) >= F.lit(run_date).cast("date"))


def filter_not_null(df: DataFrame, column: str) -> DataFrame:
    """Rows where ``column`` is not NULL (DQ not_null, dq_engine.py:26-64)."""
    return df.filter(F.col(column).isNotNull())


def filter_regex(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """Rows matching a regex (DQ regex rule, dq_engine.py:66-107).

    NULL semantics made explicit (reference bug SURVEY.md §2.14#10: NULLs
    fall out of both valid and invalid sets): NULL input → not valid.
    """
    return df.filter(F.col(column).rlike(pattern))


def filter_expr(df: DataFrame, expression: str) -> DataFrame:
    """Arbitrary boolean SQL expression (DQ expression rule, dq_engine.py:109-145)."""
    return df.filter(F.expr(expression))


def valid_flag(condition: Column, flag_name: str) -> Column:
    """VALID/INVALID tag column (reference silver_layer.py:232-235).

    NULL condition → INVALID (explicit, unlike the reference).
    """
    return (
        F.when(condition, F.lit("VALID")).otherwise(F.lit("INVALID")).alias(flag_name)
    )
