"""Operator library: DataFrame-native implementations of SURVEY.md §2.

Each module maps a section of the reference's operator inventory onto
idiomatic Spark, fixing the reference bugs catalogued in SURVEY.md §2.14
(wrong Window import, ignored partitionBy, NULL-blind regex counts, ...).
"""

from metadata_driven_etl_spark.operators import (  # noqa: F401
    aggregations,
    dedup,
    filters,
    joins,
    merge,
    projections,
    setops,
    similarity,
    sorts,
    text,
    windows,
)
