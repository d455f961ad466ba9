"""File/table source readers (reference bronze_layer.py:182-200 generic
``_extract_file`` with an options loop; S1-S3, S6 in SURVEY.md §2.1).

An explicit ``schema`` (DDL string) beats ``inferSchema`` at scale —
inference is an extra full read of CSV/JSON sources. The config may still
ask for inference (reference parity); schema wins when both are present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metadata_driven_etl_spark.config.model import SourceConfig


def read_file_source(
    spark: SparkSession, src: SourceConfig, schema: str | None = None
) -> DataFrame:
    reader = spark.read
    if src.options:
        reader = reader.options(**src.options)
    if schema:
        reader = reader.schema(schema)
    fmt = src.file_format or "parquet"
    return reader.format(fmt).load(src.source_path)


def read_table_source(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
