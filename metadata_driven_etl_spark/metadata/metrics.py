"""DQ metrics store + data dictionary.

Reference: ``metadata.data_quality_metrics`` (silver_schemas.py:72-85 — the
reference defines the table but its write is commented out,
silver_layer.py:129-139) and ``metadata.data_dictionary``
(gold_schemas.py:63-72, populated only by dead code gold_layer.py:215-254).
Both are live here.
"""

from __future__ import annotations

import threading
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from metadata_driven_etl_spark.dq.engine import DQRuleMetrics
from metadata_driven_etl_spark.io.writer import TableFormat

DQ_METRICS_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("rule_name", StringType(), False),
        StructField("rule_type", StringType(), True),
        StructField("action", StringType(), True),
        StructField("total_count", LongType(), True),
        StructField("valid_count", LongType(), True),
        StructField("invalid_count", LongType(), True),
        StructField("is_valid", BooleanType(), True),
        StructField("run_date", StringType(), True),
        StructField("measured_at", TimestampType(), True),
    ]
)

DICTIONARY_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("column_name", StringType(), False),
        StructField("data_type", StringType(), True),
        StructField("nullable", BooleanType(), True),
        StructField("description", StringType(), True),
        StructField("registered_at", TimestampType(), True),
    ]
)


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class DQMetricsStore:
    def __init__(self, spark: SparkSession, table_format: TableFormat,
                 table: str = "metadata.data_quality_metrics"):
        self.spark = spark
        self.fmt = table_format
        self.table = table
        self._lock = threading.RLock()  # concurrent units append here
        if not self.fmt.table_exists(spark, table):
            self.fmt.overwrite(spark.createDataFrame([], DQ_METRICS_SCHEMA), table)

    def record(self, table_name: str, run_date: str,
               metrics: list[DQRuleMetrics]) -> None:
        if not metrics:
            return
        rows = [
            (
                table_name, m.rule_name, m.rule_type, m.action,
                m.total_count, m.valid_count, m.invalid_count, m.is_valid,
                run_date, _now(),
            )
            for m in metrics
        ]
        with self._lock:
            self.fmt.append(
                self.spark.createDataFrame(rows, DQ_METRICS_SCHEMA), self.table
            )

    def history(self, table_name: str | None = None) -> DataFrame:
        df = self.fmt.read(self.spark, self.table)
        if table_name:
            from pyspark.sql import functions as F

            df = df.filter(F.col("table_name") == table_name)
        return df


class DataDictionary:
    def __init__(self, spark: SparkSession, table_format: TableFormat,
                 table: str = "metadata.data_dictionary"):
        self.spark = spark
        self.fmt = table_format
        self.table = table
        self._lock = threading.RLock()  # concurrent units register here
        if not self.fmt.table_exists(spark, table):
            self.fmt.overwrite(spark.createDataFrame([], DICTIONARY_SCHEMA), table)

    def register(self, table_name: str, df: DataFrame,
                 descriptions: dict[str, str] | None = None) -> None:
        """Register a table's live schema (reference register_table_schema,
        metadata_manager.py:273-328), upserting per (table, column)."""
        descriptions = descriptions or {}
        rows = [
            (
                table_name, f.name, f.dataType.simpleString(), f.nullable,
                descriptions.get(f.name), _now(),
            )
            for f in df.schema.fields
        ]
        src = self.spark.createDataFrame(rows, DICTIONARY_SCHEMA)
        with self._lock:
            self.fmt.merge(self.spark, self.table, src,
                           keys=["table_name", "column_name"])
