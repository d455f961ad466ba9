"""Pipeline control table: per-(table, layer) run state.

Reference: ``metadata.etl_control_table`` (metadata_manager.py:20-191).
Differences by design:

- **Non-destructive init**: CREATE IF NOT EXISTS — the reference DROPs and
  recreates its metadata tables on every pipeline run AND on every
  AuditLogger construction, destroying all history (SURVEY.md §4.3).
- **Upserts are DataFrame merges**, not f-string-interpolated UPDATE/INSERT
  SQL (injection hazard, §2.14#4).
- **records_processed is LONG** (the reference's IntegerType overflows at
  2^31 rows — §2.14#9; this engine targets 100 TB).
- **get_last_run_date uses MAX()** explicitly rather than result[0] of an
  unordered scan (§2.14#5).
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from metadata_driven_etl_spark.io.writer import TableFormat

CONTROL_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("layer", StringType(), False),
        StructField("last_run_date", StringType(), True),
        StructField("records_processed", LongType(), True),
        StructField("status", StringType(), True),
        StructField("config_snapshot", StringType(), True),
        StructField("updated_timestamp", TimestampType(), True),
    ]
)


class ControlTable:
    def __init__(
        self,
        spark: SparkSession,
        table_format: TableFormat,
        table: str = "metadata.etl_control_table",
    ):
        self.spark = spark
        self.fmt = table_format
        self.table = table
        # update_run is read-modify-overwrite (parquet merge): reads and
        # writes from concurrent pipeline units must serialize or a reader
        # can scan the table mid-overwrite / an update can be lost.
        self._lock = threading.RLock()
        self._ensure()

    def _ensure(self) -> None:
        if not self.fmt.table_exists(self.spark, self.table):
            empty = self.spark.createDataFrame([], CONTROL_SCHEMA)
            self.fmt.overwrite(empty, self.table)

    def update_run(
        self,
        table_name: str,
        layer: str,
        run_date: str,
        records_processed: int,
        status: str,
        config_snapshot: dict | None = None,
    ) -> None:
        row = [
            (
                table_name,
                layer,
                run_date,
                int(records_processed),
                status,
                json.dumps(config_snapshot or {}, default=str),
                datetime.now(timezone.utc).replace(tzinfo=None),
            )
        ]
        src = self.spark.createDataFrame(row, CONTROL_SCHEMA)
        with self._lock:
            self.fmt.merge(self.spark, self.table, src, keys=["table_name", "layer"])

    def get_last_run_date(self, table_name: str, layer: str) -> str | None:
        with self._lock:
            rows = (
                self.fmt.read(self.spark, self.table)
                .filter(
                    (F.col("table_name") == table_name)
                    & (F.col("layer") == layer)
                    & (F.col("status") == "success")
                )
                .agg(F.max("last_run_date").alias("d"))
                .collect()
            )
        return rows[0]["d"] if rows else None

    def get_state(self, table_name: str, layer: str):
        with self._lock:
            rows = (
                self.fmt.read(self.spark, self.table)
                .filter(
                    (F.col("table_name") == table_name) & (F.col("layer") == layer)
                )
                .collect()
            )
        return rows[0] if rows else None

    def all_states(self):
        return self.fmt.read(self.spark, self.table).orderBy(
            "layer", "table_name"
        )
