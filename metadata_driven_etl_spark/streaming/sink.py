"""Streaming upsert sink: foreachBatch → TableFormat.merge.

The canonical streaming-medallion ingest pattern: a streaming aggregation
(update semantics) lands in a managed table by MERGE-ing each micro-batch,
so the table always holds the latest value per key — the streaming
counterpart of the gold layer's incremental refresh (plans/pipeline.py).

Scale notes: each micro-batch merge touches only the keys present in that
batch (Delta prunes to matching files; the parquet fallback rewrites the
table — fine for compact aggregate tables, use Delta for big ones).
Checkpointing makes the sink exactly-once per micro-batch id: on restart,
a replayed batch re-merges the same rows idempotently (upsert is
idempotent for deterministic aggregates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from metadata_driven_etl_spark.io.writer import TableFormat


def refresh_owner_tables(owner, *tables: str) -> None:
    """Invalidate the stream OWNER session's relation cache for ``tables``.

    foreachBatch executes in a CLONED SparkSession and Spark's table
    relation cache is per-session: a refresh inside the batch only fixes
    the clone, and a reader in the owning session would hit
    FAILED_READ_FILE on the parquet fallback's replaced files after the
    next micro-batch. Shared by every streaming sink that rewrites a
    managed table; best-effort because the table may be resolvable only
    in the batch session."""
    for t in tables:
        try:
            owner.catalog.refreshTable(t)
        except Exception:
            pass


def merge_stream(
    stream_df: DataFrame,
    table: str,
    keys: Sequence[str],
    table_format: TableFormat,
    checkpoint_dir: str,
    output_mode: str = "update",
    trigger_available_now: bool = True,
):
    """Start a streaming query that upserts each micro-batch into ``table``.

    ``stream_df`` is typically a streaming aggregation keyed by ``keys``;
    with ``update`` output mode each micro-batch carries only changed keys.
    Returns the StreamingQuery (caller awaits/stops).
    """
    keys = list(keys)
    owner = stream_df.sparkSession

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # one source row per key per batch (aggregation output); guard
        # anyway — merge requires unique source keys
        src = batch_df.dropDuplicates(keys)
        table_format.merge(batch_df.sparkSession, table, src, keys)
        refresh_owner_tables(owner, table)

    writer = (
        stream_df.writeStream.foreachBatch(upsert_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
