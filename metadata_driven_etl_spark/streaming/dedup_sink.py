"""Streaming near-dup ingest: per micro-batch LSH screening + index update.

The streaming composition of ``operators.dedup.incremental_dedup_survivors``:
documents arrive as a stream; each micro-batch is screened against the
PERSISTED corpus band index (batch bands broadcast, index never
reshuffled), survivors are appended to the clean corpus table, and the
survivors' OWN bands are appended to the index so later micro-batches
dedup against them too. Net effect: the output table never contains two
near-duplicate documents, whatever the arrival order — the always-on form
of the daily-batch dedup pattern.

Exactly-once notes: checkpointing makes micro-batch replay idempotent
only if the batch writes are — here a replayed batch re-screens against
an index that may already contain its own survivors' bands, which would
drop them. So the sink appends with the micro-batch id recorded and
SKIPS batch ids it has already committed (the standard foreachBatch
transactional-sink recipe). Delta/transactional tables would subsume
this; the guard keeps the parquet fallback correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_driven_etl_spark.io.writer import TableFormat
from metadata_driven_etl_spark.operators.dedup import (
    incremental_dedup_survivors,
    lsh_bands,
)


def dedup_stream(
    stream_df: DataFrame,
    output_table: str,
    index_table: str,
    table_format: TableFormat,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    trigger_available_now: bool = True,
):
    """Start a streaming query that near-dup-screens every micro-batch.

    Returns the StreamingQuery (caller awaits/stops). ``index_table`` is
    created on first use; pre-seed it with ``lsh_bands`` of an existing
    corpus to dedup the stream against history.
    """
    owner = stream_df.sparkSession

    def screen_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # replay guard: a re-delivered batch id must not re-screen against
        # an index that already absorbed its survivors (it would drop them)
        if table_format.table_exists(spark, index_table):
            seen = (
                spark.table(index_table)
                .filter(F.col("_batch_id") == batch_id)
                .limit(1)
                .count()
            )
            if seen:
                return
            index = spark.table(index_table).select(id_col, "band", "bhash")
            survivors = incremental_dedup_survivors(
                batch_df, index, id_col=id_col, text_col=text_col,
                num_hashes=num_hashes, band_size=band_size,
                shingle_n=shingle_n,
            )
        else:
            # empty index: only within-batch screening applies
            empty = lsh_bands(
                batch_df.limit(0), text_col, id_col, num_hashes,
                band_size, shingle_n,
            )
            survivors = incremental_dedup_survivors(
                batch_df, empty, id_col=id_col, text_col=text_col,
                num_hashes=num_hashes, band_size=band_size,
                shingle_n=shingle_n,
            )
        # materialize once: appended to BOTH tables below, and the second
        # append must see the same survivor set the first one wrote
        survivors = survivors.localCheckpoint(eager=True)
        if survivors.isEmpty():
            return
        table_format.append(survivors, output_table)
        new_bands = lsh_bands(
            survivors, text_col, id_col, num_hashes, band_size, shingle_n
        ).withColumn("_batch_id", F.lit(batch_id))
        table_format.append(new_bands, index_table)
        for t in (output_table, index_table):
            try:
                owner.catalog.refreshTable(t)
            except Exception:
                pass  # table resolvable only in the batch session

    writer = (
        stream_df.writeStream.foreachBatch(screen_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
