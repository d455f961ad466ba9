"""Structured Streaming ops: file-source micro-batches → memory sink, and
batch/stream expression equivalence for the tumbling window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_driven_etl_spark.catalog import load_table
from metadata_driven_etl_spark.streaming.windows import (
    session_window_agg,
    stream_from_files,
    tumbling_window_agg,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Normalize the nanos-timestamp events table into a streamable dir
    (two files → two micro-batches)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(2).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = stream_from_files(spark, events_dir, EVENT_SCHEMA)
    _run_stream(tumbling_window_agg(stream), "t_tumble")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("t_tumble").collect()
    }
    batch = tumbling_window_agg(spark.read.schema(EVENT_SCHEMA).parquet(events_dir))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_session_window_stream(spark, events_dir):
    stream = stream_from_files(spark, events_dir, EVENT_SCHEMA)
    _run_stream(session_window_agg(stream, gap="30 minutes"), "t_sess")
    out = spark.table("t_sess")
    assert out.count() > 0
    # sessions are per-user, start <= end, event counts positive
    bad = out.filter(
        (F.col("session_start") > F.col("session_end")) | (F.col("n_events") <= 0)
    )
    assert bad.count() == 0
