"""Streaming enrichment/dedup operators (extended surface).

The reference has no streaming at all (SURVEY.md §2.11); these are the two
ops every ingest stream needs beyond windowed aggregation:

- **stream-static join**: enrich each micro-batch against a slowly-changing
  dimension. The static side is re-resolved per micro-batch (so a catalog
  table refreshed by an upstream job is picked up) and broadcast — the
  stream side never shuffles.
- **watermarked dedup**: drop duplicate records across micro-batches while
  keeping state bounded by the watermark (exactly-once-ish ingest from
  at-least-once sources). State is O(keys within the watermark horizon),
  not O(stream history).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a static/batch dimension (per-micro-batch join).

    Spark re-plans the static side every micro-batch; with ``broadcast_dim``
    the join is map-side — no stream-side shuffle, which is the only viable
    shape when the stream runs at cluster-ingest rates.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on=on, how=how)


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with watermark-bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key's state only until the
    event-time watermark passes it — duplicates arriving within the horizon
    are dropped, state never grows unboundedly. The batch equivalent is
    ``dropDuplicates(keys)`` (workloads: dedup_exact / distinct_keys).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time proximity bound.

    Both sides are watermarked and the join carries a time-range predicate
    (`right_ts ∈ [left_ts − within, left_ts + within]`), which is what lets
    Spark expire buffered state: a row is held only until the other side's
    watermark passes its join window. Without the range condition the state
    store would grow unboundedly — Spark rejects unbounded stream-stream
    joins in append mode for exactly that reason.

    ``left_ts`` and ``right_ts`` must be distinct column names (alias one
    side before calling) so the range predicate is unambiguous post-join.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"interval {within}")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"interval {within}")
        )
    )
    renamed = rw.withColumnRenamed(key, f"__r_{key}")
    return lw.join(renamed, cond, how).drop(f"__r_{key}")
