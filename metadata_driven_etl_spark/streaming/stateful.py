"""Custom stateful streaming operator: applyInPandasWithState sessionization.

The built-in ``F.session_window`` (streaming/windows.py) covers gap sessions
declaratively; this module is the *custom* stateful path the engine offers
when session semantics go beyond what the built-in expresses (per-session
aggregates, custom close conditions, emit-on-close) — the pattern a user
would extend for arbitrary per-key state machines at 100 TB stream scale.

Semantics: per user, events extend an open session while the gap between
consecutive events is ≤ ``gap_seconds``; a larger gap closes the session
(emitted immediately) and opens a new one. An open session is closed and
emitted when the event-time watermark passes its end + gap (event-time
timeout) — so state is bounded by the watermark, never unbounded.

Scale notes: state is one small tuple per open session per user — O(active
users); the watermark timeout guarantees eviction. Shuffle is one hash
partitioning on the user key. The same function body works for batch
backfill via operators.windows.sessionize (property-tested equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
# state carries epoch-micros (long) — pandas/arrow state round-trips longs
# losslessly, unlike tz-aware timestamps
SESSION_STATE_SCHEMA = (
    "session_start long, session_end long, n_events long, total_value double"
)


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """events (streaming DF) → closed sessions, via per-user custom state."""

    gap_us = gap_seconds * 1_000_000

    # Self-contained closure (no module-level references): cloudpickle ships
    # it by value so executors don't need this package importable.
    def track(key, pdfs, state):
        import datetime as _dt

        import pandas as pd

        def emit(start_us, end_us, n, total):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [
                        _dt.datetime.fromtimestamp(start_us / 1e6, _dt.timezone.utc).replace(tzinfo=None)
                    ],
                    "session_end": [
                        _dt.datetime.fromtimestamp(end_us / 1e6, _dt.timezone.utc).replace(tzinfo=None)
                    ],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        if state.hasTimedOut:
            (start_us, end_us, n, total) = state.get
            state.remove()
            yield emit(start_us, end_us, n, total)
            return

        cur = state.get if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_us = (pdf["ts"].astype("int64")).tolist()  # ns → handled below
            # pandas datetime64[ns/us] → micros
            unit_div = 1000 if pdf["ts"].dtype.str.endswith("[ns]") else 1
            vals = pdf["value"].fillna(0.0).tolist()
            for t_raw, v in zip(ts_us, vals):
                t = t_raw // unit_div
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif cur[0] - gap_us <= t <= cur[1] + gap_us:
                    # interval merge: in-order extension AND out-of-order
                    # events that land inside/adjacent to the open session
                    cur = (
                        min(cur[0], t),
                        max(cur[1], t),
                        cur[2] + 1,
                        cur[3] + float(v),
                    )
                elif t > cur[1] + gap_us:
                    out.append(cur)
                    cur = (t, t, 1, float(v))
                else:
                    # stray event far BEFORE the open session (out-of-order
                    # beyond merge reach): emit as its own fragment — an
                    # already-emitted earlier session can't be reopened
                    out.append((t, t, 1, float(v)))
        if cur is not None:
            close_at_ms = (cur[1] + gap_us) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            if close_at_ms <= wm_ms:
                # watermark already passed end + gap: the session is final
                # (no on-time event can extend it) — emit now, keep no state
                if state.exists:
                    state.remove()
                out.append(cur)
            else:
                state.update(cur)
                # evict when the watermark passes session end + gap
                state.setTimeoutTimestamp(close_at_ms)
        for s in out:
            yield emit(*s)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            track,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
