"""Session-TZ independence of the catalog's NTZ fallback path.

ADVICE (r2): the NTZ→LTZ cast in ``catalog.load_table`` preserved the
stored UTC wall clock only when the session time zone was UTC — on a
locked-down non-UTC session it silently shifted every instant. The fix
routes through ``convert_timezone('UTC', <sessionTZ>, ts)`` so the cast
is timezone-explicit. These tests drive the fallback with a real NTZ
parquet file under both UTC and a non-UTC session zone and require the
same instants either way.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampNTZType

from metadata_driven_etl_spark import catalog
from metadata_driven_etl_spark.catalog import load_table

WALL_CLOCKS = [
    datetime.datetime(2024, 3, 10, 6, 30, 0),  # spans a US DST transition
    datetime.datetime(2024, 7, 1, 12, 0, 0),
    datetime.datetime(2024, 12, 31, 23, 59, 59),
]


@pytest.fixture()
def ntz_table_dir(spark, tmp_path):
    """A testdata-shaped dir whose events.parquet has a TIMESTAMP_NTZ ts."""
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
        ]
    )
    df = spark.createDataFrame(
        [(i, wc) for i, wc in enumerate(WALL_CLOCKS)], schema
    )
    path = os.path.join(str(tmp_path), "events.parquet")
    df.write.parquet(path)
    return str(tmp_path)


def _instants(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # Compare as epoch micros — instant identity, independent of how the
    # driver renders LTZ values under the current session zone.
    rows = (
        df.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    return [r.us for r in rows]


def test_ntz_fallback_is_session_tz_independent(
    spark, ntz_table_dir, monkeypatch
):
    # The stored wall clock is UTC: instant = wall clock at UTC.
    expected = [
        int(wc.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for wc in WALL_CLOCKS
    ]
    assert _instants(spark, ntz_table_dir) == expected

    # Locked-down session: the engine cannot set its defensive confs, the
    # scan yields TIMESTAMP_NTZ, and the session zone is whatever the host
    # imposed. Simulate by disabling _ensure_session_confs and forcing
    # NTZ inference + a non-UTC zone.
    monkeypatch.setattr(catalog, "_ensure_session_confs", lambda s: None)
    original_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        for tz in ("America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _instants(spark, ntz_table_dir) == expected, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", original_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_ntz_fallback_when_conf_set_raises(spark, ntz_table_dir, monkeypatch):
    """VERDICT r3 item 4: the real locked-down branch — conf.set itself RAISES
    for the engine's defensive keys (as a policy-locked cluster would), so
    _ensure_session_confs's try/except path runs for real, the scan yields
    NTZ, and the session zone stays non-UTC. Instants must still match the
    UTC session's."""
    expected = [
        int(wc.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for wc in WALL_CLOCKS
    ]
    original_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")  # +08:45
    locked = {
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.session.timeZone",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    }
    real_set = spark.conf.set

    def locked_set(key, value):
        if key in locked:
            raise Exception(f"Cannot modify the value of a static config: {key}")
        real_set(key, value)

    try:
        monkeypatch.setattr(spark.conf, "set", locked_set)
        assert _instants(spark, ntz_table_dir) == expected
    finally:
        monkeypatch.undo()
        spark.conf.set("spark.sql.session.timeZone", original_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
