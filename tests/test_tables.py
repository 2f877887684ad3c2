"""load_table contract: events.ts is always a UTC-instant LTZ column.

The driver has regenerated the fixtures with different physical types
for events.ts across rounds (TIMESTAMP(NANOS) in round 1, plain micros
TIMESTAMP_NTZ in round 2). Every epoch computation in the engine
(`ts.cast("double")`) silently depends on the loader normalizing that
to the same LTZ instants, so pin the contract here:

- dtype is `timestamp` (LTZ), never NTZ / bigint, for every sf dir;
- the epoch of a known row equals DuckDB's UTC reading of the same
  parquet (cross-engine, no shared code path);
- the epoch does not move when spark.sql.session.timeZone changes.
"""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _min_epoch(spark):
    from gnip_trend_detection_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", ev.dtypes
    return ev.agg(F.min(F.col("ts").cast("double")).alias("e")).collect()[0]["e"]


def test_events_ts_matches_duckdb_utc_reading(spark):
    got = _min_epoch(spark)
    want = duckdb.sql(
        f"SELECT min(epoch(ts)) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert got == pytest.approx(float(want), abs=1e-6)


def test_events_ts_epoch_is_session_tz_independent(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _min_epoch(spark)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = _min_epoch(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == ny


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_events_ts_is_ltz_at_every_scale(spark, sf):
    from gnip_trend_detection_spark.sources.tables import load_table

    ev = load_table(spark, f"/root/testdata/{sf}", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
