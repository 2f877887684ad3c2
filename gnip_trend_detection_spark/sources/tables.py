"""Parquet fixture loaders + derived count-series views.

The driver fixtures (/root/testdata/sf*/...) include an `events` point
stream; the reference's input shape is *interval counts* (D1). The
adapters here derive deterministic interval-count tables from events so
every reference operator has a realistic input at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Pin an NTZ wall clock to the UTC instant with the same reading,
# independent of spark.sql.session.timeZone. to_utc_timestamp / casts
# route NTZ through the session zone, so the only safe conversion is
# pure wall-clock arithmetic against the NTZ epoch.
_NTZ_AS_UTC = (
    "timestamp_micros(timestampdiff("
    "MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}))"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Fixture generations have stored events.ts three ways: TIMESTAMP
    # (NANOS) (readable only via the nanosAsLong legacy conf — set at
    # runtime so ANY session works, the harness builds its own bare
    # one), plain micros NTZ (current), and micros LTZ. Normalize all
    # of them to the same LTZ instants so downstream epoch math
    # (ts.cast("double")) is exact and session-tz independent.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in some future Spark: fine, NANOS are gone too
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read via nanosAsLong: exact integer
            # division to micros (double math would lose microseconds)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.expr(_NTZ_AS_UTC.format(col="ts")))
    return df


def counts_from_events(
    spark: SparkSession,
    sf_dir: str,
    interval_sec: int,
    weight_by_value: bool = False,
) -> DataFrame:
    """Aggregate the events point stream into interval counts (D1).

    interval_start = floor(epoch/interval_sec)*interval_sec, one row per
    (event_type, interval) that has events — uneven coverage, which is
    exactly what rebin's zero-fill/proportional-split paths need.

    Scale note: one narrow shuffle on (event_type, interval); partial
    aggregation happens map-side, so this is shuffle-minimal at 100 TB.
    """
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(events["ts"].cast("double") / interval_sec) * interval_sec
    measure = F.sum("value") if weight_by_value else F.count(F.lit(1)).cast("double")
    return (
        events.groupBy(
            events["event_type"].alias("counter"),
            F.timestamp_seconds(bucket).alias("interval_start"),
        )
        .agg(measure.alias("count"))
        .withColumn("duration_sec", F.lit(float(interval_sec)))
        .select("counter", "interval_start", "duration_sec", "count")
    )
