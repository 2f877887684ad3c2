"""Cascading hypertable rollup: continuous aggregates maintained
incrementally from a stream — the TimescaleDB continuous-aggregate /
materialized-rollup pattern on Structured Streaming.

Two resolutions are maintained as parquet tables:

- **hourly** (the fine rollup): a watermarked tumbling-window count
  per (counter, hour). Append output mode means a window row reaches
  the sink exactly once, when the watermark closes it — so a plain
  parquet append keeps the table consistent with no merge machinery.
- **daily** (the coarse rollup): re-derived *incrementally* from the
  hourly table — each micro-batch touches only the days its hourly
  rows land in, and `partitionOverwriteMode=dynamic` rewrites exactly
  those day partitions. Day cardinality per batch is bounded by the
  batch's event-time span (a stream near now touches 1-2 days), so
  the driver-side day list is bounded by construction.

At 100 TB the same shape holds: the hourly append is the streaming
agg's natural output; the daily refresh reads back only the affected
day partitions of the *hourly* table (already ~1/3600 of raw), never
the raw stream. Deeper cascades (weekly from daily, ...) repeat the
same step. Exactly-once: parquet appends from a restarted query can
duplicate a batch — production would write through a transactional
table format; the pattern (bounded incremental refresh keyed on
affected partitions) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup_stream(
    events: DataFrame, watermark_delay: str = "2 hours"
) -> DataFrame:
    """Event stream (counter, ts timestamp, weight double) → closed
    hourly bins (counter, hour_ts long, count double), append-mode
    emitted once per window when the watermark passes."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("counter", F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("weight").alias("count"))
        .select(
            "counter",
            F.col("w.start").cast("double").cast("long").alias("hour_ts"),
            "count",
        )
    )


def cascade_sink(spark: SparkSession, hourly_path: str, daily_path: str):
    """foreachBatch sink maintaining hourly (append) and daily
    (dynamic partition overwrite of affected days only)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(hourly_path)
        affected = [
            r["day"]
            for r in batch_df.select(
                (F.floor(F.col("hour_ts") / 86400) * 86400)
                .cast("long")
                .alias("day")
            )
            .distinct()
            .collect()  # bounded: days spanned by ONE micro-batch
        ]
        hourly = spark.read.parquet(hourly_path).withColumn(
            "day", (F.floor(F.col("hour_ts") / 86400) * 86400).cast("long")
        )
        daily = (
            hourly.filter(F.col("day").isin(affected))
            .groupBy("counter", "day")
            .agg(F.sum("count").alias("count"), F.count(F.lit(1)).alias("n_hours"))
        )
        (
            daily.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(daily_path)
        )

    return sink
