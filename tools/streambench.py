"""Streaming-path throughput: rows/sec through representative
stateful operators, replayed with availableNow over file micro-batches
— the measured companion to SCALE.md's streaming design notes (batch
throughput lives in bench.py; this is the state-store path).

Covers one native-state operator (streaming_rebin: windowed agg) and
two applyInPandasWithState operators (psi_stream: O(bins) state;
score_stream_ewma: O(window) state) at configurable scale.

Usage: python tools/streambench.py [n_rows] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.session import get_spark
    from gnip_trend_detection_spark.streaming import (
        psi_stream,
        score_stream_ewma,
        streaming_rebin,
    )

    spark = get_spark(app_name="streambench")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="streambench_")

    # synthetic counter series: 64 counters x n_rows/64 intervals
    counters = 64
    flat = f"{base}/counts"
    os.makedirs(flat)
    t0 = time.time() - 600
    bounds = [i * n_rows // n_batches for i in range(n_batches + 1)]
    for i in range(n_batches):
        d = f"{base}/stage_{i}"
        sl = spark.range(bounds[i], bounds[i + 1]).select(
            F.concat(F.lit("c"), (F.col("id") % counters).cast("string")).alias(
                "counter"
            ),
            F.timestamp_seconds(
                1704067200 + (F.col("id") / counters).cast("long") * 60
            ).alias("interval_start"),
            F.lit(60.0).alias("duration_sec"),
            (F.col("id") % 7).cast("double").alias("count"),
        )
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    def run(sdf, mode, name):
        t0 = time.perf_counter()
        q = (
            sdf.writeStream.format("noop")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", f"{base}/ckpt_{name}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0

    def read_counts():
        return (
            spark.readStream.schema(
                "counter string, interval_start timestamp, "
                "duration_sec double, count double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(flat)
        )

    results = {}
    dt = run(streaming_rebin(read_counts(), "minutes", 2), "complete", "rebin")
    results["streaming_rebin"] = dt

    stream_vals = read_counts().select(
        F.col("counter").alias("grp"), F.col("count").alias("v")
    )
    cal = {f"c{i}": (0.0, 6.0, [10] * 10) for i in range(counters)}
    dt = run(psi_stream(stream_vals, cal), "update", "psi")
    results["psi_stream"] = dt

    dt = run(
        score_stream_ewma(
            read_counts().select("counter", "interval_start", "count")
        ),
        "update",
        "ewma",
    )
    results["score_stream_ewma"] = dt

    print(f"# {n_rows} rows, {n_batches} micro-batches, {counters} keys")
    for name, dt in results.items():
        print(f"{name}: {dt:.2f}s = {n_rows / dt / 1000:.0f}k rows/s")
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
