"""Streaming rebin (SURVEY §2.9; reference rebin semantics
analysis.py:21-157 recast for Structured Streaming).

The batch rebin anchors its grid at date_trunc(unit, min(start)) —
a global aggregate a stream cannot know. The streaming variant uses an
epoch-aligned grid (bin k covers [k*width, (k+1)*width)), which is
identical to the batch grid whenever the truncated span start lands on
an epoch multiple of the width (always true for width | unit, e.g.
60s bins with minute truncation). This is a documented divergence for
other widths.

Straddle-split happens *before* the windowed aggregation: each input
interval explodes into the bins it overlaps with proportional weights
(constant-rate assumption, reference time_bucket.py:118-130), then a
standard watermarked groupBy(bin, counter).sum(count*weight). Late
rows merge into their bins until the watermark passes; zero-fill and
zero-run trimming are batch-side concerns (they need the closed span)
and are not applied on the open stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnip_trend_detection_spark.functions.core import UNIT_SECONDS


def streaming_rebin(
    counts: DataFrame,
    binning_unit: str = "minutes",
    n_binning_unit: int = 2,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """D1 stream (counter, interval_start, duration_sec, count) →
    watermarked per-bin weighted counts (counter, bin_start, count).

    Works identically on a batch DataFrame (the watermark is a no-op),
    which is what the batch/stream parity tests exploit.
    """
    width = float(UNIT_SECONDS[binning_unit] * n_binning_unit)
    df = counts.withWatermark("interval_start", watermark_delay)

    s = F.col("interval_start").cast("double")
    e = s + F.col("duration_sec")
    first_bin = F.floor(s / width).cast("long")
    last_bin = (F.ceil(e / width) - 1).cast("long")

    exploded = df.select(
        "counter",
        F.col("interval_start"),
        s.alias("s"),
        e.alias("e"),
        F.col("count").cast("double").alias("cnt"),
        F.explode(F.sequence(first_bin, F.greatest(last_bin, first_bin))).alias("bin"),
    )
    bin_lo = F.col("bin") * width
    bin_hi = bin_lo + width
    weight = (F.least(F.col("e"), bin_hi) - F.greatest(F.col("s"), bin_lo)) / (
        F.col("e") - F.col("s")
    )
    contrib = exploded.select(
        "counter",
        F.timestamp_seconds(bin_lo).alias("bin_start"),
        (F.col("cnt") * weight).alias("contrib"),
    )
    return contrib.groupBy(
        F.window("bin_start", f"{int(width)} seconds").alias("w"), F.col("counter")
    ).agg(F.sum("contrib").alias("count")).select(
        "counter", F.col("w.start").alias("bin_start"), "count"
    )
