"""Rebin: re-grid interval counts onto an even time grid (SURVEY §2.3).

Reference semantics (analysis.py:21-157), re-expressed relationally:

1. Filter: keep rows whose whole interval fits in
   [start_time, stop_time] (analysis.py:65-68 — strict drop if
   stop > stop_time or start < start_time).
2. Per-counter grid: anchor = date_trunc(unit, min(start)),
   grid_stop = date_trunc(unit, max(stop)); bin width = n*unit;
   bin count = floor((grid_stop-anchor)/width) + 1 (the reference's
   grid loop always appends one bin past grid_stop,
   analysis.py:88-98, which also guarantees every input interval is
   fully covered).
3. Proportional allocation (analysis.py:100-128 +
   time_bucket.py:118-130): each input interval contributes
   count * overlap_fraction to every grid bin it overlaps. The
   reference does an O(N*G) linear scan; here each input row explodes
   into only the <= ceil(duration/width)+1 bins it can touch
   (bounded explode) and a hash aggregate sums contributions — a pure
   equi-join shape, no BroadcastNestedLoopJoin, scales linearly.
4. Zero-fill (analysis.py:138-143), zero-run compression — a zero bin
   is emitted only when the previous grid bin was non-zero
   (analysis.py:144) — and the trailing trim quirk: the emitted list
   is truncated to (grid index of the last bin that *received input*)
   + 1 entries, where position is counted over *emitted* rows
   (analysis.py:133-155; the reference indexes a compressed list with
   a grid index — reproduced faithfully).
5. Positive counts are truncated toward zero to ints
   (analysis.py:146-150); ``keep_float_counts`` preserves the legacy
   float behavior (rebin.py:167).

Scale notes: one shuffle for the per-counter span aggregate (tiny
result, broadcast back), one shuffle for the (counter, bin) hash
aggregate with map-side partial aggregation, one counter-partitioned
window for compression. No non-equi join anywhere; skewed counters
only affect the window stage, whose state is O(bins).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gnip_trend_detection_spark.functions.core import TRUNC_UNIT, UNIT_SECONDS


def rebin(
    counts: DataFrame,
    binning_unit: str = "hours",
    n_binning_unit: int = 1,
    start_time: dt.datetime | str | None = None,
    stop_time: dt.datetime | str | None = None,
    keep_float_counts: bool = False,
) -> DataFrame:
    """counts: D1 DataFrame (counter, interval_start, duration_sec, count)
    → A3 DataFrame (counter, bin_start, duration_sec, count).
    """
    if binning_unit not in UNIT_SECONDS:
        raise ValueError(f"unsupported binning_unit {binning_unit!r}")
    width = float(n_binning_unit * UNIT_SECONDS[binning_unit])
    trunc = TRUNC_UNIT[binning_unit]

    s = F.col("interval_start").cast("double")
    e = s + F.col("duration_sec")
    data = counts.filter(F.col("duration_sec") > 0)
    if start_time is not None:
        data = data.filter(F.col("interval_start") >= F.lit(start_time).cast("timestamp"))
    if stop_time is not None:
        data = data.filter(
            (s + F.col("duration_sec")) <= F.lit(stop_time).cast("timestamp").cast("double")
        )
    data = data.select(
        "counter", s.alias("s"), e.alias("e"), F.col("count").cast("double").alias("count")
    )

    # per-counter span (R1/R2) via partition windows — ONE pass over
    # the input instead of a separate agg + re-scan + join; the counter
    # exchange is shared with the allocation stage below and reused by
    # the grid branch (ReuseExchange), so the source is scanned once.
    w_span = Window.partitionBy("counter")
    ann = (
        data.withColumn(
            "anchor",
            F.date_trunc(trunc, F.timestamp_seconds(F.min("s").over(w_span))).cast(
                "double"
            ),
        )
        .withColumn(
            "grid_stop",
            F.date_trunc(trunc, F.timestamp_seconds(F.max("e").over(w_span))).cast(
                "double"
            ),
        )
        .withColumn(
            "n_bins",
            (F.floor((F.col("grid_stop") - F.col("anchor")) / width) + 1).cast("long"),
        )
    )
    spans = ann.select("counter", "anchor", "n_bins").distinct()

    # bounded explode: each input row touches bins [i0, i1]
    alloc = (
        ann
        .withColumn("i0", F.floor((F.col("s") - F.col("anchor")) / width).cast("long"))
        .withColumn(
            "i1",
            F.least(
                (F.ceil((F.col("e") - F.col("anchor")) / width) - 1).cast("long"),
                F.col("n_bins") - 1,
            ),
        )
        .select(
            "counter",
            "anchor",
            "count",
            "s",
            "e",
            F.explode(F.sequence("i0", "i1")).alias("i"),
        )
        .withColumn(
            "weight",
            (
                F.least(F.col("e"), F.col("anchor") + (F.col("i") + 1) * width)
                - F.greatest(F.col("s"), F.col("anchor") + F.col("i") * width)
            )
            / (F.col("e") - F.col("s")),
        )
        .groupBy("counter", "i")
        .agg(F.sum(F.col("count") * F.col("weight")).alias("raw_count"))
    )

    grid = spans.select(
        "counter",
        "anchor",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_bins") - 1)).alias("i"),
    )

    w_order = Window.partitionBy("counter").orderBy("i")
    w_all = Window.partitionBy("counter")
    filled = (
        grid.join(alloc, ["counter", "i"], "left")
        .withColumn("present", F.col("raw_count").isNotNull())
        .withColumn("raw", F.coalesce("raw_count", F.lit(0.0)))
        .withColumn("prev_raw", F.lag("raw", 1, 0.0).over(w_order))
        .withColumn(
            "last_present_i",
            F.max(F.when(F.col("present"), F.col("i"))).over(w_all),
        )
    )
    emitted = filled.filter((F.col("raw") != 0) | (F.col("prev_raw") != 0))
    emitted = emitted.withColumn("pos", F.row_number().over(w_order)).filter(
        F.col("pos") <= F.col("last_present_i") + 1
    )

    out_count = (
        F.when(F.col("raw") > 0, F.col("raw")).otherwise(F.lit(0.0))
        if keep_float_counts
        else F.when(F.col("raw") > 0, F.floor("raw")).otherwise(F.lit(0)).cast("long")
    )
    return emitted.select(
        "counter",
        F.timestamp_seconds(F.col("anchor") + F.col("i") * width).alias("bin_start"),
        F.lit(width).alias("duration_sec"),
        out_count.alias("count"),
    )
