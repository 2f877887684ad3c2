"""All-pairs Pearson correlation between counter series (SURVEY §2.7
A4/A5; reference time_series_correlations.py:29-47).

The reference zips series by *insertion order* with no alignment or
length check (README.md:85: "BUGS BE HERE"). Deliberate fix: series are
aligned by timestamp with an inner join, so only co-observed bins
correlate. Pairs are deduplicated with counter_a < counter_b.

Scale: the self-join shuffles on the timestamp key; with C counters
per bin the join output is O(bins * C^2) — fine for the reference's
use (C is small); for large C, pivot to a vector per bin and use a
matrix kernel instead (see extras.similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_correlations(
    rebinned: DataFrame,
    ts_col: str = "bin_start",
    round_digits: int | None = 4,
) -> DataFrame:
    a = rebinned.select(
        F.col("counter").alias("counter_a"),
        F.col(ts_col).alias("ts"),
        F.col("count").cast("double").alias("count_a"),
    )
    b = rebinned.select(
        F.col("counter").alias("counter_b"),
        F.col(ts_col).alias("ts"),
        F.col("count").cast("double").alias("count_b"),
    )
    paired = a.join(b, "ts").filter(F.col("counter_a") < F.col("counter_b"))
    r = F.corr("count_a", "count_b")
    if round_digits is not None:
        r = F.round(r, round_digits)
    return (
        paired.groupBy("counter_a", "counter_b")
        .agg(r.alias("r"), F.count(F.lit(1)).alias("n_bins"))
        .orderBy("r", "counter_a", "counter_b")
    )
