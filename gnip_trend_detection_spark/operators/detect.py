"""Threshold detection sinks (SURVEY §2.7 A6/A7; reference
trend_detector.py:16-28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_threshold(analyzed: DataFrame, theta: float) -> DataFrame:
    """Every (counter, interval_start, eta) exceedance with eta > theta."""
    return analyzed.filter(F.col("eta") > theta).select(
        "counter", "interval_start", "count", "eta"
    )


def detect_topk(analyzed: DataFrame, k: int) -> DataFrame:
    """Global top-k by eta — plans as TakeOrderedAndProject (no full
    sort); ties broken deterministically by (counter, interval_start)."""
    return analyzed.orderBy(
        F.desc("eta"), F.asc("counter"), F.asc("interval_start")
    ).limit(k)


def detect_top1(analyzed: DataFrame) -> DataFrame:
    """The reference's global argmax report (trend_detector.py:18-28)."""
    return detect_topk(analyzed, 1)


def detect_mad_outliers(
    counts: DataFrame,
    z_threshold: float = 3.0,
    value_col: str = "count",
    group_col: str = "counter",
) -> DataFrame:
    """Robust per-counter outlier detection via median/MAD z-scores —
    the distribution-free complement to the Poisson/MK model family:
    robust_z = (x - median) / (1.4826 * MAD), flagged when |z| exceeds
    ``z_threshold``. Median and MAD come from
    operators/quantile.py:exact_quantiles_by, so a hot counter never
    buffers its whole series in one aggregation buffer and nothing
    sorts on a single partition — the same plan discipline as the
    detector ensemble.

    Counters whose MAD is 0 (constant or >50% one-valued series) have
    no robust scale and are excluded rather than divided by zero.
    Medians/MADs/z are rounded to 6 per the repo parity policy; 1.4826
    is the usual normal-consistency factor.

    Scale shape: two grouped-histogram passes (each: one keyed
    exchange on (group, value) + bounded-relation windows) and two
    keyed joins back — AQE broadcasts the #groups-row median/MAD
    relations.
    """
    from gnip_trend_detection_spark.operators.quantile import exact_quantiles_by

    # the (bounded, grid-sized) counts relation feeds the median
    # histogram, the deviation histogram AND the final scoring join —
    # lazy persist so the one action materializes the rebin once
    # instead of replaying the event scan + aggregate per branch
    # (bench clears the cache after each query)
    counts = counts.persist()
    med = exact_quantiles_by(counts, value_col, [0.5], by=group_col).select(
        group_col, F.col("quantile_value").alias("__med")
    )
    dev = counts.join(med, group_col).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = exact_quantiles_by(dev, "__dev", [0.5], by=group_col).select(
        group_col, F.col("quantile_value").alias("__mad")
    )
    z = F.round(
        (F.col(value_col) - F.col("__med"))
        / (F.lit(1.4826) * F.col("__mad")),
        6,
    )
    return (
        dev.join(mad, group_col)
        .filter(F.col("__mad") > 0)
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) >= F.lit(float(z_threshold)))
        .drop("__med", "__dev", "__mad")
    )
