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
