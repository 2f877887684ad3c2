from gnip_trend_detection_spark.operators.rebin import rebin
from gnip_trend_detection_spark.operators.detect import (
    detect_threshold,
    detect_top1,
    detect_topk,
)
from gnip_trend_detection_spark.operators.asof import asof_join
from gnip_trend_detection_spark.operators.rangejoin import range_count_join
from gnip_trend_detection_spark.operators.skew import salted_agg, salted_join

__all__ = [
    "rebin",
    "detect_threshold",
    "detect_top1",
    "detect_topk",
    "asof_join",
    "range_count_join",
    "salted_agg",
    "salted_join",
]
