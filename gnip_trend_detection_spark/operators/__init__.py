from gnip_trend_detection_spark.operators.rebin import rebin
from gnip_trend_detection_spark.operators.detect import (
    detect_threshold,
    detect_top1,
    detect_topk,
)

__all__ = ["rebin", "detect_threshold", "detect_top1", "detect_topk"]
