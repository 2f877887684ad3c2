from gnip_trend_detection_spark.streaming.decontam import decontaminate_stream
from gnip_trend_detection_spark.streaming.dedup import exact_dedup_stream
from gnip_trend_detection_spark.streaming.curate import curate_stream
from gnip_trend_detection_spark.streaming.hotkeys import heavy_hitters_stream
from gnip_trend_detection_spark.streaming.neardup import lsh_neardup_stream
from gnip_trend_detection_spark.streaming.rebin import streaming_rebin
from gnip_trend_detection_spark.streaming.sessionize import sessionize_stream
from gnip_trend_detection_spark.streaming.controlchart import (
    score_stream_cusum,
    score_stream_ewma,
)
from gnip_trend_detection_spark.streaming.drift import ks_stream, psi_stream
from gnip_trend_detection_spark.streaming.models import (
    score_stream_poisson_lc,
    score_stream_poisson_cycle,
    score_stream_mann_kendall,
    score_stream_linreg,
    score_stream_wdt,
)

__all__ = [
    "decontaminate_stream",
    "exact_dedup_stream",
    "curate_stream",
    "heavy_hitters_stream",
    "lsh_neardup_stream",
    "streaming_rebin",
    "sessionize_stream",
    "score_stream_poisson_lc",
    "score_stream_poisson_cycle",
    "score_stream_mann_kendall",
    "score_stream_linreg",
    "score_stream_wdt",
    "score_stream_ewma",
    "score_stream_cusum",
    "psi_stream",
    "ks_stream",
]
