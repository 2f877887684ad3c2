from gnip_trend_detection_spark.functions.core import (
    sig_round2,
    epoch_seconds,
    UNIT_SECONDS,
)
from gnip_trend_detection_spark.functions.poisson_math import (
    poisson_interval,
    poisson_ppf,
)

__all__ = [
    "sig_round2",
    "epoch_seconds",
    "UNIT_SECONDS",
    "poisson_interval",
    "poisson_ppf",
]
