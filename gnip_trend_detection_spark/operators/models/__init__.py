from gnip_trend_detection_spark.operators.models.poisson import (
    poisson_lc,
    poisson_cycle,
)
from gnip_trend_detection_spark.operators.models.mann_kendall import mann_kendall
from gnip_trend_detection_spark.operators.models.linreg import linear_regression_model
from gnip_trend_detection_spark.operators.models.theil_sen import theil_sen
from gnip_trend_detection_spark.operators.models.wdt import weighted_data_templates

__all__ = [
    "poisson_lc",
    "poisson_cycle",
    "mann_kendall",
    "linear_regression_model",
    "theil_sen",
    "weighted_data_templates",
]
