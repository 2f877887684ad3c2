from gnip_trend_detection_spark.sources.tables import (
    load_table,
    counts_from_events,
)
from gnip_trend_detection_spark.sources.csv import (
    load_counts_csv,
    load_counts_legacy_csv,
)

__all__ = [
    "load_table",
    "counts_from_events",
    "load_counts_csv",
    "load_counts_legacy_csv",
]
