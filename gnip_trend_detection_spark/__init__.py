"""PySpark-native trend-detection analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of xdevplatform/Gnip-Trend-Detection (reference at
/root/reference, snapshot 2025-02-14), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing).

Design: everything is a long-format DataFrame keyed by ``counter``;
the reference's per-process fan-out (trend_analyze_many.py:152-235)
becomes shuffle partitioning, its linear-scan grid assignment
(analysis.py:100-128) becomes a bounded-explode equi-join, and its
per-point model folds (analysis.py:159-201) become ordered window
expressions or Arrow-batched pandas UDFs.
"""

from gnip_trend_detection_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
