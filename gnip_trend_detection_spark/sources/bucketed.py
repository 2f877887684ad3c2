"""Bucketed count-series storage: the co-location contract at scale.

Every per-counter operator in this engine (rebin's zero-fill window,
all five models, sessionize) starts by clustering rows on `counter` —
on a fresh parquet read that is one full shuffle of the corpus before
any work happens. Writing the counts table bucketed (and sorted)
by counter turns that shuffle into a property of storage: the scan
reports `HashPartitioning(counter)`, Catalyst's EnsureRequirements
sees the window's ClusteredDistribution already satisfied, and the
Exchange is elided — verified by plan assertion in
tests/test_bucketing.py.

At 100 TB this is the difference between re-shuffling the corpus per
query and paying the clustering cost ONCE at ingest: a counts table
bucketed by counter feeds every model sweep, re-bin, and detection
pass with zero exchanges. Pick bucket counts so one bucket fits an
executor's memory (buckets = cluster cores × small factor); skewed
counters stay bounded because a bucket holds many counters but one
counter never spans buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_counts(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    bucket_col: str = "counter",
) -> None:
    """Persist a counts relation bucketed+sorted by counter as an
    EXTERNAL parquet table (data at ``path``, metadata in the session
    catalog)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col, "interval_start")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_counts(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed counts table; downstream per-counter
    operators inherit the storage clustering (no Exchange)."""
    return spark.table(table)
