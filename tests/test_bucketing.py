"""Bucketed storage elides the per-counter shuffle (SCALE.md claim).

The point of sources/bucketed.py: a counts table bucketed by counter
satisfies the ClusteredDistribution every window model requires, so
the physical plan contains ZERO Exchange operators — the clustering
cost is paid once at ingest, not per query. The same query over the
plain (non-bucketed) relation must show the Exchange, proving the
elision comes from bucketing and not from the query shape.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_counts_feed_windows_without_exchange(spark):
    from gnip_trend_detection_spark.operators.models import mann_kendall
    from gnip_trend_detection_spark.sources.bucketed import (
        read_bucketed_counts,
        write_bucketed_counts,
    )
    from gnip_trend_detection_spark.sources.tables import counts_from_events

    counts = counts_from_events(spark, SF, 3600)
    path = tempfile.mkdtemp(prefix="bucketed_counts_")
    write_bucketed_counts(counts, "counts_bucketed", path, n_buckets=8)
    try:
        bucketed = read_bucketed_counts(spark, "counts_bucketed").withColumnRenamed(
            "interval_start", "bin_start"
        )
        scored_bucketed = mann_kendall(bucketed, window_size=10)
        plan_bucketed = _plan(scored_bucketed)
        assert "Exchange" not in plan_bucketed, plan_bucketed

        plain = counts.withColumnRenamed("interval_start", "bin_start")
        plan_plain = _plan(mann_kendall(plain, window_size=10))
        assert "Exchange" in plan_plain  # the shuffle bucketing removes

        # and the results are identical either way
        a = {
            (r["counter"], r["interval_start"]): r["eta"]
            for r in scored_bucketed.collect()
        }
        b = {
            (r["counter"], r["interval_start"]): r["eta"]
            for r in mann_kendall(plain, window_size=10).collect()
        }
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS counts_bucketed")
