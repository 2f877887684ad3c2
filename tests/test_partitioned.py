"""Partitioned storage prunes at the file-index level (SCALE.md):
the partition predicate must appear in PartitionFilters, and results
must match the unpartitioned filter exactly."""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_partition_pruning_and_equality(spark):
    from gnip_trend_detection_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )
    from gnip_trend_detection_spark.sources.tables import counts_from_events

    counts = counts_from_events(spark, SF, 3600).cache()
    some_counter = counts.select("counter").distinct().orderBy("counter").first()[0]
    path = tempfile.mkdtemp(prefix="partitioned_counts_")
    try:
        write_partitioned(
            counts, path, partition_cols=("counter",), sort_cols=("interval_start",)
        )
        back = read_partitioned(spark, path).filter(
            f"counter = '{some_counter}'"
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        # the predicate must live in PartitionFilters, not a row filter
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "counter" in pf, plan

        want = {
            (r["interval_start"], r["count"])
            for r in counts.filter(f"counter = '{some_counter}'").collect()
        }
        got = {(r["interval_start"], r["count"]) for r in back.collect()}
        assert got == want and len(got) > 0
    finally:
        counts.unpersist()
        shutil.rmtree(path, ignore_errors=True)
