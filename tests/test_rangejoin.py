"""range_count_join: correctness on a hand-built case + the plan
guarantee that makes it a scale operator (equi-join, never BNLJ)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_range_count_join_counts_and_plan(spark):
    from gnip_trend_detection_spark.operators.rangejoin import range_count_join

    pts = spark.createDataFrame(
        [("a", 0), ("a", 10), ("a", 19), ("a", 20), ("a", 55), ("b", 5)],
        "k string, t long",
    )
    iv = spark.createDataFrame(
        [
            ("a", 1, 0, 20),    # [0,20): t=0,10,19 -> 3 (20 excluded)
            ("a", 2, 20, 40),   # [20,40): t=20 -> 1
            ("a", 3, 40, 50),   # empty -> 0
            ("b", 4, 0, 100),   # b only sees b's points -> 1
        ],
        "k string, iv_id int, s long, e long",
    )
    out = range_count_join(
        pts, iv, on=["k"], point_time="t", start_col="s", end_col="e",
        bucket_width=16,
    )
    got = {r["iv_id"]: r["n_points"] for r in out.collect()}
    assert got == {1: 3, 2: 1, 3: 0, 4: 1}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
