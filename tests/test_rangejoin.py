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


def test_range_count_join_fractional_second_trailing_window(spark):
    """Regression: the upper bucket bound must be floor(end/w), not
    floor((end-1)/w). With fractionally-aligned intervals (s=0.7,
    e=3600.7, w=3600) a point in the trailing sub-second (t=3600.2,
    inside [s, e)) lands in bucket 1, which the old integer-only bound
    floor(3599.7/3600)=0 never exploded to — the point was silently
    dropped. This is exactly the conversion-within-hour shape with
    fractional-second event timestamps."""
    from gnip_trend_detection_spark.operators.rangejoin import range_count_join

    iv = spark.createDataFrame(
        [
            ("u", 1, 0.7, 3600.7),      # fractional hour window
            ("u", 2, 7200.0, 10800.0),  # aligned window, boundary checks
        ],
        "k string, iv_id int, s double, e double",
    )
    pts = spark.createDataFrame(
        [
            ("u", 0.7),       # == s, included (half-open lower bound)
            ("u", 3600.2),    # trailing sub-second: the old-bound victim
            ("u", 3600.7),    # == e, excluded
            ("u", 10799.9),   # trailing sub-second of the aligned window
            ("u", 10800.0),   # == e, excluded
        ],
        "k string, t double",
    )
    out = range_count_join(
        pts, iv, on=["k"], point_time="t", start_col="s", end_col="e",
        bucket_width=3600,
    )
    got = {r["iv_id"]: r["n_points"] for r in out.collect()}
    assert got == {1: 2, 2: 1}

    # brute-force cross-check across widths (width must never change
    # results, fractional or not)
    for w in (7, 1800, 3600, 5000):
        alt = range_count_join(
            pts, iv, on=["k"], point_time="t", start_col="s", end_col="e",
            bucket_width=w,
        )
        assert {r["iv_id"]: r["n_points"] for r in alt.collect()} == got


def test_choose_bucket_width_tracks_median_interval(spark):
    """Width chooser returns ~the median interval length (one
    approx_percentile pass), clamped to >= 1; join results are
    width-invariant so this only tunes the explode factor."""
    from gnip_trend_detection_spark.operators.rangejoin import (
        choose_bucket_width,
        range_count_join,
    )

    iv = spark.createDataFrame(
        [(i, 0, 100) for i in range(20)] + [(99, 0, 100000)],
        "iv_id int, s long, e long",
    )
    w = choose_bucket_width(iv)
    assert 50 <= w <= 200  # median-ish, not dragged by the outlier

    # sub-second intervals clamp to 1, never 0
    tiny = spark.createDataFrame([(1, 0.0, 0.25)], "iv_id int, s double, e double")
    assert choose_bucket_width(tiny) == 1

    # width-invariance of the actual join
    from pyspark.sql import functions as F

    pts = spark.createDataFrame([(5,), (50,), (99,)], "t long").withColumn(
        "k", F.lit(1)
    )
    ivk = iv.withColumn("k", F.lit(1))
    a = {
        r["iv_id"]: r["n_points"]
        for r in range_count_join(pts, ivk, on=["k"], bucket_width=w).collect()
    }
    b = {
        r["iv_id"]: r["n_points"]
        for r in range_count_join(pts, ivk, on=["k"], bucket_width=7).collect()
    }
    assert a == b
