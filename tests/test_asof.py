"""asof_join edge semantics: inclusive ties, pre-history nulls,
per-key isolation, payload passthrough."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_asof_join_semantics(spark):
    from gnip_trend_detection_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            ("a", 5, "e1"),   # between r@0 and r@10 -> r@0
            ("a", 10, "e2"),  # exactly at r@10 -> inclusive tie
            ("a", 99, "e3"),  # after the last right row -> r@10
            ("a", -1, "e4"),  # before all right rows -> null
            ("b", 7, "e5"),   # key b has its own timeline -> r@7
        ],
        "k string, t long, payload string",
    )
    right = spark.createDataFrame(
        [("a", 0, 100.0), ("a", 10, 110.0), ("b", 7, 700.0), ("c", 1, 999.0)],
        "k string, rt long, val double",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt", value_cols=["val"]
    )
    rows = {r["payload"]: (r["asof_time"], r["val"]) for r in out.collect()}
    assert rows == {
        "e1": (0, 100.0),
        "e2": (10, 110.0),
        "e3": (10, 110.0),
        "e4": (None, None),
        "e5": (7, 700.0),
    }
    # left row count preserved, left columns intact
    assert out.count() == 5
    assert set(out.columns) == {"k", "t", "payload", "asof_time", "val"}
