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


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check: pandas merge_asof (direction='backward',
    allow_exact_matches=True) implements the same inclusive as-of
    semantics — compare on 3 seeded datasets."""
    import numpy as np
    import pandas as pd

    from gnip_trend_detection_spark.operators.asof import asof_join

    for seed in (7, 42, 1234):
        rng = np.random.RandomState(seed)
        keys = ["k0", "k1", "k2"]
        left_pd = pd.DataFrame(
            {
                "k": rng.choice(keys, 60),
                "t": rng.randint(0, 1000, 60).astype("int64"),
                "lid": np.arange(60, dtype="int64"),
            }
        )
        right_pd = pd.DataFrame(
            {
                "k": rng.choice(keys, 25),
                "rt": rng.choice(np.arange(0, 1000, 7, dtype="int64"), 25, replace=False),
                "val": rng.randn(25).round(6),
            }
        )
        want_pd = pd.merge_asof(
            left_pd.sort_values("t"),
            right_pd.sort_values("rt"),
            left_on="t",
            right_on="rt",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.rt) else int(r.rt),
                         None if pd.isna(r.val) else float(r.val))
            for r in want_pd.itertuples()
        }
        out = asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            on=["k"],
            left_time="t",
            right_time="rt",
            value_cols=["val"],
        )
        got = {
            int(r["lid"]): (r["asof_time"], r["val"]) for r in out.collect()
        }
        assert got == want, f"seed {seed}"
