"""chain_numpy (vectorized mapInPandas chain kernel) must reproduce
the HOF apply_chain composition bit-for-bit up to the log10 ulp
(Java Math.log10 vs numpy libm — the only engine-specific op in the
recipe), and the strict -0.0-sensitive parity canonicalizer must
actually distinguish signed zeros (it hid the r02 driver failures)."""

import math

import pytest
from pyspark.sql import functions as F

from gnip_trend_detection_spark.operators import transforms
from gnip_trend_detection_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _hof_chain(e, stages):
    out = transforms.apply_chain(e, "a", "arr", stages)
    return out.select("vec_id", "arr")


@pytest.mark.parametrize("sizing", [None, 32])
def test_chain_numpy_matches_hof(spark, sizing):
    e = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("a")
    )
    if sizing is None:
        stages = transforms.test_stages(32, 8, 5)
    else:
        stages = transforms.reference_stages(32, 8, 5)
    hof = {r["vec_id"]: r["arr"] for r in _hof_chain(e, stages).collect()}
    fast = {
        r["vec_id"]: r["arr"]
        for r in transforms.chain_numpy(
            e,
            "vec_id",
            "a",
            "arr",
            reference_length=32,
            baseline_offset=8,
            n_smooth=5,
            sizing_length=sizing,
        ).collect()
    }
    assert hof.keys() == fast.keys()
    worst = 0.0
    for k, h in hof.items():
        f = fast[k]
        assert len(h) == len(f), k
        for a, b in zip(h, f):
            worst = max(worst, abs(a - b))
    # only log10 may differ, by ~1 ulp of values in [-5, ~2]
    assert worst < 1e-12, worst


def test_chain_numpy_edge_short_arrays(spark):
    # arrays shorter than the smoothing window / empty arrays
    df = spark.createDataFrame(
        [(1, [2.0, 3.0]), (2, []), (3, [5.0])], "vec_id long, a array<double>"
    )
    out = {
        r["vec_id"]: r["arr"]
        for r in transforms.chain_numpy(
            df, "vec_id", "a", "arr", reference_length=4, baseline_offset=1, n_smooth=3
        ).collect()
    }
    hof = {
        r["vec_id"]: r["arr"]
        for r in _hof_chain(df, transforms.test_stages(4, 1, 3)).collect()
    }
    assert out.keys() == hof.keys()
    for k in out:
        assert len(out[k]) == len(hof[k])
        for a, b in zip(out[k], hof[k]):
            assert abs(a - b) < 1e-12


def test_parity_canon_distinguishes_negative_zero():
    from tests.parity import _canon

    assert _canon(-0.0) != _canon(0.0)
    assert _canon(0.0) == 0.0
    assert _canon(float("nan")) == "NaN"


def test_linreg_exact_sum_formula_matches_regr_slope(spark):
    """The explicit-sum slope must agree with Spark's own regr_slope
    to FP noise (the rewrite is about CROSS-ENGINE determinism, not a
    semantic change)."""
    from gnip_trend_detection_spark.operators.models.linreg import (
        linear_regression_model,
    )
    from gnip_trend_detection_spark import queries as q

    ser = q._series_ts(spark, SF_SMOKE, 3600)
    mine = linear_regression_model(
        ser, min_points=8, averaging_window_size=4, regression_window_size=24,
        sig_round=False,
    )
    rows = {
        (r["counter"], r["interval_start"]): r["eta"] for r in mine.collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("counter").orderBy("bin_start")
    c = F.col("count").cast("double")
    rn = F.row_number().over(w)
    averaged = F.when(rn >= 4, F.avg(c).over(w.rowsBetween(-3, 0))).otherwise(
        F.lit(0.0)
    )
    df = ser.withColumn("rn", rn).withColumn("averaged", averaged)
    frame = Window.partitionBy("counter").orderBy("bin_start").rowsBetween(-23, 0)
    slope = F.regr_slope(F.col("averaged"), F.col("rn").cast("double")).over(frame)
    ref = df.select(
        "counter",
        "bin_start",
        F.coalesce(
            F.when(rn >= 8, slope).otherwise(F.lit(0.0)), F.lit(0.0)
        ).alias("eta"),
    )
    for r in ref.collect():
        a = rows[(r["counter"], r["bin_start"])]
        assert a is not None and not math.isnan(a)
        assert abs(a - r["eta"]) < 1e-9, (r, a)
