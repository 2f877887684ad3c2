"""Library table ops: build chain, merge disjointness, plot gate."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_merge_rejects_shared_series(spark):
    from gnip_trend_detection_spark.operators.library import merge_libraries

    a = spark.createDataFrame(
        [(0, True, [1.0, 2.0]), (1, False, [3.0, 4.0])],
        "series_id long, is_trend boolean, points array<double>",
    )
    b = spark.createDataFrame(
        [(1, True, [5.0, 6.0])],
        "series_id long, is_trend boolean, points array<double>",
    )
    with pytest.raises(ValueError, match="share series_ids"):
        merge_libraries(a, b)
    c = spark.createDataFrame(
        [(2, True, [5.0, 6.0])],
        "series_id long, is_trend boolean, points array<double>",
    )
    assert merge_libraries(a, c).count() == 3


def test_build_library_applies_reference_chain(spark):
    import math

    from gnip_trend_detection_spark.operators.library import build_library

    raw = spark.createDataFrame(
        [(0, True, [float(x) for x in range(1, 13)])],
        "series_id long, is_trend boolean, points array<double>",
    )
    out = build_library(raw, reference_length=6, baseline_offset=2, n_smooth=2)
    pts = out.first()["points"]
    # sizing keeps the trailing 6 elements
    assert len(pts) == 6

    # shadow: add_one -> unit_norm(6,2) -> log10 -> smooth(2) -> size(6)
    s = [x + 1.0 for x in range(1, 13)]
    sl = s[-(6 + 2) : -2]
    total = sum(sl) / 6.0
    s = [x / total for x in s]
    s = [math.log10(x if x > 0 else 1e-5) for x in s]
    sm = [sum(s[max(0, i - 1) : i + 1]) / len(s[max(0, i - 1) : i + 1]) for i in range(len(s))]
    assert pts == pytest.approx(sm[-6:], rel=1e-12)


def test_plot_gate_without_matplotlib(spark):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib installed; gate not applicable")
    except ImportError:
        pass
    from gnip_trend_detection_spark.extras.plot import plot_analyzed

    df = spark.createDataFrame(
        [("c", None, 1.0, 0.0)],
        "counter string, interval_start timestamp, count double, eta double",
    )
    with pytest.raises(ImportError, match="matplotlib"):
        plot_analyzed(df, "c", "/tmp/x.png")
