"""ROC holdout evaluation (operators.evaluate): pin the curve on a
synthetic labeled score set and sanity-check the fixture-driven query.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_roc_points_pinned_curve(spark):
    """Hand-computed curve: series max-etas
    pos: 2.0, 1.0, 0.4   neg: 1.5, 0.3
    theta=0.5 -> tpr 2/3, fpr 1/2; theta=1.2 -> tpr 1/3, fpr 1/2;
    theta=1.8 -> tpr 1/3, fpr 0; theta=2.5 -> tpr 0, fpr 0."""
    from gnip_trend_detection_spark.operators.evaluate import roc_points

    rows = [
        # (counter, is_trend, eta) — several points per series so the
        # per-series max actually aggregates
        ("p1", True, 0.1), ("p1", True, 2.0), ("p1", True, 1.2),
        ("p2", True, 1.0), ("p2", True, 0.2),
        ("p3", True, 0.4),
        ("n1", False, 1.5), ("n1", False, 0.0),
        ("n2", False, 0.3),
    ]
    scored = spark.createDataFrame(rows, "counter string, is_trend boolean, eta double")
    out = roc_points(scored, thetas=[0.5, 1.2, 1.8, 2.5])
    got = {r["theta"]: (r["tpr"], r["fpr"], r["n_pos"], r["n_neg"]) for r in out.collect()}
    assert got[0.5] == (pytest.approx(2 / 3, abs=1e-6), 0.5, 3, 2)
    assert got[1.2] == (pytest.approx(1 / 3, abs=1e-6), 0.5, 3, 2)
    assert got[1.8] == (pytest.approx(1 / 3, abs=1e-6), 0.0, 3, 2)
    assert got[2.5] == (0.0, 0.0, 3, 2)


def test_roc_query_monotone(spark):
    """The fixture-driven roc_points query must produce a weakly
    decreasing TPR and FPR as theta grows (ROC sanity), with the
    holdout split 16 pos / 16 neg."""
    from gnip_trend_detection_spark import queries as q

    out = q.ALL["roc_points"](spark, "/root/testdata/sf0.001").collect()
    rows = sorted(out, key=lambda r: r["theta"])
    assert all(r["n_pos"] == 16 and r["n_neg"] == 16 for r in rows)
    tprs = [r["tpr"] for r in rows]
    fprs = [r["fpr"] for r in rows]
    assert tprs == sorted(tprs, reverse=True)
    assert fprs == sorted(fprs, reverse=True)
    assert all(0.0 <= v <= 1.0 for v in tprs + fprs)


def test_precision_recall_pinned(spark):
    """Same synthetic max-etas as the ROC pin:
    pos: 2.0, 1.0, 0.4  neg: 1.5, 0.3
    theta=0.5 -> tp=2 fp=1: P=2/3 R=2/3 F1=2/3
    theta=1.8 -> tp=1 fp=0: P=1 R=1/3 F1=1/2
    theta=2.5 -> no detections: P/F1 null, R=0."""
    from gnip_trend_detection_spark.operators.evaluate import precision_recall

    rows = [
        ("p1", True, 2.0), ("p2", True, 1.0), ("p3", True, 0.4),
        ("n1", False, 1.5), ("n2", False, 0.3),
    ]
    scored = spark.createDataFrame(rows, "counter string, is_trend boolean, eta double")
    out = precision_recall(scored, thetas=[0.5, 1.8, 2.5])
    got = {
        r["theta"]: (r["precision"], r["recall"], r["f1"], r["n_detected"])
        for r in out.collect()
    }
    assert got[0.5] == (
        pytest.approx(2 / 3, abs=1e-6), pytest.approx(2 / 3, abs=1e-6),
        pytest.approx(2 / 3, abs=1e-6), 3,
    )
    assert got[1.8] == (1.0, pytest.approx(1 / 3, abs=1e-6), 0.5, 1)
    assert got[2.5] == (None, 0.0, None, 0)


def test_time_to_detection(spark):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.evaluate import time_to_detection

    rows = [
        # c1 crosses theta at t=120; c2 never does
        ("c1", 0.0, 0.2), ("c1", 60.0, 0.5), ("c1", 120.0, 1.3), ("c1", 180.0, 2.0),
        ("c2", 0.0, 0.1), ("c2", 60.0, 0.4),
    ]
    scored = spark.createDataFrame(
        rows, "counter string, e double, eta double"
    ).select("counter", F.timestamp_seconds("e").alias("interval_start"), "eta")
    onsets = spark.createDataFrame(
        [("c1", 0.0), ("c2", 0.0)], "counter string, e double"
    ).select("counter", F.timestamp_seconds("e").alias("onset_ts"))
    out = {r["counter"]: r for r in time_to_detection(scored, onsets, 1.0).collect()}
    assert out["c1"]["latency_sec"] == 120
    assert out["c2"]["first_detection_ts"] is None
    assert out["c2"]["latency_sec"] is None


def test_roc_on_reference_library(spark):
    """Golden evaluation: the reference's own labeled library.pkl
    (496 trends / 500 non-trends) through the full stack — pickle
    import → 25% holdout split → WDT scoring vs the remaining
    reference rows → ROC. The paper's claim (trends.tex fig:roc) is a
    large AUC; measured 0.77 with these scaled-down parameters, pinned
    conservatively at > 0.65 (chance = 0.5)."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.evaluate import (
        holdout_series,
        roc_points,
    )
    from gnip_trend_detection_spark.operators.library import import_pickle_library
    from gnip_trend_detection_spark.operators.models import weighted_data_templates

    path = "/root/reference/example/library.pkl"
    if not os.path.exists(path):
        pytest.skip("reference library.pkl not present")
    lib = import_pickle_library(spark, path)
    hold = lib.filter(F.col("series_id") % 4 < 1)
    ref = lib.filter(F.col("series_id") % 4 >= 1)
    ser = holdout_series(hold)
    scored = weighted_data_templates(
        ser.select("counter", "bin_start", "count"),
        ref,
        series_length=20,
        reference_length=60,
        lam=1.0,
        distance="l1",
        baseline_offset=10,
        n_smooth=10,
        sig_round=False,
        impl="numpy",
        score_latest_only=True,
    )
    labels = ser.select("counter", "is_trend").distinct()
    thetas = [0.1 * i for i in range(0, 51)]
    rows = roc_points(scored.join(labels, "counter"), thetas=thetas).collect()
    assert rows and rows[0]["n_pos"] == 124 and rows[0]["n_neg"] == 125
    pts = sorted({(r["fpr"], r["tpr"]) for r in rows} | {(0.0, 0.0), (1.0, 1.0)})
    auc = sum(
        (x2 - x1) * (y1 + y2) / 2 for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    )
    assert auc > 0.65, f"AUC {auc:.3f} barely above chance"


def test_holdout_series_shape(spark):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.evaluate import holdout_series

    lib = spark.createDataFrame(
        [(1, True, [1.0, 2.0, 3.0]), (2, False, [4.0])],
        "series_id long, is_trend boolean, points array<double>",
    )
    out = holdout_series(lib, interval_sec=60).collect()
    assert len(out) == 4
    by_counter = {}
    for r in out:
        by_counter.setdefault(r["counter"], []).append(r)
    assert set(by_counter) == {"h1", "h2"}
    h1 = sorted(by_counter["h1"], key=lambda r: r["bin_start"])
    assert [r["count"] for r in h1] == [1.0, 2.0, 3.0]
    assert (h1[1]["bin_start"] - h1[0]["bin_start"]).total_seconds() == 60.0
