"""Distributed logistic regression (extras/classifier.py).

The driver fixtures' labels are geometrically random (5-NN accuracy is
chance), so correctness is pinned against (a) an in-process numpy twin
running the identical GD recipe and (b) convergence on a synthetic
linearly-separable set — not fixture accuracy.
"""

from __future__ import annotations

import numpy as np
import pytest

from gnip_trend_detection_spark.extras import classifier


def _numpy_twin(X, y, lr, n_iter):
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = p - y
        w = w - lr * (X.T @ r) / n
        b = b - lr * r.sum() / n
    return w, b


def _make_df(spark, X, y):
    rows = [
        (int(i), [float(v) for v in X[i]], float(y[i])) for i in range(len(y))
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, y double")


def test_logreg_matches_numpy_twin(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(200, 8)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.float64)
    df = _make_df(spark, X, y).repartition(4)
    w, b = classifier.logreg_train(df, label_col="y", lr=2.0, n_iter=15)
    w2, b2 = _numpy_twin(X, y, 2.0, 15)
    # cross-partition float sums reorder: parity to 1e-9, not exact
    assert np.allclose(w, w2, atol=1e-9)
    assert b == pytest.approx(b2, abs=1e-9)


def test_logreg_separates_synthetic_data(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(300, 6)
    y = (X @ np.array([1.0, -2.0, 0.5, 0.0, 0.0, 3.0]) > 0).astype(np.float64)
    df = _make_df(spark, X, y).repartition(3)
    w, b = classifier.logreg_train(df, label_col="y", lr=5.0, n_iter=40)
    scored = classifier.logreg_score(df, w, b).toPandas()
    acc = (scored.sort_values("vec_id")["pred"].to_numpy() == y).mean()
    assert acc >= 0.95


def test_logreg_score_probability_bounds(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(50, 4)
    y = (X[:, 0] > 0).astype(np.float64)
    df = _make_df(spark, X, y)
    w, b = classifier.logreg_train(df, label_col="y", lr=1.0, n_iter=5)
    pdf = classifier.logreg_score(df, w, b).toPandas()
    assert len(pdf) == 50
    assert ((pdf["prob"] >= 0.0) & (pdf["prob"] <= 1.0)).all()
    assert set(pdf["pred"].unique()) <= {0, 1}


def test_logreg_empty_input(spark):
    df = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, y double"
    )
    w, b = classifier.logreg_train(df, label_col="y")
    assert len(w) == 0 and b == 0.0


def test_logreg_newton_reaches_optimum(spark):
    """Newton/IRLS must land at a (near-)stationary point of the
    logistic loss — gradient at the returned weights ~ 0 — and at
    least match GD's separation on synthetic data in far fewer
    passes."""
    import numpy as np

    rng = np.random.RandomState(7)
    # OVERLAPPING classes: on separable data the logistic MLE diverges
    # (‖w‖ → ∞) and no finite iterate is stationary — overlap keeps
    # the optimum finite so Newton can actually reach it
    X = np.vstack([rng.randn(60, 4) + 0.7, rng.randn(60, 4) - 0.7])
    y = np.array([1.0] * 60 + [0.0] * 60)
    df = spark.createDataFrame(
        [(i, X[i].tolist(), float(y[i])) for i in range(len(y))],
        "vec_id long, embedding array<double>, y double",
    )
    from gnip_trend_detection_spark.extras import classifier

    w, b = classifier.logreg_train_newton(df, label_col="y", n_iter=8)
    # gradient of the (ridge-regularized) loss at the optimum
    Xa = np.hstack([X, np.ones((len(X), 1))])
    wa = np.append(w, b)
    p = 1.0 / (1.0 + np.exp(-(Xa @ wa)))
    g = Xa.T @ (p - y) + 1e-6 * wa
    # ~1e-6 in practice; the slack covers the ridge-vs-plain-gradient
    # fixpoint offset and cross-partition sum order
    assert np.abs(g).max() < 1e-4, g
    scored = classifier.logreg_score(df, w, b).toPandas()
    acc = (scored.sort_values("vec_id")["pred"].to_numpy() == y).mean()
    assert acc >= 0.85


def test_logreg_newton_empty_input(spark):
    from gnip_trend_detection_spark.extras import classifier

    df = spark.createDataFrame([], "vec_id long, embedding array<double>, y double")
    w, b = classifier.logreg_train_newton(df, label_col="y")
    assert len(w) == 0 and b == 0.0


def test_calibration_bins_and_ece_hand_values(spark):
    """Perfectly calibrated bins give ECE 0; a score that is always
    0.9 but right only half the time gives ECE = |0.9 - 0.5| = 0.4."""
    from gnip_trend_detection_spark.extras.classifier import (
        calibration_bins,
        expected_calibration_error,
    )

    rows = [(900000, i % 2 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "p_micro long, label boolean")
    bins = calibration_bins(df).collect()
    assert len(bins) == 1
    b = bins[0]
    assert b["bin"] == 9 and b["n_docs"] == 100
    assert b["mean_p"] == 0.9 and b["pos_rate"] == 0.5
    ece = expected_calibration_error(df).collect()[0]
    assert ece["ece"] == 0.4 and ece["n_bins_hit"] == 1

    # scores at the bin edges: 1e6 clamps into bin 9, 0 into bin 0
    edge = spark.createDataFrame(
        [(0, False), (1000000, True)], "p_micro long, label boolean"
    )
    by_bin = {r["bin"]: r for r in calibration_bins(edge).collect()}
    assert set(by_bin) == {0, 9}
    assert by_bin[0]["pos_rate"] == 0.0 and by_bin[9]["pos_rate"] == 1.0


def test_cohens_kappa_hand_values(spark):
    """Classic 2x2: a=20 both-keep, d=15 both-drop, b=10 only-A,
    c=5 only-B (n=50): po=0.7, pa=0.6, pb=0.5, pe=0.5, kappa=0.4.
    Perfect agreement gives kappa 1."""
    from gnip_trend_detection_spark.extras.classifier import cohens_kappa

    rows = (
        [(True, True)] * 20
        + [(False, False)] * 15
        + [(True, False)] * 10
        + [(False, True)] * 5
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50
    assert (r["n_both_keep"], r["n_both_drop"], r["n_only_a"], r["n_only_b"]) == (
        20,
        15,
        10,
        5,
    )
    assert r["po"] == 0.7 and r["pe"] == 0.5 and r["kappa"] == 0.4

    perfect = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 7, "a boolean, b boolean"
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0


def test_cohens_kappa_degenerate_pe_one_null(spark):
    """Both gates constant (everything agrees, pe = 1): kappa is
    0/0-undefined — must emit NULL in both engines, not NaN."""
    from gnip_trend_detection_spark.extras.classifier import cohens_kappa

    df = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 1.0 and r["pe"] == 1.0
    assert r["kappa"] is None
