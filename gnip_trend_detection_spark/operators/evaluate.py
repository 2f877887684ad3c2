"""Model evaluation: ROC over a labeled holdout (SURVEY §2 evaluation
gap; reference methodology paper/trends.tex:489-516, example/roc.png).

The reference validates a trained library by removing random labeled
test sets from R+/R-, scoring them through the analysis, and sweeping
the detection threshold θ over the resulting η values to trace the
TPR/FPR curve. Here that is a pure relational pipeline:

1. per-series decision statistic: max η over the scored points (a
   series is detected at θ iff any of its η values reaches θ) —
   one hash aggregate keyed by series;
2. θ sweep: explode a literal θ array against the per-series rows
   (|series| × |θ| rows — both sides tiny after the aggregate, no
   shuffle growth);
3. one final aggregate keyed by θ → (θ, tpr, fpr, n_pos, n_neg).

Scale shape: the only data-sized shuffle is the per-series max; the
sweep and the final agg run on O(series × thetas) rows. At 100 TB the
scored input is the big side and it is touched exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sweep_counts(
    scored: DataFrame,
    thetas: Sequence[float],
    series_col: str,
    label_col: str,
    eta_col: str,
) -> DataFrame:
    """Shared θ-sweep kernel: per-series max η, explode the θ array,
    aggregate confusion counts keyed by θ → (theta, tp, fp, n_pos,
    n_neg). Used by roc_points and precision_recall."""
    per_series = scored.groupBy(series_col, label_col).agg(
        F.max(eta_col).alias("max_eta")
    )
    sweep = per_series.select(
        label_col,
        "max_eta",
        F.explode(F.array(*[F.lit(float(t)) for t in thetas])).alias("theta"),
    )
    pos = F.col(label_col)
    det = F.col("max_eta") >= F.col("theta")
    one = F.lit(1)
    return sweep.groupBy("theta").agg(
        F.sum(F.when(pos, one).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~pos, one).otherwise(0)).alias("n_neg"),
        F.sum(F.when(pos & det, one).otherwise(0)).alias("tp"),
        F.sum(F.when(~pos & det, one).otherwise(0)).alias("fp"),
    )


def roc_points(
    scored: DataFrame,
    thetas: Sequence[float],
    series_col: str = "counter",
    label_col: str = "is_trend",
    eta_col: str = "eta",
    rate_round: int = 6,
) -> DataFrame:
    """scored: one row per (series, point) with an η score and a
    boolean ground-truth label (constant within a series) →
    (theta, tpr, fpr, n_pos, n_neg) per swept θ.
    """
    counts = _sweep_counts(scored, thetas, series_col, label_col, eta_col)
    return counts.select(
        "theta",
        F.round(F.col("tp") / F.col("n_pos"), rate_round).alias("tpr"),
        F.round(F.col("fp") / F.col("n_neg"), rate_round).alias("fpr"),
        "n_pos",
        "n_neg",
    )


def precision_recall(
    scored: DataFrame,
    thetas: Sequence[float],
    series_col: str = "counter",
    label_col: str = "is_trend",
    eta_col: str = "eta",
    rate_round: int = 6,
) -> DataFrame:
    """Same sweep as roc_points but emitting classification quality:
    (theta, precision, recall, f1, n_detected). Precision (and f1) are
    NULL at thresholds with zero detections — no convention hides that
    the operating point is degenerate (trends.tex:105-123 frames
    precision/recall as the practical detection metrics)."""
    counts = _sweep_counts(scored, thetas, series_col, label_col, eta_col)
    n_det = F.col("tp") + F.col("fp")
    precision = F.when(n_det > 0, F.col("tp") / n_det)
    recall = F.col("tp") / F.col("n_pos")
    f1 = F.when(
        n_det > 0,
        F.when(
            (F.col("tp") / n_det + recall) > 0,
            2 * (F.col("tp") / n_det) * recall / (F.col("tp") / n_det + recall),
        ).otherwise(F.lit(0.0)),
    )
    return counts.select(
        "theta",
        F.round(precision, rate_round).alias("precision"),
        F.round(recall, rate_round).alias("recall"),
        F.round(f1, rate_round).alias("f1"),
        n_det.alias("n_detected"),
    )


def time_to_detection(
    scored: DataFrame,
    onsets: DataFrame,
    theta: float,
    series_col: str = "counter",
    ts_col: str = "interval_start",
    eta_col: str = "eta",
) -> DataFrame:
    """Detection latency at threshold θ (trends.tex:105-123,208-212 —
    the reference frames trend detection value as how EARLY the alarm
    fires): first scored bin with η ≥ θ per series, joined against a
    (series, onset_ts) table → (series, onset_ts, first_detection_ts,
    latency_sec; nulls when never detected).

    Scale shape: one filtered scan + min-aggregate on the scored side;
    the per-series detection table that emerges is dimension-sized and
    broadcast into the left join (the preserved onsets side cannot be
    the broadcast side of a left-outer).
    """
    det = (
        scored.filter(F.col(eta_col) >= F.lit(float(theta)))
        .groupBy(series_col)
        .agg(F.min(ts_col).alias("first_detection_ts"))
    )
    return (
        onsets.join(F.broadcast(det), series_col, "left")
        .select(
            series_col,
            "onset_ts",
            "first_detection_ts",
            (
                F.col("first_detection_ts").cast("double")
                - F.col("onset_ts").cast("double")
            )
            .cast("long")
            .alias("latency_sec"),
        )
    )


def holdout_series(
    library: DataFrame,
    interval_sec: int = 3600,
    prefix: str = "h",
) -> DataFrame:
    """Turn held-out library rows (series_id, is_trend, points) into a
    scoreable time-series table (counter, bin_start, count, is_trend) —
    the reference feeds removed R+/R- members back through the analysis
    as if they were live series (trends.tex:492-494)."""
    out = library.select(
        F.concat(F.lit(prefix), F.col("series_id").cast("string")).alias("counter"),
        "is_trend",
        F.posexplode_outer("points").alias("idx", "count"),
    ).filter(F.col("idx").isNotNull())
    return out.select(
        "counter",
        "is_trend",
        F.timestamp_seconds(F.col("idx").cast("long") * interval_sec).alias(
            "bin_start"
        ),
        F.col("count").cast("double").alias("count"),
    )
