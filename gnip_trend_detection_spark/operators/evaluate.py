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
    (theta, tpr, fpr, n_pos, n_neg) per swept θ, ordered by theta.
    """
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
    return (
        sweep.groupBy("theta")
        .agg(
            F.sum(F.when(pos, one).otherwise(0)).alias("n_pos"),
            F.sum(F.when(~pos, one).otherwise(0)).alias("n_neg"),
            F.sum(F.when(pos & det, one).otherwise(0)).alias("tp"),
            F.sum(F.when(~pos & det, one).otherwise(0)).alias("fp"),
        )
        .select(
            "theta",
            F.round(F.col("tp") / F.col("n_pos"), rate_round).alias("tpr"),
            F.round(F.col("fp") / F.col("n_neg"), rate_round).alias("fpr"),
            "n_pos",
            "n_neg",
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
