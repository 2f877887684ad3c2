"""Linear-regression slope model (SURVEY §2.4 M4; reference
models.py:47-90).

Per point, over each counter's ordered series:
1. averaged = trailing mean of the last ``averaging_window_size``
   counts, but 0 until that many counts exist (models.py:66-74 — the
   warm-up zeros stay in the series and participate in the fit).
2. result = OLS slope of the last ``regression_window_size`` averaged
   values (all of them when None) against x = 0..len-1; 0 until
   ``min_points`` values exist (models.py:76-90).
3. ``norm_by_mean`` divides y by its mean first; slope(y/ybar) =
   slope(y)/ybar, so it's a column divide (0 when ybar == 0 —
   divergence: the reference would produce nan/inf there).

Fully relational: `avg` + windowed-sum aggregates — no UDF, no
shuffle beyond the counter partitioning; x = row_number is
shift-invariant for the slope.

Cross-engine determinism note (r02 fix): the slope is computed from
explicit windowed sums, slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
NOT `regr_slope`. Engines accumulate `regr_slope` differently
(Spark: covariance pairs; DuckDB: mean-centered single pass), which
leaves last-ulp deltas. With integer counts and a power-of-two
``averaging_window_size``, every summand and every intermediate sum
here is an exactly-representable dyadic rational (while magnitudes
stay < 2^52), so FP addition is associative and the slope is
bit-identical on any engine evaluating the same formula, regardless
of window-sum fold order (sliding retract vs segment tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gnip_trend_detection_spark.functions.core import sig_round2


def linear_regression_model(
    rebinned: DataFrame,
    min_points: int,
    averaging_window_size: int = 1,
    regression_window_size: int | None = None,
    norm_by_mean: bool = False,
    ts_col: str = "bin_start",
    sig_round: bool = True,
) -> DataFrame:
    w = Window.partitionBy("counter").orderBy(ts_col)
    c = F.col("count").cast("double")
    rn = F.row_number().over(w)

    asize = averaging_window_size
    w_avg = w.rowsBetween(-(asize - 1), 0)
    averaged = F.when(rn >= asize, F.avg(c).over(w_avg)).otherwise(F.lit(0.0))

    df = rebinned.withColumn("rn", rn).withColumn("averaged", averaged)

    w2 = Window.partitionBy("counter").orderBy(ts_col)
    if regression_window_size is not None:
        frame = w2.rowsBetween(-(regression_window_size - 1), 0)
    else:
        frame = w2.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col("rn").cast("double")
    y = F.col("averaged")
    n = F.count(F.lit(1)).over(frame).cast("double")
    sx = F.sum(x).over(frame)
    sy = F.sum(y).over(frame)
    sxy = F.sum(x * y).over(frame)
    sxx = F.sum(x * x).over(frame)
    den = n * sxx - sx * sx
    # den == 0 only for single-point frames (x strictly increasing);
    # the reference's sklearn fit never sees that case with
    # min_points > 1 — guard to 0 like the old NULL-slope coalesce.
    slope = F.when(den != 0, (n * sxy - sx * sy) / den).otherwise(F.lit(0.0))
    if norm_by_mean:
        ybar = sy / n
        slope = F.when(ybar != 0, slope / ybar).otherwise(F.lit(0.0))
    result = F.when(F.col("rn") >= min_points, slope).otherwise(F.lit(0.0))
    if sig_round:
        result = sig_round2(result)
    return df.select(
        "counter",
        F.col(ts_col).alias("interval_start"),
        c.alias("count"),
        result.alias("eta"),
    )
