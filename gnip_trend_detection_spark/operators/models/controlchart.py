"""Control-chart detectors over rebinned series: finite-horizon EWMA
burst flagging, one-sided CUSUM change-point detection, and additive
seasonal decomposition.

Engine extensions in the same family as the reference's point models
(SURVEY §2.4): the reference scores each (counter, bin) from trailing
state (models.py: Poisson lag, MK window, LR window); EWMA and CUSUM
are the two classic SPC charts that fill the gap between the
reference's single-lag Poisson (memoryless) and its long-window
regression (slow), and the seasonal split is the cycle-model
(models.py:112-158) idea taken to its decomposition form.

Cross-engine determinism (the r02/r03 lesson, same discipline as
linreg.py): every value either IS an exactly-representable dyadic
rational with bounded exponent span (so FP addition is associative
and fold order — Spark running-window vs DuckDB segment tree — cannot
matter), or is produced by a single deterministic IEEE op (one
division, one comparison) from such values. No ROUND at a decimal
boundary anywhere: outputs are raw doubles, bit-identical across
engines by construction.

- EWMA weights lambda*(1-lambda)^j with lambda = 1/4: all weights are
  dyadic (3^j / 4^(j+1)); products with integer counts < 2^20 need
  mantissa <= 20 + 2*window bits — exact for window <= 8.
- CUSUM/seasonal quantize the one non-dyadic intermediate (a mean)
  with FLOOR to a power-of-two grid: floor of bit-identical doubles is
  bit-identical (no half-tie class exists for floor the way it does
  for HALF_UP vs HALF_EVEN round), and every summand downstream is
  dyadic again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ewma_chart(
    series: DataFrame,
    lam_num: int = 1,
    lam_den: int = 4,
    window: int = 8,
    burst_mult: int = 2,
    warmup: int = 4,
) -> DataFrame:
    """(counter, bin_ts, count) -> + (ewma double, burst int).

    Finite-horizon EWMA: ewma_t = sum_j w_j * x_{t-j} / sum_j w_j over
    the last ``window`` points (j = 0 is the current point), with
    w_j = lam * (1-lam)^j and the denominator restricted to the lags
    that exist — the standard truncated-EWMA normalization, so the
    series head is an average of what's there instead of biased low.
    burst = 1 when the current count exceeds ``burst_mult`` times the
    PREVIOUS point's ewma (the one-step forecast), after ``warmup``
    points.

    The numerator/denominator are explicit fixed-order lag sums (not
    window aggregates), so both engines evaluate the identical
    expression tree; with lam = 1/4 every term is exact (module
    docstring), making the chart value bit-identical across engines.
    One exchange (counter) + one sort; no UDF, no join.
    """
    if not (0 < lam_num < lam_den):
        raise ValueError("need 0 < lam_num/lam_den < 1")
    lam = lam_num / lam_den
    w = Window.partitionBy("counter").orderBy("bin_ts")
    c = F.col("count").cast("double")

    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for j in range(window):
        weight = lam * (1.0 - lam) ** j
        lagged = c if j == 0 else F.lag(c, j).over(w)
        num = num + F.coalesce(lagged * F.lit(weight), F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(
            F.lit(0.0)
        )
    # den >= w_0 > 0 always: the j=0 term is the row itself
    staged = series.select(
        "counter",
        "bin_ts",
        c.alias("count"),
        (num / den).alias("ewma"),
        F.row_number().over(w).alias("__rn"),
    )
    prev = F.lag("ewma", 1).over(w)
    burst = (
        F.when(
            (F.col("__rn") > warmup)
            & (F.col("count") > F.lit(float(burst_mult)) * prev),
            1,
        )
        .otherwise(0)
        .cast("int")
    )
    return staged.select(
        "counter", "bin_ts", "count", "ewma", burst.alias("burst")
    )


def cusum_chart(
    series: DataFrame,
    slack_num: int = 1,
    slack_den: int = 4,
    h_mult: int = 8,
) -> DataFrame:
    """(counter, bin_ts, count) -> + (cusum double, alarm int).

    One-sided upper CUSUM: s_t = max(0, s_{t-1} + (x_t - k)) with
    reference level k = (1 + slack) * mu_q, mu_q the FLOOR-quantized
    (1/64 grid) per-counter mean and slack = slack_num/slack_den;
    alarm when s_t > h_mult * mu_q.

    The recursion is rewritten with the prefix-sum identity
    s_t = P_t - min(0, min_{i<=t} P_i), P_t = sum_{i<=t} d_i — two
    ordered window aggregates instead of a sequential fold, so the
    whole chart is one exchange + one sort per counter and stays
    data-parallel. Every d_i is dyadic (granularity 2^-8 after the
    mean quantization), so the running sums are exact regardless of
    each engine's window fold order.
    """
    w = Window.partitionBy("counter")
    wo = Window.partitionBy("counter").orderBy("bin_ts")
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    c = F.col("count").cast("double")
    mu = F.sum(c).over(w) / F.count(F.lit(1)).over(w)
    mu_q = F.floor(mu * 64).cast("double") / F.lit(64.0)
    s1 = series.select(
        "counter", "bin_ts", c.alias("count"), mu_q.alias("__mu_q")
    )
    d = F.col("count") - F.col("__mu_q") * F.lit(1.0 + slack_num / slack_den)
    s2 = s1.withColumn("__p", F.sum(d).over(run))
    s3 = s2.withColumn(
        "__rm", F.min(F.least(F.col("__p"), F.lit(0.0))).over(run)
    )
    s = F.col("__p") - F.col("__rm")
    alarm = (
        F.when(s > F.lit(float(h_mult)) * F.col("__mu_q"), 1)
        .otherwise(0)
        .cast("int")
    )
    return s3.select(
        "counter", "bin_ts", "count", s.alias("cusum"), alarm.alias("alarm")
    )


def seasonal_decompose(
    series: DataFrame,
    period_bins: int = 24,
    bin_sec: int = 3600,
    half_window: int = 12,
) -> DataFrame:
    """Additive seasonal decomposition of a binned series:
    (counter, bin_ts, count) -> + (trend, phase, seasonal, residual).

    trend    = centered moving average over +/- ``half_window`` rows
               (partial at the edges — average of what exists);
    seasonal = per-(counter, phase) mean of the detrended series,
               phase = (bin_ts / bin_sec) mod period_bins (hour-of-day
               for the defaults);
    residual = detrended - seasonal.

    Determinism: the trend is an exact integer window sum divided once
    (both deterministic); the detrended value is FLOOR-quantized to
    2^-14 before the seasonal GROUP BY, so the per-phase mean sums
    dyadic rationals (span <= 21 + log2(n_bins) + 14 bits — exact for
    any realistic series length) and is merge-order-invariant in both
    Spark's partial hash agg and DuckDB's parallel agg. The seasonal
    relation is period_bins x n_counters rows — broadcast-joined back.
    """
    wo = Window.partitionBy("counter").orderBy("bin_ts")
    frame = wo.rowsBetween(-half_window, half_window)
    c = F.col("count").cast("double")
    trend = F.sum(c).over(frame) / F.count(F.lit(1)).over(frame)
    # bin_ts is a multiple of bin_sec by construction, so the division
    # is an exact integer value and the cast is safe on both engines
    phase = ((F.col("bin_ts") % (bin_sec * period_bins)) / bin_sec).cast(
        "int"
    )
    q = F.lit(16384.0)
    base = series.select(
        "counter",
        "bin_ts",
        c.alias("count"),
        trend.alias("trend"),
        phase.alias("phase"),
        (F.floor((c - trend) * q).cast("double") / q).alias("__det"),
    )
    seasonal = base.groupBy("counter", "phase").agg(
        (F.sum("__det") / F.count(F.lit(1))).alias("seasonal")
    )
    return base.join(F.broadcast(seasonal), ["counter", "phase"]).select(
        "counter",
        "bin_ts",
        "count",
        "trend",
        "phase",
        "seasonal",
        (F.col("__det") - F.col("seasonal")).alias("residual"),
    )
