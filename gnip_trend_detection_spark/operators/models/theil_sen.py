"""Theil–Sen robust trend slope per point — an engine extension of the
reference's trend-model family (SURVEY §2.4: the reference ships
LinearRegression slopes, models.py:47-80, and the rank-based
Mann-Kendall test, mk_test.py:14-77; Theil–Sen is the standard robust
companion to both — the median of all pairwise slopes over the
trailing window, insensitive to the single-bin spikes that wreck an
OLS slope and the natural effect-size partner to MK's significance z).

For each point, over the trailing ``window_size`` counts x_0..x_{m-1}
(equally spaced bins, so the x-axis is the bin index):

    slope = median{ (x_j - x_i) / (j - i) : 0 <= i < j < m }

Windows with fewer than 2 points emit 0.0 (mirroring mann_kendall's
z=0 convention for degenerate windows).

Execution shape is identical to mann_kendall: one shuffle (groupBy
counter), each counter's series in one Arrow batch via
``applyInPandas``, per-window pairwise slopes vectorized with
``np.triu_indices``. O(W^2) work per point on a bounded window — the
same budget the MK statistic already spends.

Determinism across engines: slopes are exact rationals p/q with
q < window_size; a ROUND(..., 6) boundary is a rational with
denominator 2e6, so a slope (or a midpoint average of two slopes,
denominator < 2·W²) can never sit within ~1e-8 of a boundary — last-ulp
fold differences between numpy's median and the oracle's QUANTILE_CONT
interpolation cannot flip the rounded value (the r02 tie-flake class
is structurally excluded; tools/selfcheck's ulp gate double-checks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _slope_series(x: np.ndarray, window_size: int) -> np.ndarray:
    n = x.size
    out = np.zeros(n)
    for i in range(n):
        w = x[max(0, i - window_size + 1) : i + 1]
        m = w.size
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, 1)
        out[i] = np.median((w[jj] - w[ii]) / (jj - ii))
    return out


def theil_sen(
    rebinned: DataFrame,
    window_size: int = 20,
    ts_col: str = "bin_start",
    round_digits: int = 6,
) -> DataFrame:
    """A3 DataFrame → (counter, interval_start, count, slope)."""

    def per_counter(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("interval_start")
        x = pdf["count"].to_numpy(dtype=np.float64)
        pdf["slope"] = _slope_series(x, window_size)
        return pdf[["counter", "interval_start", "count", "slope"]]

    base = rebinned.select(
        "counter",
        rebinned[ts_col].alias("interval_start"),
        rebinned["count"].cast("double").alias("count"),
    )
    out = base.groupBy("counter").applyInPandas(
        per_counter,
        schema="counter string, interval_start timestamp, count double, slope double",
    )
    # + 0.0 canonicalizes -0.0 for the cross-engine value hash
    return out.withColumn(
        "slope", F.round("slope", round_digits) + F.lit(0.0)
    )
