"""Mann-Kendall trend statistic per point (SURVEY §2.4 M3; reference
models.py:25-45 + mk_test.py:14-77).

For each point, z of the MK test over the trailing ``window_size``
counts (or the full history when window_size is None):

    S     = sum_{k<j} sign(x_j - x_k)
    var_S = (n(n-1)(2n+5) - sum_t tp(tp-1)(2tp+5)) / 18   (tie-corrected)
    z     = (S-1)/sqrt(var_S) if S>0; 0 if S==0; (S+1)/sqrt(var_S) if S<0

The reference recomputes the full O(W^2) statistic per point in scalar
Python; here each counter's series is processed in one Arrow batch via
``applyInPandas`` with numpy broadcasting per trailing window.

Scale: one shuffle (groupBy counter); per-group state is O(series
length) — the same per-series-fits-in-memory assumption the reference
makes per process. The unbounded variant computes S incrementally
(each new point adds sum(sign(x_new - x_k))) instead of re-scanning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gnip_trend_detection_spark.functions.core import sig_round2


def _mk_z(x: np.ndarray) -> float:
    n = x.size
    if n < 2:
        return 0.0
    diff = np.sign(x[None, :] - x[:, None])
    s = float(np.triu(diff, 1).sum())
    _, counts = np.unique(x, return_counts=True)
    tie_term = float(np.sum(counts * (counts - 1) * (2 * counts + 5)))
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        return (s - 1) / np.sqrt(var_s)
    if s < 0:
        return (s + 1) / np.sqrt(var_s)
    return 0.0


def _z_series(x: np.ndarray, window_size: int | None) -> np.ndarray:
    n = x.size
    out = np.zeros(n)
    if window_size is not None:
        for i in range(n):
            out[i] = _mk_z(x[max(0, i - window_size + 1) : i + 1])
        return out
    # unbounded: incremental S — adding x_i contributes
    # sum(sign(x_i - x_k), k<i); ties tracked with a running counter.
    s = 0.0
    from collections import Counter

    tie_counts: Counter = Counter()
    tie_term = 0.0
    for i in range(n):
        xi = x[i]
        if i > 0:
            s += float(np.sign(xi - x[:i]).sum())
        c = tie_counts[xi]
        # updating one tie group from c to c+1 members
        tie_term += (c + 1) * c * (2 * (c + 1) + 5) - c * (c - 1) * (2 * c + 5)
        tie_counts[xi] = c + 1
        m = i + 1
        if m < 2:
            out[i] = 0.0
            continue
        var_s = (m * (m - 1) * (2 * m + 5) - tie_term) / 18.0
        if s > 0:
            out[i] = (s - 1) / np.sqrt(var_s)
        elif s < 0:
            out[i] = (s + 1) / np.sqrt(var_s)
        else:
            out[i] = 0.0
    return out


def mann_kendall(
    rebinned: DataFrame,
    window_size: int | None = None,
    ts_col: str = "bin_start",
    sig_round: bool = True,
) -> DataFrame:
    """A3 DataFrame → D4 (counter, interval_start, count, eta=z)."""

    def per_counter(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("interval_start")
        x = pdf["count"].to_numpy(dtype=np.float64)
        pdf["eta"] = _z_series(x, window_size)
        return pdf[["counter", "interval_start", "count", "eta"]]

    base = rebinned.select(
        "counter",
        rebinned[ts_col].alias("interval_start"),
        rebinned["count"].cast("double").alias("count"),
    )
    out = base.groupBy("counter").applyInPandas(
        per_counter,
        schema="counter string, interval_start timestamp, count double, eta double",
    )
    if sig_round:
        out = out.withColumn("eta", sig_round2(out["eta"]))
    return out
