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


def norm_ppf(q: float) -> float:
    """Standard-normal inverse CDF, scipy-free: bisection on the exact
    CDF Phi(x) = erfc(-x/sqrt(2))/2 (libm erfc), converged to the
    float boundary. Only evaluated once per mann_kendall call (the
    alpha critical value), so speed is irrelevant."""
    import math

    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    lo, hi = -10.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if mid in (lo, hi):
            break
        if math.erfc(-mid / math.sqrt(2.0)) / 2.0 < q:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def mann_kendall(
    rebinned: DataFrame,
    window_size: int | None = None,
    ts_col: str = "bin_start",
    sig_round: bool = True,
    with_p: bool = False,
    alpha: float = 0.05,
) -> DataFrame:
    """A3 DataFrame → D4 (counter, interval_start, count, eta=z).

    with_p — the reference mk_test's full return tuple
    (mk_test.py:66-75): adds ``p_value`` = 2*(1-Phi(|z|)) computed as
    erfc(|z|/sqrt(2)) (libm-exact, matching scipy's norm.cdf to the
    ulp — no polynomial approximation), and ``trend`` in
    {'increasing','decreasing','no trend'} via h = |z| >
    norm_ppf(1-alpha/2) on the UNROUNDED z, exactly the reference's
    significance gate. eta still honors sig_round; p/trend do not."""
    import math

    z_crit = norm_ppf(1.0 - alpha / 2.0) if with_p else 0.0
    sqrt2 = math.sqrt(2.0)

    def per_counter(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("interval_start")
        x = pdf["count"].to_numpy(dtype=np.float64)
        z = _z_series(x, window_size)
        pdf["eta"] = z
        if with_p:
            pdf["p_value"] = [math.erfc(abs(v) / sqrt2) for v in z]
            h = np.abs(z) > z_crit
            pdf["trend"] = np.where(
                (z < 0) & h,
                "decreasing",
                np.where((z > 0) & h, "increasing", "no trend"),
            )
            return pdf[
                ["counter", "interval_start", "count", "eta", "p_value", "trend"]
            ]
        return pdf[["counter", "interval_start", "count", "eta"]]

    schema = "counter string, interval_start timestamp, count double, eta double"
    if with_p:
        schema += ", p_value double, trend string"
    base = rebinned.select(
        "counter",
        rebinned[ts_col].alias("interval_start"),
        rebinned["count"].cast("double").alias("count"),
    )
    out = base.groupBy("counter").applyInPandas(per_counter, schema=schema)
    if sig_round:
        out = out.withColumn("eta", sig_round2(out["eta"]))
    return out
