"""Pure-numpy Poisson quantiles (scipy is not available in this image).

Matches scipy.stats.poisson semantics used by the reference
(models.py:308: ``dists.poisson.interval(alpha, mean)``):
``ppf(q, mu)`` is the smallest integer k with CDF(k) >= q, and
``interval(alpha, mu) = (ppf((1-alpha)/2, mu), ppf((1+alpha)/2, mu))``.

Vectorized CDF recurrence: p_k = p_{k-1} * mu / k starting from
p_0 = exp(-mu). Exact for mu <= 700 (exp underflow bound); above that
a normal approximation with continuity correction is used — far beyond
any per-bin count this engine produces in practice, and documented.
"""

from __future__ import annotations

import numpy as np

_EXACT_MU_MAX = 700.0


def poisson_ppf(q: float, mu: np.ndarray) -> np.ndarray:
    """Smallest k with Poisson(mu) CDF(k) >= q, elementwise over mu.

    mu must be > 0; q in (0, 1).
    """
    mu = np.asarray(mu, dtype=np.float64)
    out = np.zeros_like(mu)
    exact = mu <= _EXACT_MU_MAX
    if exact.any():
        m = mu[exact]
        p = np.exp(-m)
        cdf = p.copy()
        k = np.zeros_like(m)
        pending = cdf < q
        i = 0
        # bounded by mu + ~10*sqrt(mu): the CDF tail vanishes there
        max_iter = int(np.max(m) + 12.0 * np.sqrt(np.max(m)) + 60) if m.size else 0
        while pending.any() and i < max_iter:
            i += 1
            p = p * m / i
            cdf = cdf + p
            k = np.where(pending & (cdf >= q), float(i), k)
            pending = pending & (cdf < q)
        # anything still pending: numerical tail — clamp to last index
        k[pending] = float(max_iter)
        out[exact] = k
    if (~exact).any():
        from math import erf  # noqa: F401  (numpy path below)

        m = mu[~exact]
        # normal approx with continuity correction, then a local fixup
        z = _norm_ppf(q)
        out[~exact] = np.maximum(0.0, np.floor(m + z * np.sqrt(m) + 0.5))
    return out


def poisson_interval(alpha: float, mu: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) two-sided confidence interval, scipy ``interval`` style."""
    q_lo = (1.0 - alpha) / 2.0
    q_hi = (1.0 + alpha) / 2.0
    return poisson_ppf(q_lo, mu), poisson_ppf(q_hi, mu)


def _norm_ppf(q: float) -> float:
    """Acklam's rational approximation of the standard normal inverse
    CDF (max abs error ~1e-9); only used on the mu > 700 fallback path.
    """
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow = 0.02425
    if q < plow:
        u = np.sqrt(-2 * np.log(q))
        return (((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u + c[5]) / (
            (((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1
        )
    if q > 1 - plow:
        u = np.sqrt(-2 * np.log(1 - q))
        return -(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u + c[5]) / (
            (((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1
        )
    u = q - 0.5
    t = u * u
    return (((((a[0] * t + a[1]) * t + a[2]) * t + a[3]) * t + a[4]) * t + a[5]) * u / (
        ((((b[0] * t + b[1]) * t + b[2]) * t + b[3]) * t + b[4]) * t + 1
    )
