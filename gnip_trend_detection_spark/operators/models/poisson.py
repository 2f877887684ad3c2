"""Poisson background models (SURVEY §2.4 M1/M2; reference
models.py:238-340, paper trends.tex §3.1-3.2).

eta = sensitivity / relative_CI
    = (|c - nu| / nu) / ((ppf_hi(alpha, nu) - ppf_lo(alpha, nu)) / nu)
    = |c - nu| / (ppf_hi - ppf_lo),
0 when nu is null or 0 (models.py:306,316,331-340).

`lc` mode: nu = previous count → a `lag` window, fully relational
except the Poisson quantile, which runs in an Arrow-batched pandas UDF
(deduplicated per batch — nu values repeat heavily on count data).

`a` (cycle-corrected) mode: nu = running mean of counts sharing a
period key (e.g. hour-of-day), *inclusive of the current point* —
the reference updates numerator/denominator before reading the mean
(models.py:289-298). That self-inclusive quirk is exactly
`avg over rowsBetween(unboundedPreceding, currentRow)` partitioned by
(counter, period_key).

Divergences (documented): eta = 0 when the CI width is 0 (the
reference would raise ZeroDivisionError for 0 < nu <= ~0.005);
2-sig-digit rounding is HALF_UP (see functions.core.sig_round2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gnip_trend_detection_spark.functions.core import sig_round2
from gnip_trend_detection_spark.functions.poisson_math import poisson_interval

# Period-key attributes supported by the reference: any datetime
# *attribute* name (models.py:287 uses getattr; methods like
# .weekday would stringify to garbage there, so only attributes are
# meaningful). 'dayofweek' is an ENGINE EXTENSION beyond the
# reference: the paper describes cycle correction by day-of-week
# (§3.2), but the reference code cannot express it (datetime.weekday
# is a method, not an attribute, so getattr stringifies a bound
# method); values follow Spark's dayofweek (1=Sunday..7=Saturday).
#
# All keys are computed with session-timezone-FREE arithmetic — UTC
# wall clock regardless of spark.sql.session.timeZone. F.hour/F.year
# etc. on a TIMESTAMP render in the session zone, so a harness-owned
# non-UTC session would silently shift every cycle boundary; epoch
# modulus (sub-day keys) and DATE-typed extraction via
# date_from_unix_date (calendar keys) are zone-independent.


def _utc_date(ts):
    return F.date_from_unix_date(
        F.floor(ts.cast("double") / 86400).cast("int")
    )


_PERIOD_FUNCS: dict[str, callable] = {
    "year": lambda ts: F.year(_utc_date(ts)),
    "month": lambda ts: F.month(_utc_date(ts)),
    "day": lambda ts: F.dayofmonth(_utc_date(ts)),
    "hour": lambda ts: F.pmod(F.floor(ts.cast("double") / 3600), F.lit(24)),
    "minute": lambda ts: F.pmod(F.floor(ts.cast("double") / 60), F.lit(60)),
    "second": lambda ts: F.pmod(F.floor(ts.cast("double")), F.lit(60)),
    "dayofweek": lambda ts: F.dayofweek(_utc_date(ts)),
}


def _ci_width_udf(alpha: float):
    @F.pandas_udf(T.DoubleType())
    def ci_width(nu: pd.Series) -> pd.Series:
        import numpy as np

        vals = nu.to_numpy(dtype=np.float64, na_value=np.nan)
        out = np.full(vals.shape, np.nan)
        mask = np.isfinite(vals) & (vals > 0)
        if mask.any():
            uniq, inv = np.unique(vals[mask], return_inverse=True)
            lo, hi = poisson_interval(alpha, uniq)
            out[mask] = (hi - lo)[inv]
        return pd.Series(out)

    return ci_width


def _eta(count: Column, nu: Column, width: Column) -> Column:
    return sig_round2(
        F.when(
            nu.isNotNull() & (nu != 0) & width.isNotNull() & (width != 0),
            F.abs(count - nu) / width,
        ).otherwise(F.lit(0.0))
    )


def poisson_lc(
    rebinned: DataFrame,
    alpha: float = 0.99,
    ts_col: str = "bin_start",
) -> DataFrame:
    """Point-by-point Poisson: nu = previous count (models.py:275-282)."""
    w = Window.partitionBy("counter").orderBy(ts_col)
    c = F.col("count").cast("double")
    df = rebinned.withColumn("nu", F.lag(c).over(w))
    df = df.withColumn("ci_width", _ci_width_udf(alpha)(F.col("nu")))
    return df.select(
        "counter",
        F.col(ts_col).alias("interval_start"),
        c.alias("count"),
        _eta(c, F.col("nu"), F.col("ci_width")).alias("eta"),
    )


def poisson_cycle(
    rebinned: DataFrame,
    period_list: list[str] | str = "hour",
    alpha: float = 0.99,
    ts_col: str = "bin_start",
    include_nu: bool = False,
    ci_nu_floor: bool = False,
) -> DataFrame:
    """Cycle-corrected Poisson: nu = running self-inclusive mean per
    period key (models.py:284-298)."""
    if isinstance(period_list, str):
        period_list = [p.strip() for p in period_list.split(",")]
    keys = []
    for p in period_list:
        if p not in _PERIOD_FUNCS:
            raise ValueError(f"unsupported period attribute {p!r}")
        keys.append(_PERIOD_FUNCS[p](F.col(ts_col)).cast("string"))
    key = F.concat_ws(":", *keys)

    c = F.col("count").cast("double")
    w = (
        Window.partitionBy("counter", "period_key")
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = rebinned.withColumn("period_key", key).withColumn("nu", F.avg(c).over(w))
    if include_nu:
        return df.select(
            "counter",
            F.col(ts_col).alias("interval_start"),
            c.alias("count"),
            F.col("nu"),
        )
    # ci_nu_floor quantizes the CI lookup to floor(nu) — the oracle-
    # checkable variant (an integer-indexed CI table is expressible in
    # SQL; exact fractional-nu quantiles are not). eta's numerator
    # still uses the exact nu; nu in (0,1) yields eta 0 on both sides.
    nu_for_ci = F.floor(F.col("nu")).cast("double") if ci_nu_floor else F.col("nu")
    df = df.withColumn("ci_width", _ci_width_udf(alpha)(nu_for_ci))
    return df.select(
        "counter",
        F.col(ts_col).alias("interval_start"),
        c.alias("count"),
        _eta(c, F.col("nu"), F.col("ci_width")).alias("eta"),
    )
