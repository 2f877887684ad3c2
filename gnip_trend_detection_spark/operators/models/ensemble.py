"""Consensus trend detection: rank-blend of Mann-Kendall z, Theil–Sen
slope, and the trailing burst ratio over one shared per-counter pass.

The three detectors read the SAME trailing window of the SAME series,
so computing them in three separate operators costs three per-counter
exchanges plus two joins for nothing. This operator fuses them into a
single ``applyInPandas`` kernel (one groupBy-counter exchange; the MK
and TS kernels are imported from their home modules so the fused
numbers can never drift from the standalone operators), then blends
with integer global RANKs:

    rank_sum = rank(eta DESC) + rank(slope DESC) + rank(burst DESC)

and returns the ``top_n`` lowest rank-sums (ties broken by counter,
bin). All outputs are integers — structurally immune to the
cross-engine float-tie class. Rank inputs are deterministic: MK eta
is sig-rounded (HALF_UP twin proven bit-exact by the streaming parity
tests), the TS slope is HALF_UP-round(6)-stable by the rational-slope
argument in theil_sen.py, and the burst ratio divides exact
whole-number window sums (integer-valued doubles sum exactly in FP —
fold order cannot matter).

Scale: the three global ranks are computed WITHOUT a global sort via
``competition_rank`` — distinct-value histogram (one keyed exchange),
range-partitioned per-partition prefix sums, a tiny per-partition
totals table joined back broadcast, then an equi-join of value→rank
onto the grid. No ``Exchange SinglePartition`` anywhere on the
unbounded path; the only single-partition window left runs over the
``top_n``-row head (bounded by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gnip_trend_detection_spark.functions.core import sig_round2_py
from gnip_trend_detection_spark.operators.models.mann_kendall import _z_series
from gnip_trend_detection_spark.operators.models.theil_sen import _slope_series
from gnip_trend_detection_spark.operators.rank import (  # noqa: F401 (re-export; home module)
    competition_rank,
    competition_ranks,
)


def trend_ensemble(
    rebinned: DataFrame,
    window_size: int = 20,
    top_n: int = 50,
    ts_col: str = "bin_start",
) -> DataFrame:
    """A3 DataFrame → top-``top_n`` (counter, interval_start, rank_sum,
    rk) consensus trending points."""

    def per_counter(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("interval_start")
        x = pdf["count"].to_numpy(dtype=np.float64)
        pdf["eta"] = [sig_round2_py(z) for z in _z_series(x, window_size)]
        raw = _slope_series(x, window_size)
        pdf["slope"] = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        # trailing mean of whole-number counts: cumsum is exact in FP
        cum = np.concatenate(([0.0], np.cumsum(x)))
        n = x.size
        lo = np.maximum(0, np.arange(n) - window_size + 1)
        m = np.arange(n) - lo + 1
        pdf["burst"] = x / ((cum[np.arange(n) + 1] - cum[lo]) / m)
        return pdf[["counter", "interval_start", "eta", "slope", "burst"]]

    base = rebinned.select(
        "counter",
        rebinned[ts_col].alias("interval_start"),
        rebinned["count"].cast("double").alias("count"),
    )
    # one per-counter exchange + kernel pass, frozen: the three rank
    # histograms and the final join all read the checkpointed grid
    # (counters x bins — bounded) instead of re-running the kernel
    scored = base.groupBy("counter").applyInPandas(
        per_counter,
        schema="counter string, interval_start timestamp, "
        "eta double, slope double, burst double",
    ).localCheckpoint()
    ranked = competition_ranks(
        scored,
        [
            ("eta", "__r_eta", False),
            ("slope", "__r_slope", False),
            ("burst", "__r_burst", False),
        ],
    ).select(
        "counter",
        "interval_start",
        (F.col("__r_eta") + F.col("__r_slope") + F.col("__r_burst"))
        .cast("long")
        .alias("rank_sum"),
    )
    # TakeOrdered-shaped head: sort+limit never materializes a global
    # sort; the row_number window then runs over <= top_n rows —
    # bounded by construction, not by data volume
    head = ranked.orderBy("rank_sum", "counter", "interval_start").limit(top_n)
    w = Window.orderBy("rank_sum", "counter", "interval_start")
    return head.withColumn("rk", F.row_number().over(w).cast("long"))
