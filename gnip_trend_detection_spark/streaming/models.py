"""Stateful streaming trend models (SURVEY §2.9; the reference's
online update()/get_result() contract — README.md:167-174,
models.py:15-23 — as applyInPandasWithState operators).

Each scorer groups the stream by counter and keeps exactly the
accumulators the reference's model object holds per counter
(trend_analyze_many.py:194,215):

- poisson lc   → last count                       (models.py:275-282)
- poisson a    → per-period-key (num, denom) map  (models.py:289-298)
- mann-kendall → trailing window of counts        (models.py:41-45)

Rows inside a micro-batch are sorted by timestamp before folding, so
with time-ordered arrival (the watermark's job upstream) the emitted
eta sequence is identical to the batch window computation — asserted
by tests/test_streaming.py batch/stream parity.

State is a compact typed struct (no pickled blobs): scalars for lc,
parallel key/num/denom arrays for the cycle model, a bounded count
buffer for MK. State size is O(1) / O(#period keys) / O(window) per
counter — safe for million-counter cardinality with RocksDB state
store on a real cluster.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gnip_trend_detection_spark.functions.core import sig_round2_py
from gnip_trend_detection_spark.functions.poisson_math import poisson_interval

OUT_SCHEMA = T.StructType(
    [
        T.StructField("counter", T.StringType()),
        T.StructField("interval_start", T.TimestampType()),
        T.StructField("count", T.DoubleType()),
        T.StructField("eta", T.DoubleType()),
    ]
)


def _eta_poisson(count: float, nu: float | None, alpha: float) -> float:
    if nu is None or nu == 0:
        return 0.0
    lo, hi = poisson_interval(alpha, nu)
    width = float(hi) - float(lo)
    if width == 0 or not math.isfinite(width):
        return 0.0
    return abs(count - nu) / width


def _mk_z(counts: list[float]) -> float:
    """Mann-Kendall normalized z over a small trailing window —
    mirrors operators/models/mann_kendall.py (reference mk_test.py:41-64)."""
    import numpy as np

    x = np.asarray(counts, dtype=float)
    n = x.size
    if n < 2:
        return 0.0
    diff_sign = np.sign(x[None, :] - x[:, None])
    s = float(np.triu(diff_sign, 1).sum())
    _, tp = np.unique(x, return_counts=True)
    var_s = (n * (n - 1) * (2 * n + 5) - (tp * (tp - 1) * (2 * tp + 5)).sum()) / 18.0
    if var_s <= 0:
        return 0.0
    if s > 0:
        return (s - 1) / math.sqrt(var_s)
    if s < 0:
        return (s + 1) / math.sqrt(var_s)
    return 0.0


def _concat_sorted(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    return pdf.sort_values("interval_start", ignore_index=True)


def _emit(counter: str, pdf: pd.DataFrame, etas: list[float]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "counter": counter,
            "interval_start": pdf["interval_start"],
            "count": pdf["count"].astype(float),
            "eta": [sig_round2_py(e) for e in etas],
        }
    )


def score_stream_poisson_lc(stream: DataFrame, alpha: float = 0.99) -> DataFrame:
    """Streaming twin of operators.models.poisson_lc."""
    state_schema = T.StructType([T.StructField("last_count", T.DoubleType())])

    def fn(key, pdfs, state: GroupState):
        (counter,) = key
        pdf = _concat_sorted(pdfs)
        last = state.get[0] if state.exists else None
        etas = []
        for c in pdf["count"].astype(float):
            etas.append(_eta_poisson(c, last, alpha))
            last = c
        state.update((last,))
        yield _emit(counter, pdf, etas)

    return (
        stream.groupBy("counter")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def score_stream_poisson_cycle(
    stream: DataFrame, period_list: list[str] | str = "hour", alpha: float = 0.99
) -> DataFrame:
    """Streaming twin of operators.models.poisson_cycle (self-inclusive
    running mean per period key)."""
    if isinstance(period_list, str):
        period_list = [p.strip() for p in period_list.split(",")]
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("nums", T.ArrayType(T.DoubleType())),
            T.StructField("denoms", T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (counter,) = key
        pdf = _concat_sorted(pdfs)
        if state.exists:
            ks, nums, denoms = state.get
            acc = {k: [n, d] for k, n, d in zip(ks, nums, denoms)}
        else:
            acc = {}
        etas = []
        for ts, c in zip(pdf["interval_start"], pdf["count"].astype(float)):
            pkey = ":".join(str(getattr(ts, p)) for p in period_list)
            num, denom = acc.get(pkey, (0.0, 0.0))
            num, denom = num + c, denom + 1.0
            acc[pkey] = [num, denom]
            etas.append(_eta_poisson(c, num / denom, alpha))
        ks = list(acc)
        state.update((ks, [acc[k][0] for k in ks], [acc[k][1] for k in ks]))
        yield _emit(counter, pdf, etas)

    return (
        stream.groupBy("counter")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def score_stream_mann_kendall(stream: DataFrame, window_size: int = 20) -> DataFrame:
    """Streaming twin of operators.models.mann_kendall (trailing
    window z)."""
    state_schema = T.StructType(
        [T.StructField("buffer", T.ArrayType(T.DoubleType()))]
    )

    def fn(key, pdfs, state: GroupState):
        (counter,) = key
        pdf = _concat_sorted(pdfs)
        buf: list[float] = list(state.get[0]) if state.exists else []
        etas = []
        for c in pdf["count"].astype(float):
            buf.append(c)
            if len(buf) > window_size:
                buf = buf[-window_size:]
            etas.append(_mk_z(buf))
        state.update((buf,))
        yield _emit(counter, pdf, etas)

    return (
        stream.groupBy("counter")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
