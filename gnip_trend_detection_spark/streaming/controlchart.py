"""Streaming twins of the SPC control charts
(operators/models/controlchart.py), applyInPandasWithState like the
five reference-model scorers in streaming/models.py.

- EWMA is a bounded-memory fold: state is the trailing ``window - 1``
  counts plus the previous chart value — per-row arithmetic is the
  SAME fixed-order dyadic-weight sum as the batch operator, so with
  time-ordered arrival the emitted values equal the batch output
  EXACTLY (asserted bit-equal in tests/test_streaming.py).

- CUSUM's batch form references the FULL-SERIES mean — information a
  stream cannot have. The honest online contract (and how SPC charts
  are actually deployed) is a reference level calibrated offline:
  ``score_stream_cusum`` takes ``mu_q`` per counter (e.g. from a
  historical batch run's floor-quantized mean) and folds
  s_t = max(0, s_{t-1} + (x_t - 1.25 * mu_q)) with O(1) state. Batch
  parity holds exactly when the calibration equals the batch mean —
  which doubles as a unit-level proof of the batch operator's
  prefix-sum-minus-running-min identity against the textbook
  recursion. Unknown counters (no calibration entry) are scored with
  s = 0 and alarm = 0 rather than dropped or crashed — loud in the
  output, silent in the pipeline.

State size: O(window) doubles for EWMA, 1 double for CUSUM — safe at
million-counter cardinality with the RocksDB state store.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("counter", T.StringType()),
        T.StructField("interval_start", T.TimestampType()),
        T.StructField("count", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("burst", T.IntegerType()),
    ]
)

CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("counter", T.StringType()),
        T.StructField("interval_start", T.TimestampType()),
        T.StructField("count", T.DoubleType()),
        T.StructField("cusum", T.DoubleType()),
        T.StructField("alarm", T.IntegerType()),
    ]
)


def _concat_sorted(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    return pdf.sort_values("interval_start", ignore_index=True)


def score_stream_ewma(
    stream: DataFrame,
    lam_num: int = 1,
    lam_den: int = 4,
    window: int = 8,
    burst_mult: int = 2,
    warmup: int = 4,
) -> DataFrame:
    """Streaming twin of controlchart.ewma_chart — bit-equal to batch
    under time-ordered arrival (every term is an exact dyadic, so the
    Python fold and the JVM expression agree to the last ulp)."""
    lam = lam_num / lam_den
    weights = [lam * (1.0 - lam) ** j for j in range(window)]
    state_schema = T.StructType(
        [
            T.StructField("buffer", T.ArrayType(T.DoubleType())),
            T.StructField("n_seen", T.LongType()),
            T.StructField("prev_ewma", T.DoubleType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (counter,) = key
        pdf = _concat_sorted(pdfs)
        if state.exists:
            buf, n_seen, prev = list(state.get[0]), state.get[1], state.get[2]
        else:
            buf, n_seen, prev = [], 0, None
        ewmas: list[float] = []
        bursts: list[int] = []
        for c in pdf["count"].astype(float):
            n_seen += 1
            num = 0.0
            den = 0.0
            # j = 0 is the current row; j >= 1 walks the buffer from
            # most recent backwards — same order as the batch lag sum
            for j in range(window):
                if j == 0:
                    x = c
                elif j <= len(buf):
                    x = buf[-j]
                else:
                    break
                num = num + x * weights[j]
                den = den + weights[j]
            ew = num / den
            bursts.append(
                int(n_seen > warmup and prev is not None and c > burst_mult * prev)
            )
            ewmas.append(ew)
            prev = ew
            buf.append(c)
            if len(buf) >= window:
                buf = buf[-(window - 1) :]
        state.update((buf, n_seen, prev))
        yield pd.DataFrame(
            {
                "counter": counter,
                "interval_start": pdf["interval_start"],
                "count": pdf["count"].astype(float),
                "ewma": ewmas,
                "burst": pd.Series(bursts, dtype="int32"),
            }
        )

    return stream.groupBy("counter").applyInPandasWithState(
        fn, EWMA_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def score_stream_cusum(
    stream: DataFrame,
    mu_q: dict[str, float],
    slack_num: int = 1,
    slack_den: int = 4,
    h_mult: int = 8,
) -> DataFrame:
    """Streaming twin of controlchart.cusum_chart with an offline
    calibration: ``mu_q`` maps counter -> floor-quantized reference
    mean (see module docstring for why a stream cannot use the batch
    operator's full-series mean). State is one double per counter."""
    mult = 1.0 + slack_num / slack_den
    state_schema = T.StructType([T.StructField("s", T.DoubleType())])

    def fn(key, pdfs, state: GroupState):
        (counter,) = key
        pdf = _concat_sorted(pdfs)
        s = state.get[0] if state.exists else 0.0
        ref = mu_q.get(counter)
        vals: list[float] = []
        alarms: list[int] = []
        for c in pdf["count"].astype(float):
            if ref is None:
                vals.append(0.0)
                alarms.append(0)
                continue
            s = max(0.0, s + (c - ref * mult))
            vals.append(s)
            alarms.append(int(s > h_mult * ref))
        state.update((s,))
        yield pd.DataFrame(
            {
                "counter": counter,
                "interval_start": pdf["interval_start"],
                "count": pdf["count"].astype(float),
                "cusum": vals,
                "alarm": pd.Series(alarms, dtype="int32"),
            }
        )

    return stream.groupBy("counter").applyInPandasWithState(
        fn, CUSUM_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
    )
