"""Streaming twin of the PSI drift monitor (extras/drift.py).

The batch operator splits one bounded relation at its time midpoint;
a stream cannot know its own midpoint, so the honest online contract
is the one production monitors actually use (same reasoning as
score_stream_cusum's calibrated reference level): the REFERENCE
histogram is calibrated offline from a trusted window — per group the
bin edges (vmin, vmax) and per-bin reference counts — and the stream
folds arriving values into per-group CURRENT bin counts, emitting the
updated PSI after every micro-batch.

Parity contract: after the stream has consumed exactly the batch
operator's "current" half, the emitted PSI equals
``extras.drift.psi_drift`` run over the full relation with the same
calibration — asserted in tests/test_streaming.py (the smoothing,
binning, and clamping arithmetic are the same expressions; both sides
round to 6).

State is one ``n_bins``-long count vector + a row counter per group —
O(n_bins) longs, safe at million-group cardinality with the RocksDB
state store. Unknown groups (no calibration entry) are emitted with
psi = NULL rather than dropped or crashed — loud in the output,
silent in the pipeline.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PSI_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("n_cur", T.LongType()),
        T.StructField("psi", T.DoubleType()),
    ]
)


def psi_stream(
    stream: DataFrame,
    calibration: dict[str, tuple[float, float, list[int]]],
    n_bins: int = 10,
) -> DataFrame:
    """``stream`` has (grp string, v double); ``calibration`` maps
    grp -> (vmin, vmax, ref_counts[n_bins]) from an offline batch run.
    Emits (grp, n_cur, psi) per group per micro-batch — psi rounded
    to 6, the same Jeffreys-smoothed sum as extras.drift.psi_drift.
    """
    cal = {
        g: (float(vmin), float(vmax), [int(c) for c in refs])
        for g, (vmin, vmax, refs) in calibration.items()
    }
    state_schema = T.StructType(
        [
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n_cur", T.LongType()),
        ]
    )
    half = n_bins / 2.0

    def fn(key, pdfs, state: GroupState):
        (grp,) = key
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            counts, n_cur = list(state.get[0]), state.get[1]
        else:
            counts, n_cur = [0] * n_bins, 0
        entry = cal.get(grp)
        if entry is None:
            yield pd.DataFrame(
                {"grp": [grp], "n_cur": [0], "psi": [None]}
            ).astype({"psi": "float64"})
            return
        vmin, vmax, refs = entry
        width = (vmax - vmin) / n_bins
        for v in pdf["v"].astype(float):
            if vmax > vmin:
                b = min(int(math.floor((v - vmin) / width)), n_bins - 1)
                # batch twin clamps via LEAST only (the calibration
                # window saw the global min); clamp low for stream
                # safety when a new value undershoots the reference
                b = max(b, 0)
            else:
                b = 0
            counts[b] += 1
            n_cur += 1
        n_ref = sum(refs)
        psi = 0.0
        for b in range(n_bins):
            p_ref = (refs[b] + 0.5) / (n_ref + half)
            p_cur = (counts[b] + 0.5) / (n_cur + half)
            psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
        state.update((counts, n_cur))
        yield pd.DataFrame(
            {"grp": [grp], "n_cur": [n_cur], "psi": [round(psi, 6) + 0.0]}
        )

    return stream.groupBy("grp").applyInPandasWithState(
        fn, PSI_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
    )


KS_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("n_cur", T.LongType()),
        T.StructField("ks_d", T.DoubleType()),
    ]
)


def ks_stream(
    stream: DataFrame,
    calibration: dict[str, tuple[float, float, list[int]]],
    n_bins: int = 10,
) -> DataFrame:
    """Streaming two-sample KS against a calibrated reference — the
    BINNED form (ECDFs evaluated at the calibration's bin boundaries),
    because an exact streaming KS would need every distinct value in
    state. Binned D lower-bounds exact D and EQUALS it whenever each
    distinct value maps to its own bin (asserted against ks_between in
    tests/test_streaming.py on such data); at corpus scale this is the
    standard trade (the same one SCALE.md documents for the batch
    operator's 100 TB path).

    Same state/calibration contract as psi_stream: O(n_bins) longs per
    group, unknown groups emit NULL.
    """
    cal = {
        g: (float(vmin), float(vmax), [int(c) for c in refs])
        for g, (vmin, vmax, refs) in calibration.items()
    }
    state_schema = T.StructType(
        [
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n_cur", T.LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (grp,) = key
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            counts, n_cur = list(state.get[0]), state.get[1]
        else:
            counts, n_cur = [0] * n_bins, 0
        entry = cal.get(grp)
        if entry is None:
            yield pd.DataFrame(
                {"grp": [grp], "n_cur": [0], "ks_d": [None]}
            ).astype({"ks_d": "float64"})
            return
        vmin, vmax, refs = entry
        width = (vmax - vmin) / n_bins
        for v in pdf["v"].astype(float):
            if vmax > vmin:
                b = min(int(math.floor((v - vmin) / width)), n_bins - 1)
                b = max(b, 0)
            else:
                b = 0
            counts[b] += 1
            n_cur += 1
        n_ref = sum(refs)
        d = None
        if n_ref > 0 and n_cur > 0:
            cum_r = 0
            cum_c = 0
            best = 0.0
            for b in range(n_bins):
                cum_r += refs[b]
                cum_c += counts[b]
                best = max(best, abs(cum_r / n_ref - cum_c / n_cur))
            d = round(best, 6) + 0.0
        state.update((counts, n_cur))
        yield pd.DataFrame({"grp": [grp], "n_cur": [n_cur], "ks_d": [d]})

    return stream.groupBy("grp").applyInPandasWithState(
        fn, KS_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
    )
