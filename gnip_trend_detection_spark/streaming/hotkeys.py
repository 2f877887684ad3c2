"""Streaming heavy hitters: Misra-Gries summaries as keyed state.

The streaming twin of `extras/sketch.py`'s batch heavy-hitter pass,
for term/key streams that never end (trending vocab over a crawl
feed, hot users over an event stream). The batch operator recounts
its candidate sliver exactly; a stream cannot re-scan, so state IS
the summary:

- terms scatter to ``n_buckets`` state keys by xxhash64 — state
  parallelism without a global coordinator, and each bucket's summary
  is independent (a term lives in exactly one bucket).
- each bucket's state is a bounded Misra-Gries summary (``capacity``
  counters + the running decrement offset). Folding a micro-batch is
  the mergeable-summaries merge (Agarwal et al., PODS'12): add the
  batch's per-term sums, then subtract the (capacity+1)-th largest
  count from every counter and drop the non-positive ones.
- emitted counts are LOWER bounds; ``err_bound`` (the accumulated
  decrement) bounds the undercount, so ``count_min + err_bound`` is
  the matching upper bound. Any term with true count > err_bound is
  guaranteed present — the MG guarantee, per bucket.

State size: n_buckets x capacity counters, fixed forever — the
defining property that makes this safe on an unbounded stream where
exact per-term state (`streaming/dedup.py`'s contract) would grow
with the vocabulary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("count_min", T.LongType()),
        T.StructField("err_bound", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("dec", T.LongType()),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame,
    term_col: str = "term",
    weight_col: str | None = None,
    n_buckets: int = 32,
    capacity: int = 64,
) -> DataFrame:
    """Update-mode stream of each bucket's current Misra-Gries summary:
    (bucket, term, count_min, err_bound), re-emitted whenever the
    bucket receives data. ``weight_col`` defaults to weight 1 per row.
    """
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    keyed = stream.select(
        F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col(term_col).alias("__term"),
        w.alias("__w"),
    )

    def fn(key, pdfs, state: GroupState):
        (bucket,) = key
        if state.exists:
            terms, counts, dec = state.get
            acc = dict(zip(terms, counts))
        else:
            acc, dec = {}, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            sums = pdf.groupby("__term")["__w"].sum()
            for t, c in sums.items():
                acc[t] = acc.get(t, 0) + int(c)
        if len(acc) > capacity:
            cut = sorted(acc.values(), reverse=True)[capacity]
            dec += cut
            acc = {t: c - cut for t, c in acc.items() if c > cut}
        state.update((list(acc), [int(c) for c in acc.values()], int(dec)))
        yield pd.DataFrame(
            {
                "bucket": int(bucket),
                "term": list(acc),
                "count_min": [int(c) for c in acc.values()],
                "err_bound": int(dec),
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn, OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
