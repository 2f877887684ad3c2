"""Streaming as-of enrichment: last-touch attribution over a live
event stream — the online twin of operators/asof.py + the
q_last_touch_attribution composition.

Batch formulation: union both sides, ONE keyed running window,
last_value(ignoreNulls). Streaming formulation: the same fold as
explicit per-key state — for each user the state store holds the
latest qualifying touch (time, id, type); touches advance the state,
purchases read it. One row of state per key regardless of stream
length, exactly the window's carry value.

Ordering contract (same as every stateful model twin in
streaming/models.py): micro-batches arrive in time order per key
(file/Kafka replay of a time-partitioned log). Within a batch, rows
fold in (time, tag, id) order with touches before purchases at equal
times — identical to the batch window's (time, tag) sort — and a
touch only overwrites state when its (time, id) is lexicographically
newer, so same-second duplicate touches resolve to the max id for
every LATER purchase even when they straddle micro-batches.

One inherent divergence from the batch twin, stated rather than
hidden: emitted rows are FINAL (update-mode streaming cannot retract),
so if a purchase and a same-second higher-id touch arrive in
DIFFERENT micro-batches, the already-emitted purchase keeps its
attribution while batch — which sees everything at once — would pick
the later-arriving touch. Exact parity therefore requires micro-batch
boundaries that don't split equal-second groups of one user; any
time-partitioned replay (boundaries at second granularity, as in the
parity test) satisfies this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("asof_time", T.LongType()),
        T.StructField("touch_type", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("rt", T.LongType()),
        T.StructField("touch_id", T.LongType()),
        T.StructField("touch_type", T.StringType()),
    ]
)


def last_touch_stream(
    stream: DataFrame,
    touch_types: tuple[str, ...] = ("click", "view"),
    purchase_type: str = "purchase",
) -> DataFrame:
    """Attribute each purchase in the stream to the same user's latest
    preceding (inclusive) touch.

    ``stream`` columns: user_id long, t long (epoch seconds),
    event_id long, event_type string. Emits one row per purchase:
    (user_id, t, purchase_id, asof_time, touch_type), with nulls when
    no touch precedes the purchase — identical rows to the batch
    asof_join(purchases, deduped_touches) composition.
    """
    touch_set = set(touch_types)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf["event_type"].isin(touch_set | {purchase_type})]
        # touches (tag 0) fold before purchases (tag 1) at equal time;
        # ascending id among equal-time touches -> max id wins
        # note: itertuples mangles leading-underscore names, so the
        # tag column must not start with "_"
        pdf = pdf.assign(
            tag=(pdf["event_type"] == purchase_type).astype("int64")
        ).sort_values(["t", "tag", "event_id"], kind="mergesort")
        if state.exists:
            rt, tid, ttype = state.get
        else:
            rt = tid = ttype = None
        out: list[tuple] = []
        for row in pdf.itertuples():
            if row.tag == 0:
                newer = rt is None or (int(row.t), int(row.event_id)) >= (rt, tid)
                if newer:
                    rt, tid, ttype = int(row.t), int(row.event_id), row.event_type
            else:
                out.append((user_id, int(row.t), int(row.event_id), rt, ttype))
        state.update((rt, tid, ttype))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "t", "purchase_id", "asof_time", "touch_type"],
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
