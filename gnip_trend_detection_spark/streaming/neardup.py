"""Streaming near-duplicate detection: LSH band buckets as keyed state.

The streaming twin of extras/dedup.py:lsh_candidate_pairs for corpora
that arrive continuously (crawl output). Each arriving document's
MinHash signature (the same stateless column pipeline the batch path
runs — extras/dedup.py:minhash_signatures) explodes into its LSH band
rows; the state store is keyed on (band, band_value), and the FIRST
document to claim a bucket becomes its representative. Any later
document landing in an occupied bucket is flagged against that
representative — the decision a batch LSH pass makes via the
band-value self-join, taken incrementally with no self-join at all.

Exact batch parity (pinned in tests/test_streaming.py): when documents
arrive in doc_id order, the flagged set equals exactly the documents
that have at least one SMALLER-id batch candidate partner — because a
bucket's representative is its minimum doc_id, and a flagged doc
collides with that representative in the flagging band.

State sizing at 100 TB: one state row per DISTINCT (band, band_value)
bucket — boilerplate-heavy corpora concentrate hits into existing
buckets rather than growing state, so the store scales with content
diversity, not corpus size. n_bands rows per unique doc, a small
constant factor over streaming exact dedup's one-per-hash; shard the
state store (more shuffle partitions) before reaching for anything
fancier. Emission is per (doc, hit band): cross-band dedup would need
a second stateful stage keyed by doc — leave it to the consumer
(usually a grouped count of hit bands, which is the collision-strength
signal anyway).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gnip_trend_detection_spark.extras.dedup import band_rows, minhash_signatures

OUT_SCHEMA = "doc_id long, rep_id long, band int"
STATE_SCHEMA = "rep long"


def lsh_neardup_stream(
    stream_docs: DataFrame, text_col: str = "text", rows_per_band: int = 2
) -> DataFrame:
    """Append-mode stream of (doc_id, rep_id, band) rows — one per band
    in which ``doc_id`` collided with an already-claimed bucket whose
    representative is ``rep_id``. Representatives themselves emit
    nothing (they are the keep-set)."""
    sigs = minhash_signatures(stream_docs, text_col).select("doc_id", "sig")
    bands = band_rows(sigs, rows_per_band)

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        ids = [int(x) for x in pdf["doc_id"]]
        if state.exists:
            (rep,) = state.get
        else:
            rep = ids[0]
        state.update((int(rep),))
        hits = [d for d in ids if d != rep]
        if hits:
            yield pd.DataFrame(
                {"doc_id": hits, "rep_id": int(rep), "band": int(key[0])}
            )

    return bands.groupBy("b", "band_val").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
