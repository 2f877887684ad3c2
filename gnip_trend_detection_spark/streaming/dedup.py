"""Streaming exact dedup: first-seen document per content hash.

The streaming twin of extras/dedup.py:exact_duplicates' "keep one
representative" decision, for corpora that arrive as a stream (crawl
output, log shipping). `dropDuplicates` keys the state store on the
content hash, so each micro-batch emits only rows whose hash has never
been seen — exactly the keep-set a batch dedup pass would retain if it
kept the first arrival.

State sizing at 100 TB: one state row per DISTINCT document (hash +
passthrough columns), not per input row — duplicates add nothing. With
an event-time watermark the store additionally expires hashes older
than the horizon (dedup-within-window semantics, the standard choice
when exact global dedup would need unbounded state on an unbounded
stream). Without a time column we keep global state and document the
bound: distinct-document count, which for a curation pipeline is the
same order as the corpus catalog — shard the state store (more
partitions) rather than the logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_stream(
    stream_docs: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Append-mode stream of first-seen documents, one per content
    hash. Emits the input columns plus `content_hash`.

    With ``event_time_col`` + ``watermark`` (e.g. "10 minutes"), state
    for hashes older than the horizon is dropped — late duplicates
    beyond the watermark would then re-emit, the documented tradeoff
    of windowed dedup (reference semantics: exact_duplicates keeps
    min doc_id globally; the stream keeps first arrival).
    """
    # same hash expression as extras.dedup.exact_duplicates
    hashed = stream_docs.withColumn(
        "content_hash", F.md5(F.col(text_col).cast("binary"))
    )
    if event_time_col is not None and watermark is not None:
        hashed = hashed.withWatermark(event_time_col, watermark)
        return hashed.dropDuplicatesWithinWatermark(["content_hash"])
    return hashed.dropDuplicates(["content_hash"])
