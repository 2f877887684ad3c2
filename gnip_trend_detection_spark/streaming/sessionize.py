"""Streaming sessionization via Spark's native session windows.

The streaming twin of the batch gap-sessionize (queries.q_sessionize,
lag + running break-sum): `session_window(ts, gap)` merges events into
a session while each new event arrives strictly within ``gap`` of the
session's current end, and the state store tracks only OPEN sessions —
closed ones emit once the watermark passes their end (append mode's
contract), so state is bounded by concurrently-active users, not
history.

Boundary note (documented divergence): the lag formulation keeps an
event exactly ``gap`` seconds after its predecessor in the SAME
session (break on diff > gap); session_window starts a NEW session at
exactly ``gap`` (merge on diff < gap). Real event streams make exact
equality measure-zero; the batch/stream parity test therefore uses
the same session_window aggregation as its batch truth.

At 100 TB: the shuffle is keyed on user (the natural session key);
skewed users are single-session-state hot keys, bounded by gap — the
state per key is O(open sessions), and RocksDB state stores handle
million-user keyspaces (same argument as streaming/models.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, session_start, session_end, n_events) — one row per
    closed session in append mode. Also valid on a static DataFrame
    (same aggregation, no watermark needed) — that IS the batch twin.
    """
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
