"""Deterministic replay harness: run a STATEFUL streaming scorer over
a batch fixture and hand back its full output as a plain DataFrame.

This is how a streaming operator earns an ORACLE-checked row instead of
only a batch-parity unit test: the batch series is written as
time-ordered parquet slices (one micro-batch each, strictly increasing
mtimes so FileStreamSource's modification-time ordering is pinned),
replayed with availableNow through the scorer into a memory sink, and
the sink's contents are returned for the same DuckDB SQL twin the
batch operator declares. Two drain shapes:

- ``replay_scored`` (update mode): for per-point stateful scorers
  (applyInPandasWithState) — the union of every update emission is
  exactly one row per input point.
- ``replay_complete`` (complete mode): for windowed AGGREGATIONS
  (streaming_rebin) — the memory sink holds the full re-emitted result
  table of the LAST micro-batch, i.e. the final aggregate after every
  slice has folded in, which is what the batch twin computes.

Scale note: the replay itself is a TEST harness (memory sink = driver
memory, bounded fixture). Production streaming uses the same scorer
with a real source/sink (streaming/models.py docstring); what this
module proves is that the stateful fold crossing micro-batch
boundaries is bit-identical to the batch computation.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_time_slices(series: DataFrame, n_slices: int, time_col: str) -> str:
    """Write ``series`` as ``n_slices`` contiguous-time parquet files
    (one micro-batch each) under a temp dir and return its path.

    The caller owns both the persist() lifetime of ``series`` and the
    eventual rmtree of the returned dir.
    """
    # NULL timestamps would evaluate every slice predicate to NULL and
    # silently vanish from the replay (losing rows vs the batch
    # operator without failing row-count parity) — reject them loudly
    n_null_ts = series.filter(F.col(time_col).isNull()).count()
    if n_null_ts:
        raise ValueError(
            f"replay fixture has {n_null_ts} NULL {time_col} rows; "
            "time-slice replay cannot place them in a micro-batch"
        )
    lo, hi = series.agg(
        F.min(time_col).cast("double"),
        F.max(time_col).cast("double"),
    ).first()
    if lo is None:
        # empty fixture: still run the (empty) stream for shape parity
        edges: list[float] = []
    else:
        edges = [lo + (hi - lo) * i / n_slices for i in range(1, n_slices)]
    ts = F.col(time_col).cast("double")
    slices = []
    prev = None
    for e in edges:
        cond = ts < e if prev is None else (ts >= prev) & (ts < e)
        slices.append(series.filter(cond))
        prev = e
    slices.append(series if prev is None else series.filter(ts >= prev))

    flat = tempfile.mkdtemp(prefix="gtds_replay_")
    base = tempfile.mkdtemp(prefix="gtds_replay_stage_")
    t0 = time.time() - 600
    try:
        for i, sl in enumerate(slices):
            d = os.path.join(base, f"b{i}")
            sl.coalesce(1).write.parquet(d)
            parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
            if len(parts) != 1:
                # current Spark writes exactly one part for an empty
                # coalesced slice (pinned by
                # test_replay_scored_empty_series); if a future version
                # writes zero, fail with a diagnosis instead of
                # IndexError
                raise RuntimeError(
                    f"slice {i}: expected exactly one parquet part in "
                    f"{d}, found {parts} — Spark's empty-slice write "
                    "behavior changed; emit a schema-only empty part "
                    "for this slice instead"
                )
            dst = os.path.join(flat, f"{i:03d}.parquet")
            shutil.copy(os.path.join(d, parts[0]), dst)
            # FileStreamSource orders by modification time; identical
            # mtimes would make the state-fold order nondeterministic
            os.utime(dst, (t0 + i * 10, t0 + i * 10))
    except BaseException:
        shutil.rmtree(flat, ignore_errors=True)
        raise
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return flat


def _drain_to_memory(
    spark: SparkSession,
    flat: str,
    schema,  # DDL string or StructType — readStream.schema takes both
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str,
) -> DataFrame:
    """availableNow-replay the staged slices through ``transform`` into
    a memory sink; return the sink contents as a plain DataFrame."""
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    name = f"gtds_replay_{uuid.uuid4().hex}"
    q = (
        transform(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        # never hand back a partially-drained sink as if it were
        # the full replay — that would silently fail row-count
        # parity downstream instead of failing loudly here
        q.stop()
        raise TimeoutError("streaming replay did not finish in 300s")
    # materialize the sink rows and DROP the memory table: a
    # long-lived session replaying repeatedly (the correctness
    # driver, bench sweeps) must not accumulate uuid-named tables
    # of full replay output in driver memory
    sink = spark.table(name)
    rows, schema = sink.collect(), sink.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


def replay_scored(
    spark: SparkSession,
    series: DataFrame,
    score_fn: Callable[[DataFrame], DataFrame],
    n_slices: int = 3,
) -> DataFrame:
    """series(counter, interval_start timestamp, count double) →
    score_fn's streaming output, replayed to completion over
    ``n_slices`` contiguous-time micro-batches (update mode: one
    emission per input point for the per-point stateful scorers)."""
    series = series.select(
        "counter",
        F.col("interval_start").cast("timestamp").alias("interval_start"),
        F.col("count").cast("double").alias("count"),
    ).persist()  # read once for the span agg + once per slice write
    try:
        flat = _stage_time_slices(series, n_slices, "interval_start")
        try:
            return _drain_to_memory(
                spark,
                flat,
                "counter string, interval_start timestamp, count double",
                score_fn,
                "update",
            )
        finally:
            shutil.rmtree(flat, ignore_errors=True)
    finally:
        series.unpersist()


def replay_relation(
    spark: SparkSession,
    df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    time_col: str,
    output_mode: str,
    n_slices: int = 3,
) -> DataFrame:
    """Generic replay for an arbitrary relation: slice by ``time_col``,
    restream under the relation's own schema, drain in ``output_mode``.

    This is the shape session-window replays need (events keyed by
    user, append mode: the sink holds every session the advancing
    watermark CLOSED — sessions still open at end-of-stream are append
    mode's documented remainder, so the SQL twin must carry the same
    closure predicate, session_end <= max event time)."""
    df = df.persist()
    try:
        flat = _stage_time_slices(df, n_slices, time_col)
        try:
            return _drain_to_memory(
                spark, flat, df.schema, transform, output_mode
            )
        finally:
            shutil.rmtree(flat, ignore_errors=True)
    finally:
        df.unpersist()


def replay_complete(
    spark: SparkSession,
    counts: DataFrame,
    agg_fn: Callable[[DataFrame], DataFrame],
    n_slices: int = 3,
) -> DataFrame:
    """counts(counter, interval_start timestamp, duration_sec double,
    count double) — the D1 interval-count stream shape — replayed
    through a windowed streaming AGGREGATION in complete mode.

    Complete mode re-emits the whole result table each micro-batch and
    the memory sink REPLACES its contents, so after the final slice the
    sink holds exactly the aggregate over every input row — the same
    relation the batch operator computes. That (plus deterministic
    slice order) is what lets a streaming aggregation declare the batch
    DuckDB oracle verbatim."""
    counts = counts.select(
        "counter",
        F.col("interval_start").cast("timestamp").alias("interval_start"),
        F.col("duration_sec").cast("double").alias("duration_sec"),
        F.col("count").cast("double").alias("count"),
    ).persist()
    try:
        flat = _stage_time_slices(counts, n_slices, "interval_start")
        try:
            return _drain_to_memory(
                spark,
                flat,
                "counter string, interval_start timestamp, "
                "duration_sec double, count double",
                agg_fn,
                "complete",
            )
        finally:
            shutil.rmtree(flat, ignore_errors=True)
    finally:
        counts.unpersist()
