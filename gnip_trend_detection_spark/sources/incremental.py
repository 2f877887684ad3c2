"""Incremental batch ingestion: process only files the manifest hasn't
seen.

The batch complement to Structured Streaming's file source: a periodic
job over a landing directory must not re-read its whole history to
fold in the latest arrivals — at 100 TB the delta is the job. A tiny
manifest (one row per processed file) makes each run exactly
incremental:

- discovery is a driver-side directory listing diffed against the
  manifest — O(#files), no data read (the streaming file source keeps
  the same catalog in its offset log);
- the delta loads as an ordinary DataFrame, so pushdown, pruning, and
  partitioning all apply to exactly the new bytes;
- the manifest append commits AFTER the caller's processing callback
  succeeds — a crashed run reprocesses its delta instead of dropping
  it (at-least-once, the streaming source's choice too; pair with
  deterministic/idempotent merges downstream, which every operator in
  this engine already is);
- each commit records a monotone batch_id so the manifest doubles as
  an ingestion ledger.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(manifest_dir: str) -> str:
    return os.path.join(manifest_dir, "manifest.parquet")


def processed_files(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """(path, batch_id) for every file ever committed; empty if none."""
    p = _manifest_path(manifest_dir)
    if not os.path.exists(p):
        return spark.createDataFrame([], "path string, batch_id long")
    return spark.read.parquet(p)


def list_new_files(
    spark: SparkSession, input_dir: str, manifest_dir: str, pattern: str = "*.parquet"
) -> list[str]:
    """Paths under input_dir matching pattern and absent from the
    manifest, sorted for deterministic batch composition."""
    on_disk = sorted(
        os.path.abspath(f) for f in _glob.glob(os.path.join(input_dir, pattern))
    )
    seen = {
        r["path"] for r in processed_files(spark, manifest_dir).collect()
    }
    return [f for f in on_disk if f not in seen]


def commit_files(
    spark: SparkSession, manifest_dir: str, files: list[str]
) -> int:
    """Append the files to the manifest under the next batch_id;
    returns that batch_id (-1 when there is nothing to commit)."""
    if not files:
        return -1
    prev = processed_files(spark, manifest_dir)
    nxt = (prev.agg({"batch_id": "max"}).first()[0] or 0) + 1 if prev.count() else 1
    df = spark.createDataFrame(
        [(os.path.abspath(f), nxt) for f in files], "path string, batch_id long"
    )
    os.makedirs(manifest_dir, exist_ok=True)
    df.write.mode("append").parquet(_manifest_path(manifest_dir))
    return nxt


def read_incremental(
    spark: SparkSession,
    input_dir: str,
    manifest_dir: str,
    pattern: str = "*.parquet",
) -> tuple[DataFrame | None, list[str]]:
    """(delta DataFrame over only-new files, their paths) — or
    (None, []) when nothing is new. Call `commit_files` with the
    returned paths AFTER downstream processing succeeds."""
    new = list_new_files(spark, input_dir, manifest_dir, pattern)
    if not new:
        return None, []
    return spark.read.parquet(*new), new
