"""Small-file compaction: the ingest hygiene pass at scale.

Streaming sinks and fine-grained partition writes leave thousands of
KB-sized parquet files; every downstream scan then pays a task per
file and the driver pays listing + footer fetches per file. Compaction
rewrites a table to ~target-sized files: read, repartition to
ceil(bytes / target), write back. The repartition is one round-robin
shuffle — at 100 TB run it per partition directory (compact the day
that just closed, not the table) so the shuffle is bounded and the
hot tail stays untouched.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet table at ``path`` into ~target_file_mb
    files (returns the file count written). Optional ``sort_cols``
    re-sorts within output files so row-group min/max stats stay
    selective after the rewrite. Local-path implementation (os.walk
    sizing; atomic swap via rename) — on object storage the same plan
    runs against the file index with a two-phase commit."""
    n_files = max(1, math.ceil(_dir_bytes(path) / (target_file_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    return n_files
