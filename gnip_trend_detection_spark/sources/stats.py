"""Parquet layout audit: per-file / per-row-group statistics from the
footers alone — the input to compaction and clustering decisions.

`sources/compact.py` rewrites small files and `sources/zorder.py`
proves footer-stats pruning; this module is the OBSERVABILITY side:
what do the footers actually say? Reading them costs O(#files) footer
parses (pyarrow, driver- or executor-side), never data pages — the
same cheapness argument as the incremental-ingestion manifest diff.

At cluster scale the file listing itself is a DataFrame
(`spark.createDataFrame(paths)`) and the footer parse distributes via
mapInPandas; at driver scale (thousands of files) the plain loop here
is fine and keeps the dependency surface minimal.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_layout(
    spark: SparkSession, path: str, pattern: str = "*.parquet"
) -> DataFrame:
    """(file, n_rows, n_row_groups, n_columns, file_bytes,
    uncompressed_bytes, min_rg_rows, max_rg_rows) per parquet file
    under ``path`` — small-file and row-group-skew diagnostics.
    ``uncompressed_bytes`` sums row-group ``total_byte_size``, which
    pyarrow defines as the UNcompressed data size (on-disk size is
    ``file_bytes``)."""
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(path, pattern)))
    if os.path.isfile(path):
        files = [path]
    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        uncomp = sum(
            md.row_group(i).total_byte_size for i in range(md.num_row_groups)
        )
        rows.append(
            (
                os.path.basename(f),
                int(md.num_rows),
                int(md.num_row_groups),
                int(md.num_columns),
                int(os.path.getsize(f)),
                int(uncomp),
                int(min(rg_rows)) if rg_rows else 0,
                int(max(rg_rows)) if rg_rows else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "file string, n_rows long, n_row_groups long, n_columns long, "
        "file_bytes long, uncompressed_bytes long, min_rg_rows long, "
        "max_rg_rows long",
    )


def compaction_candidates(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    pattern: str = "*.parquet",
) -> DataFrame:
    """Files smaller than half the target size (the compaction
    trigger), plus the projected post-rewrite file count.

    ``projected_files`` is sized from the TOTAL dataset bytes, because
    `sources/compact.py:compact_parquet` rewrites the whole table
    (ceil(total/target)) — sizing it from small-file bytes alone made
    the CLI `maintain` report disagree with the actual rewrite."""
    from pyspark.sql import functions as F

    layout = parquet_layout(spark, path, pattern)
    small = (F.col("file_bytes") < target_bytes // 2).cast("long")
    total = layout.agg(
        F.coalesce(F.sum(small), F.lit(0)).alias("n_small_files"),
        F.coalesce(
            F.sum(F.when(small == 1, F.col("file_bytes"))), F.lit(0)
        ).alias("small_bytes"),
        F.coalesce(F.sum("file_bytes"), F.lit(0)).alias("total_bytes"),
    )
    return total.select(
        "n_small_files",
        "small_bytes",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("total_bytes") / float(target_bytes)).cast("long"),
        ).alias("projected_files"),
    )
