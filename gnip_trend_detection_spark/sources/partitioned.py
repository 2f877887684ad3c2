"""Hive-style partitioned storage: the data-skipping contract at scale.

Bucketed storage (sources/bucketed.py) removes the per-counter
shuffle; PARTITIONED storage removes the scan itself for selective
queries. A counts/events table written `partitionBy(counter)` (or a
derived date column) puts each key in its own directory, so a filter
on the partition column prunes at the FILE INDEX level — the query
never opens, reads, or schedules the excluded files. At 100 TB with
1000 counters, `counter = 'x'` scans 0.1% of the data; the same
filter over an unpartitioned table still scans every file and drops
rows post-decode (parquet row-group stats help, but only after the
file is opened and footers fetched).

Partition columns must be low-cardinality (directories are metadata:
millions of tiny partitions thrash the driver's file index and the
filesystem) — counter families, dates, shard ids. High-cardinality
selectivity belongs to bucketing or row-group sort order instead
(write sorted within partitions so min/max stats prune row groups).

`tests/test_partitioned.py` asserts the contract from the physical
plan: PartitionFilters carries the predicate and the post-scan filter
disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("counter",),
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` Hive-partitioned by ``partition_cols``; optional
    ``sort_cols`` sort within partitions so parquet row-group min/max
    stats also prune inside each partition file."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; filters on partition columns prune
    directories before any file is opened."""
    return spark.read.parquet(path)
