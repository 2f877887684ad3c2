"""Scale-adaptive map-side parallelism guard.

Local fixture tables are single small parquet files, so a scan yields
1-2 splits and every heavy per-row map stage downstream (Arrow/pandas
kernels, tokenize+explode pipelines) runs on 1-2 of the session's
cores — measured 3x slowdowns at sf0.1 on local[32]. At production
scale the same tables arrive as many >= 128 MB splits and the scan
already saturates the cluster, so the guard must be a no-op there:
``ensure_map_parallelism`` repartitions ONLY when the plan's current
partitioning is below the session's default parallelism (optimization
guide §2.2/§6.1 — derive partitioning from the input, never pin a
constant tuned for one deployment).

Use it immediately before heavy map work whose per-row results do not
depend on row co-location (per-row kernels, integer-count aggregates,
pinned-rounding pipelines). The round-robin exchange it inserts
carries only the columns the kernel needs, so its local cost is the
few hundred KB the fixture holds; its cluster cost is zero (guard
short-circuits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_map_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` (default: the
    session's ``defaultParallelism``) iff its current partition count
    is lower. No-op — no added Exchange — when the input already has
    enough splits, which is the production case.

    Streaming DataFrames are returned untouched: the partition-count
    probe (``df.rdd``) is illegal on a streaming plan, and micro-batch
    sources size their own splits per trigger."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
