"""Distributed exact global rank — the scale-safe replacement for
``F.rank().over(Window.orderBy(...))``, which moves the ENTIRE input
to one partition and sorts it there (Spark plans
``Exchange SinglePartition`` + ``Sort``; one task, no parallelism —
the classic 100 TB cliff; tests/test_plan_budgets.py forbids that
shape over unbounded inputs repo-wide).

``competition_rank`` computes the identical SQL RANK() value with a
two-phase distinct-value algorithm (see its docstring); derived
statistics follow directly:

    percent_rank = (rank - 1) / (n - 1)        # SQL PERCENT_RANK
    dense_rank   = rank over the distinct-value relation itself

Used by the trend-detector ensemble (operators/models/ensemble.py)
and the multi-signal quality blend (queries.py:q_quality_blend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def competition_rank(
    df: DataFrame,
    col: str,
    out: str,
    n_parts: int | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Exact SQL ``RANK() OVER (ORDER BY col DESC)`` (or ASC with
    ``ascending=True``) — 1 + the number of rows strictly before —
    with NO single-partition sort.

    Two-phase distributed rank:

    1. histogram: ``groupBy(col).count()`` collapses the input to its
       distinct values (one keyed exchange, map-side combined);
    2. ``repartitionByRange`` spreads the distinct values across
       partitions in global sort order, then a per-partition running
       sum (Window partitioned BY PARTITION ID — parallel, never
       single-partition) gives each value its local strict-prefix
       count;
    3. per-partition totals (<= n_parts rows, bounded by construction)
       are collected, prefix-summed on the driver, and rejoined as a
       broadcast literal frame;
    4. ``rank(v) = 1 + offset(partition) + local_strict_prefix(v)``,
       equi-joined onto the input by value.

    The histogram is ``localCheckpoint``-ed after range partitioning:
    RangePartitioner samples its boundaries, and freezing the blocks
    guarantees the totals sub-plan and the join sub-plan read the SAME
    partitioning (a recompute could re-sample different boundaries).
    The checkpointed relation is distinct-value-sized — bounded by the
    value domain, not the raw data.

    Ties: identical values collapse into one histogram row, so every
    tied input row joins the same rank — exactly SQL RANK semantics,
    for any partitioning. NaN follows Spark sort semantics (greater
    than any double, equal to itself), same as the Window form.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order = F.asc(F.col("__v")) if ascending else F.desc(F.col("__v"))
    hist = (
        df.groupBy(F.col(col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .repartitionByRange(n_parts, order)
        .withColumn("__pid", F.spark_partition_id())
    ).localCheckpoint()
    run = Window.partitionBy("__pid").orderBy(order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = hist.withColumn("__cum", F.sum("__cnt").over(run))
    # per-partition totals: <= n_parts rows, bounded by construction
    # (partition count, not data volume) — collect and prefix-sum on
    # the driver, then rejoin as a broadcast literal frame. Keeps the
    # whole plan free of single-partition exchanges.
    tot = {
        r["__pid"]: r["__tot"]
        for r in hist.groupBy("__pid").agg(F.sum("__cnt").alias("__tot")).collect()
    }
    acc = 0
    off_rows = []
    for pid in sorted(tot):
        off_rows.append((pid, acc))
        acc += int(tot[pid])
    offsets = spark.createDataFrame(off_rows, "__pid int, __off long")
    ranks = local.join(F.broadcast(offsets), "__pid").select(
        F.col("__v"),
        (F.lit(1) + F.col("__off") + F.col("__cum") - F.col("__cnt"))
        .cast("long")
        .alias(out),
    )
    return df.join(ranks, df[col] == ranks["__v"]).drop("__v")
