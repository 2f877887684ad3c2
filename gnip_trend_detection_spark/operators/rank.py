"""Distributed exact global rank — the scale-safe replacement for
``F.rank().over(Window.orderBy(...))``, which moves the ENTIRE input
to one partition and sorts it there (Spark plans
``Exchange SinglePartition`` + ``Sort``; one task, no parallelism —
the classic 100 TB cliff; tests/test_plan_budgets.py forbids that
shape over unbounded inputs repo-wide).

``competition_ranks`` computes identical SQL RANK() values for k
columns at once with ONE two-phase distinct-value pass (see its
docstring); derived statistics follow directly:

    percent_rank = (rank - 1) / (n - 1)        # SQL PERCENT_RANK
    dense_rank   = rank over the distinct-value relation itself

Used by the trend-detector ensemble (operators/models/ensemble.py)
and the multi-signal quality blend (queries.py:q_quality_blend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def competition_ranks(
    df: DataFrame,
    specs: list[tuple[str, str, bool]],
    n_parts: int | None = None,
) -> DataFrame:
    """Exact SQL ``RANK() OVER (ORDER BY col DESC)`` (or ASC) for every
    ``(col, out, ascending)`` in ``specs``, with NO single-partition
    sort and ONE histogram pass shared by all k rank columns.

    Batched two-phase distributed rank:

    1. tall relation: each row explodes to k ``(signal, value)`` pairs
       (narrow — no shuffle); values rank as doubles;
    2. histogram: ``groupBy(signal, value).count()`` collapses to the
       distinct pairs — ONE keyed exchange, map-side combined, shared
       by every rank column (the k-separate-calls form pays this
       shuffle k times);
    3. ``repartitionByRange(signal ASC, value DESC)`` spreads distinct
       pairs across partitions in global sort order; a running sum
       partitioned by ``(partition_id, signal)`` (parallel, never
       single-partition) gives each value its local prefix count;
    4. per-(signal, partition) totals — <= k * n_parts rows, bounded
       by construction — get cumulative offsets and per-signal row
       counts via windows PARTITIONED BY SIGNAL over that bounded
       relation (no driver collect: the offsets stay in-plan and
       broadcast-join back);
    5. ``rank_desc(v) = 1 + offset + local_prefix - cnt(v)``; the
       ascending rank derives from the SAME descending histogram —
       ``rank_asc = n + 2 - rank_desc - cnt`` (reversing a total order
       maps the strictly-greater count to the strictly-less count) —
       so mixed-direction specs still share one pass;
    6. each rank column equi-joins back onto the input by value.

    The histogram is ``localCheckpoint``-ed after range partitioning:
    RangePartitioner samples its boundaries, and freezing the blocks
    guarantees the totals sub-plan and the join sub-plan read the SAME
    partitioning (a recompute could re-sample different boundaries).
    The checkpointed relation is distinct-pair-sized — bounded by the
    value domains, not the raw data — and AQE reads its real size, so
    small rank relations broadcast into the final joins.

    Ties: identical values collapse into one histogram row, so every
    tied input row joins the same rank — exactly SQL RANK semantics,
    for any partitioning. NaN follows Spark sort semantics (greater
    than any double, equal to itself), same as the Window form. NULLs
    collapse into one histogram group placed where the Window sort
    puts them (DESC NULLS LAST / ASC NULLS FIRST — Spark defaults,
    and exact mirror images, so the ASC derivation covers them too)
    and rejoin via null-safe equality, so null rows get the same rank
    the Window form gives them instead of dropping out of the join.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("__sig"),
                F.col(col).cast("double").alias("__v"),
            )
            for i, (col, _, _) in enumerate(specs)
        ]
    )
    tall = df.select(F.explode(pairs).alias("p")).select("p.__sig", "p.__v")
    hist = (
        tall.groupBy("__sig", "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .repartitionByRange(n_parts, F.asc("__sig"), F.desc("__v"))
        .withColumn("__pid", F.spark_partition_id())
    ).localCheckpoint()
    run = (
        Window.partitionBy("__pid", "__sig")
        .orderBy(F.desc("__v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = hist.withColumn("__cum", F.sum("__cnt").over(run))
    # per-(signal, partition) totals: <= k * n_parts rows, bounded by
    # construction (partition count, not data volume). Offsets and the
    # per-signal row count n both come from signal-partitioned windows
    # over this bounded relation — parallel, in-plan, no collect.
    tot = hist.groupBy("__sig", "__pid").agg(F.sum("__cnt").alias("__tot"))
    w_off = (
        Window.partitionBy("__sig")
        .orderBy(F.asc("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy("__sig")
    offsets = tot.select(
        "__sig",
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__tot").over(w_n).alias("__n"),
    )
    ranked = local.join(F.broadcast(offsets), ["__sig", "__pid"]).select(
        "__sig",
        "__v",
        "__cnt",
        "__n",
        (F.lit(1) + F.col("__off") + F.col("__cum") - F.col("__cnt"))
        .cast("long")
        .alias("__rk_desc"),
    )
    out_df = df
    for i, (col, out, ascending) in enumerate(specs):
        rk = (
            (F.col("__n") + 2 - F.col("__rk_desc") - F.col("__cnt")).cast("long")
            if ascending
            else F.col("__rk_desc")
        )
        ranks_i = ranked.filter(F.col("__sig") == i).select(
            F.col("__v").alias("__jv"), rk.alias(out)
        )
        out_df = out_df.join(
            ranks_i, out_df[col].cast("double").eqNullSafe(ranks_i["__jv"])
        ).drop("__jv")
    return out_df


def competition_rank(
    df: DataFrame,
    col: str,
    out: str,
    n_parts: int | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Single-column form of :func:`competition_ranks` — exact SQL
    ``RANK() OVER (ORDER BY col DESC)`` (or ASC with
    ``ascending=True``) with no single-partition sort."""
    return competition_ranks(df, [(col, out, ascending)], n_parts=n_parts)
