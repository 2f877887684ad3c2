"""Distributed EXACT quantiles with SQL ``quantile_cont`` semantics —
the scale-safe replacement for both ``approxQuantile`` (wrong answer)
and ``percentile_cont`` over ``Window.orderBy()`` (single-partition
sort, the 100 TB cliff; forbidden repo-wide by
tests/test_plan_budgets.py).

Same two-phase histogram machinery as operators/rank.py
(``competition_ranks``): collapse the column to its distinct-value
histogram (one keyed exchange, map-side combined), range-partition the
histogram, compute partition-local prefix counts in parallel, then
cumulative offsets over the BOUNDED per-partition totals relation.
Every requested quantile then needs only the one or two histogram rows
covering its order-statistic index — found with one broadcast join of
the (tiny, len(qs)-row) target relation against the histogram.

Curation stacks need this shape constantly: "keep docs above the 30th
quality percentile" / "trim the top 1% by length" are exact-threshold
decisions a sampled approximation silently distorts at the tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_parts: int | None = None,
) -> DataFrame:
    """Exact linear-interpolated quantiles of ``col`` — bit-compatible
    with ANSI ``percentile_cont(q)`` / DuckDB ``quantile_cont(col, q)``
    — with NO single-partition sort and ONE histogram pass shared by
    every requested quantile.

    For each q in ``qs`` (0 <= q <= 1), with n non-null values and
    0-based position pos = q * (n - 1):

        value(q) = v[floor(pos)] + (pos - floor(pos))
                                   * (v[ceil(pos)] - v[floor(pos)])

    Plan: distinct-value histogram (groupBy — the only data-sized
    shuffle) → ``repartitionByRange`` ASC → partition-local running
    counts (windows PARTITIONED by partition id, parallel) → offsets
    from the <= n_parts-row totals relation → the covering rows for
    index k satisfy ``prev < k + 1 <= cum`` (cum = rows <= v, prev =
    rows < v); since ceil(pos) <= floor(pos) + 1, one predicate
    ``cum > k_lo AND prev <= k_hi`` selects exactly the 1-2 covering
    rows per target and nothing between. The targets relation is
    len(qs) rows — broadcast into a bounded nested-loop join with the
    histogram streamed (whitelisted shape, tests/test_plan_budgets.py).

    The histogram is ``localCheckpoint``-ed after range partitioning
    for the same reason as rank.py: RangePartitioner samples its
    boundaries, and the totals sub-plan and the probe sub-plan must
    read the SAME partitioning.

    NULLs are excluded (SQL percentile semantics). Returns one row per
    q: ``(q double, quantile_value double)``, value rounded to 6
    decimals per the repo-wide cross-engine parity policy.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vals = df.select(F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    hist = (
        vals.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .repartitionByRange(n_parts, F.asc("__v"))
        .withColumn("__pid", F.spark_partition_id())
    ).localCheckpoint()
    run = (
        Window.partitionBy("__pid")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = hist.withColumn("__lcum", F.sum("__cnt").over(run))
    # per-partition totals: <= n_parts rows, bounded by construction —
    # the constant-key windows below run over THIS relation only
    tot = hist.groupBy("__pid").agg(F.sum("__cnt").alias("__tot"))
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.asc("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy(F.lit(0))
    offsets = tot.select(
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__tot").over(w_n).alias("__n"),
    )
    cum = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__cum", F.col("__off") + F.col("__lcum"))
        .withColumn("__prev", F.col("__cum") - F.col("__cnt"))
        .select("__v", "__prev", "__cum", "__n")
    )
    # len(qs)-row target relation, built in-plan from the n carried on
    # every histogram row (no driver collect)
    n_row = offsets.select(F.col("__n")).limit(1)
    targets = (
        n_row.select(
            "__n",
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])
            ).alias("q"),
        )
        .withColumn("__pos", F.col("q") * (F.col("__n") - 1).cast("double"))
        .withColumn("__klo", F.floor("__pos").cast("long"))
        .withColumn("__khi", F.ceil("__pos").cast("long"))
        .withColumn("__frac", F.col("__pos") - F.col("__klo").cast("double"))
        .select("q", "__klo", "__khi", "__frac")
    )
    covered = cum.join(
        F.broadcast(targets),
        (F.col("__cum") > F.col("__klo")) & (F.col("__prev") <= F.col("__khi")),
    )
    lo_hits = F.when(
        (F.col("__prev") <= F.col("__klo")) & (F.col("__cum") > F.col("__klo")),
        F.col("__v"),
    )
    hi_hits = F.when(
        (F.col("__prev") <= F.col("__khi")) & (F.col("__cum") > F.col("__khi")),
        F.col("__v"),
    )
    return (
        covered.groupBy("q")
        .agg(
            F.max(lo_hits).alias("__vlo"),
            F.max(hi_hits).alias("__vhi"),
            F.max("__frac").alias("__f"),
        )
        .select(
            "q",
            F.round(
                F.col("__vlo")
                + F.col("__f") * (F.col("__vhi") - F.col("__vlo")),
                6,
            ).alias("quantile_value"),
        )
    )


def exact_quantiles_by(
    df: DataFrame,
    col: str,
    qs: list[float],
    by: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Per-group :func:`exact_quantiles` — ``quantile_cont(col, q)
    GROUP BY by`` — again with no single-partition sort AND no
    per-group value buffering (Spark's exact ``percentile()``
    aggregate collects every group value into one ArrayBuffer; a hot
    group at 100 TB OOMs that executor).

    Same two-phase histogram, keyed one level up: the histogram is
    (group, value) distinct pairs; prefix counts run per
    (partition, group); offsets and per-group row counts come from
    group-partitioned windows over the bounded per-(group, partition)
    totals relation. The targets relation is (#groups x len(qs)) rows
    and joins back with a GROUP EQUI-KEY plus the covering-range
    residual — a broadcast HASH join (not a nested loop: the equi key
    hashes, the range predicate filters the few same-group rows).

    Returns one row per (group, q):
    ``(by, q double, quantile_value double)``, rounded to 6.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vals = df.select(
        F.col(by).alias("__g"), F.col(col).cast("double").alias("__v")
    ).filter(F.col("__v").isNotNull())
    hist = (
        vals.groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .repartitionByRange(n_parts, F.asc("__g"), F.asc("__v"))
        .withColumn("__pid", F.spark_partition_id())
    ).localCheckpoint()
    run = (
        Window.partitionBy("__pid", "__g")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = hist.withColumn("__lcum", F.sum("__cnt").over(run))
    tot = hist.groupBy("__g", "__pid").agg(F.sum("__cnt").alias("__tot"))
    w_off = (
        Window.partitionBy("__g")
        .orderBy(F.asc("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy("__g")
    offsets = tot.select(
        "__g",
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__tot").over(w_n).alias("__n"),
    )
    cum = (
        local.join(F.broadcast(offsets), ["__g", "__pid"])
        .withColumn("__cum", F.col("__off") + F.col("__lcum"))
        .withColumn("__prev", F.col("__cum") - F.col("__cnt"))
        .select("__g", "__v", "__prev", "__cum")
    )
    n_by_g = tot.groupBy("__g").agg(F.sum("__tot").alias("__n"))
    targets = (
        n_by_g.select(
            "__g",
            "__n",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .withColumn("__pos", F.col("q") * (F.col("__n") - 1).cast("double"))
        .withColumn("__klo", F.floor("__pos").cast("long"))
        .withColumn("__khi", F.ceil("__pos").cast("long"))
        .withColumn("__frac", F.col("__pos") - F.col("__klo").cast("double"))
        .select("__g", "q", "__klo", "__khi", "__frac")
    )
    covered = cum.join(
        F.broadcast(targets),
        (cum["__g"] == targets["__g"])
        & (F.col("__cum") > F.col("__klo"))
        & (F.col("__prev") <= F.col("__khi")),
    ).drop(targets["__g"])
    lo_hits = F.when(
        (F.col("__prev") <= F.col("__klo")) & (F.col("__cum") > F.col("__klo")),
        F.col("__v"),
    )
    hi_hits = F.when(
        (F.col("__prev") <= F.col("__khi")) & (F.col("__cum") > F.col("__khi")),
        F.col("__v"),
    )
    return (
        covered.groupBy("__g", "q")
        .agg(
            F.max(lo_hits).alias("__vlo"),
            F.max(hi_hits).alias("__vhi"),
            F.max("__frac").alias("__f"),
        )
        .select(
            F.col("__g").alias(by),
            "q",
            F.round(
                F.col("__vlo")
                + F.col("__f") * (F.col("__vhi") - F.col("__vlo")),
                6,
            ).alias("quantile_value"),
        )
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Winsorization report: clamp ``value_col`` to its GLOBAL exact
    [p_lo, p_hi] quantiles and compare per-group means before/after —
    the standard heavy-tail guard before feeding a value into scaling,
    z-scores, or a loss, plus the clamp-rate audit that shows how much
    mass the tails held.

    Thresholds come from the two-phase exact quantile histogram above
    (no single-partition sort); they pivot to one broadcast row and
    ride onto the scan. Means are exact-integer sums: raw values in
    CENTS (the fixture's 2-decimal contract), clamped values rounded
    once to integer MICROS — so both means are partitioning-invariant
    before the final round-6 division.

    Returns one row per group: (grp, n, n_lo_clamped, n_hi_clamped,
    mean_raw, mean_winsorized, lo, hi).
    """
    thr = (
        exact_quantiles(df, value_col, [p_lo, p_hi])
        .agg(
            F.max(
                F.when(F.col("q") == p_lo, F.col("quantile_value"))
            ).alias("lo"),
            F.max(
                F.when(F.col("q") == p_hi, F.col("quantile_value"))
            ).alias("hi"),
        )
        .localCheckpoint()
    )
    v = F.col(value_col).cast("double")
    scored = df.select(F.col(group_col).alias("grp"), v.alias("v")).join(
        F.broadcast(thr)
    )
    agg = scored.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("v") < F.col("lo")).cast("long")).alias("n_lo_clamped"),
        F.sum((F.col("v") > F.col("hi")).cast("long")).alias("n_hi_clamped"),
        F.sum(F.round(F.col("v") * 100).cast("long")).alias("cents"),
        F.sum(
            F.round(
                F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
                * 1000000.0
            ).cast("long")
        ).alias("micros"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )
    return agg.select(
        "grp",
        "n",
        "n_lo_clamped",
        "n_hi_clamped",
        (
            F.round(F.col("cents") / (F.col("n").cast("double") * 100.0), 6)
            + F.lit(0.0)
        ).alias("mean_raw"),
        (
            F.round(
                F.col("micros") / (F.col("n").cast("double") * 1000000.0), 6
            )
            + F.lit(0.0)
        ).alias("mean_winsorized"),
        (F.round(F.col("lo"), 6) + F.lit(0.0)).alias("lo"),
        (F.round(F.col("hi"), 6) + F.lit(0.0)).alias("hi"),
    )
