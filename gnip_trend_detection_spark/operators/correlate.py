"""All-pairs Pearson correlation between counter series (SURVEY §2.7
A4/A5; reference time_series_correlations.py:29-47).

The reference zips series by *insertion order* with no alignment or
length check (README.md:85: "BUGS BE HERE"). Deliberate fix: series are
aligned by timestamp with an inner join, so only co-observed bins
correlate. Pairs are deduplicated with counter_a < counter_b.

Scale: `pair_correlations` self-joins on the timestamp key; with C
counters per bin the join output is O(bins * C^2) — fine for the
reference's use (C is small). `pair_correlations_dense` is the
large-C twin: zero-fill onto the common grid, standardize, and reuse
the block-matrix BLAS kernel (Pearson r of dense series == cosine of
the centered vectors), so the C^2 work runs as n_blocks^2/2 matmuls
with no bins-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_correlations(
    rebinned: DataFrame,
    ts_col: str = "bin_start",
    round_digits: int | None = 4,
) -> DataFrame:
    """Pearson r from explicit sums, NOT F.corr: Spark merges Corr
    partials in shuffle-fetch order, which varies run to run, so a
    near-round-boundary r can flip between executions (observed once
    in a full-suite run). With integer counts every SUM here is exact
    (magnitudes < 2^53), making the sums merge-order-independent and r
    bit-deterministic — and bit-identical to the DuckDB oracle's same
    formula. r = (n·Σxy − ΣxΣy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²));
    NULL when either variance is 0, matching corr()."""
    a = rebinned.select(
        F.col("counter").alias("counter_a"),
        F.col(ts_col).alias("ts"),
        F.col("count").cast("double").alias("count_a"),
    )
    b = rebinned.select(
        F.col("counter").alias("counter_b"),
        F.col(ts_col).alias("ts"),
        F.col("count").cast("double").alias("count_b"),
    )
    paired = a.join(b, "ts").filter(F.col("counter_a") < F.col("counter_b"))
    x, y = F.col("count_a"), F.col("count_b")
    agg = paired.groupBy("counter_a", "counter_b").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    n = F.col("__n")
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    r = F.when((varx > 0) & (vary > 0), cov / F.sqrt(varx * vary))
    if round_digits is not None:
        r = F.round(r, round_digits) + F.lit(0.0)
    return (
        agg.select("counter_a", "counter_b", r.alias("r"), "n_bins")
        .orderBy("r", "counter_a", "counter_b")
    )


def pair_correlations_dense(
    rebinned: DataFrame,
    ts_col: str = "bin_start",
    round_digits: int = 4,
    n_blocks: int = 4,
) -> DataFrame:
    """Large-C scale twin: Pearson correlation over the ZERO-FILLED
    common bin grid, computed as block-matrix cosine of the centered
    per-counter vectors (r(a,b) == cos(a - mean(a), b - mean(b)) for
    equal-length dense series).

    Semantics differ from :func:`pair_correlations` by design: missing
    bins count as 0 over the union grid (dense-series view) instead of
    restricting each pair to co-observed bins. Constant series are
    dropped (r undefined). Plan: one grid fill (left join), one
    per-counter collect into a vector, then extras.similarity's
    blocked BLAS kernel — no bins-keyed C^2 self-join anywhere;
    the counter-rank window runs over the counters relation only
    (C rows, not the corpus).
    """
    from gnip_trend_detection_spark.extras.similarity import cosine_pairs_blocked

    base = rebinned.select(
        "counter",
        F.col(ts_col).alias("ts"),
        F.col("count").cast("double").alias("count"),
    )
    grid = base.select("ts").distinct()
    counters = base.select("counter").distinct()
    dense = (
        counters.crossJoin(grid)
        .join(base, ["counter", "ts"], "left")
        .select("counter", "ts", F.coalesce("count", F.lit(0.0)).alias("count"))
    )
    vec = (
        dense.groupBy("counter")
        .agg(F.array_sort(F.collect_list(F.struct("ts", "count"))).alias("tc"))
        .select("counter", F.transform("tc", lambda s: s["count"]).alias("x"))
    )
    nb = F.size("x")
    mu = F.aggregate("x", F.lit(0.0), lambda a, b: a + b) / nb.cast("double")
    vec = vec.select(
        "counter",
        nb.alias("n_bins"),
        F.transform("x", lambda v: v - mu).alias("z"),
    ).filter(F.sqrt(F.aggregate("z", F.lit(0.0), lambda a, v: a + v * v)) > 0)
    # C-row relation feeding three branches (embedding side + both
    # counter-name lookups) — persist so the grid fill + per-counter
    # collect runs once, not once per branch
    ids = vec.withColumn(
        "vec_id",
        F.row_number().over(Window.orderBy("counter")).cast("long") - 1,
    ).persist()
    emb = ids.select("vec_id", F.col("z").alias("embedding"))
    pairs = cosine_pairs_blocked(
        emb, threshold=-1.01, n_blocks=n_blocks, round_digits=round_digits
    )
    na = ids.select(
        F.col("vec_id").alias("vec_a"),
        F.col("counter").alias("counter_a"),
        "n_bins",
    )
    nbm = ids.select(
        F.col("vec_id").alias("vec_b"), F.col("counter").alias("counter_b")
    )
    return (
        pairs.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nbm), "vec_b")
        .select(
            "counter_a",
            "counter_b",
            F.col("cosine").alias("r"),
            F.col("n_bins").cast("long").alias("n_bins"),
        )
        .orderBy("r", "counter_a", "counter_b")
    )
