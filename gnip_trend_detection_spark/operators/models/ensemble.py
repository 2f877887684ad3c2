"""Consensus trend detection: rank-blend of Mann-Kendall z, Theil–Sen
slope, and the trailing burst ratio over one shared per-counter pass.

The three detectors read the SAME trailing window of the SAME series,
so computing them in three separate operators costs three per-counter
exchanges plus two joins for nothing. This operator fuses them into a
single ``applyInPandas`` kernel (one groupBy-counter exchange; the MK
and TS kernels are imported from their home modules so the fused
numbers can never drift from the standalone operators), then blends
with integer global RANKs:

    rank_sum = rank(eta DESC) + rank(slope DESC) + rank(burst DESC)

and returns the ``top_n`` lowest rank-sums (ties broken by counter,
bin). All outputs are integers — structurally immune to the
cross-engine float-tie class. Rank inputs are deterministic: MK eta
is sig-rounded (HALF_UP twin proven bit-exact by the streaming parity
tests), the TS slope is HALF_UP-round(6)-stable by the rational-slope
argument in theil_sen.py, and the burst ratio divides exact
whole-number window sums (integer-valued doubles sum exactly in FP —
fold order cannot matter).

Scale: the three global ranks are computed WITHOUT a global sort via
``competition_rank`` — distinct-value histogram (one keyed exchange),
range-partitioned per-partition prefix sums, a tiny per-partition
totals table joined back broadcast, then an equi-join of value→rank
onto the grid. No ``Exchange SinglePartition`` anywhere on the
unbounded path; the only single-partition window left runs over the
``top_n``-row head (bounded by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gnip_trend_detection_spark.functions.core import sig_round2_py
from gnip_trend_detection_spark.operators.models.mann_kendall import _z_series
from gnip_trend_detection_spark.operators.models.theil_sen import _slope_series


def competition_rank(
    df: DataFrame,
    col: str,
    out: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact SQL ``RANK() OVER (ORDER BY col DESC)`` — 1 + the number
    of rows strictly greater — with NO single-partition sort.

    Two-phase distributed rank:

    1. histogram: ``groupBy(col).count()`` collapses the input to its
       distinct values (one keyed exchange, map-side combined);
    2. ``repartitionByRange(desc(col))`` spreads the distinct values
       across partitions in global descending order, then a
       per-partition running sum (Window partitioned BY PARTITION ID —
       parallel, never single-partition) gives each value its local
       strict-prefix count;
    3. per-partition totals (≤ n_parts rows, bounded by construction)
       get cumulative offsets via a window over that tiny relation and
       broadcast-join back;
    4. ``rank(v) = 1 + offset(partition) + local_strict_prefix(v)``,
       equi-joined onto the input by value.

    The histogram is ``localCheckpoint``-ed after range partitioning:
    RangePartitioner samples its boundaries, and freezing the blocks
    guarantees the totals sub-plan and the join sub-plan read the SAME
    partitioning (a recompute could re-sample different boundaries).
    The checkpointed relation is distinct-value-sized — bounded by the
    score grid, not the raw data.

    Ties: identical values collapse into one histogram row, so every
    tied input row joins the same rank — exactly SQL RANK semantics,
    for any partitioning. NaN follows Spark sort semantics (greater
    than any double, equal to itself), same as the Window form.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    hist = (
        df.groupBy(F.col(col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .repartitionByRange(n_parts, F.desc("__v"))
        .withColumn("__pid", F.spark_partition_id())
    ).localCheckpoint()
    run = Window.partitionBy("__pid").orderBy(F.desc("__v")).rowsBetween(
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


def trend_ensemble(
    rebinned: DataFrame,
    window_size: int = 20,
    top_n: int = 50,
    ts_col: str = "bin_start",
) -> DataFrame:
    """A3 DataFrame → top-``top_n`` (counter, interval_start, rank_sum,
    rk) consensus trending points."""

    def per_counter(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("interval_start")
        x = pdf["count"].to_numpy(dtype=np.float64)
        pdf["eta"] = [sig_round2_py(z) for z in _z_series(x, window_size)]
        raw = _slope_series(x, window_size)
        pdf["slope"] = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        # trailing mean of whole-number counts: cumsum is exact in FP
        cum = np.concatenate(([0.0], np.cumsum(x)))
        n = x.size
        lo = np.maximum(0, np.arange(n) - window_size + 1)
        m = np.arange(n) - lo + 1
        pdf["burst"] = x / ((cum[np.arange(n) + 1] - cum[lo]) / m)
        return pdf[["counter", "interval_start", "eta", "slope", "burst"]]

    base = rebinned.select(
        "counter",
        rebinned[ts_col].alias("interval_start"),
        rebinned["count"].cast("double").alias("count"),
    )
    # one per-counter exchange + kernel pass, frozen: the three rank
    # histograms and the final join all read the checkpointed grid
    # (counters x bins — bounded) instead of re-running the kernel
    scored = base.groupBy("counter").applyInPandas(
        per_counter,
        schema="counter string, interval_start timestamp, "
        "eta double, slope double, burst double",
    ).localCheckpoint()
    ranked = competition_rank(
        competition_rank(
            competition_rank(scored, "eta", "__r_eta"),
            "slope",
            "__r_slope",
        ),
        "burst",
        "__r_burst",
    ).select(
        "counter",
        "interval_start",
        (F.col("__r_eta") + F.col("__r_slope") + F.col("__r_burst"))
        .cast("long")
        .alias("rank_sum"),
    )
    # TakeOrdered-shaped head: sort+limit never materializes a global
    # sort; the row_number window then runs over <= top_n rows —
    # bounded by construction, not by data volume
    head = ranked.orderBy("rank_sum", "counter", "interval_start").limit(top_n)
    w = Window.orderBy("rank_sum", "counter", "interval_start")
    return head.withColumn("rk", F.row_number().over(w).cast("long"))
