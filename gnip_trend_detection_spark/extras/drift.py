"""Distribution-drift detection between two time periods.

The monitoring layer a production trend pipeline runs NEXT TO the
detectors (reference `README.md` frames the system as continuous
counter monitoring): before trusting a model fit, check whether the
data feeding it still looks like the data it was tuned on. Two
standard complementary statistics, both computed per group with one
pass + one keyed aggregation each:

- **PSI** (population stability index) — binned, symmetric-ish KL
  blend; the industry drift score (>0.2 ≈ act).
- **Two-sample KS D** — max ECDF gap; exact, bin-free, catches shape
  drift PSI's coarse bins miss.

Both split the input into reference/current halves at the midpoint of
the observed time range — deterministic, no wall-clock dependence —
so the operators double as "did this week drift from last week"
primitives when callers pre-filter the window.

Scale shape: PSI is two hash aggregations (bin histogram, then
per-group sum over a fixed n_bins-row grid) — linear, map-side
combined, no windows at all. KS needs the per-group value ECDF:
counts collapse to DISTINCT (group, value) rows first, then a window
PARTITIONED by group orders each group's distinct values —
parallel across groups; within a hot group the relation is already
collapsed to distinct values (bounded by value cardinality, not row
count). At 100 TB with continuous values, swap the exact ECDF for the
PSI-style binned D (same code, pre-rounded values) — documented
trade, not a plan defect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tagged(
    events: DataFrame, group_col: str, value_col: str, ts_col: str
) -> DataFrame:
    """(grp, v, is_ref): period split at the midpoint of the observed
    time range. ``2*t <= tmin + tmax`` keeps the comparison in exact
    double arithmetic (no division)."""
    e = events.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
        F.col(ts_col).cast("double").alias("t"),
    ).filter(F.col("grp").isNotNull() & F.col("v").isNotNull())
    bounds = e.agg(F.min("t").alias("tmin"), F.max("t").alias("tmax"))
    return e.join(F.broadcast(bounds)).select(
        "grp", "v", (F.col("t") * 2 <= F.col("tmin") + F.col("tmax")).alias("is_ref")
    )


def psi_drift(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_bins: int = 10,
) -> DataFrame:
    """Population stability index per group between the first and
    second half of the observed time range.

    Equal-width bins over each group's own [min, max] value range
    (computed on BOTH periods, so the binning is symmetric); counts
    additively smoothed with 1/2 per bin (Jeffreys) so empty bins
    never hit log(0):

        p_b = (c_b + 0.5) / (n + n_bins/2)
        PSI = sum_b (p_cur - p_ref) * ln(p_cur / p_ref)

    The full group x bin grid is generated explicitly (sequence +
    explode) so bins empty in both periods still contribute their
    smoothed mass — dropping them would bias PSI low exactly when
    drift concentrates the data.

    Returns (grp, n_ref, n_cur, psi) — psi rounded to 6, n_bins-term
    sum per group.
    """
    return _psi_from_tagged(
        _tagged(events, group_col, value_col, ts_col), n_bins
    )


def psi_between(
    reference: DataFrame,
    current: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """PSI per group between TWO relations — the other production
    shape ("this week's crawl vs the trusted reference corpus"):
    identical math to psi_drift, the period flag comes from which
    input a row arrived in instead of a time split."""
    return _psi_from_tagged(
        _union_tagged(reference, current, group_col, value_col), n_bins
    )


def _union_tagged(
    reference: DataFrame, current: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    def side(df: DataFrame, flag: bool) -> DataFrame:
        return df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("double").alias("v"),
            F.lit(flag).alias("is_ref"),
        ).filter(F.col("grp").isNotNull() & F.col("v").isNotNull())

    return side(reference, True).unionByName(side(current, False))


def _psi_from_tagged(tagged: DataFrame, n_bins: int) -> DataFrame:
    # ONE per-group aggregation carries value bounds AND period totals
    # — the bin grid, the bin expression, and the smoothing
    # denominators all derive from it without re-scanning the input
    gstats = tagged.groupBy("grp").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count(F.when(F.col("is_ref"), 1)).alias("n_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("n_cur"),
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(n_bins))
    binned = tagged.join(F.broadcast(gstats), "grp").select(
        "grp",
        "is_ref",
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor((F.col("v") - F.col("vmin")) / width).cast("long"),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bin"),
    )
    cnts = binned.groupBy("grp", "bin").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("c_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("c_cur"),
    )
    grid = gstats.select(
        "grp",
        "n_ref",
        "n_cur",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_bins - 1).cast("long"))
        ).alias("bin"),
    )
    half = F.lit(n_bins / 2.0)
    p_ref = (F.coalesce("c_ref", F.lit(0)) + 0.5) / (F.col("n_ref") + half)
    p_cur = (F.coalesce("c_cur", F.lit(0)) + 0.5) / (F.col("n_cur") + half)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        grid.join(cnts, ["grp", "bin"], "left")
        .groupBy("grp", "n_ref", "n_cur")
        .agg((F.round(F.sum(term), 6) + F.lit(0.0)).alias("psi"))
    )


def ks_drift(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D per group between the
    first and second half of the observed time range:

        D = max over x of |ECDF_ref(x) - ECDF_cur(x)|

    Tie-safe by construction: rows collapse to one row per DISTINCT
    (group, value) carrying both periods' counts, cumulative sums run
    over that relation ordered by value, and the ECDF gap is evaluated
    AFTER each value's full mass (the only points where the sup can
    be attained). Cumulative counts are integers — the max is over
    exact ratios, so the statistic is partitioning-invariant.

    Returns (grp, n_ref, n_cur, ks_d) — ks_d rounded to 6.
    """
    return _ks_from_tagged(_tagged(events, group_col, value_col, ts_col))


def ks_between(
    reference: DataFrame,
    current: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Two-sample KS D per group between TWO relations (see
    psi_between) — same exact ECDF machinery as ks_drift."""
    return _ks_from_tagged(_union_tagged(reference, current, group_col, value_col))


def _ks_from_tagged(tagged: DataFrame) -> DataFrame:
    per_v = tagged.groupBy("grp", "v").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("c_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("c_cur"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        "grp",
        F.sum("c_ref").over(w).alias("cum_ref"),
        F.sum("c_cur").over(w).alias("cum_cur"),
    )
    tot = per_v.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    # try_divide: a degenerate group entirely inside one half makes
    # n 0, and the engines disagree on x/0 (ANSI Spark throws, DuckDB
    # yields NaN) — divide NULL-safely and emit an explicit NULL D
    # for that group in both engines
    gap = F.abs(
        F.try_divide(F.col("cum_ref"), F.col("n_ref"))
        - F.try_divide(F.col("cum_cur"), F.col("n_cur"))
    )
    return (
        cum.join(F.broadcast(tot), "grp")
        .groupBy("grp", "n_ref", "n_cur")
        .agg(
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round(F.max(gap), 6) + F.lit(0.0),
            ).alias("ks_d")
        )
    )


def psi_timeline(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_bins: int = 10,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Drift as a TIME SERIES: for every (group, time bucket), the PSI
    of that bucket's value distribution against the group's WHOLE
    observed distribution — the continuous-monitoring view (the same
    framing as the reference's counter monitoring) where psi_drift's
    single split is the one-shot audit. A bucket whose PSI spikes is
    the moment the input changed.

    Same Jeffreys-smoothed equal-width bins as psi_drift (bin edges
    from the group's global [min, max], so every bucket is measured
    against the same ruler). Plan: one pass bins every row, then three
    hash aggregations — (grp, bucket, bin) counts, (grp, bin) baseline
    counts, and the per-(grp, bucket) PSI sum over the generated full
    bin grid. The baseline relation is #groups x n_bins rows and
    broadcasts; no windows, no single-partition anything.

    Returns (grp, bucket, n, psi) — bucket is the epoch-second bucket
    start, psi rounded to 6.
    """
    e = events.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
        (
            F.floor(F.col(ts_col).cast("double") / bucket_sec)
            * F.lit(bucket_sec)
        )
        .cast("long")
        .alias("bucket"),
    ).filter(F.col("grp").isNotNull() & F.col("v").isNotNull())
    vb = e.groupBy("grp").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count(F.lit(1)).alias("n_all"),
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(n_bins))
    binned = e.join(F.broadcast(vb), "grp").select(
        "grp",
        "bucket",
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor((F.col("v") - F.col("vmin")) / width).cast("long"),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bin"),
    )
    # localCheckpoint: three consumers (baseline, totals, the grid
    # probe) would each re-expand the scan+bin subtree; the relation
    # is (groups x buckets x bins)-sized — bounded, cheap to pin
    per_bucket_bin = (
        binned.groupBy("grp", "bucket", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    baseline = per_bucket_bin.groupBy("grp", "bin").agg(
        F.sum("c").alias("c_all")
    )
    totals = per_bucket_bin.groupBy("grp", "bucket").agg(F.sum("c").alias("n"))
    grid = totals.select(
        "grp",
        "bucket",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_bins - 1).cast("long"))
        ).alias("bin"),
    )
    half = F.lit(n_bins / 2.0)
    joined = (
        grid.join(per_bucket_bin, ["grp", "bucket", "bin"], "left")
        .join(F.broadcast(baseline), ["grp", "bin"], "left")
        .join(F.broadcast(vb.select("grp", "n_all")), "grp")
    )
    p_cur = (F.coalesce("c", F.lit(0)) + 0.5) / (F.col("n") + half)
    p_ref = (F.coalesce("c_all", F.lit(0)) + 0.5) / (F.col("n_all") + half)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return joined.groupBy("grp", "bucket", "n").agg(
        (F.round(F.sum(term), 6) + F.lit(0.0)).alias("psi")
    )


def categorical_drift(
    events: DataFrame,
    category_col: str = "event_type",
    ts_col: str = "ts",
    bucket_sec: int = 21600,
) -> DataFrame:
    """Drift monitor for a CATEGORICAL column: per time bucket, the
    chi-square homogeneity statistic of the category distribution
    against the whole period's — the companion to psi_timeline when
    the drifting thing is a label/type/source mix rather than a
    numeric value (a crawler that suddenly returns 90% 'error' events
    moves no value histogram but screams here).

        chi2_b = sum_c (obs_bc - exp_bc)^2 / exp_bc,
        exp_bc = n_b * (n_c / N)

    Exact integer counts everywhere; the statistic is a sum over the
    (bucket x category) grid of deterministic double terms, rounded
    to 6. Plan: one (bucket, category) hash aggregate (the only
    data-sized shuffle), a category-marginal rollup derived FROM it,
    and a broadcast grid join — no windows. Categories absent from a
    bucket still contribute their full expected mass (grid generated
    from the marginals, not the observations).

    Returns (bucket, n, chi2, dof) — dof = #categories - 1.
    """
    e = events.select(
        F.col(category_col).alias("cat"),
        (
            F.floor(F.col(ts_col).cast("double") / bucket_sec)
            * F.lit(bucket_sec)
        )
        .cast("long")
        .alias("bucket"),
    ).filter(F.col("cat").isNotNull())
    obs = (
        e.groupBy("bucket", "cat")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint()
    )
    cat_tot = obs.groupBy("cat").agg(F.sum("o").alias("n_c"))
    bucket_tot = obs.groupBy("bucket").agg(F.sum("o").alias("n_b"))
    n_all = cat_tot.agg(F.sum("n_c").alias("n_all"))
    grid = bucket_tot.crossJoin(F.broadcast(cat_tot)).crossJoin(
        F.broadcast(n_all)
    )
    full = grid.join(obs, ["bucket", "cat"], "left").select(
        "bucket",
        "n_b",
        F.coalesce("o", F.lit(0)).alias("o"),
        (
            F.col("n_b").cast("double")
            * F.col("n_c").cast("double")
            / F.col("n_all").cast("double")
        ).alias("exp"),
    )
    term = (F.col("o") - F.col("exp")) * (F.col("o") - F.col("exp")) / F.col("exp")
    dof = cat_tot.agg((F.count(F.lit(1)) - 1).cast("long").alias("dof"))
    return (
        full.groupBy("bucket", "n_b")
        .agg((F.round(F.sum(term), 6) + F.lit(0.0)).alias("chi2"))
        .crossJoin(F.broadcast(dof))
        .select("bucket", F.col("n_b").cast("long").alias("n"), "chi2", "dof")
    )
