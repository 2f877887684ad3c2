"""Skew-handling primitives: salted equi-join and two-phase salted
aggregation.

Hot keys are the one thing that breaks otherwise scale-safe keyed
plans: a shuffle on the key sends every hot-key row to ONE reducer,
so a single key with 1% of 100 TB pins one executor for hours while
the rest idle. AQE's skew-join handles the sort-merge case
automatically (`session.py` enables it); these helpers cover the two
shapes AQE cannot fix:

- a broadcast-sized-but-not-broadcast dimension joined on a skewed
  key (`salted_join`): replicate the SMALL side once per salt value
  and scatter the big side uniformly, so every hot key fans out over
  ``n_salt`` reducers. The small side grows n_salt x — keep
  n_salt * |small| well under the shuffle budget.
- a groupBy on a LOW-CARDINALITY key (`salted_agg`): with 5 groups, a
  plain groupBy uses 5 reducers no matter how big the cluster is.
  Two-phase (key, salt) partial aggregation restores parallelism for
  any algebraic (mergeable) aggregate. This is the generalized form
  of the inline pattern `q_top_users_per_event` uses for its
  per-group top-k.

Both are deterministic: the salt comes from xxhash64 of a named
distributing column (NOT rand(), which breaks retries/replays and the
oracle contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⨝ small`` on ``on`` with hot-key fan-out.

    ``salt_from`` names a big-side column whose hash spreads rows
    uniformly (an id column; never the join key itself). The small
    side is exploded once per salt value — n_salt x replication — and
    the join runs on ``on + [salt]``, so each hot key occupies n_salt
    reducers instead of one.

    Only inner/left/left_semi/left_anti/cross ``how`` values are
    accepted: with a right or full outer join, an unmatched small-side
    key survives once per salt replica and would emit n_salt duplicate
    null-extended rows. Salt the other way around for those.
    """
    normalized = how.lower().replace("_", "").replace("outer", "")
    if normalized not in {"inner", "left", "leftsemi", "semi", "leftanti", "anti", "cross"}:
        raise ValueError(
            f"salted_join how={how!r} unsupported: unmatched small-side keys "
            f"would duplicate n_salt times under right/full outer joins"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salt)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")),
    )
    out = salted_big.join(salted_small, on + ["__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Callable[[Column], Column]]],
    salt_from: str,
    n_salt: int = 64,
) -> DataFrame:
    """Two-phase aggregation for low-cardinality / hot group keys.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_fn):
    the partial expression runs per (keys, salt); the merge function
    combines the n_salt partials per keys (e.g. ``F.sum("x")`` then
    ``F.sum``). Only valid for algebraic (mergeable) aggregates —
    sum/count/min/max; avg must be decomposed into sum+count by the
    caller. The first shuffle has keys x n_salt reducers; the second
    reduces n_salt pre-aggregated rows per key.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salt)).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[p.alias(f"__p_{name}") for name, (p, _m) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            merge(F.col(f"__p_{name}")).alias(name)
            for name, (_p, merge) in aggs.items()
        ]
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """MEASURE skew before fixing it: the diagnostic that decides
    whether a key needs `salted_join`/`salted_agg` at all, and with
    what n_salt. Everything above in this module treats skew as known;
    at 100 TB you establish it with one cheap keyed pass, not by
    watching a straggler for an hour.

    Two hash aggregations, both map-side combined, no windows and no
    global sort:
      1. per-key counts (the only data-sized shuffle);
      2. one global fold over the key histogram emitting:
         - n_rows, n_keys, max_cnt and the hottest key (max over a
           (cnt, key) struct — key as deterministic tiebreak),
         - hot_share = max_cnt/n_rows (what fraction one reducer
           would absorb),
         - cv = population stddev / mean of key counts,
         - entropy_ratio = H(key distribution)/ln(n_keys) in [0,1]
           (1 = perfectly uniform; via the exact-integer identity
           H = ln(n) - sum(cnt*ln cnt)/n, one aggregate term).

    NULL keys count as a real group (NULLs skew joins too): GROUP BY
    collects NULLs into one group in both Spark and ANSI SQL, so no
    sentinel is needed. Returns ONE row; doubles rounded to 6.
    """
    cnts = df.select(F.col(key_col).alias("k")).groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = F.max(F.struct(F.col("cnt"), F.col("k"))).alias("top")
    n = F.sum("cnt").cast("double")
    sum_clnc = F.sum(F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double")))
    mean = n / F.count(F.lit(1)).cast("double")
    agg = cnts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        top,
        (F.round(F.stddev_pop("cnt") / mean, 6) + F.lit(0.0)).alias("cv"),
        F.when(
            F.count(F.lit(1)) > 1,
            F.round(
                (F.log(n) - sum_clnc / n) / F.log(F.count(F.lit(1)).cast("double")),
                6,
            )
            + F.lit(0.0),
        )
        .otherwise(F.lit(1.0))
        .alias("entropy_ratio"),
    )
    return agg.select(
        "n_rows",
        "n_keys",
        F.col("top.cnt").cast("long").alias("max_cnt"),
        F.col("top.k").alias("hot_key"),
        (F.round(F.col("top.cnt") / F.col("n_rows").cast("double"), 6) + F.lit(0.0)).alias(
            "hot_share"
        ),
        "cv",
        "entropy_ratio",
    )
