"""Heavy hitters without the full-cardinality shuffle.

`GROUP BY term HAVING count > n/k` shuffles every distinct term — at
100 TB the term-frequency aggregate is vocabulary-sized and mostly
garbage (singletons). The two-pass heavy-hitter plan instead:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   capacity m = guard*k over its rows (vectorized: pandas value_counts
   first, MG decrements over the counter PAIRS, never per row). The
   union of per-partition survivors is a GUARANTEED superset of every
   item with global count > n/(m+1) >= n/k: if an item died in every
   partition, each death costs it at most n_p/(m+1) occurrences, and
   those deficits sum to at most n/(m+1) < its count — contradiction.
   Candidate volume is O(partitions * m), independent of cardinality.
2. **Exact pass** — a broadcast semi-join keeps only candidate rows,
   and the exact count runs on that sliver; `HAVING cnt > n/k` then
   yields EXACTLY the true heavy hitters — deterministic under any
   partitioning (the sketch can only widen the candidate set, never
   change the final answer), which is what makes the operator
   oracle-checkable against a plain GROUP BY twin.

The only data-sized work is one scan per pass; the only shuffles carry
candidates. This is the Misra-Gries/SpaceSaving merge argument
(mergeable-summaries literature) applied as a Spark plan shape.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries(counts: dict, capacity: int) -> dict:
    """MG over pre-aggregated (item, count) pairs."""
    summary: dict = {}
    for item, c in counts.items():
        if item in summary:
            summary[item] += c
        elif len(summary) < capacity:
            summary[item] = c
        else:
            dec = min(min(summary.values()), c)
            summary = {i: v - dec for i, v in summary.items() if v > dec}
            if c > dec:
                summary[item] = c - dec
    return summary


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, guard: int = 4
) -> DataFrame:
    """(item, cnt) for every value of ``col`` with exact count > n/k.
    ``guard`` widens the per-partition MG capacity (m = guard*k) so the
    candidate superset stays comfortably above the n/k threshold even
    under adversarial skew across partitions."""
    m = guard * k

    def candidates(batches: Iterable[pd.DataFrame]):
        summary: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            merged = summary
            for item, c in zip(vc.index, vc.to_numpy()):
                merged[item] = merged.get(item, 0) + int(c)
            summary = _misra_gries(merged, m)
        if summary:
            yield pd.DataFrame({"item": list(summary.keys())})

    cand = df.select(col).mapInPandas(candidates, "item string").distinct()
    totals = df.select(F.count(F.lit(1)).alias("n"))
    exact = (
        df.join(F.broadcast(cand), df[col] == F.col("item"), "left_semi")
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.join(F.broadcast(totals))
        .filter(F.col("cnt") * k > F.col("n"))
        .select("item", "cnt")
    )


def cms_heavy_hitters_contract(
    df: DataFrame,
    col: str,
    k: int = 100,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-Min-Sketch accuracy contract over the exact heavy
    hitters — the sketch-side twin of :func:`heavy_hitters`, shaped
    like value_quantiles_approx's bracket oracle: the hashable output
    is the EXACT (item, cnt) relation (cross-engine verifiable), plus
    two booleans per item pinning the CMS one-sided error guarantee

        cnt <= estimate <= cnt + eps * N

    CMS is the mergeable frequency sketch a 100 TB pipeline keeps
    instead of a vocabulary-sized exact histogram: each partition's
    sketch is a fixed (depth x width) counter grid, merge is
    element-wise addition (order-invariant, so the estimate is
    DETERMINISTIC for a given dataset and seed — the booleans are
    stable, not flaky), and the driver collects one sketch, never the
    vocabulary. Spark's built-in ``count_min_sketch`` aggregate does
    the distributed part; the bounded driver-side step just queries
    the returned sketch for the |heavy hitters| candidate items.
    """
    from concurrent.futures import ThreadPoolExecutor

    spark = df.sparkSession
    hh = heavy_hitters(df, col, k=k)
    # One pass: the row total rides the sketch aggregation instead of
    # a dedicated count job (guide §1.2 — 3 input scans -> 2 for this
    # query; both aggregates are map-side combined in the same stage).
    sk_df = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"count_min_sketch({col}, CAST({eps} AS DOUBLE), "
            f"CAST({confidence} AS DOUBLE), {seed})"
        ).alias("sk"),
    )
    # The sketch aggregate and the exact heavy-hitter pipeline are
    # independent actions over the same input; submitting them from
    # two driver threads lets the scheduler back-fill the tail of one
    # job with the other's tasks (guide §2.6) — wall time ~max instead
    # of sum of the two scans. Results are unchanged: both jobs are
    # deterministic and share nothing but the immutable input.
    with ThreadPoolExecutor(max_workers=2) as pool:
        sk_fut = pool.submit(sk_df.first)
        hh_fut = pool.submit(hh.collect)
        sk_row = sk_fut.result()
        hh_rows = hh_fut.result()
    n_total = sk_row["n"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk_row["sk"]))
    )
    slack = int(eps * n_total) + 1
    rows = []
    for r in hh_rows:
        est = int(cms.estimateCount(r["item"]))
        rows.append(
            (
                r["item"],
                int(r["cnt"]),
                est >= r["cnt"],
                est <= r["cnt"] + slack,
            )
        )
    return spark.createDataFrame(
        rows,
        "item string, cnt long, cms_lower_ok boolean, cms_upper_ok boolean",
    )
