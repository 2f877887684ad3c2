"""Z-order clustering: multi-dimensional row-group pruning at scale.

Sorting within partitions on ONE column (sources/partitioned.py) gives
parquet min/max pruning on that column only — a filter on a second
dimension still touches every row group. Z-ordering interleaves the
bits of several dimensions into one sort key, so rows close in the
key are close in EVERY dimension: each row group covers a small
rectangle of the value space, and a conjunctive box filter
(ts BETWEEN .. AND user BETWEEN ..) skips most groups on footer
stats alone. This is the standard lakehouse layout trick (Delta
OPTIMIZE ZORDER BY, Hudi/Iceberg z-order compaction) built from plain
DataFrame expressions.

Mechanics: each dimension is min/max scaled to a ``bits``-bit integer
(global bounds via one tiny aggregate riding a 1-row broadcast — the
same pattern as value_histogram's bounds), then the bits interleave
via shift/mask expressions — pure codegen, no UDF. The write
repartitions BY RANGE on the key (range exchange = contiguous key
blocks per file) and sorts within partitions, which is exactly the
layout row-group stats need.

Min/max scaling is skew-sensitive (one outlier stretches the grid);
at 100 TB swap the bounds aggregate for approx-quantile clamps —
plug-in point documented, same interleave on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z key: bit j of dimension d lands at position
    j * n_dims + d. Inputs must already be integers in [0, 2^bits)."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        for j in range(bits):
            key = key + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)),
                    j * n + d,
                )
            )
    return key


def zorder_key(
    df: DataFrame, dims: tuple[str, ...], bits: int = 12
) -> DataFrame:
    """Attach ``__zkey`` from min/max-scaled dimensions. One tiny
    bounds aggregate (2 values per dim) broadcast back over the scan;
    the interleave itself is shuffle-free codegen."""
    aggs = []
    for d in dims:
        aggs += [
            F.min(F.col(d).cast("double")).alias(f"__min_{d}"),
            F.max(F.col(d).cast("double")).alias(f"__max_{d}"),
        ]
    bounds = df.agg(*aggs)
    top = (1 << bits) - 1
    scaled = []
    for d in dims:
        lo, hi = F.col(f"__min_{d}"), F.col(f"__max_{d}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                F.floor((F.col(d).cast("double") - lo) / span * top + 0.5),
            )
        )
    return df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zkey", interleave_bits(scaled, bits)
    ).drop(*[f"__min_{d}" for d in dims], *[f"__max_{d}" for d in dims])


def write_zordered(
    df: DataFrame,
    path: str,
    dims: tuple[str, ...],
    bits: int = 12,
    n_files: int = 8,
) -> None:
    """Write ``df`` z-clustered on ``dims``: range-partition by the
    z-key (contiguous key blocks per file) + in-file sort, then drop
    the key — the layout, not the key, is the product."""
    keyed = zorder_key(df, dims, bits)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
