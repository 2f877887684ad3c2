"""Token-budget shard packing for training-data writes.

Pretraining jobs consume data as fixed-size shards; the packing step
assigns every document a (lane, shard_idx) so that each shard holds
~``token_budget`` tokens. A single global running sum would serialize
the whole corpus through one partition, so packing is LANE-PARALLEL:
documents are spread across ``n_lanes`` by key hash (deterministic,
the sampler's md5 trick), and the running sum is per-lane — n_lanes
independent window partitions that scale with the cluster. A shard may
overshoot the budget by at most one document (docs are never split).

The assignment is a pure function of (key, weight) — reproducible
across partitionings and retries, like everything in extras/sample.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lane_of(key, n_lanes: int, seed: int = 42):
    """Deterministic lane in [0, n_lanes): md5-prefix of the key."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(key.cast("string"), F.lit(f":lane{seed}")).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(n_lanes)


def pack_shards(
    df: DataFrame,
    weight_col: str,
    token_budget: int,
    n_lanes: int = 8,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Assign (lane, shard_idx) per row: shard_idx = floor(running
    weight BEFORE this row / budget) within the row's lane, rows
    ordered by key. Appends both columns; one narrow shuffle on lane."""
    lane = lane_of(F.col(key_col), n_lanes, seed)
    out = df.withColumn("lane", lane)
    w = (
        Window.partitionBy("lane")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(weight_col).over(w), F.lit(0)).cast("double")
    return out.withColumn(
        "shard_idx", F.floor(cum_before / token_budget).cast("long")
    )
