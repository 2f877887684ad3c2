"""Persisted IVF index: build once, probe many.

`similarity.ivf_topk` recomputes cell assignment per query batch —
right for one-shot analytics, wrong for a serving corpus probed daily.
This module materializes the index: vectors are written Hive-
partitioned BY CENTROID CELL (`centroid_id=N/` directories), so a
probe's `centroid_id IN (...)` filter prunes at the FILE INDEX level —
the nprobe/n_cells I/O fraction stops being a plan property and
becomes a storage property: non-probed cells are never opened,
scheduled, or decoded (same contract as sources/partitioned.py,
asserted from PartitionFilters in the test).

Layout:
  <path>/centroids.parquet        (centroid_id, cv, cnrm) — k rows
  <path>/cells/centroid_id=N/...  (vec_id, v, nrm) per cell

Build cost: one corpus pass (shuffle-free centroid_probes matmul) +
one partitioned write clustered on cell. Probe cost: queries assign
against the k-row centroid table, then scan ONLY their probed
directories. Scoring/ranking reuses the same rounded-cosine +
min-id tie-break discipline as ivf_topk, so a probe of the persisted
index returns exactly what the in-memory plan returns (pinned in
tests/test_ann_index.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras.similarity import (
    _normed,
    centroid_probes,
    dot,
    norm,
)


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroid_mod: int = 50,
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the IVF layout. Default centroids are the
    deterministic mod-subset (oracle-reproducible); pass a fitted
    (centroid_id, cv) set from kmeans_centroids for production."""
    n = _normed(embeddings)
    if centroids is None:
        cents = _normed(
            embeddings.filter(F.col("vec_id") % centroid_mod == 0)
        ).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    else:
        cents = centroids.select(
            "centroid_id", "cv", norm(F.col("cv")).alias("cnrm")
        )
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    assigned = centroid_probes(n, cents, 1)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/cells"
    )


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k per query against the persisted index. The probed cell
    ids become an IN-filter on the partition column — directory
    pruning, not row filtering."""
    cents = spark.read.parquet(f"{path}/centroids.parquet")
    probes = centroid_probes(_normed(queries), cents, nprobe).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "centroid_id",
    )
    # bounded collect: nprobe * |queries| cell ids, deduped — the probe
    # set IS the partition filter (a join would read every cell first)
    cell_ids = [
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    ]
    cells = spark.read.parquet(f"{path}/cells").filter(
        F.col("centroid_id").isin(cell_ids)
    )
    cand = probes.join(
        cells.select(
            "centroid_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("nv"),
            F.col("nrm").alias("nnrm"),
        ),
        "centroid_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qnrm") * F.col("nnrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(cos, round_digits).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
