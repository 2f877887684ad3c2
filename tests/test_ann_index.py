"""Persisted IVF index: probe results must equal the in-memory plan,
and the probe scan must prune non-probed cells at the partition level.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_probe_matches_inmemory_ivf_and_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.ann_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from gnip_trend_detection_spark.extras.similarity import ivf_topk
    from gnip_trend_detection_spark.sources.tables import load_table

    embs = load_table(spark, SF, "embeddings")
    queries = embs.filter(F.col("vec_id") < 3)
    idx = str(tmp_path / "ivf")
    build_ivf_index(embs, idx, centroid_mod=50)

    got = probe_ivf_index(spark, idx, queries, k=5, nprobe=2)
    want = ivf_topk(embs, queries, k=5, centroid_mod=50, nprobe=2)
    grows = sorted(
        ((r["query_id"], r["rk"], r["neighbor_id"], r["cosine"]) for r in got.collect())
    )
    wrows = sorted(
        ((r["query_id"], r["rk"], r["neighbor_id"], r["cosine"]) for r in want.collect())
    )
    assert grows == wrows and grows

    # partition pruning: the cells scan carries PartitionFilters on
    # centroid_id and reads fewer files than exist
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # probed cells are bounded by |queries| x nprobe and must be a
    # strict subset of the cells on disk — the IN-filter prunes the rest
    from gnip_trend_detection_spark.extras.similarity import (
        _normed,
        centroid_probes,
    )

    cents = spark.read.parquet(f"{idx}/centroids.parquet")
    n_probed = (
        centroid_probes(_normed(queries), cents, 2)
        .select("centroid_id")
        .distinct()
        .count()
    )
    n_cells = len(
        [d for d in os.listdir(f"{idx}/cells") if d.startswith("centroid_id=")]
    )
    assert 0 < n_probed < n_cells
