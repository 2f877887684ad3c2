"""duplicate_clusters: connected components over near-dup pairs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_duplicate_clusters_components(spark):
    """Chain 1-2-3 (path, needs >1 propagation round), clique 10-11-12,
    isolated pair 20-21 — labels must be the component minima."""
    from gnip_trend_detection_spark.extras.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3),          # path
            (10, 11), (10, 12), (11, 12),  # clique
            (20, 21),                # pair
        ],
        "doc_a long, doc_b long",
    )
    rows = {r["doc_id"]: r for r in duplicate_clusters(pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
    assert rows[3]["cluster_size"] == 3
    assert rows[12]["cluster_size"] == 3
    assert rows[21]["cluster_size"] == 2
    canon = {d for d, r in rows.items() if r["is_canonical"]}
    assert canon == {1, 10, 20}


def test_duplicate_clusters_long_path(spark):
    """A 9-node path exercises multi-round convergence (diameter 8):
    every node must still land on the global min label."""
    from gnip_trend_detection_spark.extras.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    rows = duplicate_clusters(pairs).collect()
    assert len(rows) == 9
    assert all(r["cluster_id"] == 1 for r in rows)
    assert all(r["cluster_size"] == 9 for r in rows)
