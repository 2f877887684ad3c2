"""The query-cache lifecycle contract (session.release_cached): the
four round-6 persist sites flagged by ADVICE r06 (bm25's per-doc tf,
quality_percentile_gate's scores, fuzzy decontam's signature
relations, MAD's rebinned counts) plus the checkpoint-heavy paths
(dedup_clusters, quality_blend) all pin storage past their action by
design — and one release_cached() sweep must free every block, both
CacheManager entries and localCheckpoint RDDs."""

from __future__ import annotations

import pytest

from gnip_trend_detection_spark.session import release_cached

SF = "/root/testdata/sf0.001"

QUERIES = [
    "bm25_search",
    "quality_percentile_gate",
    "decontaminate_fuzzy",
    "mad_outliers",
    "dedup_clusters",
    "quality_blend",
]


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", QUERIES)
def test_release_cached_frees_all_blocks(spark, name):
    from gnip_trend_detection_spark import queries as q

    release_cached(spark)  # start clean regardless of test order
    q.ALL[name](spark, SF).write.format("noop").mode("overwrite").save()
    release_cached(spark)
    assert _cache_manager_empty(spark), f"{name}: cached relations survive"
    assert _n_persistent_rdds(spark) == 0, (
        f"{name}: localCheckpoint RDD blocks survive release_cached"
    )
