"""Parquet layout audit (sources/stats.py): footer numbers match the
data, and the compaction candidate report sizes the rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnip_trend_detection_spark.sources.stats import (
    compaction_candidates,
    parquet_layout,
)


def test_parquet_layout_matches_data(spark, tmp_path):
    out = str(tmp_path / "t")
    spark.range(0, 1000).withColumn("v", F.col("id") * 2).repartition(
        4
    ).write.parquet(out)
    layout = parquet_layout(spark, out).collect()
    assert len(layout) == 4
    assert sum(r["n_rows"] for r in layout) == 1000
    for r in layout:
        assert r["n_columns"] == 2
        assert r["n_row_groups"] >= 1
        assert r["file_bytes"] > 0
        assert r["min_rg_rows"] <= r["max_rg_rows"] <= r["n_rows"]


def test_compaction_candidates_counts_small_files(spark, tmp_path):
    out = str(tmp_path / "t2")
    spark.range(0, 100).repartition(5).write.parquet(out)
    rep = compaction_candidates(spark, out, target_bytes=10 * 1024 * 1024).first()
    # every tiny file is a candidate; they all fit one target file
    assert rep["n_small_files"] == 5
    assert rep["projected_files"] == 1

    rep2 = compaction_candidates(
        spark, out, target_bytes=2 * 2  # absurdly small target
    ).first()
    assert rep2["n_small_files"] == 0
    # projection sizes the FULL rewrite (compact_parquet rewrites the
    # whole table): ceil(total_bytes / target), not small-bytes based
    import math

    total = sum(r["file_bytes"] for r in parquet_layout(spark, out).collect())
    assert rep2["projected_files"] == max(1, math.ceil(total / 4))
