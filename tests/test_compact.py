"""compact_parquet: many small files → few target-sized files, same
rows."""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parquet_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_compact_small_files(spark):
    from gnip_trend_detection_spark.sources.compact import compact_parquet

    path = tempfile.mkdtemp(prefix="compact_") + "/t"
    # 64 tiny files
    spark.range(10000).selectExpr(
        "id", "id % 7 as k", "cast(id as double) as v"
    ).repartition(64).write.parquet(path)
    assert len(_parquet_files(path)) == 64
    before = {r["id"] for r in spark.read.parquet(path).collect()}

    compact_parquet(spark, path, target_file_mb=128, sort_cols=("k", "id"))

    files_after = _parquet_files(path)
    assert len(files_after) <= 4, files_after  # tiny table -> ~1 file
    after = {r["id"] for r in spark.read.parquet(path).collect()}
    assert after == before
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
