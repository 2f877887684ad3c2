"""Incremental ingestion manifest (sources/incremental.py): each run
reads exactly the delta, merged results equal a full recompute, and an
uncommitted run reprocesses (at-least-once)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from gnip_trend_detection_spark.sources.incremental import (
    commit_files,
    list_new_files,
    read_incremental,
)


def _write_file(spark, path, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    tmp = path + ".d"
    df.coalesce(1).write.parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp)


def test_incremental_reads_only_delta_and_merges_to_full(spark):
    land = tempfile.mkdtemp(prefix="incr_land_")
    mani = tempfile.mkdtemp(prefix="incr_mani_")
    try:
        _write_file(spark, f"{land}/a.parquet", [("x", 1), ("y", 2)])
        _write_file(spark, f"{land}/b.parquet", [("x", 3)])

        delta1, files1 = read_incremental(spark, land, mani)
        assert len(files1) == 2 and delta1.count() == 3
        agg = {
            r["k"]: r["s"]
            for r in delta1.groupBy("k").agg(F.sum("v").alias("s")).collect()
        }
        assert commit_files(spark, mani, files1) == 1

        # nothing new → no work
        delta_none, files_none = read_incremental(spark, land, mani)
        assert delta_none is None and files_none == []

        _write_file(spark, f"{land}/c.parquet", [("y", 10), ("z", 5)])
        delta2, files2 = read_incremental(spark, land, mani)
        assert [os.path.basename(f) for f in files2] == ["c.parquet"]
        assert commit_files(spark, mani, files2) == 2
        for r in delta2.groupBy("k").agg(F.sum("v").alias("s")).collect():
            agg[r["k"]] = agg.get(r["k"], 0) + r["s"]

        full = {
            r["k"]: r["s"]
            for r in spark.read.parquet(f"{land}/*.parquet")
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
            .collect()
        }
        assert agg == full
    finally:
        shutil.rmtree(land, ignore_errors=True)
        shutil.rmtree(mani, ignore_errors=True)


def test_uncommitted_run_reprocesses(spark):
    land = tempfile.mkdtemp(prefix="incr_land2_")
    mani = tempfile.mkdtemp(prefix="incr_mani2_")
    try:
        _write_file(spark, f"{land}/a.parquet", [("x", 1)])
        _d, files = read_incremental(spark, land, mani)
        assert files  # simulated crash: no commit
        again = list_new_files(spark, land, mani)
        assert again == files  # at-least-once: the delta comes back
    finally:
        shutil.rmtree(land, ignore_errors=True)
        shutil.rmtree(mani, ignore_errors=True)
