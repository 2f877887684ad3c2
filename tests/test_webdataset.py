"""WebDataset tar shard sink: round-trip, determinism, and
partitioning-invariance (extras/webdataset.py)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnip_trend_detection_spark.extras.multimodal import synthesize_media
from gnip_trend_detection_spark.extras.webdataset import (
    read_webdataset,
    write_webdataset,
)
from gnip_trend_detection_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _media(spark, extra_meta=True):
    docs = load_table(spark, SF, "documents").select("doc_id").limit(120)
    m = synthesize_media(docs)
    if extra_meta:
        from pyspark.sql import functions as F

        m = m.withColumn("lang", F.lit("en")).withColumn(
            "quality", (F.col("doc_id") % 7).cast("double") / 7.0
        )
    return m


def test_webdataset_round_trip(spark, tmp_path):
    out = str(tmp_path / "wds")
    media = _media(spark)
    manifest = write_webdataset(media, out, n_shards=4).collect()
    assert sum(r["n_samples"] for r in manifest) == 120
    assert len(manifest) <= 4 and len(glob.glob(f"{out}/shard-*.tar")) == len(
        manifest
    )

    back = read_webdataset(spark, out)
    orig = {
        r["doc_id"]: r for r in media.collect()
    }
    got = back.collect()
    assert len(got) == 120
    for r in got:
        o = orig[r["key"]]
        assert bytes(r["payload"]) == bytes(o["payload"])  # exact bytes
        assert r["media_type"] == o["media_type"]
        import json

        meta = json.loads(r["meta_json"])
        assert meta["lang"] == "en"
        assert abs(meta["quality"] - o["quality"]) < 1e-12


def test_webdataset_shards_bit_reproducible(spark, tmp_path):
    """Two writes of the same rows — under DIFFERENT input
    partitionings — must produce byte-identical shard files (sorted
    members, zeroed tarinfo, key-pure shard assignment)."""
    media = _media(spark)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    man_a = {r["shard"]: r["sha256"] for r in write_webdataset(media, a).collect()}
    man_b = {
        r["shard"]: r["sha256"]
        for r in write_webdataset(media.repartition(13), b).collect()
    }
    assert man_a == man_b
    for shard, sha in man_a.items():
        fa = open(f"{a}/shard-{shard:06d}.tar", "rb").read()
        fb = open(f"{b}/shard-{shard:06d}.tar", "rb").read()
        assert fa == fb


def test_webdataset_rejects_nonscalar_meta(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    media = _media(spark, extra_meta=False).withColumn(
        "bad", F.array(F.lit(1), F.lit(2))
    )
    with pytest.raises(Exception, match="JSON|serializ|array"):
        write_webdataset(media, str(tmp_path / "bad")).collect()
