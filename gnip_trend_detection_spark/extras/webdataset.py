"""WebDataset-style tar shard sink/source for multimodal training data.

WebDataset (a public convention: each training sample is a group of
consecutive files in a plain POSIX tar sharing a key prefix —
``{key}.{ext}`` for the payload plus ``{key}.json`` for metadata, and
the dataset is a directory of numbered ``shard-NNNNNN.tar`` files) is
how large multimodal corpora are actually fed to trainers: loaders
stream whole tars sequentially, so a 100 TB corpus is read as big
sequential object-store GETs with zero per-sample round trips.

Spark mapping, scale-first:

- **Shard assignment is a pure function of the sample key** (the
  md5-lane trick from extras/shards.py): reproducible under any input
  partitioning, task retry, or cluster size — the same property every
  sampler in this repo guarantees.
- **One keyed exchange total**: ``groupBy(shard).applyInPandas`` builds
  each tar in the task that owns its samples. A shard is bounded by
  corpus_size / n_shards by construction (size n_shards for the
  target shard weight, e.g. ~1 GB at 100 TB → ~100k shards), so the
  per-task memory is a design constant, not data-proportional.
- **Bit-reproducible shards**: members are sorted by key, tarinfo
  mtime/uid/gid are zeroed, metadata JSON has sorted keys — two runs
  over the same rows produce byte-identical tars (asserted in
  tests/test_webdataset.py), which makes shard-level checksum dedup
  and cache validation possible downstream.
- ``read_webdataset`` is the verification twin (binaryFile scan of the
  tars → one row per sample); a loader would stream the same bytes.

The writer emits a MANIFEST DataFrame (shard, n_samples, n_bytes,
sha256) — the bounded relation a catalog ingests; payload bytes never
reach the driver.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras.shards import lane_of

_EXT_BY_TYPE = {"image": "bmp", "audio": "wav"}

MANIFEST_SCHEMA = (
    "shard long, n_samples long, n_bytes long, sha256 string, path string"
)


def _sample_ext(media_type: str) -> str:
    return _EXT_BY_TYPE.get(media_type, "bin")


def write_webdataset(
    media: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """(key, media_type, payload, *meta) → ``shard-NNNNNN.tar`` files
    under ``out_dir`` + a manifest DataFrame (one bounded row per
    shard). Every other column rides along as ``{key}.json`` metadata.

    Meta columns must be JSON-serializable scalars (the writer fails
    loudly otherwise — silent repr-coercion would poison the corpus).
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = [
        c for c in media.columns if c not in (key_col, payload_col, type_col)
    ]
    assigned = media.withColumn(
        "shard", lane_of(F.col(key_col), n_shards, seed=7)
    )

    def build_tar(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(key_col)  # member order = key order
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                key = f"{int(row[key_col]):09d}"
                meta = {c: row[c] for c in meta_cols}
                meta[type_col] = row[type_col]
                payload = bytes(row[payload_col])
                for name, data in (
                    (f"{key}.{_sample_ext(row[type_col])}", payload),
                    (
                        f"{key}.json",
                        json.dumps(
                            meta, sort_keys=True, default=_reject_nonscalar
                        ).encode(),
                    ),
                ):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0  # bit-reproducibility
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        blob = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
                "path": [path],
            }
        )

    return assigned.groupBy("shard").applyInPandas(build_tar, MANIFEST_SCHEMA)


def _reject_nonscalar(obj):
    # numpy scalars are fine; anything else is a schema bug
    if hasattr(obj, "item"):
        return obj.item()
    raise TypeError(
        f"webdataset metadata value {obj!r} is not JSON-serializable; "
        "cast meta columns to scalars before writing"
    )


def read_webdataset(spark, out_dir: str) -> DataFrame:
    """Verification twin: scan ``out_dir``'s tars (binaryFile — one
    whole-shard row per file, the same sequential read a loader does)
    and explode to one row per sample: (shard, key, media_type,
    payload, meta_json)."""
    tars = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "shard-*.tar")
    )
    schema = (
        "shard long, key long, media_type string, payload binary, "
        "meta_json string"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("shard", "key", "media_type", "payload", "meta_json")}
            for path, blob in zip(pdf["path"], pdf["content"]):
                shard = int(os.path.basename(path)[6:12])
                samples: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        samples.setdefault(key, {})[ext] = tar.extractfile(
                            m
                        ).read()
                for key, parts in sorted(samples.items()):
                    meta_raw = parts.pop("json")
                    meta = json.loads(meta_raw)
                    (ext, payload), = parts.items()
                    out["shard"].append(shard)
                    out["key"].append(int(key))
                    out["media_type"].append(meta["media_type"])
                    out["payload"].append(payload)
                    out["meta_json"].append(meta_raw.decode())
            yield pd.DataFrame(out)

    return tars.select("path", "content").mapInPandas(parse, schema)
