"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, processed by Arrow-batched python stages
(north-star extension; no reference analog).

The container has no codec libraries, so the actual decode is a
DETERMINISTIC FAKE (md5-derived header fields) clearly marked below;
pass ``use_real_codec=True`` to hit the NotImplementedError wall where
PIL/librosa/ffmpeg would plug in. Everything around the stub is real
and scale-true:

- payloads live in a `binary` column — never stringified, never
  collected to the driver;
- decode / feature-extract / frame-sample run via ``mapInPandas`` so
  payload batches stream through Arrow in bounded memory (no
  collect_list, no per-row Python UDF calls);
- frame sampling explodes one row per sampled frame with the frame
  bytes sliced from the payload — downstream operators see frames as
  ordinary binary rows, partitioned by whatever key the caller set;
- each stage's output schema is a typed StructType, so the Catalyst
  plan stays fully typed after the Python stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap documents.text bytes as fake media
    payloads (doc_id, media_type, payload binary, meta struct)."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("fake/raw").alias("declared_format"),
        ).alias("meta"),
    )


def _fake_header(payload: bytes) -> tuple[str, int, int, int, float]:
    """The deterministic FAKE decode: header fields derived from the
    payload's md5 so any engine (or SQL oracle) can reproduce them.
    A real codec would parse actual container headers here."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + ord(h[0]) % 64
    height = 16 + ord(h[1]) % 64
    n_channels = 1 + ord(h[2]) % 3
    mean_intensity = (ord(h[3]) * 256 + ord(h[4])) / 65535.0
    return h, width, height, n_channels, mean_intensity


def decode_media(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """payload → decoded header fields, streamed through Arrow batches.

    Output: doc_id, media_type, width, height, n_channels,
    mean_intensity, content_md5.
    """
    if use_real_codec:
        raise NotImplementedError(
            "real codecs (PIL/libsndfile/ffmpeg) are not available in "
            "this container; the deterministic fake decode is the "
            "supported path"
        )

    schema = (
        "doc_id long, media_type string, width int, height int, "
        "n_channels int, mean_intensity double, content_md5 string"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "n_channels": [r[3] for r in rows],
                    "mean_intensity": [r[4] for r in rows],
                    "content_md5": [r[0] for r in rows],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(decode, schema)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """payload → fixed-dim float feature vector (deterministic fake:
    md5 digest byte pairs / 255). Real models would run batched
    inference in this exact stage shape (Arrow in, Arrow out)."""
    assert dim <= 16
    schema = "doc_id long, features array<double>"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                digest = hashlib.md5(bytes(p)).digest()
                out.append([digest[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": out})

    return media.select("doc_id", "payload").mapInPandas(feats, schema)


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, every_n: int = 2
) -> DataFrame:
    """video payload → one row per sampled frame (every_n-th slice of
    frame_bytes), frame payload kept as binary.

    JVM-side (no Python): substring slicing + posexplode, so frame
    explosion is pure codegen and the payload bytes never cross into
    Python at all.
    """
    vids = media.filter(F.col("media_type") == "video")
    n_frames = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        vids.select("doc_id", "payload", F.explode(idx).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.substring(
                F.col("payload"), F.col("frame_idx") * frame_bytes + 1, frame_bytes
            ).alias("frame_payload"),
        )
        .filter(F.length("frame_payload") > 0)
    )


def resize_media(
    media: DataFrame, scale: int = 2, use_real_codec: bool = False
) -> DataFrame:
    """image payload → downsampled thumbnail payload + scaled header
    dims (the resize/thumbnail stage of an image pipeline).

    The pixel resample is the same DETERMINISTIC FAKE contract as
    `decode_media`: a real codec would decode → bilinear-resample →
    re-encode; here the "pixels" are the raw payload bytes and the
    1/scale thumbnail keeps every scale-th byte (payload[::scale]),
    with header dims ceil-divided — reproducible by any engine, so the
    SQL oracle can pin it. The Spark plumbing is the real thing:
    binary in/binary out through Arrow batches, output stays a typed
    binary column partitioned like its input, never driver-side.
    """
    if use_real_codec:
        raise NotImplementedError(
            "real codecs (PIL/libvips) are not available in this "
            "container; the deterministic fake resample is the "
            "supported path"
        )
    assert scale >= 1
    schema = (
        "doc_id long, width int, height int, thumb_width int, "
        "thumb_height int, thumb_bytes long, thumb_md5 string"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            widths, heights, tw, th, tb, tmd5 = [], [], [], [], [], []
            for p in pdf["payload"]:
                raw = bytes(p)
                _h, w, h, _c, _m = _fake_header(raw)
                thumb = raw[::scale]
                widths.append(w)
                heights.append(h)
                tw.append(-(-w // scale))
                th.append(-(-h // scale))
                tb.append(len(thumb))
                tmd5.append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths,
                    "height": heights,
                    "thumb_width": tw,
                    "thumb_height": th,
                    "thumb_bytes": tb,
                    "thumb_md5": tmd5,
                }
            )

    imgs = media.filter(F.col("media_type") == "image")
    return imgs.select("doc_id", "payload").mapInPandas(resize, schema)
