"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, processed by Arrow-batched python stages
(north-star extension; no reference analog).

Two decode paths:

- default: a DETERMINISTIC FAKE (md5-derived header fields) clearly
  marked below — the stand-in for codecs (JPEG/PNG/MP4) whose
  libraries (PIL/ffmpeg) this container lacks;
- ``use_real_codec=True``: a REAL dependency-free byte-level decoder
  for two trivial containers — BMP (BITMAPINFOHEADER, 8/24/32 bpp
  uncompressed) and WAV (RIFF PCM, 8/16-bit) — parsing actual headers
  and computing intensity stats from the actual pixel/sample bytes.
  `synthesize_media` builds real BMP/WAV payloads deterministically
  from doc_id, so a SQL oracle can pin the decode by recomputing the
  fields arithmetically — matching proves the encode→parse
  round-trip, not just the plumbing.

Everything around the decode kernel is real and scale-true either
way:

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


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bpp bottom-up BMP (BITMAPINFOHEADER): ``pixels`` is
    width*height*3 raw bytes, rows padded to 4-byte multiples per the
    spec. Pure struct packing — no imaging library."""
    import struct

    row_raw = width * 3
    row_size = (row_raw + 3) // 4 * 4
    pad = b"\x00" * (row_size - row_raw)
    body = b"".join(
        pixels[r * row_raw : (r + 1) * row_raw] + pad
        for r in range(height - 1, -1, -1)  # bottom-up row order
    )
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body


def parse_bmp(payload: bytes) -> tuple[int, int, int, float] | None:
    """Real BMP header parse + pixel-byte mean. Returns (width, height,
    n_channels, mean_intensity over the UNpadded pixel bytes / 255) or
    None when not an uncompressed 8/24/32-bpp BITMAPINFOHEADER BMP."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size < 40:
        return None
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (8, 24, 32) or width <= 0:
        return None
    height = abs(height_raw)
    n_channels = bpp // 8
    row_raw = width * n_channels
    row_size = (row_raw + 3) // 4 * 4
    total = 0
    n = 0
    for r in range(height):
        row = payload[pixel_offset + r * row_size :][:row_raw]
        if len(row) < row_raw:
            return None
        total += sum(row)
        n += row_raw
    mean = (total / n / 255.0) if n else 0.0
    return width, height, n_channels, mean


def encode_wav(
    sample_rate: int, n_channels: int, samples: list[int]
) -> bytes:
    """Minimal RIFF/WAVE PCM 16-bit container from int16 samples
    (interleaved when n_channels > 1)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        n_channels * 2, 16,
    )
    chunks = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def parse_wav(payload: bytes) -> tuple[int, int, int, float] | None:
    """Real RIFF chunk walk for PCM WAV. Returns (sample_rate,
    n_frames, n_channels, mean |amplitude| normalized to full scale)
    or None for non-PCM / non-8/16-bit / malformed payloads."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 1 or bits not in (8, 16) or n_channels < 1:
        return None
    if bits == 16:
        n_samp = len(data) // 2
        vals = struct.unpack(f"<{n_samp}h", data[: n_samp * 2])
        mean = sum(abs(v) for v in vals) / n_samp / 32768.0 if n_samp else 0.0
    else:
        n_samp = len(data)
        mean = (
            sum(abs(b - 128) for b in data) / n_samp / 128.0 if n_samp else 0.0
        )
    n_frames = n_samp // n_channels
    return sample_rate, n_frames, n_channels, mean


def _real_header(payload: bytes) -> tuple[str, int, int, int, float] | None:
    """Dispatch on container magic. Field mapping: for images,
    (width, height); for audio, width=sample_rate, height=n_frames —
    documented schema overloading so both share one typed row."""
    h = hashlib.md5(payload).hexdigest()
    parsed = parse_bmp(payload) or parse_wav(payload)
    if parsed is None:
        return None
    a, b, c, m = parsed
    return h, a, b, c, m


def decode_media(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """payload → decoded header fields, streamed through Arrow batches.

    Output: doc_id, media_type, width, height, n_channels,
    mean_intensity, content_md5. With ``use_real_codec=True`` the
    fields come from actual BMP/WAV container parsing (see parse_bmp /
    parse_wav; unparseable payloads yield nulls); the default is the
    deterministic fake for formats whose codecs this container lacks.
    """
    schema = (
        "doc_id long, media_type string, width int, height int, "
        "n_channels int, mean_intensity double, content_md5 string"
    )
    header = _real_header if use_real_codec else _fake_header

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [r[1] if r else None for r in rows],
                    "height": [r[2] if r else None for r in rows],
                    "n_channels": [r[3] if r else None for r in rows],
                    "mean_intensity": [r[4] if r else None for r in rows],
                    "content_md5": [
                        r[0] if r else hashlib.md5(bytes(p)).hexdigest()
                        for r, p in zip(rows, pdf["payload"])
                    ],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(decode, schema)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build REAL container payloads deterministically from doc_id:
    even ids → 24-bpp BMP (width 4+id%13, height 3+id%7, pixel byte i
    = (id*31 + i*7) mod 256), odd ids → 16-bit mono/stereo PCM WAV
    (rate 8000, channels 1+(id//2)%2, frames 64+id%32, sample i =
    ((id*17 + i*13) mod 65536) - 32768). Every field is a pure
    function of doc_id, so a SQL oracle can recompute the decoded
    header + intensity stats without touching bytes — equality proves
    the encoder and parser round-trip real containers."""
    schema = "doc_id long, media_type string, payload binary"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 2 == 0:
                    w, hgt = 4 + i % 13, 3 + i % 7
                    n = w * hgt * 3
                    px = bytes((i * 31 + j * 7) % 256 for j in range(n))
                    payloads.append(encode_bmp(w, hgt, px))
                    types.append("image")
                else:
                    ch = 1 + (i // 2) % 2
                    frames = 64 + i % 32
                    samples = [
                        ((i * 17 + j * 13) % 65536) - 32768
                        for j in range(frames * ch)
                    ]
                    payloads.append(encode_wav(8000, ch, samples))
                    types.append("audio")
                ids.append(i)
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": types, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(synth, schema)


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


def _bmp_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """24-bpp uncompressed BMP → (width, height, top-down row-major
    pixel bytes). The pixel-extraction twin of `parse_bmp` (which only
    aggregates); shares its validation rules, restricted to the 24-bpp
    layout `encode_bmp` writes."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp != 24 or width <= 0 or height_raw == 0:
        return None
    height = abs(height_raw)
    row_raw = width * 3
    row_size = (row_raw + 3) // 4 * 4
    rows = []
    # stored bottom-up when height_raw > 0: image row r lives at
    # stored row (height - 1 - r)
    order = range(height - 1, -1, -1) if height_raw > 0 else range(height)
    for r in order:
        row = payload[pixel_offset + r * row_size :][:row_raw]
        if len(row) < row_raw:
            return None
        rows.append(row)
    return width, height, b"".join(rows)


def _resize_real(raw: bytes, scale: int):
    """Real nearest-neighbor resize dispatch: BMP pixel decimation or
    WAV frame decimation, re-encoded through the same encoders the
    fixtures use, then re-PARSED for the thumb intensity stat — a
    green oracle row pins decode → resample → encode → decode.

    Returns (media_type, width, height, thumb_width, thumb_height,
    thumb_payload, thumb_mean) or None when the container is not one
    the dependency-free codecs handle (non-24bpp BMP, non-16-bit PCM
    WAV, anything else). Audio reuses decode_media's documented field
    overloading: width = sample_rate, height = n_frames.
    """
    import struct

    bmp = _bmp_pixels(raw)
    if bmp is not None:
        w, h, px = bmp
        kept_cols = range(0, w, scale)
        w2, h2 = len(range(0, w, scale)), len(range(0, h, scale))
        out = bytearray()
        for r in range(0, h, scale):
            base = r * w * 3
            for c in kept_cols:
                out += px[base + c * 3 : base + c * 3 + 3]
        thumb = encode_bmp(w2, h2, bytes(out))
        parsed = parse_bmp(thumb)
        if parsed is None:  # encoder/parser disagree — never expected
            return None
        return ("image", w, h, w2, h2, thumb, parsed[3])

    if len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(raw):
            cid, size = struct.unpack_from("<4sI", raw, pos)
            body = raw[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
        (bits,) = struct.unpack_from("<H", fmt, 14)
        if audio_fmt != 1 or bits != 16 or n_channels < 1:
            return None
        n_samp = len(data) // 2
        vals = struct.unpack(f"<{n_samp}h", data[: n_samp * 2])
        n_frames = n_samp // n_channels
        kept = [
            vals[f * n_channels + ch]
            for f in range(0, n_frames, scale)
            for ch in range(n_channels)
        ]
        thumb = encode_wav(sample_rate, n_channels, kept)
        parsed = parse_wav(thumb)
        if parsed is None:
            return None
        return (
            "audio",
            sample_rate,
            n_frames,
            sample_rate,
            len(range(0, n_frames, scale)),
            thumb,
            parsed[3],
        )
    return None


def resize_media(
    media: DataFrame, scale: int = 2, use_real_codec: bool = False
) -> DataFrame:
    """image payload → downsampled thumbnail payload + scaled header
    dims (the resize/thumbnail stage of an image pipeline).

    Default path: the same DETERMINISTIC FAKE contract as
    `decode_media` — the "pixels" are the raw payload bytes and the
    1/scale thumbnail keeps every scale-th byte (payload[::scale]),
    with header dims ceil-divided — reproducible by any engine, so the
    SQL oracle can pin it.

    ``use_real_codec=True``: REAL pixel-level nearest-neighbor
    decimation for 24-bpp BMP (keep every scale-th row and column,
    re-encode via `encode_bmp`) and frame decimation for 16-bit PCM
    WAV (keep every scale-th frame across channels, re-encode via
    `encode_wav`); the thumb's intensity stat comes from RE-PARSING
    the re-encoded container, so oracle equality pins the full
    decode → resample → encode → decode loop. Processes image AND
    audio rows (same field overloading as decode_media); unparseable
    payloads yield null fields. Adds ``media_type`` and
    ``thumb_mean_intensity`` columns.

    Either way the Spark plumbing is identical and scale-true: binary
    in/binary out through Arrow batches, output stays typed and
    partitioned like its input, never driver-side.
    """
    assert scale >= 1
    if use_real_codec:
        schema = (
            "doc_id long, media_type string, width int, height int, "
            "thumb_width int, thumb_height int, thumb_bytes long, "
            "thumb_md5 string, thumb_mean_intensity double"
        )

        def resize_rc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                rows = [_resize_real(bytes(p), scale) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": [r[0] if r else None for r in rows],
                        "width": [r[1] if r else None for r in rows],
                        "height": [r[2] if r else None for r in rows],
                        "thumb_width": [r[3] if r else None for r in rows],
                        "thumb_height": [r[4] if r else None for r in rows],
                        "thumb_bytes": [r and len(r[5]) for r in rows],
                        "thumb_md5": [
                            hashlib.md5(r[5]).hexdigest() if r else None
                            for r in rows
                        ],
                        "thumb_mean_intensity": [r[6] if r else None for r in rows],
                    }
                )

        return media.select("doc_id", "payload").mapInPandas(resize_rc, schema)
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
