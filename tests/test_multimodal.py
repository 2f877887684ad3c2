"""Multimodal plumbing: schema, batching, frame slicing, codec gate."""

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from gnip_trend_detection_spark.extras import multimodal
    from gnip_trend_detection_spark.sources.tables import load_table

    return multimodal.media_from_documents(load_table(spark, SF, "documents")).cache()


def test_real_codec_bmp_roundtrip():
    from gnip_trend_detection_spark.extras import multimodal as mm

    px = bytes(range(4 * 3 * 3))  # 4x3, 24bpp
    payload = mm.encode_bmp(4, 3, px)
    parsed = mm.parse_bmp(payload)
    assert parsed is not None
    w, h, ch, mean = parsed
    assert (w, h, ch) == (4, 3, 3)
    assert abs(mean - (sum(px) / len(px) / 255.0)) == 0.0


def test_real_codec_wav_roundtrip():
    from gnip_trend_detection_spark.extras import multimodal as mm

    samples = [0, 100, -100, 32767, -32768, 5, -5, 1000] * 4
    payload = mm.encode_wav(8000, 2, samples)
    parsed = mm.parse_wav(payload)
    assert parsed is not None
    rate, frames, ch, mean = parsed
    assert (rate, frames, ch) == (8000, len(samples) // 2, 2)
    expect = sum(abs(s) for s in samples) / len(samples) / 32768.0
    assert mean == expect


def test_real_codec_rejects_garbage_and_unsupported():
    from gnip_trend_detection_spark.extras import multimodal as mm

    assert mm.parse_bmp(b"not a bmp at all, nope, still not") is None
    assert mm.parse_wav(b"RIFFxxxxNOPE") is None
    assert mm.parse_bmp(b"BM" + b"\x00" * 20) is None  # truncated header
    # compressed BMP (BI_RLE8 = 1) refused
    good = mm.encode_bmp(2, 2, bytes(12))
    bad = bytearray(good)
    bad[30] = 1
    assert mm.parse_bmp(bytes(bad)) is None


def test_real_codec_decode_on_synthesized(spark):
    """End-to-end: synthesize real containers from doc ids, decode
    with use_real_codec=True, check a couple of rows by hand."""
    from gnip_trend_detection_spark.extras import multimodal as mm
    from gnip_trend_detection_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").limit(20)
    out = mm.decode_media(mm.synthesize_media(docs), use_real_codec=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows, "no rows decoded"
    for i, r in rows.items():
        assert r["width"] is not None, i  # every synth payload parses
        if i % 2 == 0:
            assert r["media_type"] == "image"
            assert r["width"] == 4 + i % 13
            assert r["height"] == 3 + i % 7
            assert r["n_channels"] == 3
        else:
            assert r["media_type"] == "audio"
            assert r["width"] == 8000
            assert r["height"] == 64 + i % 32
            assert r["n_channels"] == 1 + (i // 2) % 2
        assert 0.0 <= r["mean_intensity"] <= 1.0


def test_decode_deterministic_and_typed(spark, media):
    from gnip_trend_detection_spark.extras import multimodal

    out = multimodal.decode_media(media)
    assert dict(out.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "width": "int",
        "height": "int",
        "n_channels": "int",
        "mean_intensity": "double",
        "content_md5": "string",
    }
    row = out.orderBy("doc_id").first()
    assert 16 <= row["width"] < 80 and 1 <= row["n_channels"] <= 3
    assert 0.0 <= row["mean_intensity"] <= 1.0


def test_frames_are_payload_slices(spark, media):
    from gnip_trend_detection_spark.extras import multimodal

    frames = multimodal.sample_frames(media, frame_bytes=32, every_n=2)
    sample = frames.orderBy("doc_id", "frame_idx").limit(5).collect()
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter(media["media_type"] == "video").limit(50).collect()
    }
    assert sample, "no video frames produced"
    for r in sample:
        p = payloads[r["doc_id"]]
        start = r["frame_idx"] * 32
        assert bytes(r["frame_payload"]) == p[start : start + 32]
        assert r["frame_idx"] % 2 == 0


def test_features_match_local_md5(spark, media):
    from gnip_trend_detection_spark.extras import multimodal

    feats = {
        r["doc_id"]: r["features"]
        for r in multimodal.extract_features(media, dim=8).limit(20).collect()
    }
    payloads = {
        r["doc_id"]: bytes(r["payload"]) for r in media.limit(200).collect()
    }
    checked = 0
    for doc_id, fv in feats.items():
        if doc_id not in payloads:
            continue
        digest = hashlib.md5(payloads[doc_id]).digest()
        assert fv == pytest.approx([digest[i] / 255.0 for i in range(8)])
        checked += 1
    assert checked > 0


def test_resize_gate_and_thumbnail_bytes(spark, media):
    from gnip_trend_detection_spark.extras import multimodal

    out = {r["doc_id"]: r for r in multimodal.resize_media(media, scale=2).collect()}
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image'").collect()
    }
    assert set(out) == set(payloads)
    for doc_id, r in out.items():
        thumb = payloads[doc_id][::2]
        assert r["thumb_bytes"] == len(thumb)
        assert r["thumb_md5"] == hashlib.md5(thumb).hexdigest()
        assert r["thumb_width"] == -(-r["width"] // 2)
        assert r["thumb_height"] == -(-r["height"] // 2)


def test_resize_real_codec_pixel_level(spark):
    """Real-codec resize, cross-checked against an INDEPENDENT numpy
    resample of the same synthesized pixels: nearest-neighbor keeps
    rows/cols (images) or frames (audio) at even indices; the emitted
    thumb must re-parse to exactly that subset's stats, and the thumb
    payload itself must be a well-formed container."""
    import numpy as np

    from gnip_trend_detection_spark.extras import multimodal

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = multimodal.synthesize_media(docs)
    out = {
        r["doc_id"]: r
        for r in multimodal.resize_media(
            media, scale=2, use_real_codec=True
        ).collect()
    }
    assert set(out) == set(range(40))
    for i, r in out.items():
        if i % 2 == 0:  # BMP
            w, h = 4 + i % 13, 3 + i % 7
            px = np.array(
                [(i * 31 + j * 7) % 256 for j in range(w * h * 3)], dtype=np.int64
            ).reshape(h, w, 3)
            thumb = px[::2, ::2, :]
            assert (r["media_type"], r["width"], r["height"]) == ("image", w, h)
            assert (r["thumb_width"], r["thumb_height"]) == (
                thumb.shape[1],
                thumb.shape[0],
            )
            row_size = (3 * thumb.shape[1] + 3) // 4 * 4
            assert r["thumb_bytes"] == 54 + row_size * thumb.shape[0]
            assert r["thumb_mean_intensity"] == pytest.approx(
                thumb.mean() / 255.0
            )
        else:  # WAV
            ch = 1 + (i // 2) % 2
            frames = 64 + i % 32
            s = np.array(
                [((i * 17 + j * 13) % 65536) - 32768 for j in range(frames * ch)],
                dtype=np.int64,
            ).reshape(frames, ch)
            kept = s[::2, :]
            assert (r["media_type"], r["width"], r["height"]) == (
                "audio",
                8000,
                frames,
            )
            assert (r["thumb_width"], r["thumb_height"]) == (8000, kept.shape[0])
            assert r["thumb_bytes"] == 44 + kept.size * 2
            assert r["thumb_mean_intensity"] == pytest.approx(
                np.abs(kept).mean() / 32768.0
            )

    # unparseable payloads (plain text bytes) yield null fields, not
    # errors — the honest degrade for formats the codecs don't cover
    fake = multimodal.media_from_documents(
        spark.createDataFrame([(1, "not a container")], "doc_id long, text string")
    )
    row = multimodal.resize_media(fake, scale=2, use_real_codec=True).first()
    assert row["media_type"] is None and row["thumb_bytes"] is None
