"""Tests for the multimodal binary-column plumbing (fake codec mode)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
    multimodal as mm,
)

ROWS = [
    (1, "image", b"img-bytes-aaaa", {}),
    (2, "audio", b"audio-bytes-bb", {}),
    (3, "video", b"video-bytes-cc", {}),
    (4, "video", b"video-bytes-cc", {}),  # same bytes as 3
]


def media(spark):
    return spark.createDataFrame(ROWS, mm.MEDIA_SCHEMA)


def test_decode_fake_deterministic(spark):
    out = {r.media_id: r for r in mm.decode_media(media(spark)).collect()}
    assert set(out) == {1, 2, 3, 4}
    # identical bytes -> identical pseudo-metadata and features
    assert out[3].width == out[4].width
    assert out[3].feature == out[4].feature
    assert out[1].n_bytes == len(b"img-bytes-aaaa")
    assert 64 <= out[1].width < 256 and 64 <= out[1].height < 256
    assert len(out[1].feature) == mm.FEATURE_DIM
    assert all(-1.0 <= f <= 1.0 for f in out[1].feature)


def test_decode_real_mode_detects_codecs(spark):
    """mode="real" works iff every codec was detected; otherwise it names
    the missing dependency at PLAN time (no task failures)."""
    codecs = mm.available_codecs()
    if all(codecs.values()):
        rows = mm.decode_media(media(spark), mode="real").collect()
        assert len(rows) == len(ROWS)
    else:
        with pytest.raises(NotImplementedError, match="PIL|ffmpeg"):
            mm.decode_media(media(spark), mode="real")
    with pytest.raises(ValueError):
        mm.decode_media(media(spark), mode="nope")


def test_decode_auto_uses_whatever_exists(spark):
    """mode="auto" always runs: real per kind where a codec was detected,
    the deterministic stub elsewhere — same schema either way. In this
    container every kind falls back to fake, so auto == fake row-for-row;
    with PIL installed the image row would instead carry true dimensions
    (the branch choice is asserted against detection, not hardcoded)."""
    codecs = mm.available_codecs()
    out = {
        r.media_id: r
        for r in mm.decode_media(media(spark), mode="auto").collect()
    }
    assert set(out) == {1, 2, 3, 4}
    fake = {
        r.media_id: r for r in mm.decode_media(media(spark)).collect()
    }
    for mid, row in out.items():
        kind = row.kind
        if not codecs[kind]:
            assert row == fake[mid]  # stub path: bit-identical to fake
        else:
            assert row.n_bytes == fake[mid].n_bytes  # real path ran


def test_frame_sample_fanout(spark):
    frames = mm.frame_sample(media(spark), every_ms=1000).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append((r.frame_idx, r.ts_ms))
    assert set(by_media) == {3, 4}  # only video rows fan out
    for frames_list in by_media.values():
        idxs = sorted(i for i, _ in frames_list)
        assert idxs == list(range(len(idxs)))  # 0..N contiguous
        assert all(ts == i * 1000 for i, ts in frames_list)


def test_resize_plan_metadata(spark):
    out = mm.resize_plan(media(spark), 224, 224).select("meta").collect()
    assert all(r.meta["resize"] == "224x224" for r in out)


# -- real-codec integration (run only where the codec exists) -----------
# The container this repo is usually tested in has neither PIL nor
# ffprobe, so these skip there; in an environment WITH the codecs they
# pin the real path to the stub contract — same schema, true metadata.
# The media bytes are built from the stdlib alone (a hand-assembled PNG,
# a `wave`-module WAV) so the tests need no fixture files.


def _png_bytes(w: int, h: int) -> bytes:
    """A minimal valid 8-bit RGB PNG (one IDAT, filter 0 per scanline)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00"
        + bytes(
            (x * 40 + y * 90 + c * 30) % 256
            for x in range(w)
            for c in range(3)
        )
        for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(ms: int = 250, rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        n = rate * ms // 1000
        f.writeframes(
            b"".join(
                (int(8000 * ((i % 64) / 64 - 0.5))).to_bytes(
                    2, "little", signed=True
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


@pytest.mark.skipif(
    not mm.available_codecs()["image"], reason="PIL not installed"
)
def test_decode_auto_real_image_true_dimensions(spark):
    """mode="auto" with PIL present must decode a REAL PNG: true
    dimensions (not the md5-derived fake, which is always >= 64) and a
    feature vector inside the stub contract (FEATURE_DIM, [-1, 1])."""
    df = spark.createDataFrame(
        [(1, "image", _png_bytes(5, 3), {})], mm.MEDIA_SCHEMA
    )
    row = mm.decode_media(df, mode="auto").first()
    assert (row.width, row.height) == (5, 3)
    assert row.duration_ms is None
    assert len(row.feature) == mm.FEATURE_DIM
    assert all(-1.0 <= f <= 1.0 for f in row.feature)


@pytest.mark.skipif(
    not mm.available_codecs()["audio"], reason="ffprobe not installed"
)
def test_decode_auto_real_audio_duration(spark):
    """mode="auto" with ffprobe present must report a real WAV clip's
    true duration within container rounding, with image-only fields
    null — the stub contract's shape, real metadata."""
    df = spark.createDataFrame(
        [(1, "audio", _wav_bytes(250), {})], mm.MEDIA_SCHEMA
    )
    row = mm.decode_media(df, mode="auto").first()
    assert row.width is None and row.height is None
    assert row.feature is None
    assert abs(row.duration_ms - 250) <= 10, row.duration_ms
