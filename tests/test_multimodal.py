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


def test_decode_corrupt_payload_quarantines_not_fails(spark):
    """Real-path error posture: a payload the codec rejects yields NULL
    metadata + decode_err, never a task failure — one bad byte stream
    must not poison a 100 TB stage."""
    df = spark.createDataFrame(
        [
            (1, "image", b"\x89PNG\r\n\x1a\nGARBAGE", {}),
            (2, "image", _png_bytes(4, 4), {}),
            (3, "audio", b"not-a-wav", {}),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.decode_media(df, mode="auto").collect()}
    assert out[1].decode_err is not None
    assert out[1].width is None and out[1].feature is None
    assert out[1].n_bytes == len(b"\x89PNG\r\n\x1a\nGARBAGE")
    assert out[2].decode_err is None and out[2].width == 4
    assert out[3].decode_err is not None and out[3].duration_ms is None


def test_stdlib_png_unfilters_all_filter_types():
    """The vendored PNG decoder's unfilter paths (sub/up/average/Paeth):
    encode the SAME pixel raster once with filter 0 and once with
    filters 1..4 cycling per scanline (spec-mirroring encoder written
    here, independently of the decoder) — decoded features must be
    identical."""
    import struct
    import zlib

    w, h, ch = 6, 5, 3
    raster = [
        bytes((x * 37 + y * 11 + c * 5) % 256 for x in range(w) for c in range(ch))
        for y in range(h)
    ]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def png(scanlines):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
            + chunk(b"IEND", b"")
        )

    plain = png([b"\x00" + r for r in raster])

    enc = []
    prev = bytes(w * ch)
    for y, raw in enumerate(raster):
        f = 1 + y % 4
        line = bytearray()
        for i in range(w * ch):
            a = raw[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            line.append((raw[i] - pred) & 0xFF)
        enc.append(bytes([f]) + bytes(line))
        prev = raw
    filtered = png(enc)

    d0 = mm._stdlib_decode_png(plain)
    d1 = mm._stdlib_decode_png(filtered)
    assert (d0["width"], d0["height"]) == (w, h)
    assert d0 == d1


def _mp4_bytes(
    width: int, height: int, duration_ms: int, version: int = 0
) -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov{mvhd, trak{tkhd}} with the
    given display size and duration (timescale 1000)."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    if version == 1:
        mvhd = box(
            b"mvhd",
            bytes([1, 0, 0, 0])          # version 1 + flags
            + struct.pack(">QQ", 0, 0)   # creation, modification
            + struct.pack(">I", 1000)    # timescale
            + struct.pack(">Q", duration_ms)
            + b"\x00" * 80,
        )
        tkhd = box(
            b"tkhd",
            bytes([1, 0, 0, 0])
            + struct.pack(">QQ", 0, 0)   # creation, modification
            + struct.pack(">II", 1, 0)   # track id, reserved
            + struct.pack(">Q", duration_ms)
            + b"\x00" * 52               # reserved/layer/volume/matrix
            + struct.pack(">II", width << 16, height << 16),
        )
    else:
        mvhd = box(
            b"mvhd",
            bytes(4)                     # version 0 + flags
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", 1000)
            + struct.pack(">I", duration_ms)
            + b"\x00" * 80,
        )
        tkhd = box(
            b"tkhd",
            bytes(4)
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", 1, 0)
            + struct.pack(">I", duration_ms)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isom") + moov


def test_decode_auto_real_video_mp4_headers(spark):
    """The vendored MP4 box walker decodes real container metadata —
    true duration (mvhd) and display dimensions (tkhd, 16.16 fixed) —
    for both box versions; a non-BMFF video payload quarantines via
    decode_err instead of stub-decoding."""
    if mm.available_codecs()["video"] != "stdlib-mp4":
        import pytest

        pytest.skip("ffprobe present; stdlib path not selected")
    df = spark.createDataFrame(
        [
            (1, "video", _mp4_bytes(640, 360, 2500), {}),
            (2, "video", _mp4_bytes(1280, 720, 90000, version=1), {}),
            (3, "video", b"not a video at all", {}),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.decode_media(df, mode="auto").collect()}
    assert (out[1].width, out[1].height) == (640, 360)
    assert out[1].duration_ms == 2500 and out[1].decode_err is None
    assert out[1].feature is None
    assert (out[2].width, out[2].height) == (1280, 720)
    assert out[2].duration_ms == 90000
    assert out[3].decode_err is not None and out[3].width is None


def _jpeg_bytes(w: int, h: int, progressive: bool = False) -> bytes:
    """Minimal spec-valid JPEG header stream: SOI, APP0/JFIF, a DQT,
    SOF0 (or SOF2), then EOI — enough structure that a header parser
    must actually walk length-prefixed segments to find the frame."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0]) + bytes(64)
    comps = b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    sof = struct.pack(">BHHB", 8, h, w, 3) + comps
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
        + marker + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )


def test_decode_auto_real_image_jpeg_headers(spark):
    """The stdlib image path reads JPEG dimensions from the SOF frame
    header (baseline SOF0 and progressive SOF2) — the same header-only
    posture as the MP4 walker, so feature stays None — while PNG in
    the SAME column still full-decodes, and a truncated JPEG (no SOF
    before EOI) quarantines via decode_err."""
    if mm.available_codecs()["image"] != "stdlib-image":
        import pytest

        pytest.skip("PIL present; stdlib path not selected")
    df = spark.createDataFrame(
        [
            (1, "image", _jpeg_bytes(800, 600), {}),
            (2, "image", _jpeg_bytes(321, 123, progressive=True), {}),
            (3, "image", _png_bytes(5, 3), {}),
            (4, "image", b"\xff\xd8\xff\xd9", {}),  # SOI+EOI, no SOF
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.decode_media(df, mode="auto").collect()}
    assert (out[1].width, out[1].height) == (800, 600)
    assert out[1].feature is None and out[1].decode_err is None
    assert out[1].duration_ms is None
    assert (out[2].width, out[2].height) == (321, 123)
    assert (out[3].width, out[3].height) == (5, 3)
    assert out[3].feature is not None  # PNG keeps the pixel feature
    assert out[4].decode_err is not None and out[4].width is None


def _mp3_bytes(
    frames: int = 3,
    id3: bool = False,
    trailer: bool = False,
    footer: bool = False,
    frames_32k: int = 0,
) -> bytes:
    """Spec-valid MPEG1 Layer III CBR stream: 128 kbps @ 44100 Hz, no
    padding -> frame length 144*128000/44100 = 417 bytes, 1152
    samples/frame. Optional ID3v2 tag prefix (syncsafe size, with or
    without the footer flag), ID3v1 'TAG' trailer, and appended
    32 kHz frames (576-byte, 1152 samples) for the mixed-rate case —
    all must be handled by a real frame walker."""
    frame = (b"\xff\xfb\x90\xc4" + bytes(413)) * frames
    frame += (b"\xff\xfb\x98\xc4" + bytes(572)) * frames_32k
    out = b""
    if id3 or footer:
        pad = bytes(100)
        flags = 0x10 if footer else 0x00
        out += (
            b"ID3\x04\x00"
            + bytes([flags, 0, 0, 100 >> 7, 100 & 0x7F])
            + pad
        )
        if footer:
            out += b"3DI\x04\x00" + bytes(
                [flags, 0, 0, 100 >> 7, 100 & 0x7F]
            )
    out += frame
    if trailer:
        out += b"TAG" + bytes(125)
    return out


def test_mp3_free_format_frames():
    """Free-format MPEG audio (bitrate_index 0): frame length is not in
    the bitrate tables — the walker must measure it once from the next
    matching sync (padding bit masked out of the match) and re-apply
    each frame's own padding slot. MPEG1 Layer III @ 44100, 200-byte
    frames (196-byte zero payload: no false syncs)."""
    from fractions import Fraction

    from comp5339dataengineering_realtimefuelanalysis_spark.operators.multimodal import (
        _stdlib_decode_mp3,
    )

    hdr, hdr_pad = b"\xff\xfb\x00\xc4", b"\xff\xfb\x02\xc4"
    plain = hdr + bytes(196)  # flen 200, padding 0
    padded = hdr_pad + bytes(197)  # flen 200 + 1 padding slot
    exp4 = round(Fraction(4 * 1152 * 1000, 44100))
    assert _stdlib_decode_mp3(plain * 4)["duration_ms"] == exp4
    # padding toggles mid-stream: frame 2 is one slot longer — a walker
    # that reuses the measured length verbatim lands mid-payload on
    # frame 3 and undercounts
    exp3 = round(Fraction(3 * 1152 * 1000, 44100))
    assert (
        _stdlib_decode_mp3(plain + padded + plain)["duration_ms"] == exp3
    )
    # sole free-format frame: no next sync to measure against — the
    # payload runs to EOF and the frame still counts
    exp1 = round(Fraction(1152 * 1000, 44100))
    assert _stdlib_decode_mp3(plain)["duration_ms"] == exp1
    # MPEG-2.5 low-rate free format (ver bits 00 -> rate = base/4):
    # Layer III spf 576 @ 11025 Hz
    hdr25 = b"\xff\xe3\x00\xc4"  # sync + ver 00 + layer 01 + prot 1
    exp25 = round(Fraction(2 * 576 * 1000, 11025))
    assert (
        _stdlib_decode_mp3((hdr25 + bytes(96)) * 2)["duration_ms"]
        == exp25
    )


def test_mp3_free_format_false_sync_rejected():
    """A 0xFF + matching-masked-header byte pair INSIDE a free-format
    frame's payload must not be taken as the next frame: the walker
    validates that the candidate length self-confirms (start + length
    lands on another matching sync, or EOF) before committing. A
    walker that trusts the first match measures free_base=50 here,
    walks fake frames, and overcounts duration."""
    from fractions import Fraction

    from comp5339dataengineering_realtimefuelanalysis_spark.operators.multimodal import (
        _stdlib_decode_mp3,
    )

    hdr = b"\xff\xfb\x00\xc4"  # MPEG1 L3 free-format @ 44100, flen 200
    payload = bytearray(196)
    payload[46:49] = b"\xff\xfb\x00"  # false sync at frame offset 50
    poisoned = hdr + bytes(payload)
    stream = poisoned + hdr + bytes(196)
    exp2 = round(Fraction(2 * 1152 * 1000, 44100))
    assert _stdlib_decode_mp3(stream)["duration_ms"] == exp2


def test_mp3_mpeg2_lsf_bitrate_tables():
    """MPEG-2/2.5 CBR streams exercise the ("2", layer) rows of the
    LSF bitrate table, which free-format streams bypass entirely:

    * MPEG-2.5 Layer II, br_idx 8 -> 64 kbps @ 11025 Hz: spf 1152,
      flen = 144*64000//11025 = 835
    * MPEG-2 Layer I, br_idx 4 -> 64 kbps @ 22050 Hz (Layer I shares
      the ("2", 1) row and the 4-byte slot): spf 384,
      flen = (12*64000//22050)*4 = 136"""
    from fractions import Fraction

    from comp5339dataengineering_realtimefuelanalysis_spark.operators.multimodal import (
        _stdlib_decode_mp3,
    )

    # 0xE5 = sync|ver 00 (2.5)|layer 10 (II)|prot 1; 0x80 = br 8, sr 0
    f25l2 = b"\xff\xe5\x80\xc4" + bytes(831)
    exp = round(Fraction(3 * 1152 * 1000, 11025))
    assert _stdlib_decode_mp3(f25l2 * 3)["duration_ms"] == exp

    # 0xF7 = sync|ver 10 (2)|layer 11 (I)|prot 1; 0x40 = br 4, sr 0
    f2l1 = b"\xff\xf7\x40\xc4" + bytes(132)
    exp = round(Fraction(3 * 384 * 1000, 22050))
    assert _stdlib_decode_mp3(f2l1 * 3)["duration_ms"] == exp


def test_decode_auto_real_audio_mp3_frame_walk(spark):
    """The vendored MPEG-audio frame walker: true duration from
    walking real frame headers (3 x 1152 samples @ 44100 Hz = 78 ms),
    with an ID3v2 prefix and an ID3v1 trailer both skipped; WAV in
    the SAME column still decodes via the wave module, and a payload
    that is neither quarantines via decode_err."""
    if mm.available_codecs()["audio"] != "stdlib-audio":
        import pytest

        pytest.skip("ffprobe present; stdlib path not selected")
    from comp5339dataengineering_realtimefuelanalysis_spark.operators.multimodal import (
        _stdlib_decode_mp3,
    )

    # pure-python replay first: exact expected duration
    exp = round(3 * 1152 * 1000 / 44100)
    assert _stdlib_decode_mp3(_mp3_bytes())["duration_ms"] == exp
    assert (
        _stdlib_decode_mp3(_mp3_bytes(id3=True, trailer=True))[
            "duration_ms"
        ]
        == exp
    )
    # ID3v2 footer flag: tag occupies header + size + footer(10); a
    # walker ignoring the flag lands mid-footer and quarantines
    assert (
        _stdlib_decode_mp3(_mp3_bytes(footer=True))["duration_ms"]
        == exp
    )
    # mixed-rate VBR: per-frame seconds accumulate exactly —
    # 3x1152@44100 + 2x1152@32000, NOT total_samples/first_rate
    from fractions import Fraction

    exp_mix = round(
        Fraction(3 * 1152 * 1000, 44100) + Fraction(2 * 1152 * 1000, 32000)
    )
    got_mix = _stdlib_decode_mp3(_mp3_bytes(frames_32k=2))["duration_ms"]
    assert got_mix == exp_mix
    assert got_mix != round(5 * 1152 * 1000 / 44100)  # the old drift
    df = spark.createDataFrame(
        [
            (1, "audio", _mp3_bytes(), {}),
            (2, "audio", _mp3_bytes(frames=6, id3=True), {}),
            (3, "audio", _wav_bytes(250), {}),
            (4, "audio", b"\x00\x01not audio", {}),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.decode_media(df, mode="auto").collect()}
    assert out[1].duration_ms == exp and out[1].decode_err is None
    assert out[2].duration_ms == round(6 * 1152 * 1000 / 44100)
    assert out[3].duration_ms == 250 and out[3].decode_err is None
    assert out[4].decode_err is not None and out[4].duration_ms is None
    # reserved version bits / bad bitrate index quarantine, not crash
    bad_ver = b"\xff\xeb\x90\xc4" + bytes(413)   # ver bits = 01
    bad_br = b"\xff\xfb\xf0\xc4" + bytes(413)    # bitrate idx 15
    df2 = spark.createDataFrame(
        [(1, "audio", bad_ver, {}), (2, "audio", bad_br, {})],
        mm.MEDIA_SCHEMA,
    )
    out2 = {
        r.media_id: r
        for r in mm.decode_media(df2, mode="auto").collect()
    }
    assert out2[1].decode_err is not None
    assert out2[2].decode_err is not None
