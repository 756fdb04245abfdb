"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media are opaque ``binary`` columns plus typed metadata — Spark
never interprets the bytes in the JVM; decode/feature-extraction runs in
Arrow-batched Pandas iterators (``mapInPandas``), which is the right shape
at 100 TB: bytes stream batch-wise through Python workers without a
per-row serde, partition boundaries are preserved, and the decode stage
pipelines with the scan.

Codec availability is DETECTED, not assumed: ``available_codecs()``
optional-imports PIL (images) and looks for ffprobe (audio/video).
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


def available_codecs() -> dict[str, bool]:
    """Which real codecs this environment provides, per media kind.
    Driver-side detection — the result is closure-captured into the
    decode UDF so every executor makes the same choice. Assumes the
    executor Python matches the driver's (see module docstring caveat on
    skewed environments)."""
    try:
        import PIL.Image  # noqa: F401

        pil = True
    except ImportError:
        pil = False
    ff = shutil.which("ffprobe") is not None
    return {"image": pil, "audio": ff, "video": ff}


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


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    ``mode``: ``"fake"`` (deterministic md5-derived stand-in, oracle-
    replayable), ``"real"`` (detected codecs for every kind, plan-time
    NotImplementedError naming what is missing), ``"auto"`` (real where a
    codec was detected, fake elsewhere — never fails on a missing codec).
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
                'environment; use mode="auto" to fall back to the '
                "deterministic stub per kind, or install the codecs"
            )
    # plan-time, per-kind choice: identical on driver and every executor
    use_real = {
        kind: mode != "fake" and ok for kind, ok in codecs.items()
    }

    def _decode_row(kind: str, content: bytes) -> dict:
        if use_real.get(kind):
            if kind == "image":
                return _real_decode_image(content)
            return _real_decode_av(content)
        return _fake_decode_bytes(content)

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
