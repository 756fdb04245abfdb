"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media are opaque ``binary`` columns plus typed metadata — Spark
never interprets the bytes in the JVM; decode/feature-extraction runs in
Arrow-batched Pandas iterators (``mapInPandas``), which is the right shape
at 100 TB: bytes stream batch-wise through Python workers without a
per-row serde, partition boundaries are preserved, and the decode stage
pipelines with the scan.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
``decode=...`` stubs are explicit: ``"real"`` raises NotImplementedError
with the dependency it needs, ``"fake"`` derives deterministic
pseudo-metadata/features from the byte content (md5-seeded) so the whole
distributed plumbing — schemas, batching, partitioning, UDF signatures —
is real and testable today.
"""

from __future__ import annotations

import hashlib
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


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    ``mode="real"`` is the integration point for actual codecs; it raises
    NotImplementedError naming the missing dependency (PIL/ffmpeg are not
    installed in this environment by design).
    """
    if mode == "real":
        raise NotImplementedError(
            "real media decoding requires PIL (images) / ffmpeg (audio, "
            "video), which are not available in this environment; use "
            'mode="fake" for deterministic plumbing tests'
        )
    if mode != "fake":
        raise ValueError(f"unknown decode mode: {mode!r}")

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
            }
            decoded = pdf["content"].map(_fake_decode_bytes)
            out["width"] = decoded.map(
                lambda d: d["width"]
            ).astype("int32")
            out["height"] = decoded.map(lambda d: d["height"]).astype("int32")
            out["duration_ms"] = decoded.map(
                lambda d: d["duration_ms"]
            ).astype("int64")
            out["feature"] = decoded.map(lambda d: d["feature"])
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
