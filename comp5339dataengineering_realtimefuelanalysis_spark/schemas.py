"""Fixed schemas — the reference's runtime-enforced data contract.

The reference validates shapes at runtime instead of declaring schemas
(missing-key / wrong-type raises in ``DataCleaning.py:44-47, 58-76,
86-90, 102-131``); here they are declared once as ``StructType`` and
enforced at the source (``spark.read.schema(...)``), which lets Catalyst
prune columns and push predicates into the Parquet/JSON scan.

Reference citations (``/root/reference/``):
  * prices contract  — DataCleaning.py:44, DDL DataIngesting.py:35-43
  * stations contract — DataCleaning.py:86-87, DDL DataIngesting.py:20-32
  * raw API envelope — DataGathering.py:33-34, consumed main.py:40,69
  * wire timestamp format (day-first) — DataCleaning.py:73-74
"""

from __future__ import annotations

from pyspark.sql import types as T

# Day-first wire format, second granularity, no timezone (DataCleaning.py:73-74).
WIRE_TS_FORMAT = "dd/MM/yyyy HH:mm:ss"

# ---------------------------------------------------------------------------
# Raw (wire) shapes: everything is string/struct as it arrives from the API;
# typing happens in the validated/cleaned layer (operators/cleaning.py).
# ---------------------------------------------------------------------------

RAW_PRICE = T.StructType(
    [
        # stationcode may arrive as int on the wire -> read permissive, cast later
        T.StructField("stationcode", T.StringType()),
        T.StructField("fueltype", T.StringType()),
        # price may arrive as string-typed numeric (DataCleaning.py:65-69)
        T.StructField("price", T.StringType()),
        T.StructField("lastupdated", T.StringType()),
    ]
)

RAW_STATION = T.StructType(
    [
        T.StructField("brandid", T.StringType()),
        T.StructField("stationid", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("address", T.StringType()),
        # nested in raw JSON (main.py:69); flattened by the envelope reader
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
    ]
)

# One JSON document per API poll: {"stations": [...], "prices": [...]}
API_ENVELOPE = T.StructType(
    [
        T.StructField("stations", T.ArrayType(RAW_STATION)),
        T.StructField("prices", T.ArrayType(RAW_PRICE)),
    ]
)

# ---------------------------------------------------------------------------
# Cleaned (silver) shapes — post validate_split typing.
# ---------------------------------------------------------------------------

CLEAN_PRICE = T.StructType(
    [
        T.StructField("stationcode", T.StringType(), False),
        T.StructField("fueltype", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("lastupdated", T.TimestampType(), False),
    ]
)

CLEAN_STATION = T.StructType(
    [
        T.StructField("brandid", T.StringType(), False),
        T.StructField("stationid", T.StringType(), False),
        T.StructField("brand", T.StringType(), False),
        T.StructField("code", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("location_latitude", T.DoubleType()),
        T.StructField("location_longitude", T.DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md) — declared so streaming readers and
# tests never rely on schema inference.
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
