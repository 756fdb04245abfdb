"""Unit tests for operators/cleaning.py against the reference's documented
edge cases (SURVEY.md §5: zero price F2, missing/empty F3, 30-day boundary
F1 strict >, first-arrival dedup D1, high-watermark F4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from comp5339dataengineering_realtimefuelanalysis_spark.operators.cleaning import (
    Rule,
    validate_split,
    recent_window,
    dedup_first,
    incremental_after,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def rules():
    return [
        Rule("missing_key", F.col("key").isNull()),
        Rule("empty_key", F.col("key") == ""),
        Rule("missing_val", F.col("val").isNull()),
        Rule("zero_val", F.col("val") == 0),
    ]


def test_validate_split_routes_and_reasons(spark):
    rows = [
        (1, ts("2024-01-01T00:00:00"), "a", 1.5),
        (2, ts("2024-01-01T00:00:00"), None, 1.5),  # missing key
        (3, ts("2024-01-01T00:00:00"), "", 1.5),  # empty key
        (4, ts("2024-01-01T00:00:00"), "b", None),  # missing val
        (5, ts("2024-01-01T00:00:00"), "c", 0.0),  # zero val (F2)
        (6, None, "d", 2.0),  # ts null but no rule on ts -> valid
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    valid, rejects = validate_split(df, rules())
    assert sorted(r.id for r in valid.collect()) == [1, 6]
    got = {r.id: r.reject_reason for r in rejects.collect()}
    assert got == {
        2: "missing_key",
        3: "empty_key",
        4: "missing_val",
        5: "zero_val",
    }


def test_validate_first_failing_rule_wins(spark):
    # row fails both missing_key and zero_val -> first declared rule reported
    df = spark.createDataFrame(
        [(1, ts("2024-01-01T00:00:00"), None, 0.0)], SCHEMA
    )
    _, rejects = validate_split(df, rules())
    assert rejects.collect()[0].reject_reason == "missing_key"


def test_recent_window_strict_boundary(spark):
    # max is 2024-01-31; 30-day bound = 2024-01-01; exactly-on-bound drops
    rows = [
        (1, ts("2024-01-31T00:00:00"), "a", 1.0),
        (2, ts("2024-01-01T00:00:00"), "a", 1.0),  # == bound -> dropped
        (3, ts("2024-01-01T00:00:01"), "a", 1.0),  # > bound -> kept
        (4, ts("2023-12-01T00:00:00"), "a", 1.0),  # old -> dropped
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    kept = sorted(r.id for r in recent_window(df, "ts", days=30).collect())
    assert kept == [1, 3]


def test_recent_window_is_data_relative(spark):
    # bound follows the data max, not wall clock
    rows = [
        (1, ts("2001-06-30T00:00:00"), "a", 1.0),
        (2, ts("2001-05-01T00:00:00"), "a", 1.0),  # 60 days before max
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert [r.id for r in recent_window(df, "ts", days=30).collect()] == [1]


def test_dedup_first_deterministic(spark):
    rows = [
        (2, ts("2024-01-01T00:00:00"), "a", 1.0),  # same ts as id=1
        (1, ts("2024-01-01T00:00:00"), "a", 2.0),  # tiebreak: lower id wins
        (3, ts("2024-01-02T00:00:00"), "a", 3.0),
        (4, ts("2024-01-05T00:00:00"), "b", 4.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.key: r.id
        for r in dedup_first(df, ["key"], ["ts", "id"]).collect()
    }
    assert got == {"a": 1, "b": 4}


def test_dedup_first_without_order_keeps_one_per_key(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:00"), "a", 1.0),
            (2, ts("2024-01-02T00:00:00"), "a", 2.0),
        ],
        SCHEMA,
    )
    assert dedup_first(df, ["key"]).count() == 1


def test_incremental_after_strict(spark):
    rows = [
        (1, ts("2024-01-10T00:00:00"), "a", 1.0),  # == watermark -> excluded
        (2, ts("2024-01-10T00:00:01"), "a", 1.0),
        (3, ts("2024-01-09T00:00:00"), "a", 1.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        r.id
        for r in incremental_after(
            df, "ts", ts("2024-01-10T00:00:00")
        ).collect()
    )
    assert got == [2]
