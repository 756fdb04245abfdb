"""Unit tests for the as-of and bounded range joins on hand-built cases
covering the boundary semantics (<= for as-of; [ts-w, ts) for range)."""

from __future__ import annotations

import datetime as dt

from comp5339dataengineering_realtimefuelanalysis_spark.operators.temporal import (
    asof_join,
    range_join_count,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01T10:00:00")),
            (2, 10, ts("2024-01-01T12:00:00")),
            (3, 20, ts("2024-01-01T09:00:00")),  # no prior right row
            (4, 10, ts("2024-01-01T11:00:00")),  # ts equal to a right row
        ],
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01T09:30:00")),
            (101, 10, ts("2024-01-01T11:00:00")),  # == left id=4's ts
            (102, 10, ts("2024-01-01T11:30:00")),
            (103, 20, ts("2024-01-01T09:30:00")),  # after left id=3
        ],
        "rid long, k long, rt timestamp",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = frames(spark)
    out = {
        r.id: r.right_rid
        for r in asof_join(
            left, right, "k", "t", "rt", ["rid"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == 100  # 09:30 is latest <= 10:00
    assert out[2] == 102  # 11:30 latest <= 12:00
    assert out[3] is None  # nothing at or before 09:00 for key 20
    assert out[4] == 101  # equal timestamps match (<=)


def test_asof_join_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00"))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, 1, ts("2024-01-01T09:00:00")),
            (9, 1, ts("2024-01-01T09:00:00")),  # same ts: higher rid wins
        ],
        "rid long, k long, rt timestamp",
    )
    out = asof_join(left, right, "k", "t", "rt", ["rid"], tiebreak="rid")
    assert out.collect()[0].right_rid == 9


def test_range_join_count_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:05:00"))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00")),  # == t-5min -> included (>=)
            (1, ts("2024-01-01T10:04:59")),  # inside
            (1, ts("2024-01-01T10:05:00")),  # == t -> excluded (<)
            (1, ts("2024-01-01T09:59:59")),  # just outside
            (2, ts("2024-01-01T10:04:00")),  # wrong key
        ],
        "k long, rt timestamp",
    )
    out = range_join_count(left, right, "k", "t", "rt", 300, "n")
    assert out.collect()[0].n == 2


def test_range_join_count_zero_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00"))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00:00"))], "k long, rt timestamp"
    )
    out = range_join_count(left, right, "k", "t", "rt", 300, "n")
    assert out.collect()[0].n == 0
