"""Unit tests for operators/analytics.py — A1/A3/A4/A5, J1/J2, P5 semantics
including the documented tricky cases: timestamp-tie argmax, left-join null
path (orphan facts), collect_list ordering determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from comp5339dataengineering_realtimefuelanalysis_spark.operators.analytics import (
    latest_per_key,
    avg_by,
    enrich_left,
    label_join_agg,
    series_by,
    orphans,
)
from comp5339dataengineering_realtimefuelanalysis_spark.functions.scalars import (
    info_label,
)

FACT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("station", T.LongType()),
        T.StructField("fuel", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)

DIM = T.StructType(
    [
        T.StructField("code", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def fact(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 100, "U91", 180.0),
            (2, ts("2024-01-02T10:00:00"), 100, "U91", 185.0),  # latest U91
            (3, ts("2024-01-02T10:00:00"), 100, "E10", 170.5),
            (4, ts("2024-01-01T10:00:00"), 100, "E10", 171.0),
            # station 200 has one fuel; station 300 is an orphan (no dim row)
            (5, ts("2024-01-03T09:00:00"), 200, "P98", 210.3),
            (6, ts("2024-01-03T09:00:00"), 300, "U91", 175.0),
        ],
        FACT,
    )


def dim(spark):
    return spark.createDataFrame(
        [(100, "Alpha"), (200, "Beta"), (999, "NoFacts")], DIM
    )


def test_latest_per_key_argmax(spark):
    got = {
        (r.station, r.fuel): r.price
        for r in latest_per_key(
            fact(spark), ["station", "fuel"], "ts", tiebreak="id"
        ).collect()
    }
    assert got == {
        (100, "U91"): 185.0,
        (100, "E10"): 170.5,
        (200, "P98"): 210.3,
        (300, "U91"): 175.0,
    }


def test_latest_per_key_tiebreak_deterministic(spark):
    # two rows with identical ts for (100, E10): higher id wins (id desc)
    df = latest_per_key(fact(spark), ["station", "fuel"], "ts", tiebreak="id")
    row = [r for r in df.collect() if r.station == 100 and r.fuel == "E10"]
    assert row[0].id == 3


def test_avg_by(spark):
    got = {
        r.fuel: r.avg_value
        for r in avg_by(
            fact(spark), ["fuel"], "price", ndigits=2
        ).collect()
    }
    assert got == {"U91": 180.0, "E10": 170.75, "P98": 210.3}


def test_enrich_left_preserves_unmatched_dim(spark):
    latest = latest_per_key(
        fact(spark), ["station", "fuel"], "ts", tiebreak="id"
    )
    d = dim(spark)
    joined = enrich_left(
        d, latest, d["code"] == latest["station"], broadcast_side="right"
    )
    rows = joined.collect()
    # dim row 999 survives with NULL fact columns (J1 null path)
    nofacts = [r for r in rows if r.code == 999]
    assert len(nofacts) == 1 and nofacts[0].price is None
    # orphan fact (station 300) does NOT appear — left join keeps dim side
    assert not [r for r in rows if r.station == 300]


def test_info_label_null_guard(spark):
    latest = latest_per_key(
        fact(spark), ["station", "fuel"], "ts", tiebreak="id"
    )
    d = dim(spark)
    joined = enrich_left(
        d, latest, d["code"] == latest["station"], broadcast_side="right"
    ).select("code", info_label("fuel", "price").alias("info"))
    got = {(r.code, r.info) for r in joined.collect()}
    assert (999, "") in got  # null price -> empty string (P5)
    assert (200, "P98: 210.30") in got  # decimal(18,2) rendering


def test_label_join_agg_sorted_deterministic(spark):
    latest = latest_per_key(
        fact(spark), ["station", "fuel"], "ts", tiebreak="id"
    )
    d = dim(spark)
    joined = enrich_left(
        d, latest, d["code"] == latest["station"], broadcast_side="right"
    ).select("code", "name", info_label("fuel", "price").alias("info"))
    agg = {
        r.code: r.info
        for r in label_join_agg(
            joined, ["code", "name"], "info", sep="<br>"
        ).collect()
    }
    # sorted alphabetically regardless of arrival order
    assert agg[100] == "E10: 170.50<br>U91: 185.00"
    assert agg[200] == "P98: 210.30"
    assert agg[999] == ""


def test_series_by_ordered(spark):
    rows = series_by(fact(spark), ["fuel"], "ts", ["price"]).collect()
    assert [r.fuel for r in rows] == sorted(r.fuel for r in rows)
    u91 = [(r.ts, r.price) for r in rows if r.fuel == "U91"]
    assert u91 == sorted(u91)


def test_orphans_anti_join(spark):
    got = sorted(
        r.id
        for r in orphans(fact(spark), dim(spark), "station", "code").collect()
    )
    assert got == [6]  # only station 300 rows violate the FK
