"""Golden-path batch tests for the fuel domain: envelope reading, the full
cleaning rulesets (every FIXTURES.md §1 dirty case), and Q1-Q3."""

from __future__ import annotations

import json

import pytest

from comp5339dataengineering_realtimefuelanalysis_spark.sources.readers import (
    read_envelope,
    split_prices,
    split_stations,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans.fuel import (
    clean_prices,
    clean_stations,
    q1_avg_price_by_fueltype,
    q2_station_latest_prices,
    q3_price_trend,
)


def station(code, name="Station " + "X", brandid="B1", stationid=None,
            brand="Ampol", address="1 Main St", lat=-33.8, lon=151.2):
    return {
        "brandid": brandid,
        "stationid": stationid if stationid is not None else f"S{code}",
        "brand": brand,
        "code": str(code),
        "name": name,
        "address": address,
        "location": {"latitude": lat, "longitude": lon},
    }


def price(code, fuel, price_val, ts):
    return {
        "stationcode": str(code),
        "fueltype": fuel,
        "price": str(price_val),
        "lastupdated": ts,
    }


ENVELOPE_1 = {
    "stations": [
        station(100, name="Alpha"),
        station(200, name="Beta", brandid="", stationid=""),  # C9 defaults
        station(300, name="Gamma", address=None),  # missing address -> reject
    ],
    "prices": [
        price(100, "U91", 180.0, "01/10/2023 10:00:00"),
        price(100, "U91", 185.0, "02/10/2023 10:00:00"),  # later -> latest
        price(100, "E10", "171.5", "02/10/2023 09:00:00"),  # string numeric
        price(200, "U91", 0, "02/10/2023 10:00:00"),  # F2 zero -> reject
        price(999, "P98", 210.3, "03/10/2023 09:00:00"),  # orphan stationcode
        price(100, "DL", "abc", "02/10/2023 10:00:00"),  # bad numeric -> reject
        price(100, "P95", 190.0, "2023-10-02 10:00"),  # bad ts -> reject
        {"stationcode": "100", "fueltype": None, "price": "180.0",
         "lastupdated": "02/10/2023 10:00:00"},  # missing fueltype -> reject
    ],
}


@pytest.fixture(scope="module")
def envelope_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    (d / "poll_00000000.json").write_text(
        json.dumps(ENVELOPE_1, separators=(",", ":"))
    )
    return read_envelope(spark, str(d))


def test_split_envelope(envelope_df):
    assert split_prices(envelope_df).count() == 8
    st = split_stations(envelope_df)
    assert st.count() == 3
    assert "location_latitude" in st.columns and "location" not in st.columns


def test_clean_prices_valid_and_rejects(envelope_df):
    silver, rejects = clean_prices(split_prices(envelope_df))
    rows = silver.collect()
    assert len(rows) == 4
    assert all(isinstance(r.price, float) for r in rows)
    # day-first parse: 02/10/2023 is October 2nd
    u91_latest = max(
        (r for r in rows if r.fueltype == "U91"), key=lambda r: r.lastupdated
    )
    assert (u91_latest.lastupdated.month, u91_latest.lastupdated.day) == (10, 2)
    reasons = sorted(r.reject_reason for r in rejects.collect())
    assert reasons == [
        "bad_price",
        "bad_timestamp",
        "missing_fueltype",
        "zero_price",
    ]


def test_clean_stations_defaults_and_rejects(envelope_df):
    silver, rejects = clean_stations(split_stations(envelope_df))
    rows = {r.code: r for r in silver.collect()}
    assert set(rows) == {"100", "200"}
    # C9: empty brandid -> brand, empty stationid -> code
    assert rows["200"].brandid == "Ampol"
    assert rows["200"].stationid == "200"
    assert rows["100"].brandid == "B1"
    assert [r.reject_reason for r in rejects.collect()] == ["missing_address"]


def test_q1_avg_price(envelope_df):
    silver, _ = clean_prices(split_prices(envelope_df))
    got = {r.fueltype: r.avg_price for r in
           q1_avg_price_by_fueltype(silver).collect()}
    assert got == {"U91": 182.5, "E10": 171.5, "P98": 210.3}


def test_q2_station_map(envelope_df):
    prices, _ = clean_prices(split_prices(envelope_df))
    stations, _ = clean_stations(split_stations(envelope_df))
    got = {r.name: r.fuelinfo for r in
           q2_station_latest_prices(stations, prices).collect()}
    # station 100: latest U91 is 185.0 (not 180.0); sorted fuel labels
    assert got["Alpha"] == "E10: 171.50<br>U91: 185.00"
    # station 200: its only price was zero-rejected -> empty info (J1 null path)
    assert got["Beta"] == ""
    # orphan price (999) must not resurrect a station
    assert set(got) == {"Alpha", "Beta"}


def test_q3_price_trend(envelope_df):
    silver, _ = clean_prices(split_prices(envelope_df))
    rows = q3_price_trend(silver).collect()
    assert [r.fueltype for r in rows] == sorted(r.fueltype for r in rows)
    u91 = [(r.lastupdated, r.price) for r in rows if r.fueltype == "U91"]
    assert u91 == sorted(u91) and len(u91) == 2
