"""End-to-end fuel pipeline demo: synthetic API polls -> landing zone ->
Structured Streaming (validate/clean/quarantine, silver tables, live Q1)
-> the three dashboard queries, printed.

Run: python examples/run_fuel_demo.py [workdir]

This is the reference's whole topology (SURVEY.md §0) in one process:
where it wires threads through an MQTT broker and SQLite, this drives the
same data through the engine's landing-zone + Structured Streaming path.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.sources.rest import (
    poll_to_landing,
)
from comp5339dataengineering_realtimefuelanalysis_spark.streaming.runners import (
    FuelStreamingPipeline,
)


def fake_api_snapshots():
    """Deterministic stand-in for the NSW Fuel API (three hourly polls,
    including the dirty-record cases the cleaning layer must handle)."""
    station = lambda code, name: {
        "brandid": "B1",
        "stationid": f"S{code}",
        "brand": "Ampol",
        "code": str(code),
        "name": name,
        "address": f"{code} Pacific Hwy",
        "location": {"latitude": -33.8 - code * 0.001, "longitude": 151.2},
    }
    price = lambda code, fuel, p, ts: {
        "stationcode": str(code),
        "fueltype": fuel,
        "price": str(p),
        "lastupdated": ts,
    }
    return iter(
        [
            {
                "stations": [station(100, "Alpha"), station(200, "Beta")],
                "prices": [
                    price(100, "U91", 180.9, "01/10/2023 08:00:00"),
                    price(100, "E10", 171.5, "01/10/2023 08:00:00"),
                    price(200, "U91", 0, "01/10/2023 08:00:00"),  # rejected
                ],
            },
            {
                "stations": [station(100, "Alpha-DUP"), station(300, "Gamma")],
                "prices": [
                    price(100, "U91", 184.3, "01/10/2023 09:00:00"),
                    price(200, "P98", 210.1, "01/10/2023 09:00:00"),
                    price(300, "U91", "abc", "01/10/2023 09:00:00"),  # rejected
                ],
            },
            {
                "stations": [],
                "prices": [
                    price(300, "DL", 195.7, "01/10/2023 10:00:00"),
                    price(100, "U91", 182.0, "30/09/2023 07:00:00"),  # late
                ],
            },
        ]
    )


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="fuel_demo_"
    )
    landing = os.path.join(workdir, "landing")
    snaps = fake_api_snapshots()
    n = poll_to_landing(
        lambda: next(snaps), landing, interval_s=0, max_polls=3,
        sleep_fn=lambda s: None,
    )
    print(f"landed {n} poll snapshots under {landing}")

    spark = get_spark("fuel-demo")
    spark.sparkContext.setLogLevel("ERROR")
    pipe = FuelStreamingPipeline(
        spark,
        landing_dir=landing,
        warehouse_dir=os.path.join(workdir, "warehouse"),
        checkpoint_dir=os.path.join(workdir, "checkpoint"),
        # full fan-out: the stateful per-station high-watermark publisher
        # (the reference's F4 publish loop) runs as the 4th query
        publish_new_highs=True,
    )
    queries = pipe.start()
    try:
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()

    print("\n== silver tables ==")
    print("prices:", pipe.silver_prices().count(), "rows;",
          "stations:", pipe.silver_stations().count(), "rows;",
          "quarantined:",
          spark.read.parquet(f"{pipe.rejects_path}/prices").count(), "rows")

    print("\n== Q1 avg price per fuel type (live complete-mode table) ==")
    spark.sql("SELECT * FROM q1_live ORDER BY fueltype").show(truncate=False)

    print("== Q2 station map with latest prices ==")
    pipe.gold_q2().orderBy("name").show(truncate=False)

    print("== Q3 price trend ==")
    pipe.gold_q3().show(truncate=False)

    print("== published new-high payloads (stateful F4 publisher) ==")
    # one JSON line per record that raised its station's high-watermark —
    # the exact bytes a Kafka sink would carry (K1 payload contract)
    for line in sorted(
        spark.read.text(pipe.published_path).toPandas()["value"]
    ):
        print(" ", line)

    spark.stop()


if __name__ == "__main__":
    main()
