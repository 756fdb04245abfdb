"""S1/S2 integration: the real HTTP client (token fetch + data GET)
against a live local server, the unchanged-skip poll loop, and the landed
files flowing into the Spark envelope reader — the full gathering path
with no mocks (only the endpoint is local)."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from comp5339dataengineering_realtimefuelanalysis_spark.sources.rest import (
    fetch_envelope_http,
    poll_to_landing,
)

KEY, SECRET, TOKEN = "test-key", "test-secret", "tok-123"

PRICE = {
    "stationcode": "100",
    "fueltype": "U91",
    "price": 180.0,
    "lastupdated": "02/10/2023 09:00:00",
}
STATION = {
    "brandid": "B1",
    "stationid": "S1",
    "brand": "Ampol",
    "code": "100",
    "name": "St",
    "address": "1 Main",
    "location": {"latitude": -33.8, "longitude": 151.2},
}


class _Api(BaseHTTPRequestHandler):
    # class-level state shared across requests
    calls = {"token": 0, "data": 0}
    envelopes: list[dict] = []

    def log_message(self, *a):  # silence test output
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/token"):
            _Api.calls["token"] += 1
            expect = base64.b64encode(f"{KEY}:{SECRET}".encode()).decode()
            if self.headers.get("Authorization") != f"Basic {expect}":
                return self._json({"error": "bad basic auth"}, 401)
            if "grant_type=client_credentials" not in self.path:
                return self._json({"error": "bad grant"}, 400)
            return self._json({"access_token": TOKEN})
        if self.path.startswith("/fuel/prices"):
            if self.headers.get("Authorization") != f"Bearer {TOKEN}":
                return self._json({"error": "bad bearer"}, 401)
            if self.headers.get("apikey") != KEY:
                return self._json({"error": "bad apikey"}, 401)
            i = min(_Api.calls["data"], len(_Api.envelopes) - 1)
            _Api.calls["data"] += 1
            return self._json(_Api.envelopes[i])
        return self._json({"error": "not found"}, 404)


@pytest.fixture()
def api_server():
    _Api.calls = {"token": 0, "data": 0}
    srv = HTTPServer(("127.0.0.1", 0), _Api)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


def test_fetch_envelope_oauth_round_trip(api_server):
    _Api.envelopes = [{"prices": [PRICE], "stations": [STATION]}]
    env = fetch_envelope_http(
        f"{api_server}/fuel/prices", f"{api_server}/token", KEY, SECRET
    )
    assert env == {"prices": [PRICE], "stations": [STATION]}
    assert _Api.calls == {"token": 1, "data": 1}


def test_poll_skips_unchanged_and_lands_changes(api_server, tmp_path, spark):
    changed = {
        "prices": [dict(PRICE, price=181.5)],
        "stations": [STATION],
    }
    # two identical snapshots, then a changed one
    _Api.envelopes = [
        {"prices": [PRICE], "stations": [STATION]},
        {"prices": [PRICE], "stations": [STATION]},
        changed,
    ]
    landing = str(tmp_path / "landing")
    written = poll_to_landing(
        lambda: fetch_envelope_http(
            f"{api_server}/fuel/prices", f"{api_server}/token", KEY, SECRET
        ),
        landing,
        interval_s=0,
        max_polls=3,
        sleep_fn=lambda s: None,
    )
    assert written == 2  # middle identical poll skipped (main.py:26-27)
    assert _Api.calls["data"] == 3

    from comp5339dataengineering_realtimefuelanalysis_spark.sources.readers import (
        read_envelope,
        split_prices,
    )

    env = read_envelope(spark, landing, streaming=False)
    prices = split_prices(env)
    got = sorted(
        (r.stationcode, r.fueltype, r.price) for r in prices.collect()
    )
    assert got == [("100", "U91", "180.0"), ("100", "U91", "181.5")]
