"""S1/S2: the REST-poll source, re-shaped for Spark.

Spark has no native REST source; the scale-correct pattern is a thin
driver-side (or external scheduler) poller that lands each API snapshot as
one JSON document in a landing directory, which the streaming job tails
with ``readStream.json`` — the poller is I/O-bound and tiny; all heavy
lifting happens distributed downstream.

Reference: token fetch + data GET (DataGathering.py:5-39), hourly re-poll
with unchanged-payload skip (main.py:18-28).

The HTTP client is stdlib urllib and is only exercised when a live endpoint
is configured; tests inject a deterministic ``fetch_fn``.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable


def fetch_envelope_http(
    api_url: str,
    token_url: str,
    api_key: str,
    api_secret: str,
    timeout: int = 30,
) -> dict:
    """OAuth2 client-credentials token fetch then data GET, as the reference
    does (DataGathering.py:5-39). Returns the parsed envelope dict."""
    import base64
    import urllib.request

    creds = base64.b64encode(f"{api_key}:{api_secret}".encode()).decode()
    tok_req = urllib.request.Request(
        f"{token_url}?grant_type=client_credentials",
        headers={"Authorization": f"Basic {creds}"},
    )
    with urllib.request.urlopen(tok_req, timeout=timeout) as resp:
        token = json.load(resp)["access_token"]
    data_req = urllib.request.Request(
        api_url,
        headers={
            "Authorization": f"Bearer {token}",
            "apikey": api_key,
            "Content-Type": "application/json",
        },
    )
    with urllib.request.urlopen(data_req, timeout=timeout) as resp:
        return json.load(resp)


def poll_to_landing(
    fetch_fn: Callable[[], dict],
    landing_dir: str,
    interval_s: float = 3600.0,
    max_polls: int | None = None,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> int:
    """Poll loop: land each *changed* snapshot as one compact JSON file.

    Mirrors main.py:18-28: fixed cadence, skip-if-unchanged. File naming is
    a monotonically increasing sequence so the streaming reader picks files
    up in arrival order. Returns the number of files written.
    """
    os.makedirs(landing_dir, exist_ok=True)
    last_payload: str | None = None
    written = 0
    n = 0
    while max_polls is None or n < max_polls:
        n += 1
        payload = json.dumps(fetch_fn(), separators=(",", ":"))
        if payload != last_payload:
            tmp = os.path.join(landing_dir, f".poll_{written:08d}.json.tmp")
            final = os.path.join(landing_dir, f"poll_{written:08d}.json")
            with open(tmp, "w") as f:
                f.write(payload)
            os.rename(tmp, final)  # atomic: readers never see partial files
            last_payload = payload
            written += 1
        if max_polls is None or n < max_polls:
            sleep_fn(interval_s)
    return written
