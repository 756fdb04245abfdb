"""Attributable cross-round bench comparison.

Rounds 15-17 each burned investigation time on per-query normalized
deltas that turned out to be host-epoch or loop-warmth artifacts (r16:
emb_ivf_topk_probes2 2.2x "regression", streaming -40% raw "dip"; r17:
the knee pipeline looking slower NORMALIZED while faster RAW because the
calibration factor halved between epochs). This tool encodes the
attribution discipline:

* compares BOTH raw and normalized per-query values between two bench
  artifacts (BENCH_r{N}.json "tail" blobs are not parseable — use the
  full bench_out.json artifacts, which carry every raw run);
* a query is flagged REAL only when its raw FLOOR (min) moved beyond
  the larger artifact's own run spread — a shifted floor means the plan
  or the data changed; a floor inside the spread is host noise;
* everything else is labeled noise/epoch with the evidence inline.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold=1.3]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    co, cn = (old.get("calibration") or {}).get("factor"), (
        new.get("calibration") or {}
    ).get("factor")
    print(
        f"cal factor: {co} -> {cn}"
        + (
            "  (epochs differ: normalized deltas are NOT comparable "
            "1:1 — trust raw floors + spreads)"
            if co and cn and abs(co - cn) / max(co, cn) > 0.1
            else ""
        )
    )
    qo, qn = old.get("queries", {}), new.get("queries", {})
    ro, rn = old.get("runs", {}), new.get("runs", {})
    flagged, noise = [], []
    for name in sorted(set(qo) & set(qn)):
        a, b = qo[name], qn[name]
        if a <= 0 or max(a, b) / max(min(a, b), 1e-9) < thr:
            continue
        spread_a = max(ro.get(name, [a])) - a
        spread_b = max(rn.get(name, [b])) - b
        spread = max(spread_a, spread_b)
        moved = abs(b - a)
        line = (
            f"{name}: raw floor {a:.2f} -> {b:.2f} "
            f"(moved {moved:.2f}, max run spread {spread:.2f}; "
            f"old runs {ro.get(name)}, new runs {rn.get(name)})"
        )
        (flagged if moved > spread else noise).append(line)
    print(f"\nREAL floor shifts (moved > own run spread), >= {thr}x:")
    for line in flagged or ["  (none)"]:
        print(f"  {line}")
    print("\nwithin-spread (host noise / warmth — do not chase):")
    for line in noise or ["  (none)"]:
        print(f"  {line}")

    so, sn = old.get("streaming", {}), new.get("streaming", {})
    if "rows_per_sec" in so and "rows_per_sec" in sn:
        print(
            f"\nstreaming raw: {so['rows_per_sec']} -> "
            f"{sn['rows_per_sec']} rows/s "
            f"(steal {so.get('steal_pct')}% -> {sn.get('steal_pct')}%, "
            f"low-steal attempts {so.get('n_low_steal', '?')} -> "
            f"{sn.get('n_low_steal', '?')}, median "
            f"{so.get('median_rows_per_sec', '?')} -> "
            f"{sn.get('median_rows_per_sec', '?')})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
