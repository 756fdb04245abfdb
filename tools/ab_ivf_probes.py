"""Controlled A/B for the r16 `emb_ivf_topk_probes2` bench anomaly.

BENCH_r15 -> r16 showed probes2's min-of-3 going 0.9 -> 1.87 s raw with
ZERO changes to similarity.py or its plan, while its probes=1 twin was
flat (0.44 -> 0.43 normalized). Suspected cause per the r16 verdict: the
attestation rotation re-ordered the bench loop, changing which neighbors
warm the shared IVF index materialization / embeddings page cache.

This tool measures both queries in one fresh process, min-of-N, under
two regimes:
  * warm-shared: the index is built once (first run pays it, like the
    bench loop's pass-1) and every subsequent run reuses it;
  * cold-index: `release_ivf_indexes()` before EVERY run, so each run
    pays the full index build + probe.
Per-run steal%% is sampled so a burst is attributable. The gap between
regimes bounds how much of the r16 swing index-build placement can
explain; the warm-shared min is the number the (now order-fixed)
bench should reproduce going forward.

Usage: python tools/ab_ivf_probes.py [sf_dir] [n_runs]
Appends the result under "ab_ivf_probes_r17" in SCALE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal_sample():
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:  # noqa: BLE001
        return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from comp5339dataengineering_realtimefuelanalysis_spark.session import (
        get_spark,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
        release_tracked,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
        REGISTRY,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        release_ivf_indexes,
    )

    spark = get_spark("ab_ivf_probes")
    spark.sparkContext.setLogLevel("ERROR")

    names = ["emb_ivf_topk", "emb_ivf_topk_probes2"]
    # same codegen/Python-worker warm-up as bench.py
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != sf_dir:
        for n in names:
            REGISTRY[n].fn(spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        release_tracked()
        release_ivf_indexes()

    out: dict = {"sf_dir": sf_dir, "n_runs": n_runs, "regimes": {}}
    for regime in ("warm_shared", "cold_index"):
        runs: dict[str, list] = {n: [] for n in names}
        steals: dict[str, list] = {n: [] for n in names}
        release_ivf_indexes()
        for _ in range(n_runs):
            for n in names:
                if regime == "cold_index":
                    release_ivf_indexes()
                s0 = _steal_sample()
                t0 = time.perf_counter()
                REGISTRY[n].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs[n].append(round(time.perf_counter() - t0, 4))
                s1 = _steal_sample()
                steals[n].append(
                    round(100.0 * (s1[0] - s0[0]) / (s1[1] - s0[1]), 2)
                    if s0 and s1 and s1[1] > s0[1]
                    else None
                )
                release_tracked()
        out["regimes"][regime] = {
            n: {
                "min": min(runs[n]),
                "runs": runs[n],
                "steal_pct": steals[n],
            }
            for n in names
        }
        release_ivf_indexes()

    print(json.dumps(out, indent=1))
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_MEASURED.json",
    )
    if os.path.exists(art):
        with open(art) as f:
            data = json.load(f)
        data["ab_ivf_probes_r17"] = out
        with open(art, "w") as f:
            json.dump(data, f, indent=1)
        print(f"merged into {art}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
