"""Streaming-throughput position A/B: fresh JVM vs post-query-loop.

Raw streaming rows/s fell three rounds running (28.3k r14 -> 26.1k ->
15.5k -> 9.5k r17) with ZERO streaming-path code changes. Host steal is
the standing hypothesis (r17: all 6 attempts at 10-14% steal), but the
streaming bench always runs LAST in a JVM that just executed 95 queries
x 2-3 passes — accumulated heap / GC / shuffle / codegen-cache state is
an untested code-adjacent explanation, and the r17 query-side
calibration factor (1.30, better than r16's 1.72) says the host epoch
was NOT uniformly slow.

This tool isolates position in ONE process so the host window is
shared: N streaming attempts in the fresh session, then one full
registry pass at sf0.1 (the bench's accumulated-state generator), then
N more attempts. Each attempt carries steal%% and JVM heap before/after.
A fresh-vs-post gap at comparable steal = position effect (move the
streaming measurement to a dedicated process in bench.py); no gap =
steal/host attribution stands.

Usage: python tools/ab_stream_position.py [n_attempts=3] [sf_dir]
Prints one JSON object; merge into SCALE_MEASURED.json as
stream_position_ab.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
    release_tracked,
)
from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark


def _heap(spark) -> dict:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return {
        "used_mb": round((rt.totalMemory() - rt.freeMemory()) / 2**20),
        "total_mb": round(rt.totalMemory() / 2**20),
    }


def attempts(spark, n: int, phase: str) -> list[dict]:
    out = []
    for i in range(n):
        a = bench.streaming_bench(spark)
        a["phase"] = phase
        a["heap"] = _heap(spark)
        out.append(a)
        print(f"# {phase}[{i}]: {a['sec']}s steal={a['steal_pct']} "
              f"heap={a['heap']['used_mb']}MB", file=sys.stderr)
    return out


def query_loop(spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    for name, qd in bench.BENCH_ITEMS:
        try:
            qd.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — loop is state generator only
            pass
        finally:
            release_tracked()
    return round(time.perf_counter() - t0, 1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_stream_position")
    spark.sparkContext.setLogLevel("ERROR")
    fresh = attempts(spark, n, "fresh")
    loop_sec = query_loop(spark, sf_dir)
    print(f"# query loop: {loop_sec}s", file=sys.stderr)
    post = attempts(spark, n, "post")

    def summ(rows):
        secs = sorted(a["sec"] for a in rows)
        return {
            "best_sec": secs[0],
            "median_sec": secs[len(secs) // 2],
            "best_rows_per_sec": round(
                max(a["rows_per_sec"] for a in rows), 1
            ),
            "steal_pcts": [a["steal_pct"] for a in rows],
        }

    out = {
        "n_per_phase": n,
        "query_loop_sec": loop_sec,
        "fresh": summ(fresh),
        "post": summ(post),
        "post_over_fresh_best": round(
            summ(post)["best_sec"] / summ(fresh)["best_sec"], 3
        ),
        "attempts": fresh + post,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
