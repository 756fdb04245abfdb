"""Locate the curation pipeline's banding crossover (legacy 16/4 vs
knee 48/8) across corpus scales.

r17 promoted the whole pipeline to the knee on x300 evidence and paid
+13% raw at sf0.1; r18 makes the banding count-guarded
(_pipe_banding). This sweep measures, per scale and per banding, the
stages the banding actually touches — 5_lsh_candidates (minhash +
band join) and 7_jaccard_verify (candidate-volume-driven) — through
the production builder's stage_cb seam, aborting after stage 7 so the
(banding-independent) semantic/contamination/packing tail is not paid
4x per scale. Also records n_kept1 (the exact-dedup survivor count the
guard keys on) so the crossover maps to the guard's own variable.

Usage:
    python tools/sweep_pipe_banding.py [reps] [scale_dir ...]
Defaults: reps=2, scales = sf0.1 (x1), /tmp/scale_bench/x10, x30, x100.
Prints one JSON object; merge into SCALE_MEASURED.json as
pipe_banding_crossover.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
    release_tracked,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans import registry_llm as rl
from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark


class _Done(Exception):
    pass


def run_once(spark, sf_dir: str, banding: str) -> dict:
    os.environ["SPARK_GRAFT_PIPE_BANDING"] = banding
    stages: dict[str, float] = {}
    n_kept1 = [None]

    def cb(name: str, thunk):
        t0 = time.perf_counter()
        out = thunk()
        if isinstance(out, DataFrame):
            out.write.format("noop").mode("overwrite").save()
        stages[name] = round(time.perf_counter() - t0, 3)
        if name == "3_repetition_gate_exact_dedup":
            n_kept1[0] = out.count()
        if name == "7_jaccard_verify":
            raise _Done()
        return out

    try:
        rl.q_corpus_curation_pipeline(spark, sf_dir, stage_cb=cb)
    except _Done:
        pass
    finally:
        os.environ.pop("SPARK_GRAFT_PIPE_BANDING", None)
    return {
        "stages": stages,
        "n_kept1": n_kept1[0],
        "s5_plus_s7": round(
            stages.get("5_lsh_candidates", 0.0)
            + stages.get("7_jaccard_verify", 0.0),
            3,
        ),
        "total_1_to_7": round(sum(stages.values()), 3),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scales = sys.argv[2:] or [
        "/root/testdata/sf0.1",
        "/tmp/scale_bench/x10",
        "/tmp/scale_bench/x30",
        "/tmp/scale_bench/x100",
    ]
    spark = get_spark("sweep_pipe_banding")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for sf_dir in scales:
        if not os.path.isdir(sf_dir):
            out[sf_dir] = {"err": "missing"}
            continue
        entry: dict = {}
        for banding in ("legacy", "knee"):
            best = None
            runs = []
            for _ in range(reps):
                r = run_once(spark, sf_dir, banding)
                release_tracked()
                runs.append(r["s5_plus_s7"])
                if best is None or r["s5_plus_s7"] < best["s5_plus_s7"]:
                    best = r
            best["runs_s5_plus_s7"] = runs
            entry[banding] = best
        entry["n_kept1"] = entry["legacy"]["n_kept1"]
        entry["knee_minus_legacy_s5s7"] = round(
            entry["knee"]["s5_plus_s7"] - entry["legacy"]["s5_plus_s7"], 3
        )
        out[sf_dir] = entry
        print(f"# {sf_dir}: {json.dumps(entry, default=str)[:400]}",
              file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
