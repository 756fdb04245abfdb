"""Core-count scaling measurement at a synthetic scale point.

VERDICT r18 item 3: every 8-vs-32-core ratio at sf0.1 was ~1 because the
suite is scheduling-bound at 5k docs — the scaling block proved nothing
about parallelism. This tool times the heavy doc/embedding queries at a
scale_bench corpus (default x30 = 150k docs / 60k vectors) on
local[$SPARK_GRAFT_CPUS], honest-accounting style (shared caches released
between passes), so running it twice (SPARK_GRAFT_CPUS=32 and =8) yields
per-query core-scaling ratios where compute actually dominates.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/core_scaling.py /tmp/scale_bench/x30 \
        [passes] [q1,q2,...]
Prints one JSON line {"cpus": N, "sf_dir": ..., "queries": {name: {runs,
sec}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
    release_tracked,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
    REGISTRY,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
    release_ivf_indexes,
)

DEFAULT_QUERIES = (
    "corpus_curation_pipeline,corpus_curation_pipeline_2l,"
    "doc_semantic_dedup,doc_semantic_dedup_2l,doc_lsh_verified_pairs,"
    "doc_lsh_verified_pairs_knee,doc_bm25_topk,doc_lm_ppl_external,"
    "doc_repetition,doc_jaccard_pairs"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_bench/x30"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = (sys.argv[3] if len(sys.argv) > 3 else DEFAULT_QUERIES).split(",")
    spark = get_spark("core_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism
    # codegen/JIT warm-up on the tiny fixture so the timed runs measure
    # the plans, not first-touch compilation
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass
        release_tracked()
    release_ivf_indexes()
    out: dict = {}
    for _p in range(passes):
        for name in names:
            try:
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                out.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3)
                )
            except Exception as exc:  # noqa: BLE001
                out.setdefault(f"{name}__err", []).append(
                    f"{type(exc).__name__}: {exc}"[:200]
                )
            release_tracked()
        release_ivf_indexes()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "sf_dir": sf_dir,
                "queries": {
                    k: {"runs": v, "sec": min(v)}
                    if not k.endswith("__err")
                    else {"error": v}
                    for k, v in out.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
