"""Diagnose the x100 auto-broadcast OOM in the near-dup edge materialization.

Round-12 finding (SCALE_MEASURED.json scales.x100.connected_components.error):
the cc_comparison harness step OOM'd the 8g driver with "Not enough memory to
build and broadcast the table" while writing the verified-pair edge set at
500k docs.  No explicit F.broadcast in that path grows with n, so AQE (or the
static planner) auto-broadcast a corpus-sized join side whose size ESTIMATE
passed the 64 MB threshold — the bounded-31-word-vocabulary corpus compresses
brutally well, so compressed shuffle/cache bytes wildly understate the
deserialized hash-relation size.

This script re-runs the exact pair DAG at a given scale dir and prints the
AQE-final physical plan (after a bounded execution attempt), so the broadcast
node and its child are visible.  Run with a small driver to reproduce, or
with SPARK_GRAFT_DRIVER_MEM bumped to observe the would-be plan.

Usage: python tools/diag_x100_broadcast.py [sf_dir] [limit_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_bench/x100"

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import dedup as dd
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _SHINGLE_N, _NUM_HASHES, _BANDS, _LSH_MAX_BUCKET, _JACCARD_THRESHOLD,
        _docs_parallel,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
        release_tracked, tracked_persist,
    )

    spark = get_spark("diag-x100")
    spark.sparkContext.setLogLevel("ERROR")

    docs = _docs_parallel(spark, sf_dir)
    sh = tracked_persist(dd.shingles(docs, n=_SHINGLE_N, distinct=False))
    cands = tracked_persist(
        dd.minhash_lsh_pairs(
            docs, n=_SHINGLE_N, num_hashes=_NUM_HASHES, bands=_BANDS,
            shingles_df=sh, max_bucket=_LSH_MAX_BUCKET,
        )
    )
    n_cands = cands.count()
    print(f"candidates: {n_cands}", flush=True)

    pairs = dd.jaccard_verify_pairs(
        docs, cands, n=_SHINGLE_N, threshold=_JACCARD_THRESHOLD,
        shingles_df=sh,
    ).select("id_a", "id_b")

    print("=== static plan ===", flush=True)
    pairs.explain("formatted")

    t0 = time.perf_counter()
    try:
        n = pairs.write.format("noop").mode("overwrite").save()
        print(f"materialized OK in {time.perf_counter() - t0:.1f}s", flush=True)
    except Exception as exc:
        print(f"FAILED after {time.perf_counter() - t0:.1f}s: "
              f"{str(exc)[:500]}", flush=True)

    print("=== AQE-final plan ===", flush=True)
    pairs.explain("formatted")
    release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
