"""Sweep the MinHash-LSH (num_hashes, bands) operating point at scale.

At 500k docs (x100), the production point K=16 / b=4 / r=4 emits 28.2M
candidates of which 46.7k verify at J >= 0.5 — 0.17% precision
(SCALE_MEASURED.json), so the verify stage dominates the dedup family's
measured 100 TB cost.  The S-curve P(candidate | J=s) = 1-(1-s^r)^b
says precision is bought with more rows per band (r) and recall with
more bands (b): r=4 fires on s=0.3 noise with p~0.032 per 4 bands,
r=6 drops that 5.5x at equal band count.

This measures the actual trade on the x30 synthetic corpus (150k docs,
same planted-dup density as the x100 point): per config — candidates,
verified pairs, precision, recall vs the UNION truth set (every pair
any swept config verified; each config's verified set is a subset of
truth by construction, so relative recall is exact), and wall times for
signature+banding+pair generation vs verify.

The production queries stay at (16, 4) — their oracle SQL mirrors that
banding bit-exactly; this sweep is the evidence for SCALE.md's tuning
guidance and for choosing the at-rest band_keys layout of a real
100 TB deployment.

Usage: python tools/sweep_lsh_bands.py [--sf-dir /tmp/scale_bench/x30]
           [--passes 2] [--json SCALE_MEASURED.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# (num_hashes, bands): r = num_hashes // bands
CONFIGS = [
    (16, 4),   # production: r=4, S-curve midpoint (1/4)^(1/4) ~ 0.71
    (24, 4),   # r=6: precision play at equal band count
    (32, 8),   # r=4, 2x bands: recall-up reference (more candidates)
    (48, 8),   # r=6, 2x bands: the knee candidate — r=4 recall at r=6 noise
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scale_bench/x30")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--work-dir", default="/tmp/lsh_sweep")
    ap.add_argument(
        "--json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_MEASURED.json",
        ),
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        dedup as dd,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
        release_tracked, tracked_persist,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _SHINGLE_N, _LSH_MAX_BUCKET, _JACCARD_THRESHOLD, _docs_parallel,
    )

    spark = get_spark("lsh_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = _docs_parallel(spark, args.sf_dir)
    results: dict[str, dict] = {}

    for num_hashes, bands in CONFIGS:
        rows = num_hashes // bands
        key = f"k{num_hashes}_b{bands}_r{rows}"
        cand_path = f"{args.work_dir}/{key}/cands"
        ver_path = f"{args.work_dir}/{key}/verified"

        gen_runs, ver_runs = [], []
        for p in range(args.passes):
            # -- signatures + banding + bucket join, to parquet --------
            sh = tracked_persist(
                dd.shingles(docs, n=_SHINGLE_N, distinct=False)
            )
            t0 = time.perf_counter()
            dd.minhash_lsh_pairs(
                docs, n=_SHINGLE_N, num_hashes=num_hashes, bands=bands,
                shingles_df=sh, max_bucket=_LSH_MAX_BUCKET,
            ).write.mode("overwrite").parquet(cand_path)
            gen_runs.append(round(time.perf_counter() - t0, 3))
            # -- exact verify from the stored candidate set ------------
            cands = spark.read.parquet(cand_path)
            t0 = time.perf_counter()
            dd.jaccard_verify_pairs(
                docs, cands, n=_SHINGLE_N,
                threshold=_JACCARD_THRESHOLD, shingles_df=sh,
            ).write.mode("overwrite").parquet(ver_path)
            ver_runs.append(round(time.perf_counter() - t0, 3))
            release_tracked()

        n_cands = spark.read.parquet(cand_path).count()
        n_ver = spark.read.parquet(ver_path).count()
        s = _JACCARD_THRESHOLD
        results[key] = {
            "num_hashes": num_hashes,
            "bands": bands,
            "rows": rows,
            "candidates": n_cands,
            "verified": n_ver,
            "precision_pct": round(100.0 * n_ver / max(n_cands, 1), 3),
            "p_fire_at_t": round(1 - (1 - s ** rows) ** bands, 4),
            "p_fire_at_070": round(1 - (1 - 0.7 ** rows) ** bands, 4),
            "gen": {"runs": gen_runs, "sec": min(gen_runs)},
            "verify": {"runs": ver_runs, "sec": min(ver_runs)},
        }
        print(f"[{key}] cands={n_cands} verified={n_ver} "
              f"gen={min(gen_runs)}s verify={min(ver_runs)}s",
              file=sys.stderr)

    # union truth: every pair verified by ANY config (each config's
    # verified set is a subset, so recall ratios are exact)
    truth = None
    for key in results:
        v = spark.read.parquet(f"{args.work_dir}/{key}/verified").select(
            "id_a", "id_b"
        )
        truth = v if truth is None else truth.unionByName(v)
    truth = truth.distinct().persist()
    n_truth = truth.count()
    for key in results:
        results[key]["recall_vs_union"] = round(
            results[key]["verified"] / max(n_truth, 1), 4
        )
    out = {"sf_dir": args.sf_dir, "truth_pairs": n_truth,
           "threshold": _JACCARD_THRESHOLD, "configs": results}
    print(json.dumps(out, indent=1))

    if args.json and os.path.exists(args.json):
        with open(args.json) as f:
            merged = json.load(f)
        merged["lsh_band_sweep"] = out
        with open(args.json, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"merged into {args.json}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
