"""Time the K16/b4 -> K48/b8 banding migration at scale.

The r14 sweep measured the S-curve knee (K48/b8/r6: 12x fewer
candidates, 3.3x faster end-to-end verify at 500k docs); round 15
shipped ``migrate_banding`` so an existing silver deployment can move
its at-rest band_keys + band index there. This tool measures what that
one-time migration costs at x30 scale (150k docs): build a
single-epoch silver (v1 keys) from the scale_bench corpus, run the
migration into fresh roots (silver rewrite + full index rebuild), and
record wall seconds into SCALE_MEASURED.json under
``band_migration``.

Usage: python tools/measure_band_migration.py [--mult 30]
       [--src-dir /tmp/scale_bench] [--json SCALE_MEASURED.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--src-dir", default="/tmp/scale_bench")
    ap.add_argument(
        "--json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_MEASURED.json",
        ),
    )
    ap.add_argument("--work-dir", default="/tmp/band_migration")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from comp5339dataengineering_realtimefuelanalysis_spark.session import (
        get_spark,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        dedup as dd,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _KNEE_BANDS,
        _KNEE_NUM_HASHES,
        _SHINGLE_N,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.streaming.incremental_dedup import (
        StreamingIncrementalDedup,
    )

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("band_migration")
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(args.src_dir, f"x{args.mult}", "documents.parquet")
    docs = spark.read.parquet(src).select("doc_id", "text")
    n_docs = docs.count()

    if os.path.isdir(args.work_dir):
        shutil.rmtree(args.work_dir)
    silver_v1 = os.path.join(args.work_dir, "silver")
    # the pre-migration state: one admitted epoch with v1 (K16/b4) keys
    t0 = time.perf_counter()
    (
        dd.minhash_band_keys(docs, "text", "doc_id", _SHINGLE_N, 16, 4)
        .withColumn("ingest_epoch", F.lit(0))
        .write.partitionBy("ingest_epoch")
        .parquet(silver_v1)
    )
    build_sec = round(time.perf_counter() - t0, 2)

    runner = StreamingIncrementalDedup(
        spark=spark,
        landing_dir=os.path.join(args.work_dir, "landing"),
        silver_path=silver_v1,
        checkpoint_dir=os.path.join(args.work_dir, "chk"),
        schema=None,  # not streaming; only migrate_banding is used
        n=_SHINGLE_N,
    )
    t0 = time.perf_counter()
    migrated = runner.migrate_banding(
        spark,
        os.path.join(args.work_dir, "silver_v2"),
        os.path.join(args.work_dir, "bandidx_v2"),
        num_hashes=_KNEE_NUM_HASHES,
        bands=_KNEE_BANDS,
    )
    migrate_sec = round(time.perf_counter() - t0, 2)

    entry = {
        "mult": args.mult,
        "n_docs": n_docs,
        "migrated": migrated,
        "from": {"num_hashes": 16, "bands": 4},
        "to": {"num_hashes": _KNEE_NUM_HASHES, "bands": _KNEE_BANDS},
        "v1_build_sec": build_sec,
        "migrate_sec": migrate_sec,
        "note": (
            "one-time full re-shingle + re-hash of silver text into "
            "fresh roots (silver rewrite + band-index rebuild + pin)"
        ),
    }
    results = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)
    results.setdefault("band_migration", {})[f"x{args.mult}"] = entry
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(entry))
    spark.stop()


if __name__ == "__main__":
    main()
