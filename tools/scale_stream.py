"""Measured scale behavior of the STREAMING incremental dedup topology.

`streaming/incremental_dedup.py` promises per-batch cost proportional to
the BATCH (plus touched corpus buckets), never to the accumulated corpus:
silver stores content_hash + band_keys per admitted doc, so corpus-side
screening is a narrow pruned scan + bucket join, and corpus TEXT is read
only for candidate-pair docs.  This tool measures that promise: it feeds
the x10 synthetic corpus (tools/scale_bench.py) as K equal epochs through
`StreamingIncrementalDedup` — each epoch a separate availableNow
StreamingQuery over a shared checkpoint, i.e. K-1 restarts — and records
per-epoch wall time as the silver corpus grows from 0 to ~45k docs.
Flat(ish) per-epoch time with a 9x corpus growth is the evidence.

Usage:
    python tools/scale_stream.py [--corpus /tmp/scale_bench/x10]
        [--epochs 10] [--json SCALE_MEASURED.json]

Merges a "streaming_incremental" block into the scale artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def run_sem_drift(spark, args) -> dict:
    """Measured demo of the semantic screen's centroid-staleness story:
    feed in-distribution epochs (corpus docs as-is), then DRIFTED
    epochs (every word replaced by an md5-hex token — a wholesale
    vocabulary shift no English centroid covers), read the per-epoch
    drift ratios from the index's log, then run retrain_sem_index and
    feed one more drifted epoch. Evidence = ratios near 1 while
    in-distribution, a step up on the drifted epochs that STAYS
    elevated while the pinned centroids go stale (the degraded-without
    branch), and a post-retrain drifted epoch back near 1 (detection
    capacity restored)."""
    import shutil

    from comp5339dataengineering_realtimefuelanalysis_spark.streaming.incremental_dedup import (  # noqa: E501
        StreamingIncrementalDedup,
    )

    docs = spark.read.parquet(f"{args.corpus}/documents.parquet").select(
        "doc_id", "text"
    )
    per_epoch = args.drift_epoch_rows
    n_in, n_drift = args.drift_in_epochs, args.drift_out_epochs
    workdir = os.path.join(args.workdir, "sem_drift")
    shutil.rmtree(workdir, ignore_errors=True)
    landing = os.path.join(workdir, "landing")
    os.makedirs(landing)

    def mk():
        return StreamingIncrementalDedup(
            spark=spark,
            landing_dir=landing,
            silver_path=os.path.join(workdir, "silver"),
            checkpoint_dir=os.path.join(workdir, "chk"),
            schema=StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("text", StringType()),
                ]
            ),
            sem_index_path=os.path.join(workdir, "semidx"),
            sem_k=args.drift_sem_k,
        )

    drifted_text = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.substring(F.md5(w), 1, 8),
        ),
        " ",
    )

    def land(lo: int, hi: int, drift: bool) -> None:
        part = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        if drift:
            part = part.select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                drifted_text.alias("text"),
            )
        part.coalesce(1).write.mode("append").parquet(landing)

    d = mk()
    for e in range(n_in + n_drift):
        lo = e * per_epoch
        land(lo, lo + per_epoch, drift=e >= n_in)
        q = d.start(available_now=True)
        q.awaitTermination(600)
        print(f"sem-drift epoch {e} done", file=sys.stderr)
    pre = [
        r.asDict()
        for r in d.sem_drift_report(spark).collect()
    ]

    d2 = mk()
    t0 = time.perf_counter()
    remapped = d2.retrain_sem_index(spark)
    retrain_sec = round(time.perf_counter() - t0, 3)
    lo = (n_in + n_drift) * per_epoch
    land(lo, lo + per_epoch, drift=True)
    q = d2.start(available_now=True)
    q.awaitTermination(600)
    post = [
        r.asDict()
        for r in d2.sem_drift_report(spark).collect()
    ]
    drift_rows = [r for r in pre if r["ingest_epoch"] >= n_in]
    return {
        "corpus": args.corpus,
        "rows_per_epoch": per_epoch,
        "in_distribution_epochs": n_in,
        "drifted_epochs": n_drift,
        "sem_k": args.drift_sem_k,
        "pre_retrain": pre,
        "ratio_in_distribution_max": max(
            r["ratio"] for r in pre if r["ingest_epoch"] < n_in
        ),
        "ratio_drifted_min": min(r["ratio"] for r in drift_rows),
        "ratio_drifted_stays_elevated": all(
            r["ratio"] > 1.5 for r in drift_rows
        ),
        "retrain_remapped": remapped,
        "retrain_sec": retrain_sec,
        "post_retrain_epoch": post[-1],
    }


def run_sem_drift_mixed(spark, args) -> dict:
    """Measured demo that the drift signal DISCRIMINATES partial
    drift: after clean training epochs, feed epochs whose drifted
    share steps 0% -> 25% -> 50% -> 75% -> 100% (same size, same
    in-distribution source otherwise) and record both ratio tracks
    per epoch. Evidence = the q50 (median) ratio stays near the clean
    epoch's level until the drifted share crosses 50% and climbs
    monotonically after, while the q90 ratio starts climbing at 25% —
    i.e. the pair reads as a quantitative contamination estimate, not
    a binary alarm."""
    import shutil

    from comp5339dataengineering_realtimefuelanalysis_spark.streaming.incremental_dedup import (  # noqa: E501
        StreamingIncrementalDedup,
    )

    docs = spark.read.parquet(f"{args.corpus}/documents.parquet").select(
        "doc_id", "text"
    )
    per_epoch = args.drift_epoch_rows
    n_in = args.drift_in_epochs
    workdir = os.path.join(args.workdir, "sem_drift_mixed")
    shutil.rmtree(workdir, ignore_errors=True)
    landing = os.path.join(workdir, "landing")
    os.makedirs(landing)

    d = StreamingIncrementalDedup(
        spark=spark,
        landing_dir=landing,
        silver_path=os.path.join(workdir, "silver"),
        checkpoint_dir=os.path.join(workdir, "chk"),
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        ),
        sem_index_path=os.path.join(workdir, "semidx"),
        sem_k=args.drift_sem_k,
    )

    drifted_text = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.substring(F.md5(w), 1, 8),
        ),
        " ",
    )
    fractions = [0.0, 0.25, 0.5, 0.75, 1.0]

    def land(lo: int, hi: int, frac: float) -> None:
        part = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        # doc_id % 4 < 4*frac drifts exactly that share of the epoch
        # (fractions are multiples of 0.25), deterministically
        drift_pred = (F.col("doc_id") % 4) < int(round(4 * frac))
        part = part.select(
            F.when(
                drift_pred, F.col("doc_id") + F.lit(10_000_000)
            ).otherwise(F.col("doc_id")).alias("doc_id"),
            F.when(drift_pred, drifted_text)
            .otherwise(F.col("text"))
            .alias("text"),
        )
        part.coalesce(1).write.mode("append").parquet(landing)

    for e in range(n_in):
        lo = e * per_epoch
        land(lo, lo + per_epoch, frac=0.0)
        q = d.start(available_now=True)
        q.awaitTermination(600)
        print(f"sem-drift-mixed clean epoch {e} done", file=sys.stderr)
    for i, frac in enumerate(fractions):
        lo = (n_in + i) * per_epoch
        land(lo, lo + per_epoch, frac=frac)
        q = d.start(available_now=True)
        q.awaitTermination(600)
        print(
            f"sem-drift-mixed frac={frac} epoch done", file=sys.stderr
        )
    rep = [
        r.asDict() for r in d.sem_drift_report(spark).collect()
    ]
    mixed = {
        frac: rep[n_in + i] for i, frac in enumerate(fractions)
    }
    return {
        "corpus": args.corpus,
        "rows_per_epoch": per_epoch,
        "clean_epochs": n_in,
        "sem_k": args.drift_sem_k,
        "per_epoch": rep,
        "ratio_by_drift_frac": {
            str(f): {
                "ratio": mixed[f]["ratio"],
                "ratio_q90": mixed[f]["ratio_q90"],
                "n": mixed[f]["n"],
            }
            for f in fractions
        },
        "q50_monotone_above_half": (
            mixed[0.5]["ratio"] <= mixed[0.75]["ratio"]
            <= mixed[1.0]["ratio"]
        ),
        "q90_moves_at_quarter": (
            mixed[0.25]["ratio_q90"] > mixed[0.0]["ratio_q90"]
        ),
        "q50_flat_at_quarter": (
            abs(mixed[0.25]["ratio"] - mixed[0.0]["ratio"])
            < (mixed[1.0]["ratio"] - mixed[0.0]["ratio"]) / 4
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scale_bench/x10")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--sem-drift", action="store_true",
                    help="run the centroid-staleness demo instead of "
                         "the per-epoch cost sweep")
    ap.add_argument("--sem-drift-mixed", action="store_true",
                    help="run the partial-drift discrimination demo "
                         "(drifted share stepping 0..100% per epoch)")
    ap.add_argument("--drift-epoch-rows", type=int, default=2000)
    ap.add_argument("--drift-in-epochs", type=int, default=3)
    ap.add_argument("--drift-out-epochs", type=int, default=3)
    ap.add_argument("--drift-sem-k", type=int, default=32)
    ap.add_argument("--sem", action="store_true",
                    help="enable the semantic screen in the per-epoch "
                         "sweep (sem_index_path set); records the block "
                         "as streaming_incremental_sem")
    ap.add_argument("--sem-k", type=int, default=32)
    ap.add_argument("--block-key", default=None,
                    help="override the artifact block key")
    ap.add_argument("--sequences", type=int, default=1,
                    help="independent full replays; per-epoch MIN across "
                         "sequences is reported (single-pass epoch times "
                         "on this host are steal-burst noisy, and an "
                         "epoch can't be re-run in isolation — state)")
    ap.add_argument("--workdir", default="/tmp/scale_stream")
    ap.add_argument(
        "--json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_MEASURED.json",
        ),
    )
    args = ap.parse_args()

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.streaming.incremental_dedup import (  # noqa: E501
        StreamingIncrementalDedup,
    )

    spark = get_spark("scale_stream")
    spark.sparkContext.setLogLevel("ERROR")

    if args.sem_drift or args.sem_drift_mixed:
        key = "sem_drift_mixed" if args.sem_drift_mixed else "sem_drift"
        block = (
            run_sem_drift_mixed(spark, args)
            if args.sem_drift_mixed
            else run_sem_drift(spark, args)
        )
        results = {}
        if os.path.exists(args.json):
            with open(args.json) as f:
                results = json.load(f)
        results[key] = block
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps({"written": args.json, key: block}))
        spark.stop()
        return

    docs = spark.read.parquet(f"{args.corpus}/documents.parquet")
    n_total = docs.count()
    per_epoch = n_total // args.epochs

    def run_sequence(seq: int) -> list[dict]:
        workdir = os.path.join(args.workdir, f"seq{seq}")
        shutil.rmtree(workdir, ignore_errors=True)
        landing = os.path.join(workdir, "landing")
        os.makedirs(landing)
        dedup = StreamingIncrementalDedup(
            spark=spark,
            landing_dir=landing,
            silver_path=os.path.join(workdir, "silver"),
            checkpoint_dir=os.path.join(workdir, "chk"),
            schema=SCHEMA,
            sem_index_path=(
                os.path.join(workdir, "semidx") if args.sem else None
            ),
            sem_k=(args.sem_k if args.sem else 8),
        )
        epochs = []
        for e in range(args.epochs):
            # last epoch takes the remainder — otherwise docs that were
            # never landed would be counted as "rejected" in the artifact
            lo = e * per_epoch
            hi = n_total if e == args.epochs - 1 else (e + 1) * per_epoch
            # one file per epoch -> one micro-batch; ids are globally
            # unique and near-dup targets reference a bounded id window,
            # so later epochs carry genuine cross-epoch duplicates of
            # admitted docs
            (
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(landing)
            )
            t0 = time.perf_counter()
            q = dedup.start(available_now=True)
            q.awaitTermination(600)
            dt = round(time.perf_counter() - t0, 3)
            n_silver = spark.read.parquet(dedup.silver_path).count()
            epochs.append(
                {
                    "epoch": e,
                    "batch_rows": hi - lo,
                    "sec": dt,
                    "silver_rows_after": n_silver,
                }
            )
            print(f"seq{seq} epoch {e}: {dt}s  silver={n_silver}",
                  file=sys.stderr)
        return epochs

    sequences = [run_sequence(s) for s in range(args.sequences)]
    # determinism across replays is itself part of the contract
    for seq in sequences[1:]:
        assert [e["silver_rows_after"] for e in seq] == [
            e["silver_rows_after"] for e in sequences[0]
        ], "replayed sequence admitted different docs"
    epochs = [
        {
            "epoch": e,
            "batch_rows": sequences[0][e]["batch_rows"],
            "sec": min(seq[e]["sec"] for seq in sequences),
            "runs": [seq[e]["sec"] for seq in sequences],
            "silver_rows_after": sequences[0][e]["silver_rows_after"],
        }
        for e in range(args.epochs)
    ]
    block = {
        "corpus": args.corpus,
        "n_total": n_total,
        "sequences": args.sequences,
        "epochs": epochs,
        "rejected_total": n_total - epochs[-1]["silver_rows_after"],
    }
    if args.sem:
        block["sem_k"] = args.sem_k
    results = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)
    block_key = args.block_key or (
        "streaming_incremental_sem" if args.sem
        else "streaming_incremental"
    )
    results[block_key] = block
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": args.json, "epochs": len(epochs)}))
    spark.stop()


if __name__ == "__main__":
    main()
