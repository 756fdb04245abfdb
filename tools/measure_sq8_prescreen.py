"""SQ8 pre-screen experiment for the streaming semantic screen.

Round 11 measured a PQ (m=8, ks=64) upper-bound pre-screen on the
exact-cosine work and REJECTED it: only 37% of pairs pruned at
threshold 0.9, not worth the extra pass (SCALE.md).  SQ8's
reconstruction error is ~25x smaller (measured flat recall 0.963 vs
PQ's 0.36 on this embedding family), so its SOUND cosine upper bound

    q . x  <=  q . recon(x) + |q| * R,     R^2 = sum_d e_d^2,
    e_d = max(step_d div 2, step_d - 1 - step_d div 2)

(midpoint reconstruction; e_d is the max in-cell distance to the
midpoint on the int64 grid) should sit far closer to the exact cosine.

The measured shape mirrors ``_semantic_screen``'s corpus screen
(streaming/incremental_dedup.py:1040-1063): a BATCH of query docs, each
probing its 2 nearest of 32 cells, scored against every index row in
the probed cells.  Two physical plans over the identical candidate
volume:

  * exact_all   — index svec columns scanned, one exact int64 dot per
                  candidate (today's plan);
  * prescreened — index CODE column scanned (dim one-byte codes), the
                  bound computed via a broadcast (qid, dim, code) LUT
                  join, survivors re-joined to the index svec for the
                  exact dot (the plan the gate would install).

Reported: prune rate at thresholds 0.9 / 0.75 / 0.6 (false_prune MUST
be 0 — the bound is sound or the gate is wrong), the bound slack
R/|x|, and interleaved min-of-3 wall for both plans.  Decision rule
(SCALE.md gets the note either way): wire the gate into
_semantic_screen only if prescreened beats exact_all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
    quantization as qz,
    similarity as sim,
    text as tx,
)

DIM = 64
CELLS = 32
PROBES = 2
BATCH = 250
THRESHOLDS = (0.9, 0.75, 0.6)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sq8_prescreen", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = tx.embed_text(docs, dim=DIM, seed="e").persist()
    n = emb.count()

    stats = qz.sq8_train(emb, dim=DIM).persist()
    stats.count()

    # R from the codebook alone (broadcast-sized): max in-cell distance
    # to the midpoint reconstruction per dim, root-sum-squared
    srow = stats.select(
        F.sqrt(F.sum(
            F.pow(F.greatest(
                F.expr("step div 2"),
                F.expr("step - 1 - (step div 2)"),
            ).cast("double"), F.lit(2.0))
        )).alias("R"),
        F.max("step").alias("max_step"),
    ).first()
    R = float(srow["R"])

    cents = sim.kmeans_train_centroids(
        emb, k=CELLS, iters=2, id_col="doc_id", unit_norm=True
    ).persist()
    cents.count()

    # ---- the at-rest index, both fidelities, cell-partitioned ----------
    tmp = f"/tmp/sq8_prescreen_{os.getpid()}"
    asg = sim.kmeans_assign(emb, cents, id_col="doc_id", dim=DIM).select(
        "doc_id", F.col("cluster_id").alias("cell"), "embedding"
    )
    full = asg.select(
        "doc_id", "cell", sim.scaled_vec(F.col("embedding")).alias("svec")
    )
    full = full.withColumn(
        "norm",
        F.sqrt(sim.dot_scaled(F.col("svec"), F.col("svec")).cast("double")),
    )
    full.write.mode("overwrite").partitionBy("cell").parquet(f"{tmp}/vecs")
    codes = qz.sq8_encode(emb, stats, id_col="doc_id", dim=DIM)
    (
        codes.join(asg.select("doc_id", "cell"), "doc_id")
        .join(full.select("doc_id", "norm"), "doc_id")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(f"{tmp}/codes")
    )
    vecs_idx = spark.read.parquet(f"{tmp}/vecs")
    codes_idx = spark.read.parquet(f"{tmp}/codes")

    # ---- the query batch: BATCH docs probing their PROBES nearest cells
    # max(1, ...) so corpora smaller than BATCH degrade to "every doc
    # is a query" instead of dividing by zero
    batch = emb.filter(
        F.col("doc_id") % max(1, n // BATCH) == 0
    ).select(
        F.col("doc_id").alias("qid"),
        sim.scaled_vec(F.col("embedding")).alias("q_svec"),
    )
    batch = batch.withColumn(
        "q_norm",
        F.sqrt(sim.dot_scaled(F.col("q_svec"),
                              F.col("q_svec")).cast("double")),
    )
    wcell = Window.partitionBy("qid").orderBy("cdist", "cid")
    probed = (
        batch.crossJoin(F.broadcast(cents))
        .withColumn(
            "cdist",
            sim.l2sq_scaled_unrolled(
                F.col("q_svec"), F.col("c_svec"), DIM, long_acc=True
            ),
        )
        .withColumn("cr", F.row_number().over(wcell))
        .filter(F.col("cr") <= PROBES)
        .select("qid", "q_svec", "q_norm", F.col("cid").alias("cell"))
        .persist()
    )
    n_batch = probed.select("qid").distinct().count()

    # ---- exact plan: probed cells' svec rows x broadcast batch --------
    def exact_all(thresh: float = 0.9):
        return (
            vecs_idx.join(F.broadcast(probed), "cell")
            .select(
                "qid", "doc_id",
                (sim.dot_scaled(F.col("q_svec"), F.col("svec"))
                 .cast("double") / (F.col("q_norm") * F.col("norm"))
                 ).alias("cos"),
            )
            .filter(F.col("cos") >= thresh)
        )

    # ---- prescreen plan: codes scan + LUT bound, survivors fetch svec -
    lutbase = stats.select(
        "dim", "vmin", "step",
        F.explode(F.sequence(F.lit(0), F.lit(255))).alias("code"),
    ).select(
        "dim", "code",
        F.expr("vmin + code * step + (step div 2)").alias("recon"),
    )
    qdims = probed.select(
        "qid", F.posexplode("q_svec").alias("dim", "qv")
    ).distinct()
    lut = qdims.join(F.broadcast(lutbase), "dim").select(
        "qid", "dim", "code", (F.col("qv") * F.col("recon")).alias("pd")
    )

    def prescreened(thresh: float = 0.9):
        qside = F.broadcast(
            probed.select("qid", "q_norm", "cell").distinct()
        )
        bound = (
            codes_idx.join(qside, "cell")
            .join(F.broadcast(lut), ["qid", "dim", "code"])
            .groupBy("qid", "doc_id", "cell", "q_norm", "norm")
            .agg(F.sum("pd").alias("qr_dot"))
            .withColumn(
                "cos_ub",
                (F.col("qr_dot").cast("double")
                 + F.col("q_norm") * F.lit(R))
                / (F.col("q_norm") * F.col("norm")),
            )
        )
        surv = bound.filter(F.col("cos_ub") >= thresh).select(
            "qid", "doc_id", "cell"
        )
        qvec = F.broadcast(probed.select("qid", "cell", "q_svec",
                                         "q_norm"))
        return (
            vecs_idx.join(surv, ["cell", "doc_id"])
            .join(qvec, ["qid", "cell"])
            .select(
                "qid", "doc_id",
                (sim.dot_scaled(F.col("q_svec"), F.col("svec"))
                 .cast("double") / (F.col("q_norm") * F.col("norm"))
                 ).alias("cos"),
            )
            .filter(F.col("cos") >= thresh)
        )

    # ---- prune-rate + soundness over the identical candidate set ------
    cand = (
        vecs_idx.join(F.broadcast(probed), "cell")
        .select(
            "qid", "doc_id",
            (sim.dot_scaled(F.col("q_svec"), F.col("svec")).cast("double")
             / (F.col("q_norm") * F.col("norm"))).alias("cos"),
        )
    )
    # bound per candidate via the prescreen plan at threshold 0 (no cut)
    bound_all = (
        codes_idx.join(
            F.broadcast(probed.select("qid", "q_norm", "cell").distinct()),
            "cell",
        )
        .join(F.broadcast(lut), ["qid", "dim", "code"])
        .groupBy("qid", "doc_id", "q_norm", "norm")
        .agg(F.sum("pd").alias("qr_dot"))
        .select(
            "qid", "doc_id",
            ((F.col("qr_dot").cast("double") + F.col("q_norm") * F.lit(R))
             / (F.col("q_norm") * F.col("norm"))).alias("cos_ub"),
        )
    )
    joined = cand.join(bound_all, ["qid", "doc_id"]).persist()
    tot = joined.count()

    out = {
        "n_vecs": n,
        "n_batch": n_batch,
        "probes": PROBES,
        "cells": CELLS,
        "candidates": tot,
        "R": round(R, 1),
        "max_step": int(srow["max_step"]),
        # unit-norm grid vectors: |x| ~ 1e9, so slack ~ R / 1e9
        "bound_slack_approx": round(R / 1e9, 6),
        "thresholds": {},
    }
    for t in THRESHOLDS:
        pruned = joined.filter(F.col("cos_ub") < t).count()
        false_prune = joined.filter(
            (F.col("cos_ub") < t) & (F.col("cos") >= t)
        ).count()
        hits = joined.filter(F.col("cos") >= t).count()
        out["thresholds"][str(t)] = {
            "pruned": pruned,
            "pruned_pct": round(100.0 * pruned / max(tot, 1), 2),
            "false_prune": false_prune,
            "true_hits": hits,
        }
        print(f"t={t}: pruned {pruned}/{tot} "
              f"({100.0 * pruned / max(tot, 1):.1f}%) "
              f"false_prune={false_prune} hits={hits}", file=sys.stderr)

    # ---- wall: interleaved min-of-3, both plans end-to-end ------------
    runs = {"exact_all": [], "prescreened": []}
    for _ in range(3):
        for name, fn in (("exact_all", exact_all),
                         ("prescreened", prescreened)):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    out["wall"] = {k: {"runs": v, "sec": min(v)} for k, v in runs.items()}
    ea = out["wall"]["exact_all"]["sec"]
    ps = out["wall"]["prescreened"]["sec"]
    out["wall"]["verdict"] = (
        "prescreen_pays" if ps < ea * 0.9 else
        "no_gain" if ps <= ea * 1.1 else "prescreen_costs"
    )
    # equal-output check: both plans admit the identical (qid, doc_id)
    ex = exact_all().select("qid", "doc_id")
    pr = prescreened().select("qid", "doc_id")
    out["admissions_equal"] = (
        ex.exceptAll(pr).count() == 0 and pr.exceptAll(ex).count() == 0
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
