"""Experiment: subspace (IMI-style) level decorrelation for 2L dedup.

The measured 2L candidate volume at x10 is 9.0M pairs — ~10x the
independent-clustering design value (~0.9M). Root cause: both levels
are k-means over the SAME full-space vectors (different seeds), so
cell boundaries align and the product of the two partitions doesn't
multiply down. The inverted-multi-index shape (Babenko & Lempitsky:
product of codebooks over DISJOINT dimension subspaces) decorrelates
by construction: level A clusters dims 1..d/2, level B dims
d/2+1..d.

This measures, side by side at a given scale: candidate pairs, pair
recall vs the single-level dup set, and stage wall times, for
  full  — the current full-space two-seed product blocking
  imi   — subspace-split product blocking (same k, same probes)

Usage: python tools/profile_sem2_imi.py [--corpus /tmp/scale_bench/x10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_blocks(spark, emb, k, mode, half):
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        similarity as sim,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans import (
        registry_llm as rl,
    )

    t0 = time.monotonic()
    if mode == "imi":
        lo = emb.select(
            "vec_id", F.slice("embedding", 1, half).alias("embedding")
        )
        hi = emb.select(
            "vec_id",
            F.slice("embedding", half + 1, half).alias("embedding"),
        )
        srcs = [(lo, "asc", half), (hi, "asc", half)]
    else:
        srcs = [(emb, "asc", 2 * half), (emb, "desc", 2 * half)]
    cells = []
    for i, (src, order, dim) in enumerate(srcs):
        c = sim.kmeans_train_centroids(
            src, k=k, iters=rl._SEM_ITERS, unit_norm=True,
            seed_order=order, dim=dim,
        ).persist()
        c.count()
        pr = (
            sim.kmeans_assign_probes(
                src, c, probes=rl._SEM2_PROBES, unit_norm=True, dim=dim
            )
            .select(
                "vec_id", F.col("cluster_id").alias(f"cell_{i}")
            )
            .persist()
        )
        pr.count()
        cells.append(pr)
    assigned = (
        emb.join(cells[0], "vec_id")
        .join(cells[1], "vec_id")
        .withColumn("block", F.concat_ws("_", "cell_0", "cell_1"))
        .persist()
    )
    assigned.count()
    return assigned, time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scale_bench/x10")
    args = ap.parse_args()

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        dedup as dd,
        similarity as sim,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans import (
        registry, registry_llm as rl,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
        release_tracked,
    )

    spark = get_spark()
    docs = rl._docs_parallel(spark, args.corpus)
    emb = (
        rl._text_emb_for(spark, args.corpus)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumnRenamed("doc_id", "vec_id")
        .persist()
    )
    n = docs.count()
    emb.count()
    k = rl._sem2_k(n)
    half = rl._TEXT_EMB_DIM // 2
    print(f"n={n} k={k}", flush=True)

    print("computing 1L dup set (ground truth)...", flush=True)
    d1 = {
        r.doc_id
        for r in registry.REGISTRY["doc_semantic_dedup"]
        .fn(spark, args.corpus)
        .filter("NOT keep")
        .collect()
    }
    release_tracked()
    print(f"1L dups: {len(d1)}", flush=True)

    for mode in ("full", "imi"):
        assigned, t_block = build_blocks(spark, emb, k, mode, half)
        bs = assigned.groupBy("block").count()
        cand = bs.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
        ).collect()[0][0]
        t0 = time.monotonic()
        pairs = sim.embedding_near_dup_pairs(
            assigned,
            threshold=rl._SEM_THRESHOLD,
            dim=rl._TEXT_EMB_DIM,
            block_col="block",
            unit_norm=True,
        ).persist()
        np_ = pairs.count()
        t_pairs = time.monotonic() - t0
        t0 = time.monotonic()
        cc = dd.connected_components(pairs, "id_a", "id_b")
        dups = {
            r.node
            for r in cc.filter(F.col("node") != F.col("component"))
            .select("node")
            .collect()
        }
        t_cc = time.monotonic() - t0
        rec = len(dups & d1) / max(1, len(d1))
        print(
            f"{mode}: cand={int(cand)} pairs={np_} dups={len(dups)} "
            f"recall_of_1l={rec:.4f} block={t_block:.1f}s "
            f"pairs_t={t_pairs:.1f}s cc={t_cc:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
