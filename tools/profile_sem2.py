"""Stage-by-stage wall decomposition of doc_semantic_dedup_2l.

The post-fan-out sweep inverted the 1L/2L crossover (SCALE_MEASURED:
1L 48.5 s vs 2L 93.6 s at x10) — this times each 2L stage in
isolation so the regression is attributable: embed materialization,
each level's training, each level's probe assignment, the block join,
pair generation, and connected components. Stages are forced with
count() on a persisted frame, mirroring the registry's persist points.

Usage: python tools/profile_sem2.py [--corpus /tmp/scale_bench/x10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scale_bench/x10")
    args = ap.parse_args()

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        dedup as dd,
        similarity as sim,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans import registry_llm as rl

    spark = get_spark()
    t0 = time.monotonic()
    docs = rl._docs_parallel(spark, args.corpus)
    emb = (
        rl._text_emb_for(spark, args.corpus)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumnRenamed("doc_id", "vec_id")
        .persist()
    )
    n = docs.count()
    emb.count()
    stages = {"embed": time.monotonic() - t0}
    print(f"n={n}  embed: {stages['embed']:.1f}s", flush=True)

    k = rl._sem2_k(n)
    print(f"k per level = {k}", flush=True)

    t = time.monotonic()
    ca = sim.kmeans_train_centroids(
        emb, k=k, iters=rl._SEM_ITERS, unit_norm=True
    ).persist()
    ca.count()
    stages["train_a"] = time.monotonic() - t
    print(f"train_a: {stages['train_a']:.1f}s", flush=True)

    t = time.monotonic()
    cb = sim.kmeans_train_centroids(
        emb, k=k, iters=rl._SEM_ITERS, unit_norm=True, seed_order="desc"
    ).persist()
    cb.count()
    stages["train_b"] = time.monotonic() - t
    print(f"train_b: {stages['train_b']:.1f}s", flush=True)

    t = time.monotonic()
    aa = (
        sim.kmeans_assign_probes(
            emb, ca, probes=rl._SEM2_PROBES, unit_norm=True
        )
        .select("vec_id", F.col("cluster_id").alias("cell_a"))
        .persist()
    )
    aa.count()
    stages["probe_a"] = time.monotonic() - t
    print(f"probe_a: {stages['probe_a']:.1f}s", flush=True)

    t = time.monotonic()
    ab = (
        sim.kmeans_assign_probes(
            emb, cb, probes=rl._SEM2_PROBES, unit_norm=True
        )
        .select("vec_id", F.col("cluster_id").alias("cell_b"))
        .persist()
    )
    ab.count()
    stages["probe_b"] = time.monotonic() - t
    print(f"probe_b: {stages['probe_b']:.1f}s", flush=True)

    t = time.monotonic()
    assigned = (
        emb.join(aa, "vec_id")
        .join(ab, "vec_id")
        .withColumn("block", F.concat_ws("_", "cell_a", "cell_b"))
        .persist()
    )
    n_assigned = assigned.count()
    stages["block_join"] = time.monotonic() - t
    print(
        f"block_join: {stages['block_join']:.1f}s ({n_assigned} rows)",
        flush=True,
    )

    t = time.monotonic()
    pairs = sim.embedding_near_dup_pairs(
        assigned,
        threshold=rl._SEM_THRESHOLD,
        dim=rl._TEXT_EMB_DIM,
        block_col="block",
        unit_norm=True,
    ).persist()
    n_pairs = pairs.count()
    stages["pairs"] = time.monotonic() - t
    print(f"pairs: {stages['pairs']:.1f}s ({n_pairs} pairs)", flush=True)

    t = time.monotonic()
    cc = dd.connected_components(pairs, "id_a", "id_b")
    out = (
        docs.select("doc_id")
        .join(
            cc.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("cluster_id"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    n_out = out.count()
    stages["cc_out"] = time.monotonic() - t
    print(f"cc+out: {stages['cc_out']:.1f}s ({n_out} rows)", flush=True)

    total = time.monotonic() - t0
    print(f"TOTAL: {total:.1f}s  breakdown: "
          + " ".join(f"{k2}={v:.1f}" for k2, v in stages.items()),
          flush=True)


if __name__ == "__main__":
    main()
