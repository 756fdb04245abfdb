"""Recall-vs-cost curves for the ANN family: brute-force cosine top-k as
ground truth, hyperplane-bucket IVF (`ivf_topk`, multi-probe LSH) and
learned-centroid IVF (`ivf_kmeans_topk`, nprobe) across probe counts.

Probe cost in both layouts is a partition-pruned scan (probes/2^planes of
the corpus for hyperplanes; nprobe/k cells for k-means), so this is the
recall side of the trade SCALE.md's flat probe-cost curves measure.

Usage: python tools/ann_recall.py [sf_dir] — prints a markdown table and
appends nothing; paste the numbers where needed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        similarity as sim,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.base import (
        load_table,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _ANN_PLANES, _KMEANS_K, _KMEANS_ITERS, _TOPK_K, _TOPK_NQ,
    )

    spark = get_spark("ann_recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    qs = emb.filter(F.col("vec_id") < _TOPK_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = {
        (r.qid, r.vec_id)
        for r in sim.cosine_topk(qs, emb, k=_TOPK_K).collect()
    }

    import tempfile

    root = tempfile.mkdtemp(prefix="ann_recall_")
    hp_path = os.path.join(root, "hp")
    km_path = os.path.join(root, "km")
    sim.ivf_write(emb, hp_path, planes=_ANN_PLANES)
    cents = sim.kmeans_train_centroids(
        emb, k=_KMEANS_K, iters=_KMEANS_ITERS
    )
    sim.ivf_write_kmeans(emb, cents, km_path)

    print(f"corpus {n_vecs} vecs, {_TOPK_NQ} queries, k={_TOPK_K}, "
          f"planes={_ANN_PLANES} (2^{_ANN_PLANES} buckets), "
          f"kmeans k={_KMEANS_K} iters={_KMEANS_ITERS}\n")
    print("| index | probes | scan fraction | recall@10 | sec |")
    print("|---|---|---|---|---|")

    def measure(label, frac, fn):
        t0 = time.perf_counter()
        got = {(r.qid, r.vec_id) for r in fn().collect()}
        dt = time.perf_counter() - t0
        rec = len(got & truth) / len(truth)
        print(f"| {label} | {frac} | {rec:.3f} | {dt:.2f} |")

    # ivf_topk's multi-probe flips ONE plane per extra probe, so the
    # reachable probe count caps at planes+1 — asking for more would
    # mislabel the scan fraction of a measurement that never widened
    for p in (1, 2, 4, 8):
        if p > _ANN_PLANES + 1:
            break
        measure(
            f"hyperplane | {p}",
            f"{p}/{2 ** _ANN_PLANES}",
            lambda p=p: sim.ivf_topk(
                spark, hp_path, qs, k=_TOPK_K, planes=_ANN_PLANES,
                probes=p,
            ),
        )
    for p in (1, 2, 4, 8):
        if p > _KMEANS_K:
            break
        measure(
            f"k-means | {p}",
            f"{p}/{_KMEANS_K}",
            lambda p=p: sim.ivf_kmeans_topk(
                spark, km_path, qs, cents, k=_TOPK_K, probes=p
            ),
        )

    # quantization tiers (round 13): how much recall each compression
    # level costs on top of the blocking. SQ8 (4x, per-dim bytes)
    # should be near-lossless; flat PQ ADC (64x, m codes) pays real
    # recall; IVF-PQ+rerank recovers it by exact-rescoring a candidate
    # pool (candidates/n of vector bytes).
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        quantization as qz,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _PQ_M, _PQ_KS, _PQ_ITERS, _EMB_DIM,
    )

    # control: EXACT squared-L2 top-k vs the cosine ground truth — the
    # quantized tiers rank by L2-to-reconstruction, so any gap between
    # this row and 1.000 is metric mismatch (vectors are not exactly
    # unit-norm), not quantization loss; a quantizer matching this row
    # is lossless for retrieval purposes. Diagnostic-tool-only local
    # compute (2k x 64 floats).
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    qvecs = {r.qid: r.qvec for r in qs.collect()}
    l2got = set()
    for qid, qv in qvecs.items():
        d = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, v)), i)
            for i, v in vecs.items()
        )
        l2got |= {(qid, i) for _, i in d[:_TOPK_K]}
    print(f"| exact-L2 control | all | 1 (raw floats) | "
          f"{len(l2got & truth) / len(truth):.3f} | - |")

    stats = qz.sq8_train(emb, dim=_EMB_DIM)
    sq_codes = qz.sq8_encode(emb, stats, dim=_EMB_DIM).persist()
    measure(
        "sq8 flat | all",
        "1 (codes 4x smaller)",
        lambda: qz.sq8_topk(sq_codes, stats, qs, k=_TOPK_K, dim=_EMB_DIM),
    )
    books = qz.pq_train(emb, m=_PQ_M, ks=_PQ_KS, iters=_PQ_ITERS,
                        dim=_EMB_DIM)
    pq_codes = qz.pq_encode(emb, books, m=_PQ_M, dim=_EMB_DIM).persist()
    measure(
        "pq flat adc | all",
        "1 (codes 64x smaller)",
        lambda: qz.pq_adc_topk(pq_codes, books, qs, k=_TOPK_K,
                               m=_PQ_M, dim=_EMB_DIM),
    )
    pq_path = os.path.join(root, "ivfpq")
    qz.ivf_pq_write(emb, cents, books, pq_path, m=_PQ_M, dim=_EMB_DIM)
    for p, cand in ((2, 50), (4, 100)):
        measure(
            f"ivf-pq rerank | {p}",
            f"{p}/{_KMEANS_K} cells, {cand} cand",
            lambda p=p, cand=cand: qz.ivf_pq_rerank_topk(
                spark, pq_path, books, qs, cents, emb, k=_TOPK_K,
                probes=p, candidates=cand, m=_PQ_M, dim=_EMB_DIM,
            ),
        )

    sq8_path = os.path.join(root, "ivfsq8")
    qz.ivf_sq8_write(emb, cents, stats, sq8_path, dim=_EMB_DIM)
    for p in (1, 2, 4):
        measure(
            f"ivf-sq8 | {p}",
            f"{p}/{_KMEANS_K} cells (codes 4x smaller)",
            lambda p=p: qz.ivf_sq8_topk(
                spark, sq8_path, stats, qs, cents, k=_TOPK_K,
                probes=p, dim=_EMB_DIM,
            ),
        )

    # PRODUCTION codebooks (m=8, ks=256 — 1 B/code, the Jégou et al.
    # operating point the registry's tiny oracle-bounded m=4/ks=16
    # stands in for): substantiates the claim that flat-ADC recall is
    # a codebook-size artifact, not a PQ ceiling.
    mp, ksp = 8, 256
    books_p = qz.pq_train(emb, m=mp, ks=ksp, iters=_PQ_ITERS,
                          dim=_EMB_DIM)
    pq_codes_p = qz.pq_encode(emb, books_p, m=mp, dim=_EMB_DIM).persist()
    measure(
        f"pq flat adc (m={mp},ks={ksp}) | all",
        "1 (codes 8x smaller)",
        lambda: qz.pq_adc_topk(pq_codes_p, books_p, qs, k=_TOPK_K,
                               m=mp, dim=_EMB_DIM),
    )
    pqp_path = os.path.join(root, "ivfpq_prod")
    qz.ivf_pq_write(emb, cents, books_p, pqp_path, m=mp, dim=_EMB_DIM)
    for p, cand in ((2, 50), (4, 100)):
        measure(
            f"ivf-pq rerank (m={mp},ks={ksp}) | {p}",
            f"{p}/{_KMEANS_K} cells, {cand} cand",
            lambda p=p, cand=cand: qz.ivf_pq_rerank_topk(
                spark, pqp_path, books_p, qs, cents, emb, k=_TOPK_K,
                probes=p, candidates=cand, m=mp, dim=_EMB_DIM,
            ),
        )

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
