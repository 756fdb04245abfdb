"""Per-stage timing breakdown for q_corpus_curation_pipeline.

Each stage is materialized (noop write for plain frames; the persists the
pipeline itself uses stay in place, so later stages see the same cached
inputs as the production plan). Prints one JSON object of stage -> sec.

Usage: python tools/profile_curation.py [sf_dir] [n_reps]
Timings are min-of-N (default 2) per the host-variance policy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
    release_tracked,
    tracked_persist,
)
from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
    dedup as dd,
    packing as pk,
    selection as sel,
    text as tx,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans import registry_llm as rl


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def run_once(spark, sf_dir: str) -> dict[str, float]:
    stages: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 3)
        return out

    docs = rl._docs_parallel(spark, sf_dir)
    probe = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)

    prof = tracked_persist(
        train.select(
            "doc_id",
            "text",
            tx.lang_id("text").alias("lang"),
            tx.quality_score("text").alias("quality"),
        )
    )
    clock("1_profile", lambda: _mat(prof))
    gated = prof.filter(
        (F.col("quality") >= rl._QUALITY_KEEP) & (F.col("lang") != "unknown")
    )
    kept1 = tracked_persist(
        dd.dedup_exact(gated)
        .filter(F.col("is_canonical"))
        .select("doc_id", "text", "lang")
    )
    clock("2_gate_exact_dedup", lambda: _mat(kept1))
    sh = tracked_persist(
        dd.shingles(kept1, n=rl._SHINGLE_N, distinct=False)
    )
    clock("3_shingles", lambda: _mat(sh))
    cands = dd.minhash_lsh_pairs(
        kept1, n=rl._SHINGLE_N, num_hashes=rl._NUM_HASHES,
        bands=rl._BANDS, shingles_df=sh, max_bucket=rl._LSH_MAX_BUCKET,
    )
    pairs = dd.jaccard_verify_pairs(
        kept1, cands, n=rl._SHINGLE_N,
        threshold=rl._JACCARD_THRESHOLD, shingles_df=sh,
    )
    clock("4_lsh_verify_pairs", lambda: _mat(pairs))
    cc = clock(
        "5_connected_components",
        lambda: dd.connected_components(pairs, "id_a", "id_b"),
    )
    non_reps = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept2 = tracked_persist(kept1.join(non_reps, "doc_id", "left_anti"))
    clock("6_drop_dup_members", lambda: _mat(kept2))
    csh = tracked_persist(dd.shingles(kept2, n=rl._SHINGLE_N))
    clock("7_corpus_shingles", lambda: _mat(csh))
    contam = dd.ngram_overlap_pairs(
        probe, kept2, n=rl._SHINGLE_N, min_frac=rl._CONTAM_MIN_FRAC,
        max_df=rl._JACCARD_MAX_DF, corpus_shingles_df=csh,
    )
    dirty = contam.select(F.col("corpus_id").alias("doc_id")).distinct()
    kept3 = tracked_persist(kept2.join(dirty, "doc_id", "left_anti"))
    clock("8_contamination_screen", lambda: _mat(kept3))
    samp = sel.stratified_sample(
        kept3.select("doc_id", "lang"), "lang", rl._SAMPLE_RATES
    )
    kept4 = kept3.join(samp.select("doc_id"), "doc_id")
    clock(
        "9_sample_pack",
        lambda: _mat(pk.pack_manifest(kept4, ctx_len=rl._PACK_CTX)),
    )
    stages["total"] = round(sum(stages.values()), 3)
    return stages


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("profile_curation")
    spark.sparkContext.setLogLevel("ERROR")
    best: dict[str, float] = {}
    for _ in range(reps):
        stages = run_once(spark, sf_dir)
        release_tracked()
        for k, v in stages.items():
            best[k] = min(best.get(k, v), v)
    print(json.dumps(best, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
