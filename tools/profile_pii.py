"""Decompose doc_pii_scrub's cost: extraction regexes vs the HOF fold.

SCALE.md's 30x table shows doc_pii_scrub growing 7.1x — the steepest
map-only curve in the engine. Two candidate culprits: the six
regexp_extract_all / regexp_replace scans over the full text (codegen,
but each is a full re2 pass), or the two-pass interpreted F.aggregate
fold in _replace_each (operators/text.py) that rewrites card/secret
matches. This times an ablation ladder over a scaled corpus, each rung
adding one ingredient, so the per-stage split is (rung_i - rung_{i-1}):

  counts   — the four _count_matches extract-all scans + match-array
             sizes (extraction only, no text rewritten)
  replaces — counts + the three plain regexp_replace stages
             (email/phone/ip — codegen, no HOF)
  matches  — replaces + card_matches/secret_matches array construction
             (filter HOFs: Luhn aggregate per candidate, rlike x3 +
             char-distinct per secret candidate)
  full     — the production scrub_pii (adds the two-pass _replace_each
             folds for cards and secrets)

Usage: python tools/profile_pii.py [--corpus /tmp/scale_bench/x30]
       [--passes 3] [--json SCALE_MEASURED.json]

Merges a "pii_profile" block into the scale artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scale_bench/x30")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_MEASURED.json",
        ),
    )
    args = ap.parse_args()

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        text as tx,
    )

    spark = get_spark("profile_pii")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.corpus}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()

    email_pat, email_tok = tx.PII_PATTERNS["email"]
    phone_pat, phone_tok = tx.PII_PATTERNS["phone"]
    ip_pat, ip_tok = tx.PII_PATTERNS["ip"]
    c = F.col("text")

    def counts(df):
        return df.select(
            "doc_id",
            tx._count_matches(c, email_pat).alias("n_email"),
            tx._count_matches(c, tx.CARD_CANDIDATE).alias("n_cardcand"),
            tx._count_matches(c, phone_pat).alias("n_phone"),
            tx._count_matches(c, ip_pat).alias("n_ip"),
            tx._count_matches(c, tx.SECRET_CANDIDATE).alias(
                "n_secretcand"
            ),
        )

    def replaces(df):
        t = F.regexp_replace(c, email_pat, email_tok)
        t = F.regexp_replace(t, phone_pat, phone_tok)
        t = F.regexp_replace(t, ip_pat, ip_tok)
        return counts(df).join(
            df.select("doc_id", t.alias("clean_text")), "doc_id"
        )

    def matches(df):
        t = F.regexp_replace(c, email_pat, email_tok)
        s = df.select(
            "doc_id",
            t.alias("_t1"),
            tx.card_matches(t).alias("_cards"),
        )
        t2 = F.regexp_replace(
            F.regexp_replace(F.col("_t1"), phone_pat, phone_tok),
            ip_pat,
            ip_tok,
        )
        s = s.select(
            "doc_id",
            F.size("_cards").cast("long").alias("n_card"),
            t2.alias("_t3"),
            tx.secret_matches(t2).alias("_secrets"),
        )
        return s.select(
            "doc_id",
            "n_card",
            F.length("_t3").alias("len_t3"),
            F.size("_secrets").cast("long").alias("n_secret"),
        )

    def full(df):
        return tx.scrub_pii(df)

    rungs = {
        "counts": counts,
        "replaces": replaces,
        "matches": matches,
        "full": full,
    }
    out: dict = {"corpus": args.corpus, "n_docs": n, "rungs": {}}
    for name, fn in rungs.items():
        runs = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out["rungs"][name] = {"runs": runs, "sec": min(runs)}
        print(f"{name}: {out['rungs'][name]}", file=sys.stderr)

    results = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)
    results["pii_profile"] = out
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": args.json}))
    spark.stop()


if __name__ == "__main__":
    main()
