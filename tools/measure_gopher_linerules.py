"""Before/after micro-benchmark for the Gopher per-line rules.

Round-12 VERDICT flagged the bullet/ellipsis line-fraction rules as
interpreted HOF lambdas (`F.filter(lines, lambda x: x.rlike(...))` —
per-element interpreted evaluation, ~µs/elem); round 13 replaced them
with whole-text multiline `regexp_count` expressions (one codegen pass
per doc). This measures BOTH expression forms over the same scale
corpus in one session, interleaved min-of-N, so the comparison is
host-noise-fair — plus the end-to-end doc_gopher_rules timing for the
record.

Usage: python tools/measure_gopher_linerules.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_bench/x10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark

    spark = get_spark("measure-gopher-linerules")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # The synthetic corpus is single-line; web text is not. Break each
    # doc into ~6-word lines (every 6th space -> newline, materialized
    # once) so the per-LINE cost the two forms differ on actually
    # exists — this is the shape the rules exist for.
    docs = docs.select(
        "doc_id",
        F.regexp_replace(
            "text", r"((?:\S+ ){5}\S+) ", "$1\n"
        ).alias("text"),
    ).persist()
    n = docs.count()
    lines_per_doc = docs.select(
        F.avg(F.size(F.split("text", "\n")))
    ).first()[0]
    print(f"docs={n} avg_lines={lines_per_doc:.1f}", flush=True)

    t = F.coalesce(F.col("text"), F.lit(""))
    lines = F.split(t, "\n")
    forms = {
        "hof_lambda": docs.select(
            F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
                .alias("b"),
            F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
                .alias("e"),
        ),
        "regexp_count": docs.select(
            F.regexp_count(t, F.lit(r"(?m)^[^\S\n]*[-*•]")).alias("b"),
            F.regexp_count(t, F.lit(r"(?m)(\.\.\.|…)[^\S\n]*$"))
                .alias("e"),
        ),
    }
    results: dict[str, list[float]] = {k: [] for k in forms}
    for _ in range(passes):
        for name, frame in forms.items():  # interleaved: shared noise
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 3))
    for name, runs in results.items():
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
