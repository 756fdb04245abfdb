"""Interleaved A/B: the jaccard_verify_pairs ``shuffle_hash`` pin vs
letting Catalyst/AQE pick (``sets_hint=None``) at sf0.1.

Round 13 pinned the verify join's sets sides to ``shuffle_hash`` after a
measured x100 driver OOM (compressed stats passed the broadcast
threshold while the deserialized relation was GBs).  The same round's
driver bench showed the semantic-dedup family +0.4-0.9 s normalized —
but on a different calibration epoch, so pin cost and host drift were
confounded.  This separates them: both variants, interleaved in ONE
session (same epoch, same page cache), min-of-N each, over the exact
registry composition (same shingle persist, same LSH candidates, same
length-bound prune).

The pin stays regardless unless its sf0.1 cost exceeds ~20% (VERDICT
r13 next-round #5); this just apportions the regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
    dedup as dd,
)
from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
    release_tracked,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("AB_PASSES", "4"))
    spark = get_spark("ab_verify_hint")
    spark.sparkContext.setLogLevel("ERROR")

    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _SHINGLE_N, _NUM_HASHES, _BANDS, _LSH_MAX_BUCKET,
        _JACCARD_THRESHOLD, _docs_parallel,
    )

    def run_once(hint: str | None) -> float:
        docs = _docs_parallel(spark, sf_dir)
        sh = dd.shingles(docs, n=_SHINGLE_N, distinct=False)
        cands = dd.minhash_lsh_pairs(
            docs, n=_SHINGLE_N, num_hashes=_NUM_HASHES, bands=_BANDS,
            shingles_df=sh, max_bucket=_LSH_MAX_BUCKET,
        )
        t0 = time.perf_counter()
        dd.jaccard_verify_pairs(
            docs, cands, n=_SHINGLE_N, threshold=_JACCARD_THRESHOLD,
            shingles_df=sh, sets_hint=hint,
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_tracked()
        return round(dt, 3)

    # warm-up once (codegen + page cache), discarded
    run_once("shuffle_hash")

    runs: dict[str, list[float]] = {"pinned": [], "unpinned": []}
    for _ in range(passes):
        runs["pinned"].append(run_once("shuffle_hash"))
        runs["unpinned"].append(run_once(None))
    out = {
        "sf_dir": sf_dir,
        "passes": passes,
        "pinned": {"runs": runs["pinned"], "sec": min(runs["pinned"])},
        "unpinned": {"runs": runs["unpinned"],
                     "sec": min(runs["unpinned"])},
    }
    out["pin_cost_pct"] = round(
        100.0 * (out["pinned"]["sec"] - out["unpinned"]["sec"])
        / out["unpinned"]["sec"],
        1,
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
