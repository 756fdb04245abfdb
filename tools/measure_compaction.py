"""Measured effect of epoch compaction on incremental-dedup screening.

A long-lived incremental-dedup deployment accretes one silver partition
(plus band-index partitions) per micro-batch epoch. This tool builds a
corpus the accreted way — N tiny epochs through the production _sink —
then measures per-batch screening cost and store file counts BEFORE and
AFTER compact_epochs folds the committed partitions, holding corpus
CONTENT constant. The claim under test: screening cost is driven by
corpus size, not partition count, ONLY when partition/file count is
bounded — compaction restores that bound after long accretion.

Usage: python tools/measure_compaction.py [n_epochs=100] [probe_batches=5]
Prints one JSON object; merge into SCALE_MEASURED.json as
epoch_compaction.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import LongType, StringType, StructField, StructType

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.streaming.incremental_dedup import (
    StreamingIncrementalDedup,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
)


def _doc(i: int) -> str:
    # 40 words, deterministic per doc, near-zero cross-doc similarity
    return " ".join(
        WORDS[(i * 7 + j * 13 + i * j) % len(WORDS)] + str((i * 31 + j) % 97)
        for j in range(40)
    )


def _count_files(path: str) -> int:
    n = 0
    for _, _, files in os.walk(path):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def _probe(spark, d, start_id: int, start_epoch: int, k: int) -> list:
    secs = []
    for b in range(k):
        rows = [
            (start_id + b * 10 + j, _doc(start_id + b * 10 + j))
            for j in range(10)
        ]
        t0 = time.perf_counter()
        d._sink(spark.createDataFrame(rows, SCHEMA),
                epoch_id=start_epoch + b)
        secs.append(round(time.perf_counter() - t0, 3))
    return secs


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    probes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("measure_compaction")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="compact_measure_")
    d = StreamingIncrementalDedup(
        spark=spark,
        landing_dir=os.path.join(tmp, "landing"),
        silver_path=os.path.join(tmp, "silver"),
        checkpoint_dir=os.path.join(tmp, "chk"),
        schema=SCHEMA,
        band_index_path=os.path.join(tmp, "bandidx"),
    )
    t0 = time.perf_counter()
    for e in range(n_epochs):
        rows = [(e * 10 + j, _doc(e * 10 + j)) for j in range(10)]
        d._sink(spark.createDataFrame(rows, SCHEMA), epoch_id=e)
    accrete_sec = round(time.perf_counter() - t0, 1)

    files_before = {
        "silver": _count_files(d.silver_path),
        "band_index": _count_files(d.band_index_path),
    }
    before = _probe(spark, d, 10_000, n_epochs, probes)

    t0 = time.perf_counter()
    res = d.compact_epochs(spark)
    compact_sec = round(time.perf_counter() - t0, 2)
    files_after = {
        "silver": _count_files(d.silver_path),
        "band_index": _count_files(d.band_index_path),
    }
    after = _probe(spark, d, 20_000, n_epochs + probes, probes)

    n_silver = spark.read.parquet(d.silver_path).count()
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "n_epochs": n_epochs,
        "accrete_sec": accrete_sec,
        "compact": res,
        "compact_sec": compact_sec,
        "files_before": files_before,
        "files_after": files_after,
        "probe_batch_sec_before": before,
        "probe_batch_sec_after": after,
        "min_before": min(before),
        "min_after": min(after),
        "silver_rows_end": n_silver,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
