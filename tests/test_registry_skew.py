"""Registry-level skew-guard test: on a degenerate corpus (a boilerplate
cluster far larger than the banded-bucket caps), the LSH pair compositions
must drop the oversized buckets — pair generation stays sub-quadratic —
and the mirrored oracle SQL (QUALIFY bucket cap) must agree row-for-row,
proving the cap is replayed exactly, not just approximated."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
    REGISTRY,
)

BOILERPLATE = "terms of service apply to all visitors of this site"
NEARDUP = "the quick brown fox jumps over the lazy dog every day"
UNIQUES = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten eleven",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
    "pack my box with five dozen liquor jugs right now please",
    "sphinx of black quartz judge my vow said the old raven",
]


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    # 2100 identical boilerplate docs: over both caps (_LSH_MAX_BUCKET=256,
    # _SIMHASH_MAX_BUCKET=2000), so every band bucket they form is dropped.
    rows = [(i, BOILERPLATE) for i in range(2100)]
    rows += [(3000, NEARDUP), (3001, NEARDUP)]
    rows += [(4000 + i, t) for i, t in enumerate(UNIQUES)]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "synthetic"
    df["n_chars"] = df["text"].str.len()
    d = tmp_path_factory.mktemp("degenerate_sf")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle_rows(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


@pytest.mark.parametrize(
    "name", ["doc_lsh_pairs", "doc_simhash_pairs", "doc_lsh_verified_pairs"]
)
def test_skew_cap_engages_and_oracle_agrees(spark, degenerate_sf_dir, name):
    qd = REGISTRY[name]
    spark_rows = {
        tuple(r) for r in qd.fn(spark, degenerate_sf_dir).collect()
    }
    oracle_rows = {
        tuple(r) for r in _oracle_rows(degenerate_sf_dir, qd.oracle)
    }
    # no pair touches the capped boilerplate cluster (ids < 3000)
    assert not any(r[0] < 3000 or r[1] < 3000 for r in spark_rows), name
    # the small near-dup bucket survives the cap
    assert any(r[0] == 3000 and r[1] == 3001 for r in spark_rows), name
    # and the QUALIFY mirror reproduces the capped result exactly
    assert spark_rows == oracle_rows, name
