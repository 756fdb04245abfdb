"""Smoke tests for the driver-facing registry: every query runs at sf0.001,
returns a stable schema, and the entry() flagship returns rows."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod
from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
    ATTESTATION_WINDOW,
    REGISTRY,
    last_attested_round,
)

from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)


def test_attestation_rotation_keeps_window_fresh():
    """The driver attests only the first ATTESTATION_WINDOW registry
    entries per round. The generated rotation must guarantee no query goes
    unattested two rounds running: every entry rotated beyond the window
    must carry an attestation from the latest or next-to-latest recorded
    round."""
    last = last_attested_round(REGISTRY)
    latest = max(last.values())
    if latest < 0:  # fresh clone, no correctness artifacts yet
        return
    names = list(REGISTRY)
    # plan-changed (FORCE_ATTEST-pending) entries take the head; after
    # them, never-attested and stalest entries must iterate first
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
        FORCE_ATTEST,
    )

    forced = [
        n for n in names
        if n in FORCE_ATTEST and last[n] < FORCE_ATTEST[n]
    ]
    assert names[: len(forced)] == forced
    rounds_in_order = [last[n] for n in names[len(forced):]]
    assert rounds_in_order == sorted(rounds_in_order)
    stale = [
        n for n in names[ATTESTATION_WINDOW:] if last[n] < latest - 1
    ]
    assert not stale, (
        f"queries beyond the {ATTESTATION_WINDOW}-row driver window with "
        f"no attestation in rounds {latest - 1}-{latest}: {stale}"
    )


def test_curation_pipeline_sem_mode_auto_switches(spark, monkeypatch):
    """sem_mode='auto' picks single-level below the crossover and the
    two-level product blocking above it: with the crossover forced to
    0, auto must reproduce the pinned-2l pipeline exactly; at real
    corpus sizes (below 50k survivors) it must reproduce pinned-1l."""
    from comp5339dataengineering_realtimefuelanalysis_spark.plans import (
        registry_llm as rl,
    )

    def run(**kw):
        return sorted(
            map(
                tuple,
                rl.q_corpus_curation_pipeline(
                    spark, SF_SMOKE, **kw
                ).collect(),
            )
        )

    auto_small = run(sem_mode="auto")
    assert auto_small == run(sem_mode="1l")
    monkeypatch.setattr(rl, "_SEM_MODE_CROSSOVER", 0)
    assert run(sem_mode="auto") == run(sem_mode="2l")


def test_pipeline_banding_pinned_to_knee(monkeypatch):
    """The pipeline's stage-5 banding is the measured knee at every
    scale (the r18 sweep found no crossover: pipe_banding_crossover in
    SCALE_MEASURED.json). SPARK_GRAFT_PIPE_BANDING=legacy exists ONLY
    as the sweep tool's Spark-side measurement hook — the ORACLE must
    stay on the knee chain regardless, so an env leak into a
    correctness run forks the engines loudly (hash mismatch) rather
    than silently re-pinning both sides to the slower banding."""
    from comp5339dataengineering_realtimefuelanalysis_spark.plans import (
        registry_llm as rl,
    )

    assert rl._pipe_banding() == (rl._KNEE_NUM_HASHES, rl._KNEE_BANDS)
    monkeypatch.setenv("SPARK_GRAFT_PIPE_BANDING", "legacy")
    assert rl._pipe_banding() == (rl._NUM_HASHES, rl._BANDS)
    # oracle ignores the hook: the stage-9 chain still carries all 48
    # knee minhash columns
    sql = rl._sql_stage9_ctes()
    assert f"mh_{rl._KNEE_NUM_HASHES - 1}" in sql
    assert f"mh_{rl._KNEE_NUM_HASHES}" not in sql


def test_curation_pipeline_durable_barrier_identical(spark):
    """barrier='durable' (stage 2b's survivors written to the at-rest
    store and re-read — the cluster posture: localCheckpoint blocks
    die with an executor and cannot be recomputed) must reproduce the
    default localCheckpoint pipeline bit-exactly, and its physical
    plan must actually read stage 2b from a parquet scan."""
    from comp5339dataengineering_realtimefuelanalysis_spark.plans import (
        registry_llm as rl,
    )

    local = rl.q_corpus_curation_pipeline(spark, SF_SMOKE)
    durable = rl.q_corpus_curation_pipeline(
        spark, SF_SMOKE, barrier="durable"
    )
    got_l = sorted(map(tuple, local.collect()))
    got_d = sorted(map(tuple, durable.collect()))
    assert got_l == got_d and got_l
    plan = durable._jdf.queryExecution().executedPlan().toString()
    assert "pipeline_qscreen_barrier" in plan, plan

    import pytest

    with pytest.raises(ValueError, match="barrier"):
        rl.q_corpus_curation_pipeline(spark, SF_SMOKE, barrier="bogus")

    # barrier='auto' on this local[*] session resolves to the
    # localCheckpoint form (no parquet barrier scan in the plan); the
    # cluster side of the auto rule is source-asserted (master not
    # local -> durable) since no cluster exists in this harness
    auto = rl.q_corpus_curation_pipeline(spark, SF_SMOKE)
    plan_auto = auto._jdf.queryExecution().executedPlan().toString()
    assert "pipeline_qscreen_barrier" not in plan_auto
    assert spark.sparkContext.master.startswith("local")


def test_every_query_runs_at_smoke_sf(spark):
    for name, qd in REGISTRY.items():
        df = qd.fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0, name


def test_oracle_columns_match_spark_columns(spark):
    """The driver sorts columns by name before hashing — a name mismatch
    between the Spark result and the oracle projection fails the gate even
    when values agree. Catch it cheaply here."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = f"{SF_SMOKE}/{t}.parquet"
        if Path(path).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    for name, qd in REGISTRY.items():
        if not qd.oracle:
            continue
        d = con.execute(qd.oracle)
        d_cols = sorted(c[0] for c in d.description)
        s_cols = sorted(qd.fn(spark, SF_SMOKE).columns)
        assert s_cols == d_cols, f"{name}: {s_cols} != {d_cols}"


def test_no_oracle_output_types_hugeint_or_decimal():
    """The driver fetches oracle results through pandas/arrow, where
    DuckDB renders HUGEINT (the implicit promotion of SUM(BIGINT)) and
    DECIMAL as float64/decimal128 — which can never value-hash-match
    Spark's int64, even when the values are identical integers.  This
    killed doc_bm25_topk for two driver rounds (rounds 14-15: the single
    uncast `SUM(sterm)` among 93 oracles).  Bind every registry oracle
    and assert no output column types as HUGEINT/UHUGEINT/DECIMAL —
    integer aggregates must be wrapped in CAST(... AS BIGINT)."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = f"{SF_SMOKE}/{t}.parquet"
        if Path(path).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    bad = []
    for name, qd in REGISTRY.items():
        if not qd.oracle:
            continue
        rel = con.sql(qd.oracle)  # binds (types resolve) without running
        for col, typ in zip(rel.columns, rel.types):
            t_up = str(typ).upper()
            if any(b in t_up for b in banned):
                bad.append(f"{name}.{col}: {t_up}")
    assert not bad, f"hash-unportable oracle output types: {bad}"


def test_bench_iterates_canonical_order():
    """Bench timings must be comparable across rounds: the loop order
    must be the registry's definition order, never the attestation-
    rotated order (r16: emb_ivf_topk_probes2 swung 2.2x with an
    unchanged plan purely from rotation-driven neighbor warmth)."""
    import bench
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
        CANONICAL_ORDER,
    )

    assert [n for n, _ in bench.BENCH_ITEMS] == list(CANONICAL_ORDER)
    assert set(CANONICAL_ORDER) == set(REGISTRY)


def _spark_type_cat(t: str) -> str:
    """Hash-compatibility category of a Spark simpleString dtype."""
    t = t.lower()
    if t.startswith("array<") and t.endswith(">"):
        return "array<" + _spark_type_cat(t[6:-1]) + ">"
    if t in ("byte", "short", "int", "integer", "bigint", "long"):
        return "int"
    if t == "double":
        return "float"
    if t == "float":
        return "float32"  # 32-bit: repr precision diverges from DOUBLE
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "timestamp"
    return t  # string, boolean, date, ...


def _duck_type_cat(t: str) -> str:
    """Hash-compatibility category of a bound DuckDB output type."""
    t = str(t).upper()
    if t.endswith("[]"):
        return "array<" + _duck_type_cat(t[:-2]) + ">"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL"):
        return "float32"
    if t == "DOUBLE":
        return "float"
    if "DECIMAL" in t or "HUGEINT" in t:
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return {"VARCHAR": "string", "BOOLEAN": "boolean",
            "DATE": "date"}.get(t, t.lower())


def test_spark_output_types_hash_compatible_with_oracle(spark):
    """Symmetric twin of the HUGEINT/DECIMAL oracle guard, from the
    Spark side: the driver's value hash normalizes ints as str(int) and
    floats as repr(float), so a cross-engine int-vs-double column (or a
    Spark DecimalType / 32-bit FloatType output) is guaranteed red even
    when every value agrees. Bind both engines' schemas and assert each
    shared output column lands in the same hash-compatibility category —
    so a future Spark-side refactor (e.g. a dec_sum or a float32 cast)
    can't reintroduce the bug class the r16 oracle-side test killed."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = f"{SF_SMOKE}/{t}.parquet"
        if Path(path).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    bad = []
    for name, qd in REGISTRY.items():
        if not qd.oracle:
            continue
        sdf = qd.fn(spark, SF_SMOKE)
        # name-keyed dicts would silently collapse duplicate output
        # column names to the last occurrence (masking exactly the
        # multi-column-same-name case the driver's sort-by-name compare
        # is most fragile on) — ban dup names outright first.
        s_names = [f.name for f in sdf.schema.fields]
        rel = con.sql(qd.oracle)  # binds types without executing
        if len(set(s_names)) != len(s_names):
            bad.append(f"{name}: duplicate Spark output columns "
                       f"{s_names}")
            continue
        if len(set(rel.columns)) != len(rel.columns):
            bad.append(f"{name}: duplicate oracle output columns "
                       f"{rel.columns}")
            continue
        s_cats = {f.name: _spark_type_cat(f.dataType.simpleString())
                  for f in sdf.schema.fields}
        d_cats = dict(zip(rel.columns,
                          (_duck_type_cat(t) for t in rel.types)))
        for col, s_cat in s_cats.items():
            # decimal is unconditionally banned (Spark collects it as
            # decimal.Decimal, whose repr never matches int/float);
            # float32 is legal ONLY when the oracle column is also
            # 32-bit (identical bits widen to identical doubles —
            # doc_embed_hash.value is the green precedent), which the
            # category equality below enforces.
            if s_cat == "decimal":
                bad.append(f"{name}.{col}: Spark {s_cat} is "
                           "hash-unportable")
            d_cat = d_cats.get(col)
            if d_cat is not None and d_cat != s_cat:
                bad.append(
                    f"{name}.{col}: Spark {s_cat} vs oracle {d_cat}"
                )
    assert not bad, f"cross-engine hash-incompatible output types: {bad}"


def test_load_table_normalizes_ts_encodings(spark, tmp_path):
    """Declared ts columns normalize to TIMESTAMP whatever the fixture
    encoding — the environment has re-encoded fixtures between rounds
    once already (nanos bigint -> TIMESTAMP_NTZ); DATE is the next
    plausible shift."""
    import pandas as pd

    from comp5339dataengineering_realtimefuelanalysis_spark.plans.base import (
        load_table,
    )

    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_orderdate": pd.to_datetime(["2024-01-01", "2024-02-02"]).date,
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    loaded = load_table(spark, str(tmp_path), "orders")
    assert dict(loaded.dtypes)["o_orderdate"] == "timestamp"
    got = {r.o_orderdate.isoformat() for r in loaded.collect()}
    assert got == {"2024-01-01T00:00:00", "2024-02-02T00:00:00"}
