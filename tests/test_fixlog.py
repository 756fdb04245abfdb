"""Cross-engine determinism of the fixed-point log2 kernel
(functions/fixlog.py) — the transcendental-free idf backbone that
replaced the round-14 ln()-based BM25 hash contract.

The contract under test: the Python reference, the DuckDB lateral-
alias SELECT, and the Spark selectExpr projection are the SAME int64
recurrence, so all three agree EXACTLY on every input — that is what
makes a local oracle pass imply a driver pass on any libm."""

import math
import random

import duckdb
import pytest

from comp5339dataengineering_realtimefuelanalysis_spark.functions import (
    fixlog,
)


def _cases(n=300, seed=1234):
    rng = random.Random(seed)
    edge = [
        (1, 1),
        (2, 1),
        (3, 2),
        (1002, 3),          # sf0.01-sized BM25 idf argument
        (2**52 - 1, 1),     # domain ceiling: e = 51
        (2**52 - 1, 2**52 - 1),
        (2**40 + 7, 12345),
        (2**48 + 11, 2**47),  # dsir-scale corpus totals
        (2**21 + 1, 2**21),  # mantissa just above 1
        (2**22 - 1, 2**21),  # mantissa just below 2
    ]
    out = list(edge)
    for _ in range(n):
        q = rng.randint(1, 2**40)
        out.append((rng.randint(q, 2**52 - 1), q))
    return sorted(set(out))


def test_log2fix_python_vs_duckdb():
    cases = _cases()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(p BIGINT, q BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    nested = fixlog.duckdb_nested("SELECT p, q FROM t", "p", "q", "lf")
    got = con.execute(
        f"SELECT p, q, lf FROM ({nested}) ORDER BY p, q"
    ).fetchall()
    ref = [(p, q, fixlog.log2fix_py(p, q)) for p, q in cases]
    assert got == ref


def test_log2fix_python_vs_spark(spark):
    cases = _cases(n=60, seed=77)
    df = spark.createDataFrame(cases, "p long, q long")
    got = sorted(
        map(
            tuple,
            fixlog.spark_apply(df, "p", "q", "lf")
            .select("p", "q", "lf")
            .collect(),
        )
    )
    ref = [(p, q, fixlog.log2fix_py(p, q)) for p, q in cases]
    assert got == ref


def test_log2fix_accuracy_and_monotonicity():
    """The defined function tracks true log2 to ~2^-20 relative scale
    (it is floor-biased, never above true), and is monotone in p/q —
    the property BM25 ranking actually relies on."""
    cases = _cases(n=500, seed=9)
    worst = 0.0
    for p, q in cases:
        lf = fixlog.log2fix_py(p, q)
        true = math.log2(p / q)
        err = true - lf / 2**20
        assert err >= -1e-6, (p, q)   # never overshoots
        worst = max(worst, err)
    assert worst < 5e-5, worst
    # monotone on a fixed denominator sweep
    prev = -1
    for p in range(1000, 4000, 7):
        lf = fixlog.log2fix_py(p, 999)
        assert lf >= prev
        prev = lf


def test_log2fix_exact_powers_and_boundaries():
    """Exact powers of two land exactly on the grid (frac bits all
    zero), and the two neighbors of every boundary stay ordered —
    the cases where a float-based log is most likely to be off by
    one ulp and flip a floor."""
    for e in (0, 1, 5, 20, 40, 51):
        assert fixlog.log2fix_py(1 << e, 1) == e << 20
    for q in (1, 3, 999, 2**31 - 1):
        for e in (1, 7, 19):
            p = q << e
            if p >= 2**52:
                continue
            below = fixlog.log2fix_py(p - 1, q) if p - 1 >= q else None
            at = fixlog.log2fix_py(p, q)
            above = fixlog.log2fix_py(p + 1, q)
            assert at == e << 20
            if below is not None:
                assert below <= at <= above


def _duck_eval(con, pairs):
    con.execute("CREATE OR REPLACE TABLE h(p BIGINT, q BIGINT)")
    con.executemany("INSERT INTO h VALUES (?, ?)", pairs)
    nested = fixlog.duckdb_nested("SELECT p, q FROM h", "p", "q", "lf")
    return con.execute(
        f"SELECT p, q, lf FROM ({nested}) ORDER BY p, q"
    ).fetchall()


def test_log2fix_hypothesis_cross_engine():
    """Property: for ANY in-domain (p, q), DuckDB's evaluation of the
    emitted step list equals the pure-Python int64 recurrence — the
    portability claim itself, fuzzed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(1, 2**52 - 1),
        st.integers(1, 2**52 - 1),
    )
    def prop(a, b):
        p, q = max(a, b), min(a, b)
        got = _duck_eval(con, [(p, q)])
        assert got == [(p, q, fixlog.log2fix_py(p, q))]

    prop()


def test_log2fix_domain_errors():
    with pytest.raises(ValueError):
        fixlog.log2fix_py(1, 2)       # p < q
    with pytest.raises(ValueError):
        fixlog.log2fix_py(3, 0)       # q < 1
    with pytest.raises(ValueError):
        fixlog.log2fix_py(2**52, 1)   # beyond staged-shift bound


def test_bm25_score_tracks_float_reference(spark):
    """End-to-end: the int64 fixed-point BM25 score agrees with a
    float log2-BM25 reference to fixed-point precision, on a corpus
    where every doc matches (so every score participates)."""
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        text as tx,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha alpha beta beta beta"),
            (3, "gamma gamma delta alpha"),
            (4, "beta delta delta"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "alpha beta")], "qid string, qtext string"
    )
    got = {
        r.doc_id: r.score_fix
        for r in tx.bm25_topk(docs, queries, k=10, salts=2).collect()
    }
    # float reference: Lucene idf in base 2, k1=1.2, b=0.75
    texts = {
        1: "alpha beta gamma alpha".split(),
        2: "alpha alpha beta beta beta".split(),
        3: "gamma gamma delta alpha".split(),
        4: "beta delta delta".split(),
    }
    n = len(texts)
    s = sum(len(t) for t in texts.values())
    for d, toks in texts.items():
        ref = 0.0
        for term in ("alpha", "beta"):
            tf = toks.count(term)
            if not tf:
                continue
            df = sum(term in t for t in texts.values())
            idf = math.log2((n + 1) / (df + 0.5))
            dl = len(toks)
            sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n / s))
            ref += idf * sat
        assert abs(got[d] / 2**36 - ref) < 1e-3, (d, got[d], ref)


def test_log2_table_duckdb_range_matches_python():
    """The table face's 4096-entry mantissa table, computed IN-ENGINE
    by the layered kernel over range(4096) (the dsir Gumbel oracle's
    gumtbl CTE), must equal the Python-computed table that the Spark
    side embeds as an array literal — the cross-engine contract of
    the per-row noise."""
    tblsrc = fixlog.duckdb_nested(
        "SELECT CAST(i AS BIGINT) AS m FROM range(4096) t(i)",
        "4096 + m", "4096", "tval",
    )
    got = dict(
        duckdb.connect()
        .execute(f"SELECT m, tval FROM ({tblsrc}) z ORDER BY m")
        .fetchall()
    )
    ref = fixlog.log2_table()
    assert len(got) == 4096
    assert all(got[m] == ref[m] for m in range(4096))


def test_log2tbl_py_accuracy_and_monotonicity():
    """log2tbl (bit-length + truncated-mantissa lookup) approximates
    log2(x)*2^20 within the 12-bit truncation bound and never
    decreases in x."""
    xs = [1, 2, 3, 5, 7, 4095, 4096, 4097, 2**20, 2**20 + 1,
          2**33 - 1, 34603008, 10**9 + 7]
    xs += [random.Random(7).randint(1, 2**50) for _ in range(200)]
    prev_x, prev_v = None, None
    for x in sorted(set(xs)):
        v = fixlog.log2tbl_py(x)
        ref = math.log2(x) * (1 << 20)
        # truncating the mantissa to 12 bits UNDERestimates by at
        # most log2(1 + 2^-12)*2^20 < 370; the kernel adds < 2 more
        assert ref - 372 <= v <= ref + 2, (x, v, ref)
        if prev_x is not None and x > prev_x:
            assert v >= prev_v, (prev_x, x)
        prev_x, prev_v = x, v


def test_gumbel2_py_bounds_and_determinism():
    """The table-backed Gumbel noise: exact replay, sane range (the
    lower tail reaches -log2(33)≈-5.04, the upper tail is compressed
    by mantissa truncation to ~12 in log2 units), and deterministic."""
    from comp5339dataengineering_realtimefuelanalysis_spark.operators.selection import (
        gumbel2_py,
    )

    rng = random.Random(99)
    hs = [0, 1, 2**31, 2**32 - 1] + [
        rng.randint(0, 2**32 - 1) for _ in range(500)
    ]
    grid = 1 << 20
    for h in hs:
        g = gumbel2_py(h)
        assert -6 * grid < g < 13 * grid, (h, g)
        assert g == gumbel2_py(h)
    # median-ish hash → noise near 0 (u=0.5 → g=0 exactly in floats)
    mid = gumbel2_py(2**31)
    assert abs(mid) < grid // 2, mid


def test_gumbel2_fix_plan_is_map_only(spark):
    """The table-backed Gumbel must stay pure projections — the whole
    point of the round-16 re-shape is that per-row noise adds NO
    shuffle, NO join (the table rides the plan as one array literal),
    and no Python UDF. A future lookup-via-broadcast-join would pass
    value tests while re-adding a join per scored frame; pin the plan."""
    from comp5339dataengineering_realtimefuelanalysis_spark.operators import (
        selection as sel,
    )

    df = spark.range(64).selectExpr("id AS doc_id")
    out = sel._gumbel2_fix(df, "doc_id", "dsir")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # and the emitted values are the exact python replay
    import hashlib

    def h32(did):
        return int(
            hashlib.md5(f"{did}#gdsir".encode()).hexdigest()[:8], 16
        )

    got = {r.doc_id: r._g for r in out.collect()}
    assert got == {
        i: sel.gumbel2_py(h32(i)) for i in range(64)
    }


def test_gumbel2_duckdb_oracle_chain_matches_python():
    """The REAL dsir-sample oracle's Gumbel CTE text (gumtbl +
    bit-length + two table joins), run over synthetic doc_ids with
    zero weights, must reproduce gumbel2_py(md5-hash) exactly —
    the DuckDB half of the per-row noise contract, fuzzed directly
    instead of only through the 125-row selected set."""
    import hashlib

    from comp5339dataengineering_realtimefuelanalysis_spark.operators.selection import (
        gumbel2_py,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
        _sql_dsir_gumbel_ctes,
        _DSIR_SEED,
    )

    ids = [0, 1, 7, 2**31, 2**40 + 3] + [
        random.Random(5).randint(0, 2**62) for _ in range(60)
    ]
    vals = ", ".join(f"({i}, 0)" for i in ids)
    sql = (
        f"WITH wts(doc_id, dsir_weight) AS (VALUES {vals}),\n"
        + _sql_dsir_gumbel_ctes()
        + "\nSELECT doc_id, score FROM scored"
    )
    got = dict(duckdb.connect().execute(sql).fetchall())

    def expected(did):
        h = int(
            hashlib.md5(
                f"{did}#g{_DSIR_SEED}".encode()
            ).hexdigest()[:8],
            16,
        )
        return gumbel2_py(h)

    assert len(got) == len(set(ids))
    assert got == {i: expected(i) for i in set(ids)}


def test_multi_kernel_fused_emission_cross_engine(spark):
    """Three sibling kernels riding one shared, liveness-pruned layer
    stack (spark_apply_multi / duckdb_nested_multi) must equal three
    independent log2fix_py calls on both engines — pins the fusion +
    pruning emission beyond the lrA/lrB pair the dsir oracle covers."""
    rng = random.Random(42)
    rows = []
    for _ in range(40):
        vals = []
        for _ in range(3):
            q = rng.randint(1, 2**30)
            vals += [rng.randint(q, 2**50), q]
        rows.append(tuple(vals))
    cols = ["p1", "q1", "p2", "q2", "p3", "q3"]
    specs = [("p1", "q1", "o1"), ("p2", "q2", "o2"), ("p3", "q3", "o3")]

    sdf = spark.createDataFrame(rows, ", ".join(f"{c} long" for c in cols))
    out = fixlog.spark_apply_multi(sdf, specs)
    assert sorted(out.columns) == sorted(cols + ["o1", "o2", "o3"])
    got_s = {tuple(r[c] for c in cols): (r.o1, r.o2, r.o3)
             for r in out.collect()}

    vals_sql = ", ".join(str(r) for r in rows)
    src = f"SELECT * FROM (VALUES {vals_sql}) t({', '.join(cols)})"
    nested = fixlog.duckdb_nested_multi(src, specs)
    got_d = {
        tuple(rec[c] for c in cols): (rec["o1"], rec["o2"], rec["o3"])
        for rec in duckdb.connect()
        .execute(f"SELECT {', '.join(cols)}, o1, o2, o3 FROM ({nested}) z")
        .fetch_arrow_table().to_pylist()
    }
    for r in rows:
        exp = tuple(
            fixlog.log2fix_py(r[2 * i], r[2 * i + 1]) for i in range(3)
        )
        assert got_s[r] == exp, r
        assert got_d[r] == exp, r
