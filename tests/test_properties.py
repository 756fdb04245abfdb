"""Property-based tests (hypothesis): stream/batch equivalence of the
cleaning layer over random micro-batch splits of random (dirty) record
streams — SURVEY.md §5's property-test plan.

The property: processing a stream in any batch partitioning produces the
same silver output as one batch over the concatenated input. This is the
invariant that lets the same operator library back both the batch/oracle
path and the streaming runner.
"""

from __future__ import annotations

import datetime as dt
import functools

from hypothesis import given, settings, strategies as st, HealthCheck

from comp5339dataengineering_realtimefuelanalysis_spark.operators.cleaning import (
    dedup_first,
    validate_split,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans.fuel import (
    clean_prices,
)

BASE_TS = dt.datetime(2023, 10, 1)


def wire_ts(offset_min: int) -> str:
    t = BASE_TS + dt.timedelta(minutes=offset_min)
    return t.strftime("%d/%m/%Y %H:%M:%S")


price_record = st.fixed_dictionaries(
    {
        "stationcode": st.one_of(
            st.none(),
            st.just(""),
            st.integers(1, 5).map(str),
        ),
        "fueltype": st.one_of(
            st.none(), st.just(""), st.sampled_from(["U91", "E10", "P98"])
        ),
        "price": st.one_of(
            st.none(),
            st.just(""),
            st.just("abc"),
            st.just("0"),
            st.floats(80, 260, allow_nan=False).map(lambda x: f"{x:.1f}"),
        ),
        "lastupdated": st.one_of(
            st.just("not-a-date"),
            st.integers(0, 10000).map(wire_ts),
        ),
    }
)


@functools.lru_cache(maxsize=1)
def _schema():
    from comp5339dataengineering_realtimefuelanalysis_spark.schemas import RAW_PRICE

    return RAW_PRICE


def rows_key(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    records=st.lists(price_record, min_size=0, max_size=30),
    split_at=st.integers(0, 30),
)
def test_clean_is_batch_split_invariant(spark, records, split_at):
    """clean(batch1) ∪ clean(batch2) == clean(batch1 ∪ batch2)."""
    split_at = min(split_at, len(records))
    whole = spark.createDataFrame(records, _schema()) if records else None
    if whole is None:
        return
    silver_whole, rejects_whole = clean_prices(whole)

    parts = [records[:split_at], records[split_at:]]
    silver_parts, rejects_parts = [], []
    for p in parts:
        if not p:
            continue
        s, r = clean_prices(spark.createDataFrame(p, _schema()))
        silver_parts.append(s)
        rejects_parts.append(r)
    union_silver = functools.reduce(lambda a, b: a.unionAll(b), silver_parts)
    union_rejects = functools.reduce(lambda a, b: a.unionAll(b), rejects_parts)

    assert rows_key(union_silver) == rows_key(silver_whole)
    assert rows_key(union_rejects) == rows_key(rejects_whole)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=st.lists(price_record, min_size=1, max_size=30))
def test_validate_split_partitions_input(spark, records):
    """Every input row lands in exactly one of (valid, rejects)."""
    df = spark.createDataFrame(records, _schema())
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.fuel import (
        price_rules,
    )

    valid, rejects = validate_split(df, price_rules())
    assert valid.count() + rejects.count() == len(records)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(1, 4), min_size=1, max_size=20),
)
def test_dedup_first_idempotent_and_complete(spark, keys):
    """dedup_first emits each key exactly once, and re-applying is a
    no-op (idempotence — the property the streaming sink relies on)."""
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "seq long, key long")
    once = dedup_first(df, ["key"], ["seq"])
    twice = dedup_first(once, ["key"], ["seq"])
    got = {r.key: r.seq for r in once.collect()}
    assert set(got) == set(keys)
    # first arrival wins: seq is the minimal index for that key
    for k, s in got.items():
        assert s == min(i for i, kk in rows if kk == k)
    assert rows_key(once) == rows_key(twice)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            # coordinate sums well beyond 2^53: the DOUBLE-division
            # hazard zone where DuckDB's `/` (float) would diverge —
            # the oracle must use `//` (exact HUGEINT division)
            st.integers(-(10**18), 10**18),
            st.integers(1, 10**9),  # member count n
        ),
        min_size=1,
        max_size=30,
    )
)
def test_floor_div_centroid_quantization_cross_engine(spark, pairs):
    """kmeans_train re-quantizes centroids with
    (s - ((s % n + n) % n)) / n, claimed to be the MATHEMATICAL floor
    bit-identically in Spark and DuckDB (both have truncating %). The
    property: for random (s, n) the Spark expression, the DuckDB
    expression, and Python's // (true floor) all agree — including
    negative sums, where round() ties and truncating division diverge."""
    import duckdb

    from pyspark.sql import functions as F

    rows = [(i, s, n) for i, (s, n) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i long, s long, n long")
    got_spark = [
        r.q
        for r in df.select(
            "i",
            (
                (
                    F.col("s").cast("decimal(38,0)")
                    - F.pmod(
                        F.col("s").cast("decimal(38,0)"),
                        F.col("n").cast("decimal(38,0)"),
                    )
                )
                / F.col("n").cast("decimal(38,0)")
            )
            .cast("long")
            .alias("q"),
        )
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s HUGEINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got_duck = [
        row[0]
        for row in con.execute(
            "SELECT CAST((s - ((s % n + n) % n)) // n AS BIGINT) "
            "FROM t ORDER BY i"
        ).fetchall()
    ]
    want = [s // n for s, n in pairs]
    assert got_spark == want
    assert got_duck == want


text_doc = st.text(
    alphabet="ab #.\n" + "the of to x",
    min_size=0,
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(text_doc, min_size=1, max_size=12))
def test_gopher_and_ppl_layout_independent(spark, texts):
    """Layout independence — the Spark-correctness property every
    deterministic operator must hold: the same rows through a
    different partitioning (and row order) produce identical outputs.
    Catches accumulation-order and first()/limit-style
    nondeterminism in the new quality operators."""
    from comp5339dataengineering_realtimefuelanalysis_spark.operators.selection import (
        lm_ppl_score,
    )
    from comp5339dataengineering_realtimefuelanalysis_spark.operators.text import (
        gopher_rules,
    )
    from pyspark.sql import functions as F

    rows = [(i, t, i % 2 == 0) for i, t in enumerate(texts)]
    a = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    b = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, text string, tgt boolean"
    ).repartition(7)

    ga = sorted(map(tuple, gopher_rules(a, min_words=2).collect()))
    gb = sorted(map(tuple, gopher_rules(b, min_words=2).collect()))
    assert ga == gb

    pa = sorted(map(tuple, lm_ppl_score(
        a, F.col("tgt"), buckets=32).collect()))
    pb = sorted(map(tuple, lm_ppl_score(
        b, F.col("tgt"), buckets=32).collect()))
    assert pa == pb
