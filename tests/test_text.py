"""Semantic unit tests for operators/text.py on hand-built edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from comp5339dataengineering_realtimefuelanalysis_spark.operators import text as tx


def one(spark, s):
    return spark.createDataFrame([(1, s)], "doc_id long, text string")


def val(spark, s, col):
    return one(spark, s).select(col.alias("v")).collect()[0].v


def test_token_count_ws_edges(spark):
    assert val(spark, "a  b\tc", tx.token_count_ws("text")) == 3
    assert val(spark, "", tx.token_count_ws("text")) == 0
    assert val(spark, "   ", tx.token_count_ws("text")) == 0
    assert val(spark, "one", tx.token_count_ws("text")) == 1


def test_token_count_regex(spark):
    assert val(spark, "ab 12 c!", tx.token_count_regex("text")) == 4
    assert val(spark, "don't", tx.token_count_regex("text")) == 3


def test_char_classes(spark):
    s = "ab1 2,c!"
    assert val(spark, s, tx.n_alpha("text")) == 3
    assert val(spark, s, tx.n_digit("text")) == 2
    assert val(spark, s, tx.n_punct("text")) == 2


def test_lang_id(spark):
    assert val(spark, "the cat and the dog is a pet", tx.lang_id("text")) == "en"
    assert val(spark, "le chat et les chiens des rues", tx.lang_id("text")) == "fr"
    assert val(spark, "der hund und die katze ist gut", tx.lang_id("text")) == "de"
    assert val(spark, "el perro de la casa que ladra", tx.lang_id("text")) == "es"
    assert val(spark, "这是中文文本", tx.lang_id("text")) == "zh"
    assert val(spark, "xyzzy qwerty", tx.lang_id("text")) == "unknown"


def test_fingerprint_whitespace_invariant(spark):
    a = val(spark, "Hello   world", tx.fingerprint("text"))
    b = val(spark, "hello world ", tx.fingerprint("text"))
    c = val(spark, "hello worlds", tx.fingerprint("text"))
    assert a == b
    assert a != c


def test_quality_score_bounds(spark):
    good = val(spark, "the quick brown fox jumps over the lazy dog", tx.quality_score("text"))
    junk = val(spark, "!!!! #### $$$$", tx.quality_score("text"))
    assert 0.0 <= junk < good <= 1.0


def test_corpus_prep_funnel(spark):
    """Composed prep pipeline: dedup funnel invariants hold and the gates
    actually gate (kept docs are a strict subset of the corpus)."""
    from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.1"
    rows = REGISTRY["corpus_prep_summary"].fn(spark, sf).collect()
    assert rows, "pipeline must keep at least one language"
    total_raw = sum(r.n_raw for r in rows)
    for r in rows:
        assert r.lang != "unknown"
        assert r.n_raw >= r.n_docs > 0
        assert r.avg_quality >= 0.7
    n_corpus = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert 0 < total_raw < n_corpus
