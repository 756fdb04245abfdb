"""Sequence-packing tests: bucketed prefix sum == naive cumsum, chunk
assignment handles boundary-straddling and empty docs."""

from __future__ import annotations

from comp5339dataengineering_realtimefuelanalysis_spark.operators.packing import (
    pack_sequences,
    prefix_sum,
)

DOCS = [
    (0, "a b c"),           # 3 tokens -> [0, 3)
    (1, "d e"),             # 2 tokens -> [3, 5)
    (2, ""),                # empty -> spans nothing, insertion point 5
    (3, "f g h i j k"),     # 6 tokens -> [5, 11) straddles ctx=8
    (4, "l"),               # 1 token  -> [11, 12)
]


def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_prefix_sum_crosses_bucket_boundaries(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id long, v long"
    )
    # bucket_size=3 forces 7 buckets; exclusive prefix of 1..20
    got = {
        r.id: r.prefix
        for r in prefix_sum(df, "id", "v", bucket_size=3).collect()
    }
    want, acc = {}, 0
    for i in range(20):
        want[i] = acc
        acc += i + 1
    assert got == want


def test_pack_sequences_offsets_and_spans(spark):
    got = {
        r.doc_id: (r.n_tokens, r.start_tok, r.first_seq, r.last_seq)
        for r in pack_sequences(docs(spark), ctx_len=8).collect()
    }
    assert got[0] == (3, 0, 0, 0)
    assert got[1] == (2, 3, 0, 0)
    assert got[2] == (0, 5, 0, 0)      # empty doc: insertion point only
    assert got[3] == (6, 5, 0, 1)      # straddles the ctx=8 boundary
    assert got[4] == (1, 11, 1, 1)


def test_pack_sequences_partitioning_invariant(spark):
    """Same answer regardless of input partitioning (order comes from the
    id, not the layout)."""
    a = pack_sequences(docs(spark), ctx_len=8).collect()
    b = pack_sequences(docs(spark).repartition(7), ctx_len=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_manifest_full_sequences_and_boundaries(spark):
    from comp5339dataengineering_realtimefuelanalysis_spark.operators.packing import (
        pack_manifest,
    )

    got = {
        r.seq_id: (r.n_docs, r.n_tokens, r.full)
        for r in pack_manifest(docs(spark), ctx_len=8).collect()
    }
    # stream: doc0[0,3) doc1[3,5) doc3[5,11) doc4[11,12) -> seq0 full
    # (docs 0,1,3), seq1 partial (tail of doc3 + doc4)
    assert got == {0: (3, 8, True), 1: (2, 4, False)}


def test_pack_manifest_totals_match_doc_view(spark):
    from comp5339dataengineering_realtimefuelanalysis_spark.operators.packing import (
        pack_manifest,
        pack_sequences,
    )

    d = docs(spark)
    per_doc = sum(
        r.n_tokens for r in pack_sequences(d, ctx_len=8).collect()
    )
    per_seq = sum(
        r.n_tokens for r in pack_manifest(d, ctx_len=8).collect()
    )
    assert per_doc == per_seq  # every token lands in exactly one sequence
