"""Sequence packing for LLM training-data pipelines.

Concatenate-and-chunk packing (the standard pretraining layout): documents
are laid out end-to-end in a deterministic order and the token stream is
chunked into fixed-length training sequences. The operator computes, for
every document, its absolute token offset in that stream and which
sequences it lands in — the metadata a packer/loader needs to materialize
shards without ever building the concatenated stream itself.

The core primitive is a distributed prefix sum. A naive
``Window.orderBy(id)`` cumsum has NO partition key, so Spark plans it as a
single task over the whole table — correct at test scale, serial at any
real scale. Instead: range-bucket the order column, cumsum within buckets
(parallel window), agg per-bucket totals (tiny), prefix-sum THOSE on the
driver-side-free broadcast join. Cost: one scan + one parallel window +
one broadcast join; no global sort task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count_ws


def prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "prefix",
    bucket_size: int = 10_000,
) -> DataFrame:
    """Exclusive prefix sum of ``val_col`` over ``order_col`` order.

    ``order_col`` must be numeric and unique (doc ids). Buckets are
    ``floor(order/bucket_size)`` — contiguous in the order, so the
    bucket-level prefix reconstructs the global one exactly. Bucket
    totals are aggregated to one row per bucket (corpus/bucket_size
    rows: broadcastable far beyond 100 TB of docs at the default size),
    prefix-summed with a tiny single-partition window over that
    aggregate only, and broadcast-joined back.
    """
    bucket = (F.col(order_col) / F.lit(bucket_size)).cast("long")
    b = df.withColumn("__bkt", bucket)

    within = Window.partitionBy("__bkt").orderBy(order_col)
    b = b.withColumn(
        "__cum_in",
        F.coalesce(
            F.sum(val_col).over(
                within.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    totals = b.groupBy("__bkt").agg(F.sum(val_col).alias("__tot"))
    # window over the per-bucket aggregate only — one row per bucket, so
    # the single-partition window is a few KB, not the corpus
    bw = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bkt",
        F.coalesce(F.sum("__tot").over(bw), F.lit(0)).alias("__off"),
    )

    return (
        b.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, (F.col("__cum_in") + F.col("__off")).cast("long"))
        .drop("__bkt", "__cum_in")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 2048,
    token_col: str | None = None,
) -> DataFrame:
    """Assign every document its place in the concatenated token stream.

    Output per doc: ``n_tokens``, ``start_tok`` (exclusive prefix sum in
    ``id_col`` order), ``first_seq``/``last_seq`` (the ctx_len-sized
    training sequences the doc spans; empty docs span none and report
    their insertion point as both). Deterministic: byte-identical runs
    regardless of partitioning, because the order is the id order.

    ``token_col``: use a precomputed token count instead of the built-in
    whitespace counter.
    """
    toks = (
        F.col(token_col) if token_col else token_count_ws(text_col)
    ).cast("long")
    t = df.select(F.col(id_col), toks.alias("n_tokens"))
    p = prefix_sum(t, id_col, "n_tokens", out_col="start_tok")
    # integer division (div), not double `/`: exact past 2^53 tokens
    first = F.expr(f"start_tok div {ctx_len}")
    last = F.expr(f"(start_tok + n_tokens - 1) div {ctx_len}")
    return p.select(
        id_col,
        "n_tokens",
        "start_tok",
        first.alias("first_seq"),
        F.when(F.col("n_tokens") > 0, last)
        .otherwise(first)
        .alias("last_seq"),
    )


def pack_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 2048,
    token_col: str | None = None,
) -> DataFrame:
    """The sequence-side view of ``pack_sequences``: one row per training
    sequence with how many documents contribute to it, how many tokens it
    holds, and whether it is full — the manifest a shard writer needs to
    materialize fixed-length batches (and the loader needs to mask
    cross-document attention).

    Each doc explodes to the sequences it spans (fan-out = its token
    count / ctx_len, so total explosion = corpus tokens / ctx_len rows),
    its per-sequence token contribution is pure interval arithmetic, and
    one partial-agg shuffle on seq_id folds contributions together.
    Every sequence except the last must come out exactly full — that
    invariant is the packing correctness check a pipeline should assert
    on a sample of shards.
    """
    p = pack_sequences(df, id_col, text_col, ctx_len, token_col)
    spans = p.filter(F.col("n_tokens") > 0).select(
        id_col,
        "start_tok",
        "n_tokens",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    contrib = F.least(
        F.col("start_tok") + F.col("n_tokens"),
        (F.col("seq_id") + 1) * F.lit(ctx_len),
    ) - F.greatest(F.col("start_tok"), F.col("seq_id") * F.lit(ctx_len))
    return (
        spans.withColumn("tok_in_seq", contrib)
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_in_seq").alias("n_tokens"),
        )
        .withColumn("full", F.col("n_tokens") == F.lit(ctx_len))
    )
