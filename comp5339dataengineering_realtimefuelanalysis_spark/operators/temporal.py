"""Temporal joins Spark has no native operator for: as-of join and bounded
range join — composed from built-in ops per the documented escalation
path (compose > applyInPandas > custom), so they stay in codegen and
scale like ordinary shuffles.

* asof_join — "for each left row, the most recent right row at or before
  it" (per key). Implemented with the union trick: tag both sides, sort
  within the key by (ts, right-before-left), carry right attributes
  forward with last(ignorenulls). ONE shuffle on the key + in-partition
  sort — same cost shape as latest_per_key, no join explosion, no
  per-group pandas. This is the general form of the reference's
  latest-price-then-join pattern (SURVEY.md §2.6 note).

* range_join_count — "count right rows within a bounded time window of
  each left row". Naive theta joins are O(n·m); bucketizing the time axis
  at the window width turns it into an equi-join on (key, bucket) where
  each left row probes exactly two buckets. The exact window predicate is
  applied AFTER the bucket equi-join, so results are identical to the
  naive form while the join stays hash-partitioned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols`` of the
    right row with the greatest ``right_ts`` <= ``left_ts`` for the same
    ``key`` (NULLs when no prior right row exists).

    ``tiebreak``: a right-side column ordering equal-timestamp right rows
    (the later-sorted wins), pinning determinism the way latest_per_key
    does — any orderable type (ordering uses the column's NATIVE type; a
    cast to long would silently null out string ids and un-pin the order).
    Equal left/right timestamps match (<=, not <).
    """
    lcols = left.columns
    tb_type = right.schema[tiebreak].dataType if tiebreak else None
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        (F.lit(None).cast(tb_type) if tiebreak else F.lit(0)).alias("__tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        F.lit(None).cast(
            tagged_left.schema["__left"].dataType
        ).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # Right rows sort BEFORE the left row at equal ts (is_right desc) so
    # `<=` matches; tiebreak orders equal-ts right rows deterministically.
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__ts"),
            F.col("__is_right").desc(),
            F.col("__tb"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_left.unionByName(tagged_right)
    filled = unioned.select(
        "__is_right",
        "__left",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__is_right") == 0).select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[F.col(f"__r_{c}").alias(f"right_{c}") for c in right_cols],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """Per left row: count of right rows with
    ``left_ts - window <= right_ts < left_ts`` for the same key.

    Bucketed equi-join on (key, bucket): both sides bucket the time axis
    at the window width, each left row probes its own and the previous
    bucket (the window spans at most two), and the exact interval
    predicate filters after the hash join — identical results to the
    naive inequality join without the per-key cross product.

    Per-row counts are restored by grouping on a synthetic per-row id
    (attached BEFORE the probe explode), so fully duplicate left rows each
    keep their own count instead of collapsing into one summed row.
    """
    win_us = window_seconds * 1_000_000
    lcols = left.columns
    l = (
        left.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn(
            "__b0",
            F.expr(f"unix_micros(cast({left_ts} as timestamp)) div {win_us}"),
        )
        .withColumn("__probe", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"))))
        .drop("__b0")
    )
    r = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        F.expr(
            f"unix_micros(cast({right_ts} as timestamp)) div {win_us}"
        ).alias("__rb"),
    )
    matched = l.join(
        r,
        (F.col(key) == F.col("__rk"))
        & (F.col("__probe") == F.col("__rb"))
        & (F.col("__rts") >= F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("__rts") < F.col(left_ts)),
        "left",
    )
    return matched.groupBy("__rid", *lcols).agg(
        F.count(F.col("__rts")).alias(count_alias)
    ).drop("__rid")
