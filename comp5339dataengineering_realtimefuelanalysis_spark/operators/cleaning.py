"""Cleaning / ingest operators (SURVEY.md §2.4, §2.5, §2.12).

Generic, column-parameterized DataFrame->DataFrame transforms; the fuel
domain (plans/fuel.py) and the driver's ``events`` table both instantiate
these. All pure built-in expressions — no Python UDFs — so every operator
stays in whole-stage codegen and scales linearly with partitions.

Reference parity map:
  * validate_split   — V1/F2/F3: per-record validate-or-reject with reason
                       (DataCleaning.py:42-133, catch+log 146-167)
  * recent_window    — F1/A2/O1: keep rows within N days of the data max
                       (DataCleaning.py:15-39, strict ``>`` at :31)
  * dedup_first      — D1: emit each key once, first arrival wins
                       (main.py:60,72-76 — Python set keyed on station code)
  * incremental_after— F4: high-watermark incremental publish
                       (main.py:44-51)
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

REJECT_REASON_COL = "reject_reason"


@dataclass(frozen=True)
class Rule:
    """A single validation rule: ``fails`` marks rows to reject with ``name``.

    Rules are evaluated in declaration order; the FIRST failing rule supplies
    the reject reason, matching the reference's fail-fast raise inside
    ``clean_price_data`` / ``clean_station_data`` (DataCleaning.py:42-133).
    """

    name: str
    fails: Column


def null_or_empty_rules(cols: Sequence[str]) -> list[Rule]:
    """F3: missing/None/empty-string rejection for each expected column
    (DataCleaning.py:44-52, 86-95)."""
    rules: list[Rule] = []
    for c in cols:
        rules.append(Rule(f"missing_{c}", F.col(c).isNull()))
    for c in cols:
        rules.append(
            Rule(f"empty_{c}", F.col(c).cast("string") == F.lit(""))
        )
    return rules


def reject_reason(rules: Sequence[Rule]) -> Column:
    """First-failing-rule reason column (NULL == valid row)."""
    expr: Column = F.lit(None).cast("string")
    # Build WHEN chain in reverse so the first declared rule wins.
    for rule in reversed(rules):
        expr = F.when(rule.fails, F.lit(rule.name)).otherwise(expr)
    return expr


def validate_split(
    df: DataFrame, rules: Sequence[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, rejects-with-reason) — V1.

    The reference raises per record and logs "Removed invalid data ...,
    reason: ..." (DataCleaning.py:146-167); here the same contract is a
    declarative column split: rejects carry ``reject_reason`` and can be
    sunk to a quarantine path instead of stdout. One scan, two filters —
    Catalyst pushes both predicate sets down to the source scan.
    """
    reason = reject_reason(rules)
    tagged = df.withColumn(REJECT_REASON_COL, reason)
    valid = tagged.filter(F.col(REJECT_REASON_COL).isNull()).drop(
        REJECT_REASON_COL
    )
    rejects = tagged.filter(F.col(REJECT_REASON_COL).isNotNull())
    return valid, rejects


def recent_window(df: DataFrame, ts_col: str, days: int = 30) -> DataFrame:
    """F1: keep rows strictly newer than ``max(ts) - days`` (data-relative).

    Expressed as a broadcast join against the 1-row global max instead of a
    driver-side ``collect()`` so the whole thing stays one lazy plan (works
    identically under ``foreachBatch`` in streaming, where the bound is the
    batch-relative max — DataCleaning.py:23-31). The build side is 1 row, so
    Catalyst plans BroadcastNestedLoopJoin: free at any scale. The max
    aggregation itself is a partial-agg (one value per partition shuffled),
    not a full shuffle of the data.
    """
    bound = df.agg(F.max(F.col(ts_col)).alias("__max_ts"))
    return (
        df.join(F.broadcast(bound), how="cross")
        .filter(
            F.col(ts_col)
            > F.col("__max_ts") - F.expr(f"INTERVAL {int(days)} DAYS")
        )
        .drop("__max_ts")
    )


def dedup_first(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str | Column] = (),
) -> DataFrame:
    """D1: one row per key.

    With ``order_cols``: deterministic first-arrival (row_number over the
    key window) — needed for oracle-stable results, since the reference's
    Python-set dedup (main.py:72-76) keeps whichever record arrived first
    on the wire. Without: ``dropDuplicates`` (cheaper: partial-agg based,
    no full sort within groups).

    Scale note: this is a single hash shuffle on ``keys``. Under streaming
    use ``dropDuplicates`` on the stream directly — Spark keeps the seen-key
    set in the state store (the reference's unbounded Python set, T5).
    """
    if not order_cols:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def incremental_after(df: DataFrame, ts_col: str, watermark) -> DataFrame:
    """F4: emit only rows strictly after the saved high watermark.

    In batch this is an explicit filter (pushed down to the parquet scan);
    under Structured Streaming it disappears into checkpointed offsets —
    each record is processed exactly once (main.py:44-51 re-implemented by
    the engine's own offset tracking).
    """
    return df.filter(F.col(ts_col) > F.lit(watermark))
