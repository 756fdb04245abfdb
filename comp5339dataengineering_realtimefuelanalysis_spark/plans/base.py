"""Shared plumbing for query registries: the QueryDef contract and the
driver-table loader."""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None
    tables: tuple[str, ...] = ()
    doc: str = ""


# Columns written as parquet TIMESTAMP(NANOS) (pandas default); read as
# long under spark.sql.legacy.parquet.nanosAsLong and converted losslessly
# (integer `div 1000` — float division would lose precision at 1e18 nanos).
_TS_NS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-set (not only in session.get_spark) because the caller — the
    # driver harness — may hand us a vanilla SparkSession; without this flag
    # Spark refuses TIMESTAMP(NANOS) parquet outright (PARQUET_TYPE_ILLEGAL).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet/DuckDB timestamps are naive; pin the session to UTC so Spark's
    # session-TZ rendering can't shift values on a non-UTC driver machine.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Bound plan-string rendering (default ~2^31 chars): the composed
    # curation pipeline's lineage prints shared subplans once PER
    # REFERENCE, so the EXPLAIN/log string (not the plan itself) grows
    # multiplicatively with stages — measured java.lang.OutOfMemoryError
    # inside StringConcat.append while localCheckpoint stringified the
    # inline-2l pipeline plan. Truncation affects logs/UI text only,
    # never execution. Runtime-set for the same reason as the flags
    # above: the driver may hand us a vanilla session.
    spark.conf.set("spark.sql.maxPlanStringLength", str(1024 * 1024))
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_NS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif dtype in ("timestamp_ntz", "date"):
            # Fixtures have changed encoding between rounds once already
            # (TIMESTAMP(NANOS) -> TIMESTAMP_MICROS(isAdjustedToUTC=0),
            # which Spark reads as TIMESTAMP_NTZ). Normalize every
            # declared ts column to TIMESTAMP so type-strict functions
            # (unix_micros) resolve regardless of the parquet encoding.
            # Lossless: the session TZ is pinned to UTC above, so
            # wall-clock values are unchanged (DATE -> midnight UTC).
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
