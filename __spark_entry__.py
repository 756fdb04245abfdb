"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Q2-analog pipeline (validate → latest-per
-key → dim left-join → label string-agg) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 via the
package's query registry (one source of truth:
``comp5339dataengineering_realtimefuelanalysis_spark/plans/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (  # noqa: E402
    REGISTRY,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["label_join_agg"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle
    }


def release_caches() -> int:
    """Unpersist frames the query plans persisted (shared shingle sets,
    LSH candidates). Call after materializing a query's result in a
    long-lived session; each query re-persists what it needs. Returns the
    number of frames released."""
    from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
        release_tracked,
    )

    return release_tracked()
