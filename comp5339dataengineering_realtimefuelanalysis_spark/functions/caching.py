"""Explicit ownership of persisted frames built inside query plans.

Several registry plans persist intermediates that feed multiple branches of
the SAME result (shared shingle explosions, LSH candidate sets). The result
DataFrame is returned lazily, so the plan builder cannot unpersist before
the caller materializes it — but leaving the blocks behind accumulates
cache pressure in a long-lived session (blocks evict each other and the
recompute thrash shows up as latency spikes).

Contract: plan builders register every frame they persist via
``tracked_persist``; whoever materializes the result (bench.py, a test, the
driver harness via ``__spark_entry__.release_caches``) calls
``release_tracked()`` afterwards. Untracked user persists are never
touched — unlike ``spark.catalog.clearCache()``, which nukes the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() (MEMORY_AND_DISK: spills instead of OOM at scale) and
    register the frame for a later ``release_tracked()``."""
    _TRACKED.append(df.persist())
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False: async block drop).
    Returns how many frames were released. Safe to call repeatedly and
    with a stopped session."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — blocks are gone anyway
    return n
