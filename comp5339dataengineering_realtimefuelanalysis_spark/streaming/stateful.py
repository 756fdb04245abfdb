"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's high-watermark incremental publish (F4, main.py:44-51)
keeps one timestamp per publisher and emits only rows newer than it. In
batch mode that is a plain filter (operators/cleaning.py:incremental_after);
under streaming with PER-KEY watermarks it becomes keyed state — the one
operator family in this engine that built-in DataFrame ops cannot express,
hence the documented escalation path (compose > applyInPandas > custom):
Arrow-batched grouped state, one state row per key.

Scale: state is one timestamp per key, partitioned by the grouping key —
memory is O(|keys|), independent of throughput. For huge key spaces back
the state store with RocksDB (see SCALE.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [T.StructField("max_seen_us", T.LongType())]
)


def emit_new_highs(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    output_schema: T.StructType,
) -> DataFrame:
    """Per-key high-watermark filter: a row is emitted iff its ``ts_col``
    is strictly greater than everything previously seen for its key; the
    watermark then advances to the batch max (exactly the reference's
    publisher semantics, per key instead of global).

    Emission order within a micro-batch follows event time (the incoming
    group is sorted before the filter), so re-delivered or late rows are
    suppressed deterministically.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (max_seen_us,) = state.get if state.exists else (None,)
        floor = max_seen_us if max_seen_us is not None else -(1 << 62)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts_us = pdf[ts_col].astype("int64") // 1000  # ns -> µs
            keep = ts_us > floor
            if keep.any():
                floor = int(ts_us[keep].max())
                yield pdf[keep]
        state.update((floor,))

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
