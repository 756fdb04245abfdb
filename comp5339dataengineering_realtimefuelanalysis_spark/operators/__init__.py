from .cleaning import (
    Rule,
    validate_split,
    recent_window,
    dedup_first,
    incremental_after,
)
from .analytics import (
    latest_per_key,
    avg_by,
    enrich_left,
    label_join_agg,
    series_by,
    orphans,
)

__all__ = [
    "Rule",
    "validate_split",
    "recent_window",
    "dedup_first",
    "incremental_after",
    "latest_per_key",
    "avg_by",
    "enrich_left",
    "label_join_agg",
    "series_by",
    "orphans",
]
