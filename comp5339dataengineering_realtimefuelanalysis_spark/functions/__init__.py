from .scalars import (
    dec_avg,
    dec_sum,
    fmt_value,
    info_label,
    parse_wire_ts,
    format_wire_ts,
    default_if_empty,
)

__all__ = [
    "dec_avg",
    "dec_sum",
    "fmt_value",
    "info_label",
    "parse_wire_ts",
    "format_wire_ts",
    "default_if_empty",
]
