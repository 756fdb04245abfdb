"""Scalar/column expression helpers (reference's §2.10 function surface).

Everything here is a *built-in* Spark expression — zero Python UDFs — so it
stays inside whole-stage codegen and Catalyst can constant-fold / push down.

Determinism conventions (these matter for oracle hash-parity and for
reproducible results on a cluster where partition/summation order is
nondeterministic):

* ``dec_sum``/``dec_avg`` quantize each input to a fixed-scale DECIMAL and
  accumulate exactly, then cast the exact decimal back to DOUBLE. Floating
  sums are order-dependent (a+b+c != c+a+b in IEEE754); decimal sums are
  exact, so the result is bit-identical no matter how Spark partitions the
  data — and bit-identical to any other engine (the DuckDB oracle) using the
  same quantization.
* ``fmt_value`` renders a double through DECIMAL(18,2) so the string form is
  locale/shortest-repr independent ("185.30", not "185.3").

Reference citations: timestamp parse/format C1/C2 (DataCleaning.py:73-79,
main.py:41-42,54), conditional default-fill C9 (DataCleaning.py:96-100),
null-guarded label P5/C8 (DataAnalysis.py:118-120), round C7
(DataAnalysis.py:81).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import WIRE_TS_FORMAT

# Scale used for exact decimal accumulation. Scale 6 matters for tie-freedom:
# inputs here are exact ≤2dp decimals, so derived products (price·(1-disc)·
# (1+tax)) are exact ≤6dp decimals — quantizing at scale 6 lands every value
# ON a grid point, so no rounding-rule (HALF_UP vs binary-scaled) divergence
# between engines is possible. 18 digits precision leaves 12 integer digits
# per *input*; Spark widens the sum to decimal(28,6) and DuckDB to
# decimal(38,6), so 1e10+ rows of 1e12-sized sums fit — comfortable at 100 TB.
_DEC = "decimal(18,6)"
_DEC6 = "decimal(18,6)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM of a double column via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC6)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def fmt_value(col: Column | str, scale: int = 2) -> Column:
    """Portable, deterministic string form of a numeric: fixed decimal scale."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})").cast("string")


def info_label(
    key_col: Column | str, value_col: Column | str, sep: str = ": "
) -> Column:
    """Null-guarded "<key>: <value>" label (reference P5, DataAnalysis.py:118-120).

    NULL value -> empty string, matching the reference's row-wise lambda.
    """
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.when(
        v.isNotNull(), F.concat(k, F.lit(sep), fmt_value(v))
    ).otherwise(F.lit(""))


def parse_wire_ts(col: Column | str) -> Column:
    """Day-first wire timestamp parse (C1). Malformed -> NULL (rejected by
    V1) — try_to_timestamp, because under ANSI mode (Spark 4 default) a
    plain to_timestamp raises on the first malformed record and would kill
    the whole job instead of quarantining the row."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(WIRE_TS_FORMAT))


def format_wire_ts(col: Column | str) -> Column:
    """Format a timestamp back to the day-first wire form (C2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, WIRE_TS_FORMAT)


def default_if_empty(col: Column | str, default: Column | str) -> Column:
    """Empty-string (or NULL) -> default column (C9, DataCleaning.py:96-100)."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.col(default) if isinstance(default, str) else default
    return F.when(c.isNull() | (c == ""), d).otherwise(c)
