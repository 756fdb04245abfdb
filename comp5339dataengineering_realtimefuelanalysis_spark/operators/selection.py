"""Data-selection operators: deterministic sampling for corpus curation.

Training-data mixes are built by sampling source corpora at per-stratum
rates (by language, source, quality band, ...). The sampler here is
HASH-based, not RNG-based: membership is a pure function of the row id,
so (a) the same row is selected in every run, on any cluster layout,
with no seed plumbing; (b) resampling at a higher rate is a superset of
the lower rate (bucket < 10 ⊂ bucket < 20) — the property that lets a
curriculum grow a mix without churning previously selected data; (c) the
identical selection is expressible in SQL for the oracle.

All map-only: no shuffle, runs at scan speed. (The bucket predicate is a
computed expression, so it filters in the scan STAGE, not inside the
parquet reader — only the stratum-column predicate, when constant, can
push down further.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash32


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Stable per-row bucket in [0, buckets): md5-derived 32-bit hash of
    the id's string form, mod buckets. Engine-portable (DuckDB:
    ('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % N)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (hash32(c.cast("string")) % F.lit(buckets)).cast("int")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls below its stratum's
    percentage. ``rates`` maps stratum value -> percent kept (0-100);
    unlisted strata get ``default_pct``. Output = input columns plus the
    ``bucket`` the decision was made on (auditability: a reviewer can
    re-derive every keep/drop)."""
    pct: Column = F.lit(default_pct)
    for value, p in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.withColumn("bucket", hash_bucket(id_col)).filter(
        F.col("bucket") < pct
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    alpha: float = 0.5,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-LM mixing
    knob): target stratum proportions p_s ∝ (n_s/N)^alpha, realized by
    DOWNSAMPLING only — each stratum keeps
    ``rate_s = (n_min/n_s)^(1-alpha)`` of its rows, so the rarest
    stratum is kept in full and abundant strata are flattened toward
    it (alpha=1 keeps natural proportions; alpha=0 keeps ~n_min rows of
    every stratum — uniform). Selection is the hash-bucket sampler, so
    it is deterministic, layout-independent, and nested across alphas
    (a hotter mix is a superset of a colder one stratum-by-stratum,
    because rate_s grows monotonically with alpha and bucket
    thresholds nest).

    alpha=0.5 (the default, and the common operating point) computes
    rates with sqrt — CORRECTLY ROUNDED in IEEE 754, so the DuckDB
    oracle replays the exact double and the keep decision bit-exactly.
    Other alphas go through pow(), which is not guaranteed identical
    across engines' libm; the decision only differs if rate*buckets
    straddles an integer within 1 ulp, but oracle-gated pipelines
    should pin alpha=0.5 (the registry does).

    Scale shape: one tiny per-stratum count aggregate, a broadcast
    rates join, then a map-only filter — scan speed at any corpus
    size. Output: input columns + keep_rate + bucket (auditability)."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("n_min"))
    nd = F.col("n").cast("double")
    md = F.col("n_min").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(md / nd)
    else:
        rate = F.pow(md / nd, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        strata_col, rate.alias("keep_rate")
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("bucket", hash_bucket(id_col, buckets))
        .filter(
            F.col("bucket").cast("double")
            < F.col("keep_rate") * F.lit(float(buckets))
        )
    )
