"""Fixed-point base-2 logarithm over int64 — the cross-engine
determinism kernel for scores that need a logarithm inside an
exact-hash oracle contract.

Why this exists: round 14 shipped BM25 with an in-plan ``ln()`` and
the driver recorded ``hash_match: false`` while the same query passed
bit-exact locally — the JVM's ``Math.log`` and the driver's DuckDB
libm disagreed by 1 ulp on at least one argument, and
``floor(x * 1e6)`` amplified that into a different int64. The durable
fix is to remove the transcendental from the hashed value entirely:
this module computes

    log2fix(p, q, frac) = an int64 ~= log2(p / q) * 2**frac

using ONLY int64 multiply / truncating-divide / modulo / compare —
operations every engine executes bit-identically. The result is not
"log2 correctly rounded"; it is a DEFINED deterministic function of
(p, q) — the contract both engines implement by running the same
integer recurrence, so local green implies driver green on any
platform.

Algorithm (all intermediates provably fit in signed int64):

1. integer part  ``e = floor(log2(p / q))`` via ``len(bin(p // q)) - 1``
   (for p >= q >= 1, ``floor(log2(p/q)) == floor(log2(p // q))``:
   with k = p // q and e = floor(log2 k), k <= p/q < k + 1 <= 2^(e+1)).
2. mantissa ``M = floor(p * 2^30 / (q * 2^e))`` in [2^30, 2^31) by
   staged base-2^10 long division (three shift-mod-divide rounds —
   digit-group long division is EXACT, so the staging only bounds the
   intermediates: the shifted remainder never exceeds Q * 2^10).
3. ``frac`` iterations of the classic square-and-shift bit recurrence:
   ``s = (y * y) >> 30``; if ``s >= 2^31`` emit bit 1 and halve.
   y stays in [2^30, 2^31) so y*y < 2^62.

Domain: p >= q >= 1 and p < 2^52 (so ``(p % Q) << 10`` fits). At the
100 TB design point BM25's p = 2N + 2 ~ 2^38 (N docs) and dsir's
p = R_tot + sB ~ 2^48 (corpus feature occurrences) — both inside the
bound.

Signed wrapper: callers whose ratio can fall below 1 (e.g. a
log-likelihood RATIO) evaluate ``log2fix(a, b) - log2fix(c, d)`` with
each call's arguments ordered p >= q — a difference of two exact
int64s, never a negative-log domain.

EMISSION SHAPE — layered projections, never one lateral-alias chain:
both Spark's and DuckDB's binders resolve a lateral column alias by
INLINING the producing expression at every reference site. The
recurrence references each previous value 2-4 times per step, so a
single 60-alias SELECT expands to a ~4^20-node expression tree and
the analyzer never returns (observed on both engines). Emitting each
step as its own projection layer (a nested ``SELECT *, step FROM
(...)`` in DuckDB, a ``withColumn`` batch in Spark) makes every
reference a real resolved column — linear work, and Spark's
CollapseProject keeps multiply-referenced non-cheap aliases in their
own Project, so the plan stays linear after optimization too.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame

__all__ = [
    "log2fix_py",
    "log2fix_layers",
    "spark_apply",
    "spark_apply_multi",
    "duckdb_nested",
    "duckdb_nested_multi",
    "log2_table",
    "log2tbl_py",
    "TBL_BITS",
]

_M30 = 1 << 30
_M31 = 1 << 31


def log2fix_py(p: int, q: int, frac: int = 20) -> int:
    """Pure-Python reference of the kernel (exactly the int64 ops both
    engines run; Python ints are exact so this is the ground truth the
    cross-engine tests compare against)."""
    if not (1 <= q <= p):
        raise ValueError("log2fix requires p >= q >= 1")
    if p >= 1 << 52:
        raise ValueError("log2fix domain is p < 2^52")
    k = p // q
    e = k.bit_length() - 1
    qq = q << e
    a = p // qq
    r1 = (p % qq) << 10
    b = r1 // qq
    r2 = (r1 % qq) << 10
    c = r2 // qq
    r3 = (r2 % qq) << 10
    d = r3 // qq
    y = a * _M30 + b * (1 << 20) + c * (1 << 10) + d
    f = 0
    for _ in range(frac):
        s = (y * y) >> 30
        if s >= _M31:
            f = f * 2 + 1
            y = s >> 1
        else:
            f = f * 2
            y = s
    return e * (1 << frac) + f


def log2fix_layers(
    p: str, q: str, out: str, frac: int = 20, div: str = "//",
    shl1: str = "(cast(1 as bigint) << cast({e} as int))",
) -> List[List[Tuple[str, str]]]:
    """Emit the kernel as layers of ``(alias, expr)`` — every expr
    references only ``p`` / ``q`` or aliases from STRICTLY EARLIER
    layers (see module docstring for why lateral chains are banned).
    ``p`` / ``q`` are SQL expressions yielding positive BIGINTs;
    ``out`` is the final alias and the intermediate prefix. ``div`` is
    the dialect's truncating integer division; ``shl1`` renders
    ``2^e`` (the one variable shift — constant shifts are literal
    multiplies, shared by every dialect)."""
    n = out
    layers: List[List[Tuple[str, str]]] = [
        [(f"{n}__k", f"({p}) {div} ({q})")],
        [(f"{n}__e", f"cast(length(bin({n}__k)) as bigint) - 1")],
        [(f"{n}__q2", f"({q}) * " + shl1.format(e=f"{n}__e"))],
        [(f"{n}__r1", f"(({p}) % {n}__q2) * 1024")],
        [(f"{n}__r2", f"({n}__r1 % {n}__q2) * 1024")],
        [(f"{n}__r3", f"({n}__r2 % {n}__q2) * 1024")],
        [
            (
                f"{n}__y0",
                f"(({p}) {div} {n}__q2) * 1073741824"
                f" + ({n}__r1 {div} {n}__q2) * 1048576"
                f" + ({n}__r2 {div} {n}__q2) * 1024"
                f" + ({n}__r3 {div} {n}__q2)",
            ),
            (f"{n}__f0", "cast(0 as bigint)"),
        ],
    ]
    # One layer per square-and-shift iteration: the step value
    # s = (y*y) >> 30 is inlined into both emitted aliases instead of
    # getting its own layer. y_{i-1} is a REAL resolved column (not a
    # lateral alias), so the duplication is a bounded 4 copies of one
    # multiply-divide per step — NOT the recursive 4^n blowup the
    # module docstring bans — and the layer count halves (48 -> 28
    # for frac=20), which is what the analyzer/binder bill actually
    # scales with (round 15 measured ~1 s of planning per 48-layer
    # kernel application on BOTH engines).
    for i in range(1, frac + 1):
        s = f"(({n}__y{i - 1} * {n}__y{i - 1}) {div} 1073741824)"
        layers.append(
            [
                (f"{n}__y{i}",
                 f"case when {s} >= 2147483648"
                 f" then {s} {div} 2 else {s} end"),
                (f"{n}__f{i}",
                 f"{n}__f{i - 1} * 2"
                 f" + (case when {s} >= 2147483648"
                 f" then 1 else 0 end)"),
            ]
        )
    layers.append([(n, f"{n}__e * {1 << frac} + {n}__f{frac}")])
    return layers


def _shared_layers_with_liveness(
    per_kernel: List[List[List[Tuple[str, str]]]],
    finals: set,
) -> List[Tuple[List[Tuple[str, str]], List[str]]]:
    """Zip sibling kernels into shared layers and compute, per layer,
    which earlier aliases DIE there (produced before, not a final,
    and never referenced by any later layer's exprs). Pruning dead
    intermediates keeps every projection O(kernels) wide instead of
    O(layers) — the analyzer/binder bill is layers x width, and the
    naive ``SELECT *`` emission made width grow with layers."""
    import re

    shared = [
        [item for layer in layers for item in layer]
        for layers in zip(*per_kernel)
    ]
    produced_at = {}
    for j, merged in enumerate(shared):
        for a, _ in merged:
            produced_at[a] = j
    last_ref = dict(produced_at)
    pats = {a: re.compile(rf"\b{re.escape(a)}\b") for a in produced_at}
    for j, merged in enumerate(shared):
        for _, e in merged:
            for a, pat in pats.items():
                if produced_at[a] < j and pat.search(e):
                    if last_ref[a] < j:
                        last_ref[a] = j
    # an alias must live in output(t) for t in [produced, last_ref-1]
    # (layer last_ref reads it from its input) and is dropped exactly
    # once, when emitting layer max(last_ref, produced+1)
    drop_layer = {
        a: max(last_ref[a], produced_at[a] + 1)
        for a in produced_at
        if a not in finals
    }
    out = []
    for j, merged in enumerate(shared):
        dead = sorted(a for a, dj in drop_layer.items() if dj == j)
        out.append((merged, dead))
    return out


def spark_apply_multi(
    df: DataFrame,
    specs: List[Tuple[str, str, str]],
    frac: int = 20,
) -> DataFrame:
    """Append one column per ``(p, q, out)`` spec, every kernel
    riding the SAME layer stack (layer i of every kernel lands in one
    shared Project): n independent log2fix columns cost the layer
    count of one — the analyzer bill scales with layers, not with
    aliases per layer. Dead intermediates (y_{i-1}, f_{i-1}, the
    long-division remainders) are pruned from each layer's output,
    so projections stay a few columns wide however long the chain.
    Use for sibling kernels over the same frame (dsir's lrA/lrB; a
    log-likelihood numerator + denominator)."""
    per_kernel = [
        log2fix_layers(
            p, q, out, frac, div="div",
            shl1="shiftleft(cast(1 as bigint), cast({e} as int))",
        )
        for p, q, out in specs
    ]
    finals = {out for _, _, out in specs}
    alive = list(df.columns)
    produced: set = set()
    for merged, dead in _shared_layers_with_liveness(
        per_kernel, finals
    ):
        dead_s = set(dead)
        alive = [c for c in alive if c not in dead_s]
        df = df.selectExpr(
            *alive, *[f"{e} AS {a}" for a, e in merged]
        )
        alive.extend(a for a, _ in merged)
        produced.update(a for a, _ in merged)
    # liveness drops every intermediate before the end (the last f/e
    # die on the final layer); this is a defensive sweep over OUR
    # aliases only — caller columns are never touched
    return df.drop(
        *[a for a in alive if a in produced and a not in finals]
    )


def spark_apply(
    df: DataFrame, p: str, q: str, out: str, frac: int = 20
) -> DataFrame:
    """Append column ``out`` = log2fix(p, q) to ``df`` (and drop the
    kernel's intermediates). One Project per recurrence layer — a
    narrow map-only chain, no shuffle, no UDF; run it on the SMALL
    frame (per-term, per-bucket), never per scored row (per-row noise
    wants the table face: log2_table / log2tbl_py)."""
    return spark_apply_multi(df, [(p, q, out)], frac)


def duckdb_nested_multi(
    source: str,
    specs: List[Tuple[str, str, str]],
    frac: int = 20,
) -> str:
    """DuckDB mirror of spark_apply_multi: one nested SELECT per
    shared recurrence layer, dead intermediates EXCLUDEd per layer so
    the binder's per-layer width stays O(kernels). The final output
    carries the source columns + the ``out`` columns (+ the last
    layer's f accumulator) — wrap with an outer SELECT to project."""
    per_kernel = [
        log2fix_layers(p, q, out, frac) for p, q, out in specs
    ]
    finals = {out for _, _, out in specs}
    sql = f"SELECT * FROM ({source})"
    for merged, dead in _shared_layers_with_liveness(
        per_kernel, finals
    ):
        items = ", ".join(f"{e} AS {a}" for a, e in merged)
        star = (
            "* EXCLUDE ({})".format(", ".join(dead)) if dead else "*"
        )
        sql = f"SELECT {star}, {items} FROM ({sql})"
    return sql


def duckdb_nested(
    source: str, p: str, q: str, out: str, frac: int = 20
) -> str:
    """A DuckDB subquery string computing ``SELECT *, {out} FROM
    (source)`` via one nested SELECT per recurrence layer (kernel
    intermediates remain in the output — wrap with an outer SELECT to
    prune). ``source`` is any ``SELECT ...`` string."""
    return duckdb_nested_multi(source, [(p, q, out)], frac)


# --- table-backed log2: the PER-ROW face of the kernel -------------
#
# The layered kernel above is the right shape for SMALL frames
# (per-term idf, per-bucket likelihood ratios): ~48 projection layers
# amortize over a broadcast-sized input. Run per CORPUS ROW it is the
# wrong shape twice over — ~130 int64 ops/row of execution, and (the
# cost round 15 actually measured) a Catalyst/DuckDB-binder analysis
# bill that grows with layers × columns and landed a 2-4x normalized
# regression on the dsir family. The table face fixes the shape:
# compute log2 of the 13-bit mantissa ONCE for all 4096 values with
# the exact same kernel, then per row do only
#
#     log2tbl(x) = (bitlen(x) - 1) * 2^frac + T[mantissa_12bits(x)]
#
# — a bit-length, one shift-divide, and one constant-array lookup.
# The result is log2(x) * 2^frac with the mantissa TRUNCATED to 12
# bits: a coarser but equally DEFINED deterministic int64 function of
# x (max error 2^-12 * 2^frac in the fraction), which is exactly what
# hash-contract noise needs and corpus-statistics ratios do not — use
# the layered kernel for statistics, the table for per-row noise.

TBL_BITS = 12
_TBL_CACHE: dict = {}


def log2_table(frac: int = 20, bits: int = TBL_BITS) -> List[int]:
    """T[m] = log2fix(2^bits + m, 2^bits, frac) for m in [0, 2^bits):
    the fractional log2 of every truncated mantissa, computed by the
    ground-truth kernel (cached; ~4096 log2fix_py calls once per
    process)."""
    key = (frac, bits)
    if key not in _TBL_CACHE:
        n = 1 << bits
        _TBL_CACHE[key] = [
            log2fix_py(n + m, n, frac) for m in range(n)
        ]
    return _TBL_CACHE[key]


def log2tbl_py(x: int, frac: int = 20, bits: int = TBL_BITS) -> int:
    """Pure-Python reference of the table lookup (ground truth for the
    cross-engine tests): log2(x) * 2^frac with a bits-bit mantissa."""
    if x < 1:
        raise ValueError("log2tbl requires x >= 1")
    if x >= 1 << 52:
        raise ValueError("log2tbl domain is x < 2^52")
    e = x.bit_length() - 1
    m = ((x << bits) >> e) - (1 << bits)
    return e * (1 << frac) + log2_table(frac, bits)[m]
