"""Similarity search over embedding columns (array<float>).

Two paths:
  * cosine_topk — exact brute force: broadcast the (small) query set,
    score every corpus vector, window top-k. The correctness baseline.
  * ann_lsh_topk — random-hyperplane LSH: bucket corpus + queries by
    sign-pattern, score only within matching buckets. The scale path:
    at 100 TB the corpus never self-joins; per-query cost is bucket-sized.

Determinism: vector elements are scaled to int64 at 1e9 (round(x·1e9)),
products (≤1e18, exact in int64) accumulate into DECIMAL(38,0) — integer
arithmetic is associative, so the dot product is independent of
partition/summation order AND bit-identical to the DuckDB oracle's
SUM(BIGINT)→HUGEINT over the same scaled elements (float sums are
neither). The final cosine division runs in IEEE double on identical
inputs, hence identical outputs. The 1e-9 quantization is far below
float32 input precision, so ranking quality is unaffected.

Hyperplanes for LSH are generated from the same portable md5-based hash
as the dedup operators — no RNG, reproducible everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000_000.0  # 1e9: element quantization grid
# decimal(38,0) is addition-stable (scale 0 never loses precision) and
# holds ~1e19 products × 1e19 rows without overflow
_ACC = "decimal(38,0)"


def _scaled(x: Column) -> Column:
    """int64 element at 1e9 grid; identical to the oracle's
    CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT)."""
    return F.round(x.cast("double") * F.lit(_SCALE), 0).cast("long")


def scaled_vec(vec: Column) -> Column:
    """Whole vector on the int64 grid (array<long>). Compute this ONCE per
    side before a join: re-scaling inside the pair expression multiplies
    the rounding work by the pair count."""
    return F.transform(vec, _scaled)


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent exact dot product of two float arrays (scaled by
    1e18; callers divide through norms so the scale cancels)."""
    return dot_scaled(scaled_vec(a), scaled_vec(b))


def dot_scaled(sa: Column, sb: Column) -> Column:
    """Exact dot of two pre-scaled int64 arrays."""
    prods = F.zip_with(sa, sb, lambda x, y: x * y)
    return F.aggregate(
        prods, F.lit(0).cast(_ACC), lambda acc, x: acc + x.cast(_ACC)
    )


def dot_scaled_unrolled(
    sa: Column, sb: Column, dim: int, long_acc: bool = False
) -> Column:
    """Exact scaled dot product as a DIM-UNROLLED expression: dim
    element_at products summed. Bit-identical to ``dot_scaled``
    (integer addition is associative), but every term is a plain
    codegen-able expression — higher-order-function lambdas
    (zip_with/aggregate) never enter whole-stage codegen and run on the
    interpreted path, measured ~30µs per evaluation; unrolled is far
    faster. Use for HOT inner loops (pair scoring, Lloyd assignment);
    the HOF forms remain for dynamic dims.

    ``long_acc=True`` accumulates in int64 instead of decimal —
    decimal(38,0) codegen still allocates BigDecimals per op (~10µs per
    64-term evaluation); longs are ~100x cheaper. SAFE ONLY under a
    norm bound the CALLER guarantees: for vectors with L2 norm <= 1.5
    on the 1e9 grid, Cauchy-Schwarz bounds every partial sum by
    sum|x_i y_i| <= |x||y| <= 2.25e18 < 2^63. Results are identical to
    the decimal path whenever both are in range."""
    acc = "long" if long_acc else _ACC
    terms = [
        (
            F.element_at(sa, j + 1).cast(acc)
            * F.element_at(sb, j + 1).cast(acc)
        )
        for j in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def l2sq_scaled_unrolled(
    sa: Column, sb: Column, dim: int, long_acc: bool = False
) -> Column:
    """Exact scaled squared-L2 distance, dim-unrolled (see
    dot_scaled_unrolled for why and for the ``long_acc`` norm-bound
    contract: sum (x-y)^2 = |x|^2 + |y|^2 - 2xy <= 9e18 for norms
    <= 1.5e9, and every per-term square is <= (3e9)^2; terms are
    non-negative so partial sums never exceed the total)."""
    acc = "long" if long_acc else _ACC
    terms = []
    for j in range(dim):
        d = (
            F.element_at(sa, j + 1).cast(acc)
            - F.element_at(sb, j + 1).cast(acc)
        )
        terms.append(d * d)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dim_guard(arr: Column, dim: int, expr: Column) -> Column:
    """Make a dim/vector-length mismatch LOUD: the unrolled expressions
    hard-index 1..dim, so a longer vector would silently truncate the
    sum (underestimated cosines, missed near-dups) and a shorter one
    throws a bare array-index error. One size() compare per evaluation;
    raise_error carries the actual length."""
    return F.when(F.size(arr) == dim, expr).otherwise(
        F.raise_error(
            F.format_string(
                "vector length %s does not match unrolled dim "
                + str(dim),
                F.size(arr),
            )
        )
    )


def _pair_guard(a: Column, b: Column, expr: Column) -> Column:
    """Make a PAIRWISE length mismatch LOUD on the dynamic-dim HOF
    paths: zip_with silently truncates to the shorter array, so a
    corpus/centroid (or query/index) length skew would underestimate
    every dot product instead of failing. Unlike ``_dim_guard`` this
    imposes no static dim — equal-length pairs of ANY width pass, so
    dim-agnostic callers keep working."""
    return F.when(F.size(a) == F.size(b), expr).otherwise(
        F.raise_error(
            F.format_string(
                "paired vector lengths %s and %s differ",
                F.size(a),
                F.size(b),
            )
        )
    )


def attach_scaled(df: DataFrame, vec_col: str, prefix: str = "") -> DataFrame:
    """Add ``{prefix}svec`` (int64-scaled vector) and ``{prefix}norm``
    (double L2 norm on the scaled grid) — the per-vector precomputation
    that turns per-pair cosine into one zip_with + one divide."""
    out = df.withColumn(f"{prefix}svec", scaled_vec(F.col(vec_col)))
    return out.withColumn(
        f"{prefix}norm",
        F.sqrt(
            dot_scaled(F.col(f"{prefix}svec"), F.col(f"{prefix}svec")).cast(
                "double"
            )
        ),
    )


def norm_sq_exact(a: Column) -> Column:
    return dot_exact(a, a)


def cosine_exact(a: Column, b: Column) -> Column:
    """Cosine similarity, deterministic to the bit (see module docstring)."""
    return dot_exact(a, b).cast("double") / (
        F.sqrt(norm_sq_exact(a).cast("double"))
        * F.sqrt(norm_sq_exact(b).cast("double"))
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query by cosine.

    Physical shape: broadcast-nested-loop join (queries are small),
    per-partition scoring, then a window top-k — the shuffle carries only
    (query, corpus_id, cosine) triples, k-filtered by AQE-friendly
    row_number. Ties broken by corpus id for determinism.
    """
    cs = attach_scaled(corpus, corpus_vec, "c_")
    qs = attach_scaled(queries, query_vec, "q_")
    scored = cs.crossJoin(F.broadcast(qs)).select(
        F.col(query_id),
        F.col(corpus_id),
        (
            dot_scaled(F.col("q_svec"), F.col("c_svec")).cast("double")
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    dim: int = 64,
    max_bucket: int | None = None,
    block_col: str | None = None,
    unit_norm: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    LSH blocking first (same sign-bucket under ``planes`` random
    hyperplanes), exact cosine verify second — the corpus never fully
    self-joins. Output: (id_a, id_b, cosine), id_a < id_b.

    ``max_bucket``: skew guard — buckets larger than this are dropped
    before the self-join (a degenerate bucket, e.g. a mass of identical
    embeddings, otherwise makes pair generation O(b²); exact dedup should
    collapse those upstream). See operators.dedup.cap_buckets for the
    observable dropped-bucket stats. Set it at scale.

    ``block_col``: use an EXISTING column of ``df`` as the blocking key
    instead of hyperplane signs — e.g. a k-means cell id
    (``kmeans_assign``), the data-ADAPTIVE choice. Hyperplane buckets
    depend on the corpus direction distribution: on a corpus whose
    vectors concentrate around a shared direction (any single-domain
    text corpus under feature hashing), most rows share a sign pattern
    and within-bucket pair generation degrades toward O(n²) — measured
    5x the time for 3x the docs. k-means cells track density by
    construction, so cell sizes stay ~n/k and pair cost stays linear
    for k grown with the corpus.
    """
    from .dedup import cap_buckets

    bucketed = attach_scaled(df, vec_col).withColumn(
        "bucket",
        F.col(block_col)
        if block_col is not None
        else _hyperplane_bucket(F.col(vec_col), planes, dim),
    )
    if max_bucket is not None:
        bucketed, _ = cap_buckets(bucketed, ["bucket"], max_bucket)
    if unit_norm:
        # UNPACKED-COLUMN scoring: project svec into ``dim`` primitive
        # long columns per side BEFORE the join, then score with plain
        # column-arithmetic sum-of-products. The array form (a
        # dim-term element_at chain evaluated above the join) runs at
        # interpreted speed even inside a WholeStageCodegen Project —
        # measured 42.1 s vs 4.1 s for the same 9M candidate pairs at
        # x10 — while primitive columns stay in fast codegen. The
        # unpack itself is one element_at per (row, dim) on the n-row
        # side, trivial next to the pair fan-out, and the shuffled
        # bytes are unchanged (same dim longs per row, flat instead of
        # boxed in an array). Identical int64 math (|dot| <= 1e18 by
        # Cauchy-Schwarz under the unit-norm grid bound, so plain long
        # accumulation is exact) -> bit-identical cosines. _dim_guard
        # rides the first unpacked column so a length-mismatched
        # vector still raises instead of silently truncating.
        def unpack(tag: str) -> list[Column]:
            return [
                (
                    _dim_guard(
                        F.col("svec"), dim, F.element_at("svec", 1)
                    )
                    if i == 0
                    else F.element_at("svec", i + 1)
                ).alias(f"_{tag}{i}")
                for i in range(dim)
            ]

        a = bucketed.select(
            F.col(id_col).alias("id_a"),
            F.col("norm").alias("na"),
            "bucket",
            *unpack("a"),
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"),
            F.col("norm").alias("nb"),
            "bucket",
            *unpack("b"),
        )
        dot = F.col("_a0") * F.col("_b0")
        for i in range(1, dim):
            dot = dot + F.col(f"_a{i}") * F.col(f"_b{i}")
        return (
            a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (
                    dot.cast("double") / (F.col("na") * F.col("nb"))
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= F.lit(threshold))
            .distinct()
        )
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col("svec").alias("sa"),
        F.col("norm").alias("na"),
        "bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col("svec").alias("sb"),
        F.col("norm").alias("nb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # generic path: the HOF decimal dot — unrolled DECIMAL is
            # SLOWER than interpreted HOF (BigDecimal alloc per term,
            # measured 5x at x10), so unpacking only pays with longs
            (
                dot_scaled(F.col("sa"), F.col("sb")).cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .distinct()
    )


def _hyperplane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from md5 of "plane:dim" — no RNG state, reproducible."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return (h / float(1 << 31)) - 1.0


def _hyperplane_bucket(vec: Column, planes: int, dim: int = 64) -> Column:
    """Sign-pattern bucket id: bit p = sign(vec · plane_p)."""
    bucket = F.lit(0)
    for p in range(planes):
        # constant plane folded into the plan as an array literal
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(
                    *[
                        F.lit(_hyperplane_component(p, d))
                        for d in range(dim)
                    ]
                ),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _hyperplane_projections(vec: Column, planes: int, dim: int) -> Column:
    """array<double> of the vector's projection onto each hyperplane."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(
                        *[
                            F.lit(_hyperplane_component(p, d))
                            for d in range(dim)
                        ]
                    ),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for p in range(planes)
        ]
    )


def ivf_write(
    corpus: DataFrame,
    path: str,
    planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF (inverted-file) ANN layout: the corpus bucketed
    by hyperplane sign-pattern and written as parquet PARTITIONED BY the
    bucket, with the int64-scaled vector and L2 norm precomputed.

    This is the at-rest form of ``ann_lsh_topk``'s corpus side: a query
    then reads only its probed buckets (a partition-pruned scan — at 100 TB
    the unprobed ~2^planes - probes fraction of the corpus is never
    touched), and per-row preprocessing is already paid.
    """
    cb = attach_scaled(corpus, vec_col, "c_").withColumn(
        "bucket", _hyperplane_bucket(F.col(vec_col), planes, dim)
    )
    (
        # cluster by output partition before the write (guide §6 —
        # see ivf_pq_write's note)
        cb.select(id_col, "c_svec", "c_norm", "bucket")
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    planes: int = 6,
    dim: int = 64,
    probes: int = 1,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """Approximate top-k against a materialized ``ivf_write`` index.

    Multi-probe: each query searches its own bucket plus the buckets
    reached by flipping the ``probes - 1`` planes with the smallest
    projection margin (the classic multi-probe LSH order) — recall rises
    with ``probes`` while the scan stays partition-pruned to
    ``probes / 2**planes`` of the corpus. The probe join broadcasts the
    (small) query set, so Spark's dynamic partition pruning derives the
    bucket filter for the index scan at runtime.

    With ``probes=1`` results are identical to ``ann_lsh_topk`` on the
    same corpus/planes (same buckets, same exact-cosine scoring).
    """
    index = spark.read.parquet(path)
    qs = attach_scaled(queries, query_vec, "q_").withColumn(
        "projs", _hyperplane_projections(F.col(query_vec), planes, dim)
    )
    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket + F.when(
            F.element_at(F.col("projs"), p + 1) > 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
    qs = qs.withColumn("bucket0", bucket)
    # planes ranked by |margin| ascending: flip the least-confident first
    flip_order = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.element_at(F.col("projs"), p + 1)).alias(
                        "margin"
                    ),
                    F.lit(p).alias("plane"),
                )
                for p in range(planes)
            ]
        )
    )
    # 2^plane via a literal int array lookup — pure integer (pow()
    # is a libm call with no cross-engine exactness guarantee, and
    # the bucket id it feeds reaches the output set)
    pow2 = F.array(*[F.lit(1 << p) for p in range(planes)])
    probe_list = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(
            F.element_at(
                pow2, F.element_at(flip_order, i + 1)["plane"] + 1
            )
        )
        for i in range(max(0, min(probes - 1, planes)))
    ]
    probed = qs.withColumn(
        "bucket", F.explode(F.array(*probe_list))
    ).select(query_id, "q_svec", "q_norm", "bucket")
    scored = index.join(F.broadcast(probed), "bucket").select(
        F.col(query_id),
        F.col(corpus_id),
        (
            dot_scaled(F.col("q_svec"), F.col("c_svec")).cast("double")
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    planes: int = 6,
    dim: int = 64,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket. Recall rises as ``planes`` falls (bigger buckets).

    At scale, persist the bucketed corpus partitioned by bucket — each
    query then touches one partition (an IVF-style inverted file).
    """
    cb = attach_scaled(corpus, corpus_vec, "c_").withColumn(
        "bucket", _hyperplane_bucket(F.col(corpus_vec), planes, dim)
    )
    qb = attach_scaled(queries, query_vec, "q_").withColumn(
        "bucket", _hyperplane_bucket(F.col(query_vec), planes, dim)
    )
    scored = cb.join(F.broadcast(qb), "bucket").select(
        F.col(query_id),
        F.col(corpus_id),
        (
            dot_scaled(F.col("q_svec"), F.col("c_svec")).cast("double")
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF training: one exact Lloyd (k-means) iteration
# ---------------------------------------------------------------------------


def kmeans_step(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    unit_norm: bool = False,
) -> DataFrame:
    """One Lloyd iteration over the corpus: assign every vector to its
    nearest seed centroid (exact squared-L2 on the int64 grid), then
    recompute per-cluster per-dimension means — the training step that
    turns the IVF layout's buckets into data-adaptive cells (run it
    Kmax times driver-side for full k-means; each step is one job).

    Determinism end-to-end: seeds are the k lowest-id vectors (no RNG);
    distances are integer (decimal-accumulated), so argmin has no float
    ambiguity, with cluster id as the documented tiebreak; means divide
    an exact integer sum once in IEEE double.

    Scale shape: the seed side is k rows — broadcast, never shuffled;
    the corpus×k distance fan-out collapses map-side via min_by partial
    aggregation (one shuffle keyed on the vector id carrying one row per
    vector); the centroid update explodes assigned vectors to (cluster,
    dim) — dim-fold map-side fan-out into a 2nd shuffle of k×dim groups.

    Output: (cluster_id, dim, n_members, mean) — k×dim rows.
    """
    c = corpus.select(
        F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec")
    )
    return _lloyd_means(
        _lloyd_assign(
            c,
            _kmeans_seeds(corpus, k, id_col, vec_col),
            id_col,
            dim,
            unit_norm,
        )
    )


def _kmeans_seeds(
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    seed_order: str = "asc",
) -> DataFrame:
    """Deterministic seeds: the k lowest-id vectors (no RNG).
    ``seed_order="desc"`` seeds from the HIGHEST ids instead — the
    cheap way to get a second, independent-enough clustering of the
    same corpus for product (two-level) blocking."""
    order = (
        F.col(id_col) if seed_order == "asc" else F.col(id_col).desc()
    )
    return (
        corpus.orderBy(order)
        .limit(k)
        .select(
            F.col(id_col).alias("cid"),
            scaled_vec(F.col(vec_col)).alias("c_svec"),
        )
    )


def _assign_dist(dim: int, unit_norm: bool) -> Column:
    """The centroid-assignment distance expression over columns
    ``svec`` / ``c_svec``: exact integer squared-L2, on the
    dim-unrolled int64 path under the unit-norm bound, else the
    dim-agnostic HOF decimal path (see _lloyd_assign for the full
    trade discussion)."""
    if unit_norm:
        # unrolled path hard-indexes 1..dim: BOTH sides must match
        # the static dim (a longer c_svec would silently truncate)
        return _dim_guard(
            F.col("svec"),
            dim,
            _dim_guard(
                F.col("c_svec"),
                dim,
                l2sq_scaled_unrolled(
                    F.col("svec"), F.col("c_svec"), dim,
                    long_acc=True,
                ),
            ),
        )
    # generic path: HOF decimal — unrolled decimal is slower
    # (BigDecimal per term); see dot_scaled_unrolled docstring.
    # Guarded PAIRWISE (not against the static dim): zip_with
    # silently truncates a corpus/centroid length skew, but
    # equal-length vectors of any width are fine — dim-agnostic
    # callers with non-default widths keep working
    return _pair_guard(
        F.col("svec"),
        F.col("c_svec"),
        F.aggregate(
            F.zip_with(
                F.col("svec"),
                F.col("c_svec"),
                lambda x, y: (x.cast(_ACC) - y.cast(_ACC))
                * (x.cast(_ACC) - y.cast(_ACC)),
            ),
            F.lit(0).cast(_ACC),
            lambda acc, x: acc + x,
        ),
    )


def _assign_dists_exploded(
    c: DataFrame,
    cents: DataFrame,
    id_col: str,
    dim: int,
) -> DataFrame:
    """(id, cid, dist) for every vector x centroid pair — the CODEGEN
    distance fan-out for the unit-norm int64 path: posexplode both
    sides, broadcast-hash-join on the dimension index, hash-aggregate
    the squared differences ((v-cv)^2 sums to <= 4e18 under the
    unit-norm 1e9-grid bound, so plain long sums are exact). Same
    integer dist values as the dim-unrolled projection, so
    argmin/tiebreak — and therefore trained centroids and oracle
    parity — are unchanged.

    Why not the unrolled expression over the broadcast nested-loop
    join: that projection compiles but evaluates ~4.5x slower
    (measured 7.1 s vs 1.6 s for a 15k x 96 fan-out at dim 64 — ~0.3us
    per element_at; BNLJ output sits outside whole-stage codegen). The
    price here is that the (id, cid) partial aggregate's exchange
    carries n*k narrow rows where min_by-over-fanout carried n; at the
    semantic family's operating envelope (<=~50k docs per
    partition-set after blocking) that exchange is trivial next to the
    n*k*dim compute this shape wins back.

    Both sides are size-guarded BEFORE the explode: the join on the
    dimension index would silently DROP a length mismatch (exactly the
    failure the guards exist to make loud)."""
    ce = c.select(
        F.col(id_col),
        F.posexplode(
            _dim_guard(F.col("svec"), dim, F.col("svec"))
        ).alias("_i", "_v"),
    )
    ke = cents.select(
        "cid",
        F.posexplode(
            _dim_guard(F.col("c_svec"), dim, F.col("c_svec"))
        ).alias("_i", "_cv"),
    )
    d = F.col("_v") - F.col("_cv")
    return (
        ce.join(F.broadcast(ke), "_i")
        .groupBy(id_col, "cid")
        .agg(F.sum(d * d).alias("dist"))
    )


# Batched-numpy centroid assignment (r18 optimization round). The
# exploded hash-agg fan-out (_assign_dists_exploded) moves n*k narrow
# rows through a hash aggregate plus an (id, cid) exchange — at the
# semantic family's operating point (50k docs x 223..324 cells x
# 32..64 dims) that is ~0.7-1.5e9 aggregate rows per assignment, the
# single largest compute in the bench. The same distances computed as
# ONE int64 matrix product per Arrow batch (|v|^2 + |c|^2 - 2 V.C^T,
# exact: every term <= 4.5e18 < 2^63 under the unit-norm 1e9-grid
# bound the caller already guarantees) run ~15x faster per core and
# need NO exchange at all — mapInArrow is a narrow map, the k-row
# centroid side rides the task closure. Ties break to the LOWEST cid
# exactly as min_by(struct(dist, cid)) / ROW_NUMBER(ORDER BY dist,
# cid): centroid columns are sorted by cid ascending and
# argmin/stable-argsort take the first minimum. Assignments are
# therefore bit-identical to the exploded path (integer math, same
# argmin, same tiebreak) — asserted by tests against both the legacy
# path and the DuckDB oracle. SPARK_GRAFT_NP_ASSIGN=0 falls back to
# the exploded shape (measurement hook; values identical either way).
_NP_ASSIGN_ENV = "SPARK_GRAFT_NP_ASSIGN"
_CID_PA_TYPES = ("bigint", "int", "smallint", "tinyint")


def _np_assign_enabled() -> bool:
    if os.environ.get(_NP_ASSIGN_ENV) == "0":
        return False
    try:
        import numpy  # noqa: F401
        import pyarrow  # noqa: F401
    except ImportError:
        return False
    return True


def _np_assign_frame(
    c: DataFrame,
    cents: DataFrame,
    id_col: str,
    dim: int,
    probes: int | None = None,
    keep_svec: bool = False,
) -> DataFrame | None:
    """Centroid assignment as a mapInArrow numpy kernel (see the block
    comment above). ``probes=None`` -> argmin frame ``(id, cid[,
    svec])``; ``probes=p`` -> multi-probe frame ``(id, cluster_id,
    cell_rank)`` with rank 1..p by (dist, cid). Returns None when the
    centroid frame's shape doesn't fit the kernel (non-integer cid) so
    the caller can fall back to the exploded path. Collecting ``cents``
    is bounded by k — the same size class as the broadcast the legacy
    path ships.

    Two documented behavior notes (ADVICE r18):
    * the ``cents.collect()`` below is EAGER — building a kmeans-family
      plan executes the centroid-training jobs at plan-construction
      time, so tools/capture_plans.py's 'built, not run' contract does
      not hold for these queries (accepted: the collect is what lets
      the kernel fold k centroids into one matrix product instead of an
      n x k exploded join; a lazy broadcast would move the fold into
      the task where the matrix must be rebuilt per batch iterator).
    * NULL vector ELEMENTS raise here, where the exploded path would
      silently sum the non-null terms into a wrong distance — raising
      is deliberate (a NULL element is corrupt input, not a distance),
      and NULL whole-vector rows are dropped exactly like posexplode
      drops them."""
    import numpy as np
    import pyarrow as pa

    cid_type = cents.schema["cid"].dataType.simpleString()
    if cid_type not in _CID_PA_TYPES:
        return None
    id_type = {
        f.name: f.dataType.simpleString() for f in c.schema.fields
    }[id_col]
    rows = [
        (r[0], r[1]) for r in cents.select("cid", "c_svec").collect()
    ]
    rows.sort(key=lambda r: r[0])
    for _, cv in rows:
        if cv is None or len(cv) != dim:
            raise ValueError(
                f"vector length {'NULL' if cv is None else len(cv)} "
                f"does not match unrolled dim {dim}"
            )
    spark = c.sparkSession
    if probes is None:
        out_schema = f"{id_col} {id_type}, cid {cid_type}" + (
            ", svec array<bigint>" if keep_svec else ""
        )
    else:
        out_schema = (
            f"{id_col} {id_type}, cluster_id {cid_type}, cell_rank int"
        )
    if not rows:
        # empty centroid set: the join/fan-out forms emit no rows
        return spark.createDataFrame([], out_schema)
    C = np.asarray([list(cv) for _, cv in rows], dtype=np.int64)
    cids = np.asarray([cid for cid, _ in rows], dtype=np.int64)
    cn = np.einsum("ij,ij->i", C, C)
    cid_pa = {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
    }[cid_type]

    def kernel(batches):
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.compute as _pc

        for b in batches:
            ids, sv = b.column(0), b.column(1)
            if sv.null_count:
                # the exploded form drops NULL-vector rows (posexplode
                # emits nothing) — mirror that
                mask = _pc.is_valid(sv)
                ids, sv = ids.filter(mask), sv.filter(mask)
            n = len(ids)
            if n == 0:
                continue
            lens = _pc.list_value_length(sv).to_numpy(
                zero_copy_only=False
            )
            if (lens != dim).any():
                bad = int(lens[(lens != dim).argmax()])
                raise ValueError(
                    f"vector length {bad} does not match unrolled "
                    f"dim {dim}"
                )
            flat = _pc.list_flatten(sv)
            if flat.null_count:
                raise ValueError(
                    "vector contains NULL elements — cannot assign"
                )
            V = (
                flat.to_numpy(zero_copy_only=False)
                .astype(_np.int64, copy=False)
                .reshape(n, dim)
            )
            # exact int64: |v|^2, |c|^2, 2 v.c all <= 4.5e18 under the
            # unit-norm grid bound (norms <= 1.5e9)
            dist = (
                _np.einsum("ij,ij->i", V, V)[:, None]
                + cn[None, :]
                - 2 * (V @ C.T)
            )
            if probes is None:
                am = dist.argmin(axis=1)  # first min = lowest cid
                cols = [ids, _pa.array(cids[am]).cast(cid_pa)]
                names = [id_col, "cid"]
                if keep_svec:
                    cols.append(sv)
                    names.append("svec")
                yield _pa.RecordBatch.from_arrays(cols, names)
            else:
                p = min(probes, len(cids))
                order = _np.argsort(dist, axis=1, kind="stable")[:, :p]
                rep = _pa.array(_np.repeat(_np.arange(n), p))
                yield _pa.RecordBatch.from_arrays(
                    [
                        ids.take(rep),
                        _pa.array(cids[order].ravel()).cast(cid_pa),
                        _pa.array(
                            _np.tile(
                                _np.arange(1, p + 1, dtype=_np.int32), n
                            )
                        ),
                    ],
                    [id_col, "cluster_id", "cell_rank"],
                )

    return c.select(id_col, "svec").mapInArrow(kernel, out_schema)


def _lloyd_assign(
    c: DataFrame,
    cents: DataFrame,
    id_col: str,
    dim: int = 64,
    unit_norm: bool = False,
    np_assign: bool = True,
) -> DataFrame:
    """Assign every (id, svec) row to its nearest centroid by exact
    integer squared-L2; tiebreak = lowest centroid id. Centroids are k
    rows — broadcast; min_by collapses the k-fold fan-out map-side.

    Distance: with ``unit_norm`` the caller guarantees |x| <= 1 on the
    1e9 grid, so exact int64 math applies and the fan-out runs in the
    exploded hash-agg shape (_assign_dists_exploded — measured 4.5x
    the dim-unrolled projection, which compiles but evaluates outside
    whole-stage codegen above the nested-loop join); svec is joined
    back onto the argmin by id for the mean update. Without unit_norm
    the HOF decimal(38,0) form runs instead: (x-y)^2 overflows long
    already at |x| > ~1.5 on the grid, and the unrolled DECIMAL
    variant measured ~5x slower than the HOF (a BigDecimal allocation
    per term — see dot_scaled_unrolled).

    ``np_assign=False`` opts out of the numpy kernel and keeps the
    exploded LAZY plan: the kernel's eager ``cents.collect()`` costs
    one driver round-trip per Lloyd iteration, which is right for ONE
    wide training chain but wrong for many narrow ones — pq_train runs
    m=16 subspace chains, and the eager form turned codebook training
    into ~m * (iters + 1) sequential scheduler-bound jobs where the
    exploded form is a single lazy plan collected once (r19, measured
    10.5 -> ~2 s on the emb_pq_codes cold build). The two paths are
    bit-identical by construction (the kernel is parity-pinned to the
    exploded path in tests/test_similarity.py)."""
    if unit_norm:
        if np_assign and _np_assign_enabled():
            out = _np_assign_frame(
                c, cents, id_col, dim, keep_svec=True
            )
            if out is not None:
                return out
        argmin = (
            _assign_dists_exploded(c, cents, id_col, dim)
            .groupBy(id_col)
            .agg(F.min_by("cid", F.struct("dist", "cid")).alias("cid"))
        )
        return argmin.join(c.select(id_col, "svec"), id_col)
    return (
        c.crossJoin(F.broadcast(cents))
        .withColumn("dist", _assign_dist(dim, unit_norm))
        .groupBy(id_col)
        .agg(
            F.min_by("cid", F.struct("dist", "cid")).alias("cid"),
            F.first("svec").alias("svec"),  # identical across the k rows
        )
    )


def _lloyd_sums(assigned: DataFrame) -> DataFrame:
    """(cid, dim, n_members, s): exact per-cluster per-dimension count
    and int-grid coordinate sum of the assigned vectors."""
    ex = assigned.select("cid", F.posexplode("svec").alias("dim", "sv"))
    return ex.groupBy("cid", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("sv").cast(_ACC)).alias("s"),
    )


def _lloyd_means(assigned: DataFrame) -> DataFrame:
    """The presentation form of one Lloyd update: per-cluster
    per-dimension mean back in real space (one exact-int division in
    IEEE double)."""
    return _lloyd_sums(assigned).select(
        F.col("cid").alias("cluster_id"),
        "dim",
        "n_members",
        (
            (F.col("s").cast("double") / F.col("n_members").cast("double"))
            / F.lit(1e9)
        ).alias("mean"),
    )


def kmeans_train_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    unit_norm: bool = False,
    seed_order: str = "asc",
    np_assign: bool = True,
) -> DataFrame:
    """Centroids (cid, c_svec) after ``iters`` exact Lloyd updates from
    the deterministic lowest-id seeds (``iters=0`` returns the seeds;
    ``seed_order="desc"`` seeds from the highest ids — see
    _kmeans_seeds).

    Each update re-quantizes the new centroid to the int64 grid with
    MATHEMATICAL FLOOR division, spelled ``(s - ((s % n + n) % n)) / n``
    — bit-identical wherever ``%`` is the truncating remainder (Spark
    and DuckDB both), unlike round(), whose half-way ties Spark
    (HALF_UP) and DuckDB (half-even) break differently. That makes the
    whole training replayable as chained oracle CTEs. The ≤1-grid-unit
    (1e-9) quantization bias is far below float32 input precision.

    A cluster that loses all members simply disappears from the next
    round's centroid set (standard drop-empty Lloyd) — deterministic on
    both engines because the assignments are.

    Scale shape per iteration: one broadcast k-row crossJoin collapsed
    map-side (shuffle keyed on the vector id), one k x dim group-by —
    the same two shuffles as ``kmeans_step``; ``iters`` is a small
    constant, each iteration one job when materialized.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    c = corpus.select(
        F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec")
    )
    cents = _kmeans_seeds(corpus, k, id_col, vec_col, seed_order)
    for _ in range(iters):
        sums = _lloyd_sums(
            _lloyd_assign(c, cents, id_col, dim, unit_norm, np_assign)
        )
        quant = (
            (
                F.col("s")
                - F.pmod(F.col("s"), F.col("n_members").cast(_ACC))
            )
            / F.col("n_members").cast(_ACC)
        ).cast("long")
        cents = (
            sums.withColumn("cv", quant)
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "cv"))
                ).alias("dc")
            )
            .select(
                "cid",
                F.transform(F.col("dc"), lambda x: x["cv"]).alias(
                    "c_svec"
                ),
            )
        )
    return cents


def kmeans_train(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    unit_norm: bool = False,
) -> DataFrame:
    """Full fixed-iteration Lloyd training: the ``iters``-th update's
    per-cluster per-dimension means (same schema as ``kmeans_step``;
    ``iters=1`` IS ``kmeans_step`` — asserted in tests). Fixed iteration
    count rather than a convergence test keeps the computation a finite
    deterministic expression an oracle can replay."""
    if iters < 1:
        # iters=0 would silently present the means of one assignment
        # against the raw seeds — which IS iters=1 by this definition
        raise ValueError(f"kmeans_train requires iters >= 1, got {iters}")
    c = corpus.select(
        F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec")
    )
    cents = kmeans_train_centroids(
        corpus, k, iters - 1, id_col, vec_col, dim, unit_norm
    )
    return _lloyd_means(
        _lloyd_assign(c, cents, id_col, dim, unit_norm)
    )


def kmeans_assign(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    unit_norm: bool = False,
) -> DataFrame:
    """``corpus`` plus ``cluster_id`` = nearest trained centroid (exact
    integer L2, lowest-cid tiebreak) — the IVF cell assignment."""
    c = corpus.select(
        F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec")
    )
    return corpus.join(
        _lloyd_assign(c, cents, id_col, dim, unit_norm).select(
            id_col, F.col("cid").alias("cluster_id")
        ),
        id_col,
    )


def kmeans_assign_probes(
    corpus: DataFrame,
    cents: DataFrame,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    unit_norm: bool = False,
) -> DataFrame:
    """Each vector's ``probes`` NEAREST trained centroids — the
    multi-probe blocking assignment (one row per (vector, probe):
    ``(id_col, cluster_id, cell_rank)``, cell_rank 1..probes by exact
    integer L2, lowest-cid tiebreak). Rank r here is identical to
    ``ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cid) = r`` —
    the oracle-replayable contract.

    Scale shape: on the unit-norm path the distances come from the
    exploded hash-agg fan-out (_assign_dists_exploded), whose (id, cid)
    exchange already carries n*k narrow rows — a window top-``probes``
    over that frame adds no asymptotic cost and evaluates every
    distance exactly ONCE (the previous iterated-pass form re-evaluated
    the fan-out per probe, and pass 2's lineage nested pass 1's). The
    decimal path keeps the iterated min_by passes: its crossJoin
    fan-out collapses map-side, so the per-pass exchange moves n rows,
    never n x k — the right trade when the fan-out must not cross an
    exchange.
    """
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    # probes > k would SILENTLY emit only k rows per vector (row_number
    # runs out of centroids) — downstream multi-probe recall math then
    # overstates coverage. cents is k rows by contract, so the count is
    # a trivial action — but NOTE it is an eager one: callers that built
    # cents from an unpersisted Lloyd chain re-run training here (the
    # registry callers all tracked_persist the centroid frame first).
    # Degenerate corpora (drop-empty Lloyd on a near-uniform or tiny
    # input can leave fewer centroids than probes) CLAMP with a loud
    # warning instead of raising: every cell being probed is exhaustive
    # coverage, not an error, and the SQL oracle's ROW_NUMBER() <= probes
    # replay has exactly the clamped semantics.
    n_cents = cents.count()
    if probes > n_cents:
        import warnings

        warnings.warn(
            f"probes={probes} exceeds the number of trained centroids "
            f"({n_cents}); clamping to {n_cents} — every cell is "
            "probed (exhaustive coverage for this corpus)",
            stacklevel=2,
        )
        probes = n_cents
    if unit_norm:
        c = corpus.select(
            F.col(id_col), scaled_vec(F.col(vec_col)).alias("svec")
        )
        if _np_assign_enabled():
            out = _np_assign_frame(c, cents, id_col, dim, probes=probes)
            if out is not None:
                return out
        w = Window.partitionBy(id_col).orderBy("dist", "cid")
        return (
            _assign_dists_exploded(c, cents, id_col, dim)
            .withColumn("cell_rank", F.row_number().over(w))
            .filter(F.col("cell_rank") <= probes)
            .select(
                id_col,
                F.col("cid").alias("cluster_id"),
                "cell_rank",
            )
        )
    cur = corpus.select(
        F.col(id_col),
        scaled_vec(F.col(vec_col)).alias("svec"),
        # empty array typed like the id column (cids are seed ids, so
        # they share its type): slice(.., 1, 0) of a 1-element array
        F.slice(F.array(F.col(id_col)), 1, 0).alias("taken"),
    )
    picked = []
    for r in range(1, probes + 1):
        fan = (
            cur.crossJoin(F.broadcast(cents))
            .filter(~F.array_contains(F.col("taken"), F.col("cid")))
            .withColumn("dist", _assign_dist(dim, unit_norm))
        )
        step = fan.groupBy(id_col).agg(
            F.min_by("cid", F.struct("dist", "cid")).alias("cid"),
            F.first("svec").alias("svec"),
            F.first("taken").alias("taken"),
        )
        picked.append(
            step.select(
                id_col,
                F.col("cid").alias("cluster_id"),
                F.lit(r).alias("cell_rank"),
            )
        )
        if r < probes:
            cur = step.select(
                id_col,
                "svec",
                F.array_append(F.col("taken"), F.col("cid")).alias(
                    "taken"
                ),
            )
    out = picked[0]
    for p in picked[1:]:
        out = out.unionByName(p)
    return out


def ivf_write_kmeans(
    corpus: DataFrame,
    cents: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    unit_norm: bool = False,
) -> None:
    """Materialize the LEARNED-centroid IVF layout: corpus partitioned
    by nearest-trained-centroid cell, scaled vector + norm precomputed at
    rest. The k-means analog of ``ivf_write`` (hyperplane buckets):
    data-adaptive cells follow the corpus distribution, so cell sizes are
    balanced by construction where hyperplane buckets depend on luck.
    ``unit_norm``: caller-guaranteed |x| <= 1 bound -> exact int64
    assignment path (see _lloyd_assign)."""
    cb = attach_scaled(
        kmeans_assign(corpus, cents, id_col, vec_col, dim, unit_norm),
        vec_col,
        "c_",
    )
    (
        # cluster by output partition before the write (guide §6 —
        # see ivf_pq_write's note)
        cb.select(id_col, "c_svec", "c_norm", "cluster_id")
        .repartition(F.col("cluster_id"))
        .write.partitionBy("cluster_id")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_kmeans_topk(
    spark,
    path: str,
    queries: DataFrame,
    cents: DataFrame,
    k: int = 10,
    probes: int = 1,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k against a materialized ``ivf_write_kmeans``
    index: each query probes its ``probes`` nearest centroid cells
    (exact integer L2 to the k trained centroids — a broadcast k-row
    ranking, the classic IVF nprobe), and only those partitions of the
    index are scanned (broadcast probe join -> dynamic partition
    pruning). Exact-cosine scoring within the probed cells; every corpus
    vector lives in exactly one cell, so no cross-probe dedup is needed.
    ``dim`` is validated against the query vectors (loud failure on a
    mismatched caller, same contract as the unrolled kernels); scoring
    itself uses the dynamic-dim HOF path, which any query/index length
    skew would hit as a zip_with truncation otherwise.
    """
    index = spark.read.parquet(path)
    q = attach_scaled(queries, query_vec, "q_").withColumnRenamed(
        query_id, "qid_"
    )
    q = q.withColumn("q_svec", _dim_guard(F.col("q_svec"), dim, F.col("q_svec")))
    # pairwise guard on top of the static query-side check: an index or
    # centroid frame written at a different dim must fail loudly, not
    # zip_with-truncate to the shorter side
    dist = _pair_guard(
        F.col("q_svec"),
        F.col("c_svec"),
        F.aggregate(
            F.zip_with(
                F.col("q_svec"),
                F.col("c_svec"),
                lambda x, y: (x.cast(_ACC) - y.cast(_ACC))
                * (x.cast(_ACC) - y.cast(_ACC)),
            ),
            F.lit(0).cast(_ACC),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("qid_").orderBy("dist", "cid")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("dist", dist)
        .withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= probes)
        .select(
            F.col("qid_").alias(query_id),
            "q_svec",
            "q_norm",
            F.col("cid").alias("cluster_id"),
        )
    )
    scored = index.join(F.broadcast(probed), "cluster_id").select(
        F.col(query_id),
        F.col(corpus_id),
        _pair_guard(
            F.col("q_svec"),
            F.col("c_svec"),
            dot_scaled(F.col("q_svec"), F.col("c_svec")).cast("double")
            / (F.col("q_norm") * F.col("c_norm")),
        ).alias("cosine"),
    )
    wr = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
