"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk``: exact cosine top-k of every query vector
  against the corpus. The query side is broadcast (queries are small
  by construction); the corpus side streams — no shuffle of the big
  side, score computation is a JVM-side ``zip_with``/``aggregate``
  expression with double accumulation.
- ``lsh_topk``: sign-random-projection (hyperplane) LSH — deterministic
  pseudo-random planes derived from md5 nibbles, bucket equi-join, then
  exact cosine re-rank within buckets. This is the 100 TB path: the
  candidate join is blocked on the bucket key instead of |Q| x |C|.

Determinism: scores are rounded to 6 decimals and ties broken by
vector id, so rankings are stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, cosine_prenormed, norm_sq
from ..session import tiny_local_df
from ..sources.tables import fan_out

# Row budget for the residual IVFADC query LUT broadcast (|Q| x
# n_probe x n_subspaces x n_codes rows, ~100 B/row as a JVM broadcast
# hash relation => ~100 MB at the default). See ivf_pq_search.
_RESIDUAL_LUT_ROW_BUDGET = 1_000_000


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos_sim).

    Norms are computed once per vector before the pair join (linear),
    so the quadratic scoring stage does one dot product per pair
    instead of three array reductions."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__qn"),
    )
    # per corpus row we compute |Q| dot products — fan the corpus scan
    # out before the broadcast join (no-op on an already-parallel scan)
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (id_a, id_b)
    with ``cosine >= threshold`` and ``id_a < id_b``.

    This is the exact baseline: an all-pairs comparison with one side
    broadcast — O(n^2) scoring, only viable when one side fits in a
    broadcast. The 100 TB path blocks candidates through sign-LSH
    buckets first (``lsh_topk``'s bucketing) and applies the same
    exact threshold to the survivors, trading recall for a
    bucket-equi-join instead of a cross product."""
    a = fan_out(corpus).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__nb"),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_prenormed(F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into
    inverted lists by nearest centroid; each query probes only its
    ``n_probe`` closest lists, then exact cosine re-ranks the
    candidates.

    Centroids are the first ``n_centroids`` corpus vectors by id —
    deterministic (no k-means iterations) so results are stable across
    runs; on a real deployment the centroid table would come from a
    trained quantizer but the dataflow is identical: broadcast the
    (tiny) centroid table, one linear assign pass over the corpus, and
    a candidate join blocked on the centroid id instead of |Q| x |C|.
    Returns the ``brute_force_topk`` schema; recall < 1 by design."""
    cents = F.broadcast(
        corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("__cent"),
            F.sqrt(norm_sq(F.col(vec_col))).alias("__centn"),
        )
    )
    # one linear pass: nearest centroid per corpus vector via
    # ivf_list_assign (packed-BIGINT argmax => HashAggregate), then the
    # raw vector + norm joined back by id — one id-keyed shuffle of the
    # corpus instead of a SortAggregate that sorts the
    # |corpus| x n_centroids expansion WITH the float-array payload
    # inside every row on both sides of its shuffle.
    corpus_n = fan_out(corpus).withColumn("__vn", F.sqrt(norm_sq(F.col(vec_col))))
    assign = (
        ivf_list_assign(corpus, id_col, vec_col, n_centroids)
        .select(F.col(id_col), "cent_id")
        .join(
            corpus_n.select(
                F.col(id_col),
                F.col(vec_col).alias("__cvec"),
                F.col("__vn").alias("__cn"),
            ),
            id_col,
        )
        .select(
            F.col(id_col).alias("neighbor_id"), "cent_id", "__cvec", "__cn"
        )
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_c").desc(), F.col("cent_id").asc()
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.sqrt(norm_sq(F.col(vec_col))).alias("__qn"),
        )
        .crossJoin(cents)
        .select(
            "query_id",
            "__qvec",
            "__qn",
            "cent_id",
            F.round(
                cosine_prenormed(F.col("__qvec"), F.col("__cent"), F.col("__qn"), F.col("__centn")),
                6,
            ).alias("cos_c"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "__qvec", "__qn", "cent_id")
    )
    scored = (
        probes.join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_prenormed(F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
        # no dedup needed — and the shuffle it would cost is pure waste:
        # every neighbor carries exactly ONE cent_id (ivf_list_assign is
        # a per-id argmax) and probes are distinct (query_id, cent_id)
        # rows, so the cent_id equi-join can produce each
        # (query_id, neighbor_id) pair at most once by construction
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_list_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Exact inverted-list assignment of ``ivf_topk``'s blocking
    structure: every corpus vector mapped to its nearest centroid
    (max rounded cosine, ties toward the lower centroid id), centroids
    = first ``n_centroids`` corpus vectors by id, broadcast.

    This is the deterministic, hash-checkable core of the IVF index —
    given fixed centroids the list membership is exact, which is what
    lets an SQL oracle verify the blocking structure even though the
    top-k scorer built on it is approximate. One broadcast pass over
    the corpus, one map-side ``max_by`` aggregation keyed on the
    vector id; no data-sized shuffle.

    Returns (vec_id, cent_id, cos_sim) of the final assignment.

    ``centroids`` overrides the derive-from-corpus convention with an
    EXPLICIT (cent_id, __cent) table — how a corpus DELTA is assigned
    against a persisted index's frozen coarse quantizer
    (``ann_index.append_to_pq_index`` on an IVFADC index)."""
    if n_centroids > 1024:
        raise ValueError("ivf_list_assign: n_centroids must be <= 1024 (packing)")
    corpus_n = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col), F.sqrt(norm_sq(F.col(vec_col))).alias("__vn")
    )
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cent")
        )
    cents = F.broadcast(
        centroids.select(
            "cent_id",
            "__cent",
            F.sqrt(norm_sq(F.col("__cent"))).alias("__centn"),
        )
    )
    # argmax via a packed BIGINT instead of max_by(struct, struct) —
    # primitive agg buffer => HashAggregate instead of a SortAggregate
    # that sorts the |corpus| x n_centroids expansion on both shuffle
    # sides. The rounded cosine is k/1e6 for integer k in [-1e6, 1e6]
    # (recovered exactly by round(cos_r * 1e6)); packing
    # (k + 1e6) * 1024 + (1023 - cent_id) makes lexicographic
    # (cosine DESC-max, cent_id ASC on ties) equal to plain MAX, and
    # unpacking k / 1e6 yields bit-identical doubles to round(cos, 6)
    # (both are the closest double to the same 6-dp decimal).
    cos_r = F.round(
        cosine_prenormed(
            F.col(vec_col), F.col("__cent"), F.col("__vn"), F.col("__centn")
        ),
        6,
    )
    # A zero-norm vector (or centroid) makes cosine NULL (try_divide in
    # functions/vector.py — ANSI mode would otherwise fail the job on
    # the division). NULL enc rows would vanish from MAX and drop the
    # vector from the output; coalesce to -1 (minimum cosine) so
    # degenerate vectors get a deterministic assignment (lowest
    # centroid id wins the all-tie). nanvl additionally guards inputs
    # that contain NaN floats.
    cos_fp = F.round(
        F.coalesce(F.nanvl(cos_r, F.lit(-1.0)), F.lit(-1.0)) * 1_000_000
    ).cast("long")
    enc = (cos_fp + F.lit(1_000_000)) * F.lit(1024) + (
        F.lit(1023) - F.col("cent_id")
    )
    return (
        corpus_n.crossJoin(cents)
        .select(F.col(id_col), enc.alias("__enc"))
        .groupBy(F.col(id_col))
        .agg(F.max("__enc").alias("__menc"))
        .select(
            F.col(id_col),
            (F.lit(1023) - F.col("__menc") % 1024).cast("long").alias("cent_id"),
            (
                (F.expr("__menc div 1024") - F.lit(1_000_000)).cast("double")
                / 1_000_000
            ).alias("cos_sim"),
        )
    )


def ivf_residuals(
    corpus: DataFrame,
    assign: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, vec_col) with the vector replaced by its coarse
    RESIDUAL — ``vector - assigned centroid``, element-wise in double.

    This is the IVFADC encoding step proper (Jégou et al. §III):
    within an inverted list the vectors share a centroid, so the
    residuals are centered near zero and the PQ code budget covers
    within-list variance instead of re-describing the centroid the
    list id already encodes — the standard recall lever at identical
    code bytes vs quantizing raw vectors.

    ``assign`` is an (id_col, cent_id) table (``ivf_list_assign``
    output or the persisted ``lists/``); ``centroids`` is
    (cent_id, __cent), broadcast here (always quantizer-sized). The
    corpus⋈assign join is id-keyed — the same co-partitioned shape as
    the codes⋈lists join every IVFADC search already does; nothing
    quadratic, nothing collected. When the assignment is being
    COMPUTED rather than loaded, prefer ``ivf_assign_residuals`` —
    it produces the identical result without this join."""
    return (
        corpus.join(assign.select(F.col(id_col), "cent_id"), id_col)
        .join(F.broadcast(centroids.select("cent_id", "__cent")), "cent_id")
        .select(
            F.col(id_col),
            F.zip_with(
                F.col(vec_col),
                F.col("__cent"),
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias(vec_col),
        )
    )


def ivf_assign_residuals(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cent_id, vec_col = residual): the coarse assignment
    AND the IVFADC residual in ONE broadcast pass over the corpus —
    exactly ``ivf_list_assign`` composed with ``ivf_residuals``
    (pytest-pinned identical, including tie-breaks and degenerate
    vectors), with neither the assignment group-by exchange nor the
    corpus⋈assign id join.

    Why it exists (r14, guide §8): the unfused pair re-scans the
    corpus and joins it BY ID against the corpus-sized assignment just
    to attach a 2-column decision — at cluster scale that join
    shuffles the raw vectors (the heavy payload) to attach the
    lightweight proxy that decided their routing. Here the decision is
    computed in the same row as the payload: the centroids —
    quantizer-sized by the same contract that broadcasts them
    everywhere else — are gathered into ONE array row and
    broadcast-nested-loop-joined onto the scan, the per-row argmax
    unpacks the same packed BIGINT as ``ivf_list_assign`` (rounded
    cosine in 1e-6 fixed point, ties toward the lower cent_id,
    zero-norm/NaN vectors coalesced to cosine −1), and the residual is
    the same double-precision ``zip_with`` as ``ivf_residuals``.
    Nothing data-sized is shuffled at all.

    ``centroids`` is (cent_id, __cent) with cent_id in [0, 1023] —
    the same packing bound ``ivf_list_assign`` validates at build
    time; callers pass a table a build already validated."""
    carr = F.broadcast(
        centroids.select(
            F.struct(
                F.col("cent_id"),
                F.col("__cent"),
                F.sqrt(norm_sq(F.col("__cent"))).alias("__centn"),
            ).alias("__c")
        ).agg(F.collect_list("__c").alias("__cents"))
    )
    corpus_n = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col), F.sqrt(norm_sq(F.col(vec_col))).alias("__vn")
    )

    def _enc(c):
        # identical arithmetic to ivf_list_assign — see the packing
        # and degenerate-vector notes there
        cos_r = F.round(
            cosine_prenormed(
                F.col(vec_col), c["__cent"], F.col("__vn"), c["__centn"]
            ),
            6,
        )
        cos_fp = F.round(
            F.coalesce(F.nanvl(cos_r, F.lit(-1.0)), F.lit(-1.0)) * 1_000_000
        ).cast("long")
        return (cos_fp + F.lit(1_000_000)) * F.lit(1024) + (
            F.lit(1023) - c["cent_id"]
        )

    with_encs = corpus_n.join(carr).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__cents"),
        F.transform(F.col("__cents"), _enc).alias("__encs"),
    )
    # enc values are unique per centroid within a row (the packed
    # tie-break), so position-of-max is well-defined regardless of
    # collect_list's row order
    best = F.element_at(
        F.col("__cents"),
        F.array_position(F.col("__encs"), F.array_max(F.col("__encs"))).cast("int"),
    )
    return with_encs.select(
        F.col(id_col),
        # cast matches ivf_list_assign's output dtype exactly, so the
        # persisted lists/ schema is independent of which path wrote it
        best["cent_id"].cast("long").alias("cent_id"),
        F.zip_with(
            F.col(vec_col),
            best["__cent"],
            lambda x, y: x.cast("double") - y.cast("double"),
        ).alias(vec_col),
    )


def _pq_subvectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    out_sub: str,
    n_subspaces: int,
    sub_dim: int,
) -> DataFrame:
    """(id, subspace, subvector) rows: each vector split into
    ``n_subspaces`` contiguous ``sub_dim``-wide slices."""
    subspaces = F.explode(
        F.array(*[F.lit(s).cast("int") for s in range(n_subspaces)])
    ).alias("subspace")
    return df.select(F.col(id_col).alias(out_id), F.col(vec_col), subspaces).select(
        out_id,
        "subspace",
        F.slice(
            F.col(vec_col), F.col("subspace") * sub_dim + 1, F.lit(sub_dim)
        ).alias(out_sub),
    )


def _sq_l2_fp(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 distance between two float arrays, accumulated in
    double and rounded into a 1e-6 fixed-point BIGINT — exact to
    compare and to sum across subspaces (no float-order dependence)."""
    diff_sq = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.round(
        F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x) * 1_000_000
    ).cast("long")


def _pq_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_subspaces: int,
    sub_dim: int,
    n_codes: int,
) -> DataFrame:
    """(subspace, code, __code_sub): the fixed PQ codebook — matching
    slices of the first ``n_codes`` corpus vectors by id (deterministic
    and engine-checkable; a trained quantizer slots in by swapping this
    one function — see ``kmeans_assign_2iter`` for the trained path)."""
    return _pq_subvectors(
        corpus.filter(F.col(id_col) < n_codes),
        id_col,
        vec_col,
        "code",
        "__code_sub",
        n_subspaces,
        sub_dim,
    )


def pq_assign_codes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization code assignment: split each vector into
    ``n_subspaces`` contiguous ``sub_dim``-dim subvectors and map every
    subvector to its nearest codebook entry by squared L2 distance
    (codebook per subspace = the matching slices of the first
    ``n_codes`` corpus vectors by id; ties toward the lower code).

    This is the compression stage of an IVF-PQ index — the structure
    that makes billion-vector ANN memory-resident (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search"). Given a fixed
    codebook the assignment is exact and engine-checkable, like
    ``ivf_list_assign`` for the coarse quantizer: distances are
    accumulated in double and rounded into 1e-6 fixed-point BIGINTs
    *before* the argmin, so the chosen code never depends on
    sub-ulp float ordering.

    One broadcast of the (n_subspaces x n_codes) codebook against a
    fanned-out corpus scan, one map-side ``min_by`` aggregation —
    no data-sized shuffle. Returns (vec_id, subspace, code, dist_fp)
    with dist_fp = round(squared_L2 * 1e6) of the chosen code.

    ``codebook`` overrides the derive-from-corpus convention with an
    EXPLICIT (subspace, code, __code_sub) table — how a corpus DELTA
    is quantized against a persisted index's frozen codebook
    (``ann_index.append_to_pq_index``): same assignment arithmetic,
    codebook loaded instead of derived."""
    if n_codes > 256:
        raise ValueError("pq_assign_codes: n_codes must be <= 256 (code packing)")
    sub = _pq_subvectors(
        fan_out(corpus), id_col, vec_col, id_col, "__sub", n_subspaces, sub_dim
    )
    if codebook is None:
        codebook = _pq_codebook(corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes)
    cb = F.broadcast(codebook)
    dist_fp = _sq_l2_fp(F.col("__sub"), F.col("__code_sub"))
    # argmin via a packed BIGINT instead of min_by(struct, struct):
    # encoded = dist_fp * 256 + code preserves the (dist_fp ASC, code
    # ASC) order exactly (dist_fp >= 0, code < 256 enforced above), and
    # a primitive agg buffer lets Spark plan a HashAggregate — the
    # struct-buffer min_by falls back to SortAggregate, which sorts the
    # whole |corpus| x subspaces x codes expansion on both sides of the
    # shuffle. Overflow would need dist_fp > 2^63/256 (= squared L2 >
    # 3.6e10 after the 1e-6 fixed-point scale), far beyond any real
    # embedding magnitude.
    return (
        sub.join(cb, "subspace")
        .select(
            F.col(id_col),
            "subspace",
            (dist_fp * F.lit(256) + F.col("code")).alias("__enc"),
        )
        .groupBy(F.col(id_col), F.col("subspace"))
        .agg(F.min("__enc").alias("__menc"))
        .select(
            F.col(id_col),
            "subspace",
            (F.col("__menc") % 256).cast("long").alias("code"),
            # integer div, not `/` (double division loses exactness on
            # large packed values)
            F.expr("__menc div 256").alias("dist_fp"),
        )
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    k: int = 5,
    rerank_factor: int = 10,
) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance computation (ADC)
    with exact re-rank: corpus vectors are represented only by their
    ``pq_assign_codes`` codes; per query a (subspace, code) ->
    distance lookup table is computed once against the codebook, each
    corpus vector is scored by summing its ``n_subspaces`` table
    entries (the shortlist scan never touches a raw corpus vector),
    and the top ``k * rerank_factor`` shortlist is re-scored with the
    exact squared L2 on the raw vectors — the standard two-stage
    IVF-PQ search (coarse ADC scan, exact re-rank of a tiny
    candidate set).

    This is why PQ scales: the scoring join streams over the
    corpus-sized *code* table (``n_subspaces`` small ints per vector
    instead of the full float array) with the per-query distance
    tables broadcast (|Q| x n_subspaces x n_codes rows), then one
    map-side-combinable sum per (query, vector), a per-query shortlist
    window, and an exact re-rank join that touches only
    |Q| x k x rerank_factor raw vectors. Distances are 1e-6
    fixed-point BIGINTs at every stage, so sums and rankings are exact
    and order-independent.

    Approximate by construction (the shortlist can miss true
    neighbors) — recall is gated against the exact scorer in pytest,
    like the IVF and LSH scorers. Returns
    (query_id, neighbor_id, rank, dist_fp) with dist_fp the exact
    re-ranked squared L2."""
    codes = pq_assign_codes(
        corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes
    ).select(F.col(id_col).alias("neighbor_id"), "subspace", "code")
    cb = _pq_codebook(corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes)
    return pq_adc_search(
        codes, cb, queries, corpus, id_col, vec_col, n_subspaces, sub_dim,
        k, rerank_factor,
    )


def _require_query_dim(
    queries: DataFrame, vec_col: str, expected: int, ctx: str
) -> DataFrame:
    """Fail a search loudly when a query vector is too short for the
    index geometry. Without this, ``F.slice`` past the end yields a
    short subvector, ``zip_with`` NULL-pads it, and the NULL distance
    sorts LAST under ASC — the query silently gets garbage neighbors
    instead of an error. Query-side only (queries are small by
    contract; the corpus side is quantized at build time).

    The guard lives INSIDE the vector expression (`when`/`raise_error`
    on the column itself) — a detached ``assert_true`` column gets
    pruned by Catalyst the moment nothing reads it, which is exactly
    what happened to the first version of this check (pytest-pinned)."""
    return queries.withColumn(
        vec_col,
        F.when(F.size(F.col(vec_col)) >= F.lit(expected), F.col(vec_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"{ctx}: query {vec_col} needs >= {expected} elements "
                        "(index geometry n_subspaces*sub_dim), got "
                    ),
                    # coalesce: a NULL query vector has NULL size, which
                    # would NULL the whole concat and fire raise_error
                    # with an empty message — guard still trips, but the
                    # diagnostic is lost (mirrors the append-path twin)
                    F.coalesce(
                        F.size(F.col(vec_col)).cast("string"), F.lit("NULL")
                    ),
                )
            )
        ),
    )


def pq_adc_search(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    corpus: DataFrame | None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    k: int = 5,
    rerank_factor: int = 10,
) -> DataFrame:
    """The ADC search core over materialized index structures — shared
    by ``pq_adc_topk`` (structures derived in-memory) and
    ``ann_index.search_pq_index`` (structures loaded from parquet), so
    persisting an index cannot change what a search computes.

    ``codes``: (neighbor_id, subspace, code) — the only corpus-sized
    scan. ``codebook``: (subspace, code, __code_sub). ``n_subspaces``
    and ``sub_dim`` must match the codebook's build geometry (the
    index loader reads them from the persisted meta). ``corpus=None``
    skips the exact re-rank and returns the top-k by ADC distance
    directly (``dist_fp`` is then the quantized distance) — the pure
    code-scan path for raw vectors in cold storage."""
    queries = _require_query_dim(
        queries, vec_col, n_subspaces * sub_dim, "pq_adc_search"
    )
    qsub = _pq_subvectors(
        queries, id_col, vec_col, "query_id", "__qsub", n_subspaces, sub_dim
    )
    # per-query LUT: distance from each query subvector to every
    # codebook entry — |Q| x n_subspaces x n_codes rows, broadcast
    qd = F.broadcast(
        qsub.join(codebook, "subspace").select(
            "query_id",
            "subspace",
            "code",
            _sq_l2_fp(F.col("__qsub"), F.col("__code_sub")).alias("qdist_fp"),
        )
    )
    scored = (
        codes.join(qd, ["subspace", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qdist_fp").alias("adc_dist_fp"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist_fp").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("pr", F.row_number().over(w_short))
        .filter(F.col("pr") <= (k * rerank_factor if corpus is not None else k))
        .select("query_id", "neighbor_id", "adc_dist_fp", F.col("pr"))
    )
    if corpus is None:
        return shortlist.select(
            "query_id",
            "neighbor_id",
            F.col("pr").alias("rank"),
            F.col("adc_dist_fp").alias("dist_fp"),
        )
    # exact re-rank: raw vectors only for the shortlist candidates
    qraw = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    craw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    exact = (
        shortlist.select("query_id", "neighbor_id")
        .join(craw, "neighbor_id")
        .join(qraw, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _sq_l2_fp(F.col("__qvec"), F.col("__cvec")).alias("dist_fp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_fp").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_fp")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    k: int = 5,
    rerank_factor: int = 20,
    residual: bool = False,
    lut_row_budget: int | None = _RESIDUAL_LUT_ROW_BUDGET,
    chunk_oversized: bool = False,
) -> DataFrame:
    """Full IVF-PQ search: coarse probe + ADC over the probed lists
    only + exact re-rank — the composition of ``ivf_list_assign`` (the
    coarse quantizer, oracle-verified by ``ann_ivf_lists``) and
    ``pq_assign_codes`` (the compressor, oracle-verified by
    ``emb_pq_codes_battery``) into the search structure a billion-vector
    deployment actually runs (Jégou et al., IVFADC).

    ``residual=True`` quantizes coarse RESIDUALS instead of raw
    vectors (``ivf_residuals``) — classic IVFADC: the PQ codebook is
    derived from and applied to ``vector - assigned centroid``, and at
    search time the per-query ADC lookup tables are computed per
    PROBED LIST from the query's residual against that list's centroid
    (|Q| x n_probe x n_subspaces x n_codes LUT rows — |Q|-linear, so
    ``lut_row_budget`` refuses an oversized query batch loudly with
    the exact chunk size that fits; see ``ivf_pq_search``). Same code
    bytes per vector, measurably higher recall (pytest-gated >= the
    raw-vector form's floor).

    Dataflow, sized for 100 TB of vectors:

    1. **Index build** (in production: precomputed and stored — see
       ``ann_index.build_ivfpq_index`` for the persisted form): one
       co-partitioned join of the PQ code table with the IVF list
       assignment on the vector id — both are map-side aggregations
       over the same corpus scan, so AQE plans a local join; the
       result is (cent_id, neighbor_id, subspace, code): 4 small ints
       per subspace per vector, never a raw float array.
    2. **Probe**: each query scores the broadcast centroid table and
       keeps its ``n_probe`` closest lists — |Q| x n_centroids work.
    3. **ADC scan**: the per-query (subspace, code) -> distance lookup
       tables (|Q| x n_subspaces x n_codes rows) and the probe table
       are both broadcast against the index, so the scan touches ONLY
       rows whose cent_id is probed — a ``n_probe / n_centroids``
       fraction of the corpus, with no shuffle of the big side before
       the (query, neighbor) partial-agg sum.
    4. **Exact re-rank**: raw vectors fetched for just
       |Q| x k x rerank_factor shortlist candidates.

    Distances are 1e-6 fixed-point BIGINTs at every stage (exact,
    order-independent sums). Approximate by construction — a true
    neighbor outside the probed lists is unreachable — so recall is
    pytest-gated against the exact scorer rather than SQL-oracled,
    while both underlying structures stay exactly verified."""
    assign = ivf_list_assign(corpus, id_col, vec_col, n_centroids)
    lists = assign.select(F.col(id_col).alias("neighbor_id"), "cent_id")
    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cent")
    )
    # residual=True: both the codebook seed and the code assignment
    # operate on the residual table — vec_col's NAME is unchanged, so
    # the downstream geometry/meta plumbing is identical either way
    to_code = (
        ivf_residuals(corpus, assign, cents, id_col, vec_col)
        if residual
        else corpus
    )
    codes = pq_assign_codes(
        to_code, id_col, vec_col, n_subspaces, sub_dim, n_codes
    ).select(F.col(id_col).alias("neighbor_id"), "subspace", "code")
    index = codes.join(lists, "neighbor_id")
    cb = _pq_codebook(to_code, id_col, vec_col, n_subspaces, sub_dim, n_codes)
    return ivf_pq_search(
        index, cents, cb, queries, corpus, id_col, vec_col,
        n_subspaces, sub_dim, n_probe, k, rerank_factor, residual=residual,
        lut_row_budget=lut_row_budget, chunk_oversized=chunk_oversized,
    )


def ivf_pq_search(
    index: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_probe: int = 4,
    k: int = 5,
    rerank_factor: int = 20,
    residual: bool = False,
    lut_row_budget: int | None = _RESIDUAL_LUT_ROW_BUDGET,
    chunk_oversized: bool = False,
) -> DataFrame:
    """The IVFADC search core over materialized index structures —
    shared by ``ivf_pq_topk`` (structures derived in-memory) and
    ``ann_index.search_ivfpq_index`` (structures loaded from parquet),
    so persisting the index cannot change what a search computes.

    ``index``: (cent_id, neighbor_id, subspace, code) — the only
    corpus-sized scan. ``centroids``: (cent_id, __cent). ``codebook``:
    (subspace, code, __code_sub). ``n_probe``/``k``/``rerank_factor``
    are search-time knobs; the geometry params must match the build.

    ``residual`` must match how the codes were built (persisted in
    ``ivf_meta`` by ``build_ivfpq_index``): residual codes scored
    against a raw-query LUT (or vice versa) return confidently wrong
    neighbors. With ``residual=True`` the LUT is keyed by
    (query_id, cent_id) — the query's residual against each PROBED
    centroid — and the ADC join picks the LUT row matching the code
    row's own list, so a corpus vector is always compared in the
    coordinate frame it was encoded in.

    Query ids must be UNIQUE and non-null on every path: results and
    LUTs are keyed by ``query_id``, and BOTH arms enforce it loudly —
    on the raw arm duplicate ids produce colliding (query_id,
    subspace, code) LUT rows whose distances would silently
    double-count in the ADC sum; on the residual arm duplicates
    collide on (query_id, cent_id) and score against one row's
    residuals.

    LUT scale bound (both arms): the residual per-probed-list LUT is
    ``|Q| x n_probe x n_subspaces x n_codes`` BROADCAST rows and the
    raw LUT is ``|Q| x n_subspaces x n_codes`` (``n_probe``x smaller,
    identically |Q|-linear) — so a production batch of 1e5 queries at
    n_probe=8, m=16, k=256 is 3.3e9 residual rows (4.1e8 raw), far
    past any broadcast. ``lut_row_budget`` (default 1M rows, ~100 MB
    as a JVM broadcast hash relation at ~100 B/row) makes that
    failure LOUD before the broadcast is attempted: oversized batches
    raise with the chunk size that fits — top-k per query is
    independent across query chunks, so slicing the batch and
    unioning results is exact, not approximate. ``None`` overrides
    for callers that have sized their executors for a bigger LUT.
    ``chunk_oversized=True`` turns the advice into behavior: an
    oversized batch is split by query row number into the minimum
    number of chunks whose LUTs fit the budget and the per-chunk
    results are unioned — exact by the independence argument, memory
    bounded by construction (chunks are row-count-even, so every
    chunk's LUT lands within one query of the budget; a straggler
    that still exceeds re-splits itself, and the row-number split
    strictly shrinks each level, so the recursion terminates). The honest cost: each chunk re-runs the probed-list code
    SCAN, so wall time is ~n_chunks x the scan — the dial a
    deployment turns when one batch's LUT cannot fit, as opposed to
    raising the budget on bigger executors."""
    cents = F.broadcast(
        centroids.select(
            "cent_id",
            F.col("__cent"),
            F.sqrt(norm_sq(F.col("__cent"))).alias("__centn"),
        )
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_c").desc(), F.col("cent_id").asc()
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.sqrt(norm_sq(F.col(vec_col))).alias("__qn"),
        )
        .crossJoin(cents)
        .select(
            "query_id",
            "cent_id",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"), F.col("__cent"), F.col("__qn"), F.col("__centn")
                ),
                6,
            ).alias("cos_c"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "cent_id")
    )

    checked = _require_query_dim(
        queries, vec_col, n_subspaces * sub_dim, "ivf_pq_search"
    )
    # one cheap aggregate on the probe batch buys loud failures for
    # two silent-wrong-answer classes, on BOTH arms. This guard is
    # about CORRECTNESS, so it runs regardless of lut_row_budget (the
    # budget override must not also disable it): the residual LUT is
    # keyed by (query_id, cent_id) and the raw LUT by (query_id,
    # subspace, code), so duplicate ids with different vectors either
    # score against one row's residuals (residual arm) or produce
    # colliding LUT rows whose distances double-count in the ADC sum
    # (raw arm); null ids silently match nothing on both; and unique
    # non-null ids are also what makes the row-number chunk split
    # deterministic across filter re-evaluations.
    qstats = queries.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(id_col)).alias("nn"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).collect()[0]
    n_q = qstats["n"]
    lut_key = (
        "(query_id, cent_id)" if residual else "(query_id, subspace, code)"
    )
    if qstats["nn"] != n_q:
        raise ValueError(
            f"ivf_pq_search: query batch carries "
            f"{n_q - qstats['nn']} NULL {id_col} value(s) — the "
            f"ADC LUT is keyed by {lut_key}, so "
            "null-id rows silently match nothing; key the batch"
        )
    if qstats["nd"] != n_q:
        raise ValueError(
            f"ivf_pq_search: query batch carries duplicate ids "
            f"({n_q} rows, {qstats['nd']} distinct {id_col}) — the "
            f"ADC LUT is keyed by {lut_key}, so "
            "duplicates collide"
            + (
                ""
                if residual
                else " and their distances silently double-count in the"
                " ADC sum"
            )
            + "; dedup or re-key the batch"
        )
    if lut_row_budget is not None:
        # the codebook count (broadcast-sized by construction) prices
        # the LUT so an oversized batch fails loudly instead of
        # silently degrading — or OOMing — the broadcast. Both arms
        # build a |Q|-linear broadcast LUT; the residual one carries
        # an extra n_probe factor (keyed per probed list).
        cb_rows = codebook.count()
        per_q = (n_probe if residual else 1) * cb_rows
        lut_rows = n_q * per_q
        arm = "residual" if residual else "raw"
        per_q_shape = (
            f"n_probe={n_probe} x codebook={cb_rows}"
            if residual
            else f"codebook={cb_rows}"
        )
        if lut_rows > lut_row_budget:
            if per_q > lut_row_budget:
                # chunking splits QUERIES; one query's own LUT over
                # the budget cannot be split further — a distinct loud
                # message, or chunk_oversized would loop to this same
                # dead end one query at a time
                raise ValueError(
                    f"ivf_pq_search: a SINGLE query's {arm} LUT is "
                    f"{per_q} broadcast rows ({per_q_shape}) "
                    f"> lut_row_budget={lut_row_budget} — query "
                    "chunking cannot help; "
                    + ("lower n_probe, or " if residual else "")
                    + "raise lut_row_budget deliberately for "
                    "executors sized to hold it"
                )
            if chunk_oversized:
                # minimum chunk count whose per-chunk LUT fits, capped
                # at the query count. The split is by ROW NUMBER, not
                # id hash: a hash split makes no progress when every id
                # in a chunk shares the same residue (two even-hash
                # queries re-split 2-ways land in the same chunk again,
                # forever — the recursion would never reach the
                # single-query base case). row_number mod n_chunks
                # bounds every chunk at ceil(n_q / n_chunks) < n_q for
                # n_chunks >= 2, so each recursion level strictly
                # shrinks and (per_q <= budget above) terminates at
                # chunks that fit. Determinism: ids are unique (the
                # duplicate-id refusal above), so the orderBy is a
                # total order and every filter re-evaluation assigns
                # each row the same chunk — ties would have made
                # row_number unstable across evaluations (rows
                # duplicated into two chunks or dropped from all).
                # The global orderBy window is one
                # single-task sort of |Q| rows — query batches are
                # driver-collected-shortlist-sized, and this path only
                # runs once the batch is already over budget.
                n_chunks = min(-(-lut_rows // lut_row_budget), n_q)
                chunked = queries.withColumn(
                    "__chunk",
                    F.pmod(
                        F.row_number().over(Window.orderBy(F.col(id_col)))
                        - 1,
                        F.lit(int(n_chunks)),
                    ),
                )
                out = None
                for i in range(int(n_chunks)):
                    part = ivf_pq_search(
                        index, centroids, codebook,
                        chunked.filter(F.col("__chunk") == i).drop("__chunk"),
                        corpus, id_col, vec_col,
                        n_subspaces, sub_dim, n_probe, k, rerank_factor,
                        residual=residual, lut_row_budget=lut_row_budget,
                        chunk_oversized=True,
                    )
                    out = part if out is None else out.unionByName(part)
                return out
            max_q = max(1, lut_row_budget // max(per_q, 1))
            raise ValueError(
                f"ivf_pq_search: {arm} LUT would be {lut_rows} broadcast "
                f"rows (|Q|={n_q} x {per_q_shape}) "
                f"> lut_row_budget={lut_row_budget} (~100 B/row as a "
                "broadcast hash relation). Chunk the query batch: search "
                f"slices of <= {max_q} queries and union the results "
                "(top-k per query is independent across chunks, so "
                "chunking is exact — or pass chunk_oversized=True to "
                "have the search do exactly that)"
                + (", or lower n_probe" if residual else "")
                + "; lut_row_budget=None overrides deliberately"
            )
    if residual:
        # per-(query, probed list) LUT: the query's RESIDUAL against
        # each probed centroid, scored against the (residual-trained)
        # codebook — |Q| x n_probe x n_subspaces x n_codes rows, still
        # broadcast-sized. The cent_id in the join key doubles as the
        # probe filter, so the corpus-sized code scan touches only
        # probed lists, exactly like the raw path's probes join.
        subspaces = F.explode(
            F.array(*[F.lit(s).cast("int") for s in range(n_subspaces)])
        ).alias("subspace")
        qres = (
            probes.join(
                checked.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col)
                ),
                "query_id",
            )
            .join(cents.select("cent_id", "__cent"), "cent_id")
            .select(
                "query_id",
                "cent_id",
                F.zip_with(
                    F.col(vec_col),
                    F.col("__cent"),
                    lambda x, y: x.cast("double") - y.cast("double"),
                ).alias("__qres"),
            )
            .select("query_id", "cent_id", subspaces, "__qres")
            .select(
                "query_id",
                "cent_id",
                "subspace",
                F.slice(
                    F.col("__qres"),
                    F.col("subspace") * sub_dim + 1,
                    F.lit(sub_dim),
                ).alias("__qrsub"),
            )
        )
        qd = F.broadcast(
            qres.join(codebook, "subspace").select(
                "query_id",
                "cent_id",
                "subspace",
                "code",
                _sq_l2_fp(F.col("__qrsub"), F.col("__code_sub")).alias(
                    "qdist_fp"
                ),
            )
        )
        scored = (
            index.join(qd, ["cent_id", "subspace", "code"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("qdist_fp").alias("adc_dist_fp"))
        )
    else:
        qsub = _pq_subvectors(
            checked,
            id_col,
            vec_col,
            "query_id",
            "__qsub",
            n_subspaces,
            sub_dim,
        )
        qd = F.broadcast(
            qsub.join(codebook, "subspace").select(
                "query_id",
                "subspace",
                "code",
                _sq_l2_fp(F.col("__qsub"), F.col("__code_sub")).alias("qdist_fp"),
            )
        )
        scored = (
            index.join(F.broadcast(probes), "cent_id")
            .join(qd, ["query_id", "subspace", "code"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("qdist_fp").alias("adc_dist_fp"))
        )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist_fp").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("pr", F.row_number().over(w_short))
        .filter(F.col("pr") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    qraw = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    craw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    exact = (
        shortlist.join(craw, "neighbor_id")
        .join(qraw, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _sq_l2_fp(F.col("__qvec"), F.col("__cvec")).alias("dist_fp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_fp").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_fp")
    )


def kmeans_assign_2iter(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    fp_scale: int = 2**40,
) -> DataFrame:
    """Two fixed Lloyd iterations of cosine k-means, fully
    deterministic and engine-reproducible — the trained-quantizer step
    that feeds ``ivf_topk``'s inverted lists.

    Iteration structure (the general iterative-DataFrame pattern, like
    ``connected_components`` but with a fixed round count so the whole
    computation stays one declarative plan):

    1. seed centroids = the first ``n_centroids`` corpus vectors by id;
    2. assign every vector to its max-rounded-cosine centroid
       (ties -> lower centroid id), centroids broadcast;
    3. recompute each centroid as the per-dimension mean of its
       members in 2^-40 fixed point (exact long sums — order-
       independent, so AQE repartitioning can't change the result);
    4. reassign against the updated centroids.

    Returns (vec_id, cent_id, cos_sim) of the final assignment.
    Fixed 2 iterations rather than convergence-looped: the output is
    a pure function of the input, which is what lets a SQL oracle
    reproduce it; production k-means iterates the same two stages
    inside the driver loop with ``localCheckpoint`` per round."""
    assign, recompute, cents0 = _kmeans_parts(
        corpus, id_col, vec_col, n_centroids, fp_scale
    )
    return assign(recompute(assign(cents0)))


def kmeans_centroids_2iter(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    fp_scale: int = 2**40,
) -> DataFrame:
    """The TRAINED coarse-quantizer table behind
    ``kmeans_assign_2iter``: (cent_id, __cent, __centn) after one
    deterministic Lloyd refinement of the id-seeded centroids — the
    same fixed-point means, exposed as a table so
    ``build_ivfpq_index(train=True)`` can persist trained centroids
    and ``ivf_list_assign(centroids=...)`` can assign against them.
    ``kmeans_assign_2iter(corpus) ==
    assign-against(kmeans_centroids_2iter(corpus))`` by construction
    (shared internals)."""
    assign, recompute, cents0 = _kmeans_parts(
        corpus, id_col, vec_col, n_centroids, fp_scale
    )
    return recompute(assign(cents0))


def _kmeans_parts(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    fp_scale: int,
):
    """Shared internals of the 2-iter k-means family: the normalized
    corpus, the assign/recompute stages, and the id-seeded centroids."""
    corpus_n = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col), F.sqrt(norm_sq(F.col(vec_col))).alias("__vn")
    )

    if n_centroids > 1024:
        raise ValueError("kmeans_assign_2iter: n_centroids must be <= 1024 (packing)")

    def assign(cents: DataFrame) -> DataFrame:
        """cents: (cent_id, __cent, __centn) — broadcast-sized.

        Argmax via the same packed-BIGINT trick as ``ivf_list_assign``
        (HashAggregate instead of a struct-buffer SortAggregate):
        (round(cos,6)*1e6 + 1e6) * 1024 + (1023 - cent_id) makes plain
        MAX equal to (cosine DESC, cent_id ASC), and the unpacked
        k/1e6 is bit-identical to round(cos, 6)."""
        cos_r = F.round(
            cosine_prenormed(
                F.col(vec_col), F.col("__cent"), F.col("__vn"), F.col("__centn")
            ),
            6,
        )
        # NULL/NaN-safe for zero-norm vectors, same rationale as
        # ivf_list_assign.
        cos_fp = F.round(
            F.coalesce(F.nanvl(cos_r, F.lit(-1.0)), F.lit(-1.0)) * 1_000_000
        ).cast("long")
        enc = (cos_fp + F.lit(1_000_000)) * F.lit(1024) + (
            F.lit(1023) - F.col("cent_id")
        )
        return (
            corpus_n.crossJoin(F.broadcast(cents))
            .select(F.col(id_col), enc.alias("__enc"))
            .groupBy(F.col(id_col))
            .agg(F.max("__enc").alias("__menc"))
            .select(
                F.col(id_col),
                (F.lit(1023) - F.col("__menc") % 1024).cast("long").alias("cent_id"),
                (
                    (F.expr("__menc div 1024") - F.lit(1_000_000)).cast("double")
                    / 1_000_000
                ).alias("cos_sim"),
            )
        )

    def recompute(assigned: DataFrame) -> DataFrame:
        # per-row fixed-point terms are ~|val| * 2^40 ≈ 2^40..2^43; a
        # BIGINT sum would overflow past ~2^23 cluster members (tens of
        # millions of vectors at n_centroids=8 — far below the target
        # scale), silently wrapping non-ANSI or failing ANSI. Accumulate
        # in decimal(38,0) instead (exact to ~10^38, i.e. ~10^25 rows);
        # DuckDB's SUM(BIGINT) widens to HUGEINT the same way, so the
        # oracle parity is unchanged.
        comp = (
            assigned.join(corpus_n.select(F.col(id_col), F.col(vec_col)), id_col)
            .select("cent_id", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("val").cast("double") * F.lit(float(fp_scale)))
                        .cast("long")
                        .cast("decimal(38,0)")
                    ).cast("double")
                    / (F.count("*") * F.lit(float(fp_scale)))
                ).alias("mean_val")
            )
        )
        cents = comp.groupBy("cent_id").agg(
            F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("pm")
        ).select(
            "cent_id",
            F.transform(F.col("pm"), lambda x: x["mean_val"]).alias("__cent"),
        )
        return cents.select(
            "cent_id", "__cent", F.sqrt(norm_sq(F.col("__cent"))).alias("__centn")
        )

    cents0 = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("__cent"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__centn"),
    )
    return assign, recompute, cents0


def kmeans_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    max_iters: int = 20,
    tol: float = 1e-9,
    fp_scale: int = 2**40,
) -> tuple[DataFrame, int]:
    """Production k-means: Lloyd iterations to CONVERGENCE in a driver
    loop — the open-ended form of ``kmeans_assign_2iter``'s fixed two
    rounds (that one stays a pure function so a SQL oracle can replay
    it; this one is what a real pipeline runs before
    ``build_ivfpq_index``). Returns ``(centroids, n_iters)`` with
    centroids as (cent_id, __cent, __centn) — the shape
    ``ivf_list_assign(centroids=...)`` consumes.

    Scale shape per round: ONE broadcast-argmax assignment pass + ONE
    fixed-point mean recomputation over the corpus (both linear, no
    data-sized shuffle beyond the (cent_id, pos) aggregation), then
    the k x dim centroid table — broadcast-sized by definition — is
    COLLECTED and re-emitted as a literal DataFrame. That collect is
    the iterative-state pattern for tiny state: it truncates lineage
    exactly (each round's plan would otherwise nest every previous
    round's assign+recompute) without pinning executor blocks the way
    ``localCheckpoint`` does, and it gives the driver the convergence
    signal for free: stop when no centroid component moved more than
    ``tol`` (movement of the broadcast-sized state, never a
    corpus-sized changed-assignment join). Same fixed-point mean
    arithmetic as the 2-iter form, so ``max_iters=1`` reproduces
    ``kmeans_centroids_2iter`` bit-for-bit (pytest-pinned)."""
    spark = corpus.sparkSession
    assign, recompute, cents0 = _kmeans_parts(
        corpus, id_col, vec_col, n_centroids, fp_scale
    )

    def literal_cents(rows: dict[int, list[float]]) -> DataFrame:
        # Arrow path (tiny_local_df): the pickle-RDD form of
        # createDataFrame costs a python-worker round per evaluation,
        # and this table is re-emitted (and re-evaluated by the next
        # assignment pass) EVERY iteration — doubles preserved exactly
        df = tiny_local_df(
            spark,
            [(cid, vec) for cid, vec in sorted(rows.items())],
            "cent_id long, __cent array<double>",
        )
        return df.select(
            "cent_id", "__cent", F.sqrt(norm_sq(F.col("__cent"))).alias("__centn")
        )

    prev: dict[int, list[float]] | None = None
    cents = cents0
    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        rows = {
            r["cent_id"]: [float(v) for v in r["__cent"]]
            for r in recompute(assign(cents)).collect()
        }
        cents = literal_cents(rows)
        if prev is not None and set(prev) == set(rows):
            moved = max(
                abs(a - b)
                for cid in rows
                for a, b in zip(rows[cid], prev[cid])
            )
            if moved <= tol:
                break
        prev = rows
    return cents, n_iters


def trained_pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    fp_scale: int = 2**40,
) -> DataFrame:
    """TRAINED PQ codebook: the fixed id-seeded codebook refined by
    one deterministic Lloyd iteration per subspace under squared L2 —
    assign every subvector to its nearest seed entry
    (``pq_assign_codes``), recompute each entry as the per-dimension
    fixed-point mean of its members, keep the seed slice for any code
    that attracted no members (so the codebook always has exactly
    n_subspaces x n_codes rows and ``load_pq_index``'s structural
    check holds). Returns (subspace, code, __code_sub) — a drop-in
    replacement for the fixed ``_pq_codebook`` in
    ``pq_assign_codes(codebook=...)`` and
    ``build_pq_index(train=True)``.

    Deterministic end to end: means accumulate floor(val * 2^40)
    longs in decimal (exact, order-independent — same arithmetic as
    ``kmeans_assign_2iter``'s recompute step), so a SQL oracle can
    replay the whole refinement and the trained code assignment stays
    hash-checkable even though the DOWNSTREAM top-k search built on
    it is approximate."""
    seed = _pq_codebook(corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes)
    assigned = pq_assign_codes(
        corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes
    ).select(id_col, "subspace", "code")
    sub = _pq_subvectors(
        fan_out(corpus), id_col, vec_col, id_col, "__sub", n_subspaces, sub_dim
    )
    means = (
        assigned.join(sub, [id_col, "subspace"])
        .select("subspace", "code", F.posexplode("__sub").alias("pos", "val"))
        .groupBy("subspace", "code", "pos")
        .agg(
            (
                # decimal accumulator for the same overflow headroom
                # rationale as the k-means recompute step above
                F.sum(
                    F.floor(F.col("val").cast("double") * F.lit(float(fp_scale)))
                    .cast("long")
                    .cast("decimal(38,0)")
                ).cast("double")
                / (F.count("*") * F.lit(float(fp_scale)))
            ).alias("mean_val")
        )
        .groupBy("subspace", "code")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("pm")
        )
        .select(
            "subspace",
            "code",
            F.transform(F.col("pm"), lambda x: x["mean_val"]).alias("__trained"),
        )
    )
    return seed.join(means, ["subspace", "code"], "left").select(
        "subspace",
        "code",
        F.coalesce(
            F.col("__trained"),
            F.transform(F.col("__code_sub"), lambda x: x.cast("double")),
        ).alias("__code_sub"),
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Throughput-oriented brute-force top-k: the query matrix is
    collected (it is small by contract) and broadcast into an
    Arrow-batched ``mapInPandas`` that scores each corpus batch against
    ALL queries with one BLAS matmul — the vectorized-Python path the
    JVM expression tree can't match once |Q| grows.

    Not oracle-paired: BLAS reorders the dot-product accumulation, so
    the last float ulp can differ from sequential summation; parity
    with ``brute_force_topk`` is asserted in pytest under a 1e-9
    tolerance instead. Same output schema."""
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    sc = corpus.sparkSession.sparkContext
    b = sc.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        import pandas as pd

        ids, mat, qn = b.value
        for pdf in batches:
            c_mat = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            if len(c_mat) == 0:
                continue
            cn = np.sqrt((c_mat * c_mat).sum(axis=1))
            # zero-norm guard: 0/0 is NaN, and Spark sorts NaN ABOVE
            # every real double, so an unguarded degenerate vector would
            # take rank 1 for every query. Emit no candidate row instead
            # — matching the JVM path's try_divide-NULL, which a
            # descending sort puts last and the top-k never reaches.
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (c_mat @ mat.T) / np.outer(cn, qn)  # |batch| x |Q|
            n_c, n_q = sims.shape
            flat = sims.ravel()
            keep = np.isfinite(flat)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(ids, n_c)[keep],
                    "neighbor_id": np.repeat(pdf[id_col].to_numpy(), n_q)[keep],
                    "cos_sim": np.round(flat[keep], 6),
                }
            )

    scored = (
        fan_out(corpus.select(id_col, vec_col))
        .mapInPandas(score, schema="query_id long, neighbor_id long, cos_sim double")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _hyperplane_values(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i is the
    (i mod 32)-th hex nibble of md5(f"{plane}:{i//32}") centered at
    7.5. Computed in Python at plan-build time: emitting the 64
    components as float literals instead of md5/conv expression trees
    removes ~10k expression nodes per bucketing pass (measured ~30 s
    of analysis + codegen per fresh session at 8 tables x 4 planes).
    Values are identical to the old expression form (md5 of the UTF-8
    bytes, hex nibble, minus 7.5)."""
    import hashlib

    out = []
    for i in range(dim):
        digest = hashlib.md5(f"{plane}:{i // 32}".encode()).hexdigest()
        out.append(float(int(digest[i % 32], 16)) - 7.5)
    return out


def sign_lsh_buckets_long(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    keep_vec: bool = False,
) -> DataFrame:
    """Long-form sign-LSH bucketing: one row per (vector, table) with
    the table's bit-string bucket key — the shared blocking stage for
    ``lsh_topk``, ``lsh_near_dup_pairs`` and ``lsh_bucket_stats``.

    Table ``t`` projects onto planes ``t*n_planes .. t*n_planes+n_planes-1``
    of the deterministic md5-derived plane space (identical plane ids →
    identical buckets across every operator built on this). Output:
    ``(id_col, tbl, bucket[, __vec, __norm])``.

    The hyperplanes ride as DATA — a broadcast ``n_tables``-row table
    of per-table plane matrices, equi-joined on ``tbl`` — not as
    literal expression trees. The values are identical (the same
    ``_hyperplane_values`` doubles; ``createDataFrame`` preserves
    IEEE doubles exactly, so every bucket is bit-identical to the
    expression form and the SQL oracles are unchanged), but the plan
    carries ~50 nodes instead of n_tables x n_planes x dim literal
    nodes: at 8 tables x 12 planes the expression form cost a
    measured ~7 s of Catalyst ANALYSIS per plan build — paid on every
    query invocation, dwarfing the 1.5 s execution — and the data
    form removes it without adding any shuffle (the plane table
    broadcasts; the per-vector fan-out is the same n_tables-row
    explode as before)."""
    spark = df.sparkSession
    plane_rows = [
        (t, [_hyperplane_values(t * n_planes + p, dim) for p in range(n_planes)])
        for t in range(n_tables)
    ]
    planes = F.broadcast(
        tiny_local_df(spark, plane_rows, "tbl int, __planes array<array<double>>")
    )
    # Malformed vectors (NULL, wrong length, or any NULL component)
    # must yield a NULL bucket, not a valid-looking one: a NULL
    # component poisons every plane's dot-product sum into NULL, the
    # sign test's otherwise-branch then emits "0" for every bit, and
    # the vector would silently alias the all-zeros bucket (colliding
    # with genuinely all-negative-projection vectors in every
    # downstream bucket equi-join). A NULL bucket instead drops out of
    # the equi-joins — malformed input can never manufacture a
    # candidate pair.
    well_formed = (F.size(F.col(vec_col)) == F.lit(dim)) & ~F.exists(
        F.col(vec_col), lambda x: x.isNull()
    )
    bucket = F.when(
        well_formed,
        F.concat_ws(
            "",
            F.transform(
                F.col("__planes"),
                lambda pv: F.when(
                    F.aggregate(
                        F.zip_with(
                            F.col(vec_col), pv, lambda x, y: x.cast("double") * y
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0")),
            ),
        ),
    ).otherwise(F.lit(None).cast("string"))
    return (
        df.withColumn(
            "tbl", F.explode(F.array(*[F.lit(t).cast("int") for t in range(n_tables)]))
        )
        .join(planes, "tbl")
        .select(
            F.col(id_col),
            *(
                [
                    F.col(vec_col).alias("__vec"),
                    F.sqrt(norm_sq(F.col(vec_col))).alias("__norm"),
                ]
                if keep_vec
                else []
            ),
            F.col("tbl"),
            bucket.alias("bucket"),
        )
    )


def lsh_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Blocked embedding near-duplicate pairs — the 100 TB path that
    replaces ``embedding_near_dup_pairs``'s all-pairs crossJoin.

    Candidates must share a sign-LSH bucket in at least one of
    ``n_tables`` tables (a bucket equi-join, never |C| x |C|), then the
    survivors get the same exact rounded-cosine threshold as the exact
    baseline. Same output schema as ``embedding_near_dup_pairs``
    (id_a, id_b, cos_sim); recall < 1 by design and is gated against
    the exact operator in tests.

    Defaults (4 planes x 16 tables) are tuned for the synthetic
    corpus's low-margin threshold (0.4 -> per-bit agreement ~0.63,
    recall ~0.94); a production near-dup pass at threshold ~0.9 keeps
    recall ~1 at these settings and gets far more selective blocking
    (per-bit agreement ~0.86).

    The bucket self-join and the pair dedup move ONLY (id, bucket)
    rows — the 64-float vectors never ride through the multi-table
    explode or the candidate shuffle (measured 6x on the sf0.1 bench
    vs carrying them). Vectors re-attach to the surviving distinct
    pairs with two id-equi-joins, which AQE turns into broadcasts when
    the corpus is small and leaves as co-partitioned shuffle joins at
    scale."""
    # candidates from ONE lazy pass (r14 restructure, guide §1.2/§2.4):
    # group the bucket table by (tbl, bucket), collect member ids,
    # explode the ordered pairs. The previous bucket-keyed self-join's
    # two sides were separate plan subtrees that each ran the n_tables
    # x n_planes plane projections — the query's dominant per-row cost
    # — once PER SIDE; r13's eager localCheckpoint de-duplicated the
    # compute but serialized the query into checkpoint-then-join jobs
    # (a measured bench regression). The grouped form has exactly one
    # consumer of the bucket table, so nothing needs materializing:
    # one (tbl, bucket) shuffle replaces the join's two, the vectors
    # still never ride through it, and skew matches the join exactly
    # (B bucket members -> B(B-1)/2 pairs on one key either way; the
    # collected id array is O(B) next to that quadratic output).
    b = sign_lsh_buckets_long(
        fan_out(corpus), id_col, vec_col, n_planes, n_tables, dim
    )
    cand = (
        b.groupBy("tbl", "bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__n"),
    )
    return (
        cand.join(vecs, cand.id_a == vecs.__vid)
        .select("id_a", "id_b", F.col("__v").alias("__va"), F.col("__n").alias("__na"))
        .join(vecs, F.col("id_b") == vecs.__vid)
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_prenormed(F.col("__va"), F.col("__v"), F.col("__na"), F.col("__n")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_bucket_stats(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Exact, deterministic projection of the LSH blocking structure:
    per (table, bucket) vector count, candidate-pair count and min
    member id. The planes are float literals fixed at plan-build time,
    so this is SQL-oracle-checkable — it pins down the *bucketing* the
    approximate ``lsh_topk`` family relies on, giving the ANN family a
    hash-checkable invariant (the top-k itself stays approximate)."""
    b = sign_lsh_buckets_long(fan_out(corpus), id_col, vec_col, n_planes, n_tables, dim)
    return b.groupBy("tbl", "bucket").agg(
        F.count("*").alias("n_vectors"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("long").alias("n_pairs"),
        F.min(id_col).alias("min_id"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket in any
    of ``n_tables`` independent hash tables, then exact re-rank.
    Returns the same schema as ``brute_force_topk`` (rank <= k; fewer
    rows possible when recall misses).

    Shares ``sign_lsh_buckets_long`` with the near-dup/stats operators
    (identical plane space → identical buckets), and moves ONLY
    (id, tbl, bucket) rows through the bucket join and the candidate
    dedup — the 64-float vectors re-attach to the surviving distinct
    pairs by id-join (query side broadcast: small by contract), the
    same measured-6x shape as ``lsh_near_dup_pairs``."""
    qb = sign_lsh_buckets_long(queries, id_col, vec_col, n_planes, n_tables, dim).select(
        F.col(id_col).alias("query_id"), "tbl", "bucket"
    )
    cb = sign_lsh_buckets_long(
        fan_out(corpus), id_col, vec_col, n_planes, n_tables, dim
    ).select(F.col(id_col).alias("neighbor_id"), "tbl", "bucket")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("__cn"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
