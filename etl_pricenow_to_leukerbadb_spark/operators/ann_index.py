"""Persisted ANN index: build once to parquet, search many times.

The in-memory ANN scorers (``similarity.pq_adc_topk`` and friends)
derive their index structures — PQ codes and codebook — from the
corpus on every call. That is the right shape for an oracle-checkable
query, but not for production retrieval at 100 TB: there the O(N)
index build runs ONCE (when the corpus snapshot lands), the artifacts
are written next to the data, and every search afterwards scans only
the quantized codes (4 small ints per vector) plus a dimension-sized
codebook — never the raw float vectors, except for the final exact
re-rank of a k x rerank_factor shortlist.

Layout under ``path/``:

    meta/       1-row parquet: (n_subspaces, sub_dim, n_codes,
                id_col, vec_col) — the build parameters, so search
                never has to guess them and a mismatched caller fails
                loudly instead of computing garbage distances.
    codebook/   (subspace, code, __code_sub) — n_subspaces x n_codes
                rows, each a sub_dim-wide float slice. Dimension-sized:
                always broadcast.
    codes/      (<id_col>, subspace, code) — n_subspaces small ints
                per corpus vector. THE scan side of every search;
                written without the raw vectors so a search job's
                ReadSchema is three narrow columns.

Search = ``similarity.pq_adc_search`` over the loaded tables: per
query one broadcast (subspace, code) -> distance lookup table, one
map-side-combinable sum over the code scan, a per-query shortlist
window, and (when the caller passes the corpus) an exact re-rank join
touching only shortlist raw vectors. Distances are 1e-6 fixed-point
BIGINTs end to end, so persisted-index search is bit-identical to the
from-scratch scorer — pytest-verified, which is the point: persisting
the index changes WHERE the structures live, never what they compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import (
    _pq_codebook,
    ivf_list_assign,
    ivf_pq_search,
    pq_adc_search,
    pq_assign_codes,
)

_META_COLS = ("n_subspaces", "sub_dim", "n_codes", "id_col", "vec_col")


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    overwrite: bool = False,
) -> None:
    """Quantize the corpus and persist the PQ index under ``path``.

    One pass over the raw vectors (the ``pq_assign_codes`` broadcast
    argmin — no data-sized shuffle) plus a dimension-sized codebook
    write. ``overwrite=False`` (default) refuses to clobber an
    existing index — rebuilds are deliberate, not accidental."""
    mode = "overwrite" if overwrite else "errorifexists"
    spark = corpus.sparkSession
    meta = spark.createDataFrame(
        [(n_subspaces, sub_dim, n_codes, id_col, vec_col)],
        "n_subspaces int, sub_dim int, n_codes int, id_col string, vec_col string",
    )
    # meta first: a crashed build leaves meta without codes, which
    # load_pq_index turns into a clean "missing codes" read error
    # rather than a silently param-less index
    meta.coalesce(1).write.mode(mode).parquet(f"{path}/meta")
    _pq_codebook(corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes).write.mode(
        mode
    ).parquet(f"{path}/codebook")
    pq_assign_codes(corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes).select(
        id_col, "subspace", "code"
    ).write.mode(mode).parquet(f"{path}/codes")


def load_pq_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """Load (codes, codebook, params) from a ``build_pq_index`` path.

    Validates that the codebook row count matches the persisted
    parameters (n_subspaces x n_codes) — the cheap structural check
    that catches a half-written or hand-edited index before a search
    silently computes distances against missing codes."""
    meta_rows = spark.read.parquet(f"{path}/meta").collect()
    if len(meta_rows) != 1 or set(_META_COLS) - set(meta_rows[0].asDict()):
        raise ValueError(f"load_pq_index: malformed meta at {path}/meta")
    params = meta_rows[0].asDict()
    codebook = spark.read.parquet(f"{path}/codebook")
    expected = params["n_subspaces"] * params["n_codes"]
    actual = codebook.count()  # dimension-sized table: a cheap job
    if actual != expected:
        raise ValueError(
            f"load_pq_index: codebook at {path} has {actual} entries, "
            f"expected n_subspaces*n_codes = {expected} — index is corrupt "
            "or was built with different parameters"
        )
    codes = spark.read.parquet(f"{path}/codes")
    return codes, codebook, params


def search_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    corpus: DataFrame | None = None,
    k: int = 5,
    rerank_factor: int = 10,
) -> DataFrame:
    """Top-k ANN over a persisted PQ index.

    ``corpus`` (the raw-vector table) enables the exact re-rank stage;
    ``corpus=None`` returns ADC-distance top-k straight off the code
    scan — the pure quantized path for when raw vectors are cold
    storage. Search output is bit-identical to ``pq_adc_topk`` run
    from scratch with the build's parameters (pytest-gated)."""
    codes, codebook, params = load_pq_index(spark, path)
    return pq_adc_search(
        codes.select(
            F.col(params["id_col"]).alias("neighbor_id"), "subspace", "code"
        ),
        codebook,
        queries,
        corpus,
        id_col=params["id_col"],
        vec_col=params["vec_col"],
        n_subspaces=params["n_subspaces"],
        sub_dim=params["sub_dim"],
        k=k,
        rerank_factor=rerank_factor,
    )


def append_to_pq_index(
    delta: DataFrame,
    path: str,
    assume_new_ids: bool = False,
) -> None:
    """Incrementally extend a persisted PQ or IVFADC index with a
    corpus delta — the streaming-ingest shape: quantize ONLY the new
    vectors against the index's FROZEN codebook (one broadcast argmin
    pass over the delta) and append their code rows; on an IVFADC
    layout (``build_ivfpq_index``) the delta is also assigned to the
    frozen coarse centroids and appended to the inverted lists, so
    both search paths see it. Nothing existing is rewritten, and the
    result is bit-identical to a full rebuild over the union
    (pytest-gated — the quantizers are fixed, so assignment is a pure
    per-vector function).

    Guards, each failing loudly instead of corrupting searches:
    delta vectors must cover the index geometry (short/NULL vectors
    would append NULL-code rows whose undercounted ADC sums wrongly
    PROMOTE the vector); delta ids must be internally unique and
    disjoint from the index (duplicates double-count in every ADC
    sum) — skippable with ``assume_new_ids=True`` when the ingest
    guarantees fresh ids; and a post-append invariant detects a
    partially-committed prior append (vectors with an incomplete
    per-subspace code set)."""
    import os

    spark = delta.sparkSession
    codes, codebook, params = load_pq_index(spark, path)
    id_col, vec_col = params["id_col"], params["vec_col"]
    dim = params["n_subspaces"] * params["sub_dim"]
    # Dimension guard BEFORE quantizing: a short (or NULL) delta vector
    # would slice short subvectors, zip_with would NULL-pad them, the
    # argmin would emit NULL codes, and those rows would fail the ADC
    # join at search time — an artificially SMALL distance that wrongly
    # promotes the vector into top-k. Same in-expression raise_error
    # pattern as _require_query_dim (a detached assert gets pruned);
    # unlike the build path, an append delta comes from a separate
    # ingest and is exactly where a dim mismatch happens.
    delta = delta.withColumn(
        vec_col,
        F.when(F.size(F.col(vec_col)) >= F.lit(dim), F.col(vec_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"append_to_pq_index: delta {vec_col} needs >= {dim} "
                        "elements (index geometry n_subspaces*sub_dim), got "
                    ),
                    F.coalesce(
                        F.size(F.col(vec_col)).cast("string"), F.lit("NULL")
                    ),
                )
            )
        ),
    )
    if not assume_new_ids:
        # two passes, one per corruption mode: (1) an aggregate over
        # the delta catches INTERNAL duplicates, (2) a semi-join from
        # the delta into the code table catches collisions with the
        # EXISTING index. Neither alone covers both.
        stats = delta.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(id_col)).alias("nd"),
        ).collect()[0]
        if stats["n"] != stats["nd"]:
            raise ValueError(
                f"append_to_pq_index: delta contains {stats['n'] - stats['nd']} "
                "internally duplicated id(s) — each would emit duplicate code "
                "rows and double-count in every ADC sum. Deduplicate the delta"
            )
        # left_semi from the delta: no distinct over the whole code
        # table (delta ids are proven unique above, and semi-join
        # existence semantics absorb the n_subspaces rows per id)
        n_dup = delta.select(F.col(id_col)).join(codes, id_col, "left_semi").count()
        if n_dup:
            raise ValueError(
                f"append_to_pq_index: {n_dup} delta id(s) already exist in "
                f"the index at {path} — appending would double-count their "
                "code rows in every ADC sum. Deduplicate the delta (or pass "
                "assume_new_ids=True only when ids are provably fresh)"
            )
    new_codes = pq_assign_codes(
        delta,
        id_col,
        vec_col,
        params["n_subspaces"],
        params["sub_dim"],
        params["n_codes"],
        codebook=codebook,
    ).select(id_col, "subspace", "code")
    new_codes.write.mode("append").parquet(f"{path}/codes")
    # An IVFADC index (build_ivfpq_index layout) must ALSO extend the
    # inverted lists: search_ivfpq_index inner-joins codes to lists, so
    # codes-only appends would be silently invisible to IVFADC search
    # (while plain PQ search over the same path saw them).
    if os.path.isdir(f"{path}/ivf_meta"):
        n_centroids = spark.read.parquet(f"{path}/ivf_meta").collect()[0][
            "n_centroids"
        ]
        centroids = spark.read.parquet(f"{path}/centroids")
        ivf_list_assign(
            delta, id_col, vec_col, n_centroids, centroids=centroids
        ).select(id_col, "cent_id").write.mode("append").parquet(f"{path}/lists")
    # Post-append invariant, scoped loudness over silent corruption: a
    # partially-committed append (crash during job commit) leaves some
    # vectors with fewer than n_subspaces code rows, which searches
    # would read as undercounted ADC sums. One scan of the
    # 4-small-ints code table per append is the cheap insurance; a
    # violation names the recovery (rebuild, or prune the partial ids)
    # instead of poisoning every later search.
    bad = (
        spark.read.parquet(f"{path}/codes")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") != params["n_subspaces"])
        .count()
    )
    if bad:
        raise RuntimeError(
            f"append_to_pq_index: {bad} vector(s) in {path}/codes have a "
            f"partial code set (!= {params['n_subspaces']} rows) after the "
            "append — a previous append likely crashed mid-commit. Rebuild "
            "the index with build_pq_index(..., overwrite=True) or remove "
            "the partial ids before searching"
        )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    overwrite: bool = False,
) -> None:
    """Persist the full IVFADC index: the PQ artifacts plus
    ``centroids/`` (cent_id, __cent — the coarse quantizer, always
    broadcast-sized) and ``lists/`` (<id_col>, cent_id — the inverted-
    list assignment). Two linear passes over the corpus (PQ argmin +
    IVF argmax, both broadcast aggregations), zero data-sized
    shuffles; everything a search needs afterwards except the raw
    vectors for the final re-rank."""
    # Validate the coarse quantizer BEFORE writing anything: the
    # fixed-codebook convention takes ids 0..n_centroids-1, and a
    # corpus whose ids don't cover that range (fewer vectors, or ids
    # not starting at 0) would otherwise build successfully and fail
    # only at search time with a misleading "index is corrupt"
    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cent")
    )
    n_found = cents.count()
    if n_found != n_centroids:
        raise ValueError(
            f"build_ivfpq_index: corpus has {n_found} vectors with "
            f"{id_col} < {n_centroids}; the fixed-codebook convention "
            f"needs ids 0..{n_centroids - 1} present exactly once — "
            "lower n_centroids or renumber the corpus ids"
        )
    build_pq_index(
        corpus, path, id_col, vec_col, n_subspaces, sub_dim, n_codes, overwrite
    )
    mode = "overwrite" if overwrite else "errorifexists"
    n_cent = corpus.sparkSession.createDataFrame(
        [(n_centroids,)], "n_centroids int"
    )
    n_cent.coalesce(1).write.mode(mode).parquet(f"{path}/ivf_meta")
    cents.write.mode(mode).parquet(f"{path}/centroids")
    ivf_list_assign(corpus, id_col, vec_col, n_centroids).select(
        id_col, "cent_id"
    ).write.mode(mode).parquet(f"{path}/lists")


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    n_probe: int = 4,
    k: int = 5,
    rerank_factor: int = 20,
) -> DataFrame:
    """Top-k IVFADC over a persisted index: coarse-probe the persisted
    centroid table, ADC-scan only the probed lists of the persisted
    code table, exact-re-rank the shortlist against ``corpus`` raw
    vectors. Bit-identical to ``ivf_pq_topk`` run from scratch with
    the build's parameters (pytest-gated)."""
    codes, codebook, params = load_pq_index(spark, path)
    cent_rows = spark.read.parquet(f"{path}/ivf_meta").collect()
    if len(cent_rows) != 1:
        raise ValueError(f"search_ivfpq_index: malformed ivf_meta at {path}")
    n_centroids = cent_rows[0]["n_centroids"]
    centroids = spark.read.parquet(f"{path}/centroids")
    actual = centroids.count()  # broadcast-sized table: a cheap job
    if actual != n_centroids:
        raise ValueError(
            f"search_ivfpq_index: centroid table at {path} has {actual} "
            f"rows, expected {n_centroids} — index is corrupt or was "
            "built with different parameters"
        )
    nid = F.col(params["id_col"]).alias("neighbor_id")
    lists = spark.read.parquet(f"{path}/lists").select(nid, "cent_id")
    index = codes.select(nid, "subspace", "code").join(lists, "neighbor_id")
    return ivf_pq_search(
        index,
        centroids,
        codebook,
        queries,
        corpus,
        id_col=params["id_col"],
        vec_col=params["vec_col"],
        n_subspaces=params["n_subspaces"],
        sub_dim=params["sub_dim"],
        n_probe=n_probe,
        k=k,
        rerank_factor=rerank_factor,
    )
