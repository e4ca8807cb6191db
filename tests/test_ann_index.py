"""Persisted PQ index: build-once / search-many parity and safety.

The contract under test: persisting the index changes WHERE the
structures live (parquet next to the data), never WHAT a search
computes — search from disk must be bit-identical to the from-scratch
scorer, the code scan must read only the three narrow code columns,
and a corrupt or clobber-prone build must fail loudly.
"""

import pytest
from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
    build_pq_index,
    load_pq_index,
    search_pq_index,
)
from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
    pq_adc_topk,
    pq_assign_codes,
)
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table

PARAMS = dict(n_subspaces=4, sub_dim=16, n_codes=8)


@pytest.fixture(scope="module")
def corpus(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 3)


@pytest.fixture(scope="module")
def index_path(corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pq") / "idx")
    build_pq_index(corpus, path, **PARAMS)
    return path


def test_search_matches_from_scratch_scorer(spark, corpus, queries, index_path):
    from_disk = sorted(
        tuple(r) for r in search_pq_index(spark, index_path, queries, corpus, k=5).collect()
    )
    from_scratch = sorted(
        tuple(r) for r in pq_adc_topk(corpus, queries, k=5, **PARAMS).collect()
    )
    assert from_disk == from_scratch and len(from_disk) == 15


def test_persisted_codes_match_computed(spark, corpus, index_path):
    codes, codebook, params = load_pq_index(spark, index_path)
    assert {k: params[k] for k in PARAMS} == PARAMS
    on_disk = sorted(
        (r.vec_id, r.subspace, r.code) for r in codes.collect()
    )
    computed = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in pq_assign_codes(corpus, **PARAMS).collect()
    )
    assert on_disk == computed


def test_code_scan_reads_only_code_columns(spark, corpus, queries, index_path):
    """The whole point of the persisted index: a search's corpus-sized
    scan is the codes table, and its ReadSchema must be the three
    narrow columns — never the raw vectors."""
    plan = (
        search_pq_index(spark, index_path, queries, corpus=None, k=5)
        ._jdf.queryExecution()
        .simpleString()
    )
    scans = [ln for ln in plan.splitlines() if "/codes" in ln and "Scan" in ln]
    assert scans, plan
    assert "embedding" not in " ".join(scans)


def test_no_rerank_path_returns_adc_distances(spark, corpus, queries, index_path):
    rows = search_pq_index(spark, index_path, queries, corpus=None, k=5).collect()
    assert len(rows) == 15
    assert {r.rank for r in rows} == {1, 2, 3, 4, 5}
    # self-matches excluded even without the re-rank join
    assert all(r.query_id != r.neighbor_id for r in rows)


def test_build_refuses_to_clobber(corpus, index_path):
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        build_pq_index(corpus, index_path, **PARAMS)


def test_overwrite_rebuilds(spark, corpus, queries, index_path):
    build_pq_index(corpus, index_path, overwrite=True, **PARAMS)
    assert search_pq_index(spark, index_path, queries, corpus, k=5).count() == 15


def test_ivfpq_search_matches_from_scratch(spark, corpus, queries, tmp_path):
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import ivf_pq_topk

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(corpus, path, n_centroids=16, **PARAMS)
    from_disk = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    from_scratch = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            corpus, queries, n_centroids=16, n_probe=4, k=5, **PARAMS
        ).collect()
    )
    assert from_disk == from_scratch and len(from_disk) == 15


def test_short_query_vector_fails_loudly(spark, corpus, queries, index_path):
    """A query vector shorter than the index geometry must raise, not
    silently rank on NULL-padded distances."""
    short = queries.select("vec_id", F.slice("embedding", 1, 10).alias("embedding"))
    with pytest.raises(Exception, match="needs >= 64 elements"):
        search_pq_index(spark, index_path, short, corpus, k=5).collect()


def test_append_delta_equals_full_rebuild(spark, corpus, queries, tmp_path):
    """Appending a delta against the frozen codebook must produce an
    index bit-identical to rebuilding over the union — and search
    results over it must match the from-scratch scorer on the union."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    inc_path = str(tmp_path / "inc")
    build_pq_index(old, inc_path, **PARAMS)
    append_to_pq_index(delta, inc_path)

    full_path = str(tmp_path / "full")
    # NOTE: the union's codebook equals old's (ids < n_codes all in old)
    build_pq_index(corpus, full_path, **PARAMS)

    inc_codes = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in spark.read.parquet(f"{inc_path}/codes").collect()
    )
    full_codes = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in spark.read.parquet(f"{full_path}/codes").collect()
    )
    assert inc_codes == full_codes

    got = sorted(
        tuple(r) for r in search_pq_index(spark, inc_path, queries, corpus, k=5).collect()
    )
    want = sorted(
        tuple(r) for r in pq_adc_topk(corpus, queries, k=5, **PARAMS).collect()
    )
    assert got == want


def test_append_refuses_duplicate_ids(spark, corpus, tmp_path):
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
    )

    path = str(tmp_path / "dup")
    build_pq_index(corpus, path, **PARAMS)
    with pytest.raises(ValueError, match="already exist in"):
        append_to_pq_index(corpus.filter(F.col("vec_id") < 5), path)
    # internal duplicates are rejected before touching the index
    # (deterministic subset — LIMIT without ORDER BY can pick different
    # rows per evaluation and would flake the n==nd check)
    fresh = corpus.select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    ).filter(F.col("vec_id") < 100_003)
    with pytest.raises(ValueError, match="internally duplicated"):
        append_to_pq_index(fresh.unionAll(fresh), path)


def test_append_rejects_short_vectors(spark, corpus, tmp_path):
    """A delta vector shorter than the index geometry must raise, not
    append NULL-code rows whose undercounted ADC sums would wrongly
    promote the vector in every later search."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
    )

    path = str(tmp_path / "short")
    build_pq_index(corpus, path, **PARAMS)
    bad = corpus.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.slice("embedding", 1, 10).alias("embedding"),
    ).filter(F.col("vec_id") < 100_002)
    with pytest.raises(Exception, match="needs >= 64 elements"):
        append_to_pq_index(bad, path)


def test_append_extends_ivfpq_lists(spark, corpus, queries, tmp_path):
    """Appending to an IVFADC-layout index must extend the inverted
    lists too — codes-only appends would be silently invisible to
    search_ivfpq_index (its codes-to-lists join is inner)."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import ivf_pq_topk

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivfpq_inc")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    append_to_pq_index(delta, path)
    got = sorted(
        tuple(r)
        for r in search_ivfpq_index(spark, path, queries, corpus, n_probe=4, k=5).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            corpus, queries, n_centroids=16, n_probe=4, k=5, **PARAMS
        ).collect()
    )
    assert got == want and len(got) == 15


def test_ivfpq_build_validates_centroid_coverage(spark, corpus, tmp_path):
    """A corpus whose ids don't cover 0..n_centroids-1 must fail the
    BUILD with an actionable message — not build successfully and then
    fail every search with 'index is corrupt'."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
    )

    shifted = corpus.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="lower n_centroids or renumber"):
        build_ivfpq_index(shifted, str(tmp_path / "bad"), n_centroids=16, **PARAMS)


def test_corrupt_codebook_detected(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_pq_index(corpus, path, **PARAMS)
    # truncate the codebook to simulate a half-written index (collect
    # then rewrite — Spark refuses to overwrite a path it is reading)
    cb = spark.read.parquet(f"{path}/codebook")
    kept = [r for r in cb.collect() if r.code < 4]
    spark.createDataFrame(kept, cb.schema).write.mode("overwrite").parquet(
        f"{path}/codebook"
    )
    with pytest.raises(ValueError, match="corrupt"):
        load_pq_index(spark, path)
