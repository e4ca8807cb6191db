"""Per-process index handle cache: one marker job per hit, and the
build_id validation must catch every way an index can change under a
cached handle — rebuild (new build_id), crashed rebuild (no matching
marker -> loud error, never stale params), and appends (big tables are
re-read fresh per call, so they are visible without invalidation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.fs import fs_delete
from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
    append_to_pq_index,
    build_pq_index,
    invalidate_index_handles,
    load_pq_index,
    search_pq_index,
)
from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
    build_dedup_index,
    invalidate_dedup_handles,
    load_dedup_index,
    query_dedup_candidates,
)
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table

PQ = dict(n_subspaces=4, sub_dim=16, n_codes=8)


@pytest.fixture(scope="module")
def corpus(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents")


def test_pq_cache_hit_serves_same_artifacts(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_pq_index(corpus, path, **PQ)
    invalidate_index_handles()
    _, cb1, p1 = load_pq_index(spark, path)  # cold: populates
    _, cb2, p2 = load_pq_index(spark, path)  # hit: validated via marker
    assert p1 == p2
    assert cb2 is cb1  # the cached codebook plan is reused


def test_pq_cache_invalidated_by_overwrite_rebuild(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_pq_index(corpus, path, **PQ)
    _, _, p1 = load_pq_index(spark, path)
    build_pq_index(corpus, path, n_subspaces=2, sub_dim=32, n_codes=8, overwrite=True)
    _, cb, p2 = load_pq_index(spark, path)
    # new generation's params, not the cached ones
    assert p2["build_id"] != p1["build_id"]
    assert p2["n_subspaces"] == 2 and cb.count() == 16


def test_pq_cache_never_masks_a_crashed_rebuild(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_pq_index(corpus, path, **PQ)
    load_pq_index(spark, path)  # cached
    fs_delete(spark, f"{path}/commit")  # simulate a crashed rebuild
    with pytest.raises(ValueError, match="no matching commit marker"):
        load_pq_index(spark, path)


def test_pq_cached_search_sees_appends(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    base = corpus.filter(F.col("vec_id") < 40)
    delta = corpus.filter(F.col("vec_id") >= 40)
    build_pq_index(base, path, **PQ)
    queries = corpus.filter(F.col("vec_id") < 2)
    search_pq_index(spark, path, queries, corpus, k=5).collect()  # cache warm
    append_to_pq_index(delta, path)
    # the codes table is re-read per call, so appended ids are
    # searchable through the SAME cached handle
    ids = {
        r["neighbor_id"]
        for r in search_pq_index(spark, path, queries, corpus, k=50).collect()
    }
    assert any(i >= 40 for i in ids)


def test_dedup_cache_invalidation_and_crash_loudness(spark, docs, tmp_path):
    path = str(tmp_path / "dd")
    build_dedup_index(docs, path, k_shingle=3, n_hashes=8, bands=4)
    invalidate_dedup_handles()
    _, p1 = load_dedup_index(spark, path)
    _, p2 = load_dedup_index(spark, path)  # hit
    assert p1 == p2
    # rebuild with different geometry -> probe must hash with the NEW one
    build_dedup_index(
        docs, path, k_shingle=3, n_hashes=16, bands=8, overwrite=True
    )
    _, p3 = load_dedup_index(spark, path)
    assert p3["n_hashes"] == 16 and p3["build_id"] != p1["build_id"]
    probe = docs.limit(3)
    assert query_dedup_candidates(spark, path, probe).columns == [
        "probe_id",
        "corpus_id",
    ]
    fs_delete(spark, f"{path}/commit")
    with pytest.raises(ValueError, match="no matching commit marker"):
        load_dedup_index(spark, path)
