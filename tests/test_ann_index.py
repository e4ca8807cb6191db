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


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_search_matches_from_scratch(
    spark, corpus, queries, tmp_path, residual
):
    """Persisted-search parity for BOTH encodings: the residual flag
    is stamped in meta at build time and read back by the search, so
    the same call site gets the right coordinate frame either way."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import ivf_pq_topk

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=residual, **PARAMS)
    from_disk = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    from_scratch = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            corpus, queries, n_centroids=16, n_probe=4, k=5,
            residual=residual, **PARAMS
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


def test_compact_index_preserves_search_and_shrinks_files(
    spark, corpus, queries, tmp_path
):
    """Compacting a streaming-ingested index (many small per-batch
    files) must leave search results bit-identical, shrink the file
    counts, keep fsck clean, preserve the ingest markers' rows, and
    leave the index appendable — compaction is maintenance, never a
    new generation."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        compact_index,
        fsck_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.session import tiny_local_df

    old = corpus.filter(F.col("vec_id") < 350)
    path = str(tmp_path / "cmp")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    # simulate a streaming ingest: several small appends + marker files
    for lo, hi in ((350, 400), (400, 430), (430, 470), (470, 10_000)):
        append_to_pq_index(
            corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), path
        )
    for epoch in range(3):
        tiny_local_df(
            spark,
            [("qid", epoch, "bid")],
            "query_id string, epoch_id long, build_id string",
        ).coalesce(1).write.mode("append").parquet(f"{path}/ingest_epochs")

    before = sorted(
        tuple(r)
        for r in search_ivfpq_index(spark, path, queries, corpus, n_probe=4, k=5).collect()
    )
    report = compact_index(spark, path, target_files=2)
    assert report["codes"]["files_after"] < report["codes"]["files_before"]
    assert report["lists"]["files_after"] < report["lists"]["files_before"]
    assert report["ingest_epochs"]["rows"] == 3
    after = sorted(
        tuple(r)
        for r in search_ivfpq_index(spark, path, queries, corpus, n_probe=4, k=5).collect()
    )
    assert after == before and len(after) == 15
    assert spark.read.parquet(f"{path}/ingest_epochs").count() == 3
    fsck_index(spark, path)  # strict: clean
    # still appendable after compaction (same generation, same guards)
    fresh = corpus.select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    ).filter(F.col("vec_id") < 100_003)
    append_to_pq_index(fresh, path)
    fsck_index(spark, path)


def test_compact_refuses_uncommitted_index(spark, corpus, tmp_path):
    """Compacting an index whose commit marker is missing must refuse
    loudly — rewriting mixed-generation artifacts into freshly sorted
    files would launder a crashed build into a coherent-looking lie."""
    import shutil

    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        compact_index,
    )

    path = str(tmp_path / "cmp_nocommit")
    build_pq_index(corpus, path, **PARAMS)
    shutil.rmtree(f"{path}/commit")
    with pytest.raises(ValueError, match="commit"):
        compact_index(spark, path)


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


def test_ivf_layout_detection_is_filesystem_agnostic(
    spark, corpus, tmp_path, monkeypatch
):
    """Layout detection must go through Spark's filesystem, never a
    driver-local os.path probe: on HDFS/S3 (the storage this module
    targets) os.path.isdir is silently False, the lists append would
    be skipped, and appended vectors would be permanently invisible to
    IVFADC search. Simulate that storage by making every os.path
    probe return False — the append must still extend the lists."""
    import os as _os

    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "agnostic")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    n_before = spark.read.parquet(f"{path}/lists").count()
    monkeypatch.setattr(_os.path, "isdir", lambda p: False)
    monkeypatch.setattr(_os.path, "exists", lambda p: False)
    append_to_pq_index(delta, path)
    n_after = spark.read.parquet(f"{path}/lists").count()
    assert n_after == n_before + delta.count()


def test_missing_commit_marker_detected(spark, corpus, tmp_path):
    """A build that crashed before its commit marker (fresh build, or
    a marker-less hand-copied index) must refuse to load."""
    import shutil

    path = str(tmp_path / "nocommit")
    build_pq_index(corpus, path, **PARAMS)
    shutil.rmtree(f"{path}/commit")
    with pytest.raises(ValueError, match="commit marker"):
        load_pq_index(spark, path)


def test_crashed_overwrite_rebuild_detected(spark, corpus, tmp_path):
    """An overwrite rebuild that crashed after writing new meta but
    before its commit marker leaves OLD codes under NEW parameters;
    with unchanged parameters the codebook-count check passes, so the
    generation token is the only thing standing between a search and
    silently mixed artifacts. Simulate the crash state directly: meta
    carries a build_id the commit marker does not."""
    path = str(tmp_path / "genmix")
    build_pq_index(corpus, path, **PARAMS)
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    meta["build_id"] = "deadbeef" * 4
    spark.createDataFrame(
        [tuple(meta.values())], list(meta.keys())
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="commit marker"):
        load_pq_index(spark, path)


def test_fsck_detects_codes_lists_disagreement(spark, corpus, tmp_path):
    """A crash between an IVFADC append's lists and codes writes
    leaves the two tables covering different id sets. The per-append
    guards are deliberately DELTA-scoped (flat cost per micro-batch),
    so whole-index disagreement — ids outside any later delta — is
    fsck_index's job: the scheduled sweep must fail loudly instead of
    letting IVFADC search silently drop the difference at its inner
    join. A later append of UNRELATED ids must still succeed (its own
    delta is consistent)."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        fsck_index,
    )

    path = str(tmp_path / "halfappend")
    build_ivfpq_index(
        corpus.filter(F.col("vec_id") < 400), path, n_centroids=16, **PARAMS
    )
    # simulate the crashed prior append: a complete per-subspace code
    # set for an id that never made it into the inverted lists
    spark.createDataFrame(
        [(900_000, s, 0) for s in range(PARAMS["n_subspaces"])],
        "vec_id long, subspace int, code long",
    ).write.mode("append").parquet(f"{path}/codes")
    # delta-scoped guards: an unrelated delta appends fine
    append_to_pq_index(corpus.filter(F.col("vec_id") >= 400), path)
    # ...but the whole-index sweep names the orphan
    with pytest.raises(RuntimeError, match="inconsistent"):
        fsck_index(spark, path)
    report = fsck_index(spark, path, strict=False)
    assert report["codes_lists_id_mismatch"]
    assert report["n_ids"] == report["n_list_ids"] + 1


def test_fsck_repair_prunes_incoherent_ids(spark, corpus, tmp_path):
    """fsck_index(repair=True) is the cheap recovery: prune-and-rewrite
    of the narrow codes/lists tables, no re-quantization. Plants all
    three violation shapes on one IVFADC index — an orphan complete
    code set (id absent from lists), a partial code set (crash during
    a codes file-commit), and duplicated list rows — and requires the
    repaired index to be row-identical to a clean build, with the
    pruned REAL id re-ingestable afterwards (repair restores its
    "never appended" state)."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        fsck_index,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    path = str(tmp_path / "repairme")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    # orphan: complete code set for an id the lists never saw
    spark.createDataFrame(
        [(900_000, s, 0) for s in range(PARAMS["n_subspaces"])],
        "vec_id long, subspace int, code long",
    ).write.mode("append").parquet(f"{path}/codes")
    # partial: 2 of n_subspaces code rows for a real (future-delta) id
    spark.createDataFrame(
        [(450, s, 0) for s in range(2)], "vec_id long, subspace int, code long"
    ).write.mode("append").parquet(f"{path}/codes")
    # duplicate list rows: replay one existing id's list assignment
    spark.read.parquet(f"{path}/lists").filter(
        F.col("vec_id") == 7
    ).write.mode("append").parquet(f"{path}/lists")

    with pytest.raises(RuntimeError, match="repair=True"):
        fsck_index(spark, path)
    report = fsck_index(spark, path, repair=True)
    assert report["repair"]["pruned_ids"] == 2  # 900000 + 450
    assert report["repair"]["n_ids_after"] == 400
    assert report["post_repair"]["partial_code_ids"] == 0
    assert report["post_repair"].get("dup_list_rows") == 0

    clean = str(tmp_path / "repairme_clean")
    build_ivfpq_index(old, clean, n_centroids=16, **PARAMS)
    for sub in ("codes", "lists"):
        got = sorted(tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect())
        want = sorted(tuple(r) for r in spark.read.parquet(f"{clean}/{sub}").collect())
        assert got == want, sub
    # the pruned real id is "never appended" again: re-ingest works
    append_to_pq_index(corpus.filter(F.col("vec_id") == 450), path)
    fsck_index(spark, path)


def test_fsck_repair_retains_double_appended_ids(spark, corpus, tmp_path):
    """A replayed assume_new_ids=True append writes byte-identical
    duplicate code rows (assignment is deterministic under the frozen
    codebook) — repair must reconstruct those ids via distinct(), not
    prune them: zero ids lost, codes equal the computed assignment."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import fsck_index

    path = str(tmp_path / "dupcodes")
    build_pq_index(corpus, path, **PARAMS)
    spark.read.parquet(f"{path}/codes").filter(
        F.col("vec_id") == 7
    ).write.mode("append").parquet(f"{path}/codes")
    report = fsck_index(spark, path, repair=True)
    assert report["repair"]["pruned_ids"] == 0
    on_disk = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    computed = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in pq_assign_codes(corpus, **PARAMS).collect()
    )
    assert on_disk == computed


def test_append_retry_after_lists_crash_repairs(spark, corpus, queries, tmp_path):
    """The natural recovery from a crash between an IVFADC append's
    lists and codes writes is RETRYING the same delta. The retry must
    be idempotent — delta ids already in lists/ are anti-joined out of
    the lists append, the codes side completes, and the repaired index
    is bit-identical to a full rebuild (duplicated list rows would
    silently double adc_dist_fp for exactly those ids at search
    time)."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        fsck_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        ivf_list_assign,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "retry")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    # simulate the crashed first attempt: lists written, codes not
    centroids = spark.read.parquet(f"{path}/centroids")
    ivf_list_assign(
        delta, "vec_id", "embedding", 16, centroids=centroids
    ).select("vec_id", "cent_id").write.mode("append").parquet(f"{path}/lists")
    # retry the SAME delta: must succeed and repair
    append_to_pq_index(delta, path)
    fsck_index(spark, path)  # whole-index sweep is clean
    full_path = str(tmp_path / "retry_full")
    build_ivfpq_index(corpus, full_path, n_centroids=16, **PARAMS)
    for sub in ("codes", "lists"):
        got = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect()
        )
        want = sorted(
            tuple(r) for r in spark.read.parquet(f"{full_path}/{sub}").collect()
        )
        assert got == want, sub


def test_replayed_assume_new_ids_append_fails_loudly(spark, corpus, tmp_path):
    """assume_new_ids=True skips the codes disjointness probe, so a
    full replay of an already-committed append double-writes code rows
    — the delta-scoped post-append invariant must catch that loudly
    (undetected, every ADC sum for those ids doubles). The lists side
    must NOT duplicate (the retry anti-join runs regardless of
    assume_new_ids)."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        fsck_index,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "replay")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    append_to_pq_index(delta, path, assume_new_ids=True)
    with pytest.raises(RuntimeError, match="incomplete|partial"):
        append_to_pq_index(delta, path, assume_new_ids=True)
    report = fsck_index(spark, path, strict=False)
    assert report["partial_code_ids"] > 0  # the duplicated code sets
    assert report["dup_list_rows"] == 0  # lists stayed exactly-once


def test_legacy_meta_without_build_id_loads(spark, corpus, tmp_path):
    """Indexes persisted before the generation-token format (meta has
    no build_id column, no commit/ directory) must still load through
    the structural codebook-count check — the format bump must not
    strand every existing index behind a rebuild."""
    path = str(tmp_path / "legacy")
    build_pq_index(corpus, path, **PARAMS)
    # strip the index down to the legacy format
    import shutil

    shutil.rmtree(f"{path}/commit")
    meta = spark.read.parquet(f"{path}/meta").drop(
        "build_id", "trained", "id_type", "vec_elem_type", "residual"
    )
    rows, schema = meta.collect(), meta.schema
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
    codes, codebook, params = load_pq_index(spark, path)
    assert "build_id" not in params
    assert codes.count() == corpus.count() * PARAMS["n_subspaces"]


def _exact_l2_top5(emb, n_queries=10):
    import numpy as np

    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    return {
        q: {
            c
            for _, c in sorted(
                (float(np.sum((V[q] - V[c]) ** 2)), c) for c in V if c != q
            )[:5]
        }
        for q in range(n_queries)
    }


def _adc_recall(spark, path, queries, exact):
    rows = search_pq_index(spark, path, queries, corpus=None, k=5).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)


def test_trained_codebook_recall_at_least_fixed(spark, corpus, tmp_path):
    """The point of train=True: one deterministic Lloyd refinement
    must center the codebook better than the raw id-seeded slices.
    Measured on the PURE ADC path (no exact re-rank, which would mask
    codebook quality): recall@5 trained >= fixed against exact L2
    ground truth. Both paths are deterministic at fixed SF, so this
    is a hard gate, not a flaky statistical one."""
    q10 = corpus.filter(F.col("vec_id") < 10)
    exact = _exact_l2_top5(corpus)
    fixed_path = str(tmp_path / "fixed")
    trained_path = str(tmp_path / "trained")
    build_pq_index(corpus, fixed_path, **PARAMS)
    build_pq_index(corpus, trained_path, train=True, **PARAMS)
    r_fixed = _adc_recall(spark, fixed_path, q10, exact)
    r_trained = _adc_recall(spark, trained_path, q10, exact)
    assert r_trained >= r_fixed, (
        f"trained ADC recall {r_trained:.3f} < fixed {r_fixed:.3f}"
    )
    # and the trained codebook keeps the full row count (empty codes
    # fall back to their seed slice, so the structural check holds)
    _, codebook, params = load_pq_index(spark, trained_path)
    assert params["trained"] is True
    assert codebook.count() == PARAMS["n_subspaces"] * PARAMS["n_codes"]


@pytest.mark.parametrize("residual", [False, True])
def test_trained_ivfpq_index_searches_and_appends(spark, corpus, tmp_path, residual):
    """train=True must compose with the rest of the index lifecycle:
    IVFADC search returns a full, dense result off trained quantizers,
    and an append quantizes deltas against the FROZEN trained
    codebook/centroids (quantizer-agnostic by construction). The
    residual arm additionally trains the PQ codebook on RESIDUALS and
    must residualize the append's delta against the frozen trained
    centroids before encoding."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "trained_ivfpq")
    build_ivfpq_index(
        old, path, n_centroids=16, train=True, residual=residual, **PARAMS
    )
    append_to_pq_index(delta, path)
    q10 = corpus.filter(F.col("vec_id") < 10)
    exact = _exact_l2_top5(corpus)
    rows = search_ivfpq_index(spark, path, q10, corpus, n_probe=4, k=5).collect()
    assert len(rows) == 50
    assert {r.rank for r in rows} == {1, 2, 3, 4, 5}
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)
    assert recall >= 0.8, f"trained IVFADC recall {recall:.2f} too low"


def test_residual_lut_budget_fails_loudly_and_chunking_is_exact(
    spark, corpus, tmp_path
):
    """The r10 ask: the residual path's per-probed-list LUT is
    |Q| x n_probe x m x k BROADCAST rows — |Q|-linear — and nothing
    guarded the query-batch bound the way max_partials guards the
    prefix scan. Now an oversized batch fails loudly with the chunk
    size that fits (both the in-memory scorer and the persisted
    search path), and the advice it prints is exact: per-chunk
    results union to the full-batch answer."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        ivf_pq_topk,
    )

    q10 = corpus.filter(F.col("vec_id") < 10)
    # batch over budget, single query within it: the chunkable case
    # (per-query LUT = n_probe 4 x codebook 32 = 128 rows <= 200)
    with pytest.raises(ValueError, match="residual LUT would be .* Chunk"):
        ivf_pq_topk(
            corpus, q10, n_centroids=16, residual=True, lut_row_budget=200,
            **PARAMS,
        ).collect()
    # a SINGLE query's LUT over the budget: chunking cannot help, and
    # the message must say so instead of advising it
    with pytest.raises(ValueError, match="SINGLE query.*chunking cannot help"):
        ivf_pq_topk(
            corpus, q10, n_centroids=16, residual=True, lut_row_budget=100,
            chunk_oversized=True, **PARAMS,
        ).collect()

    # the persisted search path honors the same budget (meta says
    # residual, so the guard applies without the caller asking)
    path = str(tmp_path / "res_idx")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=True, **PARAMS)
    with pytest.raises(ValueError, match="residual LUT would be"):
        search_ivfpq_index(
            spark, path, q10, corpus, n_probe=4, k=5, lut_row_budget=200
        ).collect()

    # the printed recovery is exact, not approximate: top-k per query
    # is independent, so chunked searches union to the full batch
    full = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, q10, corpus, n_probe=4, k=5
        ).collect()
    )
    chunked = sorted(
        tuple(r)
        for lo, hi in [(0, 5), (5, 10)]
        for r in search_ivfpq_index(
            spark,
            path,
            corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            corpus,
            n_probe=4,
            k=5,
        ).collect()
    )
    assert chunked == full

    # chunk_oversized=True runs the printed recipe automatically: the
    # oversized batch hash-splits into budget-fitting chunks and the
    # union equals the unchunked answer exactly
    auto_chunked = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, q10, corpus, n_probe=4, k=5,
            lut_row_budget=400, chunk_oversized=True,
        ).collect()
    )
    assert auto_chunked == full

    # the raw (non-residual) path consults the SAME budget (r10
    # verdict: its LUT is n_probe-times smaller but identically
    # |Q|-linear): with a budget one query's LUT cannot fit, the
    # message says chunking cannot help rather than advising it
    with pytest.raises(ValueError, match="SINGLE query.*chunking cannot help"):
        ivf_pq_topk(
            corpus, q10, n_centroids=16, residual=False, lut_row_budget=1,
            **PARAMS,
        ).collect()


def test_raw_adc_guards_match_residual_arm(spark, corpus, tmp_path):
    """The r10 verdict's one real finding: both r10 guards ran only
    under ``if residual:`` while the raw arm built its own unguarded
    |Q|-linear broadcast LUT (|Q| x n_subspaces x n_codes), and raw
    duplicate query ids produced colliding (query_id, subspace, code)
    LUT rows whose distances silently DOUBLE-COUNTED in the ADC sum —
    a wrong-answer class, not just an OOM. The guards are now hoisted
    above the arm branch; this test pins the raw arm to the exact
    behaviors the residual tests pin."""
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        ivf_pq_topk,
    )

    q10 = corpus.filter(F.col("vec_id") < 10)
    # raw LUT pricing: per-query LUT = codebook 4x8 = 32 rows fits a
    # 100-row budget, the 10-query batch (320 rows) does not -> loud
    # refusal naming the raw arm and the exact chunk size (3 queries)
    with pytest.raises(ValueError, match="raw LUT would be .* Chunk"):
        ivf_pq_topk(
            corpus, q10, n_centroids=16, residual=False, lut_row_budget=100,
            **PARAMS,
        ).collect()

    # chunk_oversized=True on the raw arm: the union of the per-chunk
    # searches must equal the unchunked answer exactly (top-k per
    # query is independent across query chunks)
    full = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q10, n_centroids=16, residual=False, **PARAMS
        ).collect()
    )
    auto_chunked = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q10, n_centroids=16, residual=False, lut_row_budget=100,
            chunk_oversized=True, **PARAMS,
        ).collect()
    )
    assert auto_chunked == full

    # duplicate query ids are refused up front on the raw arm too —
    # before the fix they silently double-counted every subspace
    # distance (two identical LUT rows summed per (query, neighbor))
    q2 = corpus.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="duplicate ids.*double-count"):
        ivf_pq_topk(
            corpus, q2.unionAll(q2), n_centroids=16, residual=False,
            **PARAMS,
        ).collect()

    # null ids are refused on the raw arm (they silently match nothing
    # through the LUT join)
    qnull = q2.withColumn(
        "vec_id",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(F.col("vec_id")),
    )
    with pytest.raises(ValueError, match="NULL vec_id"):
        ivf_pq_topk(
            corpus, qnull, n_centroids=16, residual=False, **PARAMS
        ).collect()


def test_chunked_residual_search_progresses_on_hash_colliding_ids(
    spark, corpus, tmp_path
):
    """Regression: the auto-chunk split used to be
    pmod(xxhash64(id), n_chunks) — two over-budget queries whose
    hashes share a residue re-split into the SAME chunk at every
    level (the recursive call recomputes the identical n_chunks and
    the identical partition), so the recursion never reached the
    single-query base case: infinite recursion, each level burning a
    queries.count() + codebook.count(). The split is now by row
    number, which strictly shrinks every level. This test picks the
    adversarial same-residue pair explicitly and must return the
    exact unchunked answer."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    path = str(tmp_path / "coll_idx")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=True, **PARAMS)
    by_residue: dict = {}
    for r in (
        corpus.select(
            "vec_id",
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)).alias("p"),
        )
        .limit(20)
        .collect()
    ):
        by_residue.setdefault(r["p"], []).append(r["vec_id"])
    pair = next(v[:2] for v in by_residue.values() if len(v) >= 2)
    q2 = corpus.filter(F.col("vec_id").isin([int(x) for x in pair]))
    full = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, q2, corpus, n_probe=4, k=5
        ).collect()
    )
    # budget fits ONE query's LUT (n_probe 4 x codebook 32 = 128 rows)
    # but not two (256): forces n_chunks=2 on a same-residue pair
    chunked = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, q2, corpus, n_probe=4, k=5,
            lut_row_budget=200, chunk_oversized=True,
        ).collect()
    )
    assert chunked == full

    # duplicate query ids are refused up front: the residual LUT is
    # keyed by (query_id, cent_id) so duplicates would silently score
    # against one row's residuals, and the row-number chunk split
    # needs a total order (ties would make a row's chunk unstable
    # across the per-chunk filter re-evaluations)
    with pytest.raises(ValueError, match="duplicate ids"):
        search_ivfpq_index(
            spark, path, q2.unionAll(q2), corpus, n_probe=4, k=5,
            lut_row_budget=200, chunk_oversized=True,
        ).collect()


def test_stream_index_ingest_matches_rebuild_and_is_idempotent(
    spark, corpus, queries, tmp_path
):
    """Streaming micro-batch appends must leave the index bit-identical
    to a full rebuild over the union, and replaying the same input
    against a fresh checkpoint must be a no-op (the anti-join replay
    guard) — foreachBatch is at-least-once, the index must not
    double-count."""
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_index_ingest_job,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    path = str(tmp_path / "stream_idx")
    vecs = str(tmp_path / "vec_stream")
    build_pq_index(old, path, **PARAMS)
    # two files -> availableNow may split them into separate micro-batches
    delta.repartition(2).write.parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)

    full_path = str(tmp_path / "stream_full")
    build_pq_index(corpus, full_path, **PARAMS)
    inc = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    full = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in spark.read.parquet(f"{full_path}/codes").collect()
    )
    assert inc == full

    # replay the whole input with a FRESH checkpoint: every id already
    # indexed -> anti-join drops all, codes unchanged
    import shutil

    shutil.rmtree(path + "_ingest_ckpt")
    stream_index_ingest_job(spark, vecs, path)
    again = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    assert again == inc

    got = sorted(
        tuple(r) for r in search_pq_index(spark, path, queries, corpus, k=5).collect()
    )
    want = sorted(
        tuple(r) for r in pq_adc_topk(corpus, queries, k=5, **PARAMS).collect()
    )
    assert got == want


def test_stream_index_ingest_ivfadc_replay_crash(
    spark, corpus, queries, tmp_path
):
    """IVFADC streaming ingest under the at-least-once contract: a
    first delivery that crashed between its lists and codes writes
    (lists landed, codes did not, no epoch marker) must be REPAIRED by
    the replay — the finished index bit-identical to a full rebuild on
    both directories, search seeing exactly-once results — and a
    replay of an input already ingested under a FRESH checkpoint must
    be a no-op."""
    import shutil

    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        fsck_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        ivf_list_assign,
    )
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_index_ingest_job,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    path = str(tmp_path / "ivf_stream")
    vecs = str(tmp_path / "ivf_vec_stream")
    build_ivfpq_index(old, path, n_centroids=16, **PARAMS)
    # simulate the crashed first delivery: lists written, codes not,
    # no epoch marker
    centroids = spark.read.parquet(f"{path}/centroids")
    ivf_list_assign(
        delta, "vec_id", "embedding", 16, centroids=centroids
    ).select("vec_id", "cent_id").write.mode("append").parquet(f"{path}/lists")
    delta.coalesce(1).write.parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)  # the replay repairs
    fsck_index(spark, path)

    full_path = str(tmp_path / "ivf_stream_full")
    build_ivfpq_index(corpus, full_path, n_centroids=16, **PARAMS)
    for sub in ("codes", "lists"):
        got = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect()
        )
        want = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{full_path}/{sub}").collect()
        )
        assert got == want, sub
    got = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, full_path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    assert got == want and len(got) == 15

    # replay the whole input under a FRESH checkpoint: new query id ->
    # the epoch markers don't apply (by design — epoch ids restart at
    # 0 on a wipe), the anti-join guard makes it a no-op
    shutil.rmtree(path + "_ingest_ckpt")
    stream_index_ingest_job(spark, vecs, path)
    fsck_index(spark, path)
    again = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/codes").collect()
    )
    want_codes = sorted(
        tuple(r) for r in spark.read.parquet(f"{full_path}/codes").collect()
    )
    assert again == want_codes
    markers = spark.read.parquet(f"{path}/ingest_epochs").collect()
    assert len({m.query_id for m in markers}) == 2  # one per checkpoint


def test_stream_index_ingest_partial_codes_fail_loudly(
    spark, corpus, tmp_path
):
    """A batch containing an id whose code set is PARTIAL (a prior
    append crashed during the codes file-commit) must fail the ingest
    loudly, naming the recovery: parquet cannot retract the partial
    rows, re-appending would double-count them in every ADC sum, and
    silently skipping them would leave under-counting vectors in the
    index forever."""
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_index_ingest_job,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    path = str(tmp_path / "partial_idx")
    vecs = str(tmp_path / "partial_vec_stream")
    build_pq_index(old, path, **PARAMS)
    # plant the partial set: 2 of 4 subspaces for one delta id
    spark.createDataFrame(
        [(450, s, 0) for s in range(2)], "vec_id long, subspace int, code long"
    ).write.mode("append").parquet(f"{path}/codes")
    delta.coalesce(1).write.parquet(vecs)
    with pytest.raises(Exception, match="PARTIAL code set"):
        stream_index_ingest_job(spark, vecs, path)


def test_stream_index_ingest_epoch_marker_short_circuits(
    spark, corpus, tmp_path
):
    """Replaying a COMMITTED epoch inside one checkpoint (crash after
    the marker write, before the checkpoint commit) must take the
    marker fast path: a metadata no-op that never scans the code
    table. Proof is in the marker table itself — the marker-hit path
    returns before appending, so the row count stays flat; the
    anti-join fallback path would append a second marker row for the
    replayed epoch."""
    import shutil

    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_index_ingest_job,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    path = str(tmp_path / "marker_idx")
    vecs = str(tmp_path / "marker_vec_stream")
    build_pq_index(old, path, **PARAMS)
    delta.coalesce(1).write.parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)
    markers_before = spark.read.parquet(f"{path}/ingest_epochs").collect()

    # crash-after-marker simulation: wipe the checkpoint's commits so
    # Spark re-delivers the same epochs under the SAME query id
    shutil.rmtree(path + "_ingest_ckpt/commits")
    stream_index_ingest_job(spark, vecs, path)
    markers_after = spark.read.parquet(f"{path}/ingest_epochs").collect()
    assert sorted(map(tuple, markers_after)) == sorted(
        map(tuple, markers_before)
    )
    # and the index did not double-count
    n_ids = (
        spark.read.parquet(f"{path}/codes")
        .select("vec_id")
        .distinct()
        .count()
    )
    assert n_ids == corpus.count()


def test_marker_swap_crash_is_recovered_not_silently_lost(
    spark, corpus, tmp_path
):
    """Compaction swaps the epoch-marker table rename-FIRST: a crash
    between the two renames leaves the full marker copy in a hidden
    backup OUTSIDE the staging dir, and the next compaction restores
    it — the old staged-copy design parked the only copy under
    .compact_stage, which the next run's startup wipe silently
    deleted (markers then degraded to classification replay with no
    signal)."""
    from etl_pricenow_to_leukerbadb_spark.fs import fs_rename, try_read_parquet
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        compact_index,
    )
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_index_ingest_job,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    path = str(tmp_path / "idx")
    vecs = str(tmp_path / "vecs")
    build_pq_index(old, path, **PARAMS)
    delta.repartition(2).write.parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)
    markers_before = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/ingest_epochs").collect()
    )
    assert markers_before  # the ingest wrote epoch markers

    # simulate a swap that crashed between the two renames: live dir
    # moved aside, staged copy stranded under .compact_stage
    fs_rename(spark, f"{path}/ingest_epochs", f"{path}/.ingest_epochs.old")
    spark.createDataFrame(
        [("dead", 0, "stale")], "query_id string, epoch_id long, build_id string"
    ).write.parquet(f"{path}/.compact_stage/ingest_epochs")
    assert try_read_parquet(spark, f"{path}/ingest_epochs") is None

    report = compact_index(spark, path)
    # the backup was restored (NOT the stranded stage copy), then
    # compacted as usual
    markers_after = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/ingest_epochs").collect()
    )
    assert markers_after == markers_before
    assert report["ingest_epochs"]["rows"] == len(markers_before)
    assert try_read_parquet(spark, f"{path}/.ingest_epochs.old") is None


@pytest.mark.parametrize("residual", [False, True])
def test_ivfadc_ingest_lifecycle_soak(spark, corpus, queries, tmp_path, residual):
    """Full-lifecycle soak over the IVFADC index: build -> several
    micro-batch ingest waves (files arriving between runs of the same
    checkpointed availableNow job) -> an injected crash (half-append:
    lists written, codes not, no marker) -> replay repairs ->
    fsck clean -> compact_index -> search bit-identical to a
    from-scratch build over the union. Each piece has its own test;
    this pins the COMPOSITION, which is what a production deployment
    actually runs for months.

    Parametrized over the residual encoding: the residual arm proves
    that streamed/appended vectors encode against the FROZEN coarse
    quantizer in the residual frame — including through the injected
    half-append crash, whose replay must residualize the already-listed
    ids identically — and still land bit-identical to a from-scratch
    residual rebuild over the union."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        compact_index,
        fsck_index,
        search_ivfpq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        ivf_list_assign,
    )
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_index_ingest_job,
    )

    path = str(tmp_path / "soak_idx")
    vecs = str(tmp_path / "soak_stream")
    base = corpus.filter(F.col("vec_id") < 300)
    waves = [
        corpus.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 420)),
        corpus.filter((F.col("vec_id") >= 420) & (F.col("vec_id") < 520)),
        corpus.filter(F.col("vec_id") >= 520),
    ]
    build_ivfpq_index(base, path, n_centroids=16, residual=residual, **PARAMS)

    # wave 1: normal ingest (two files -> possibly two micro-batches)
    waves[0].select("vec_id", "embedding").repartition(2).write.mode(
        "append"
    ).parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)

    # wave 2: crash injection — a half-append (lists only, no marker)
    # for the wave's ids, then the wave arrives through the stream and
    # the replay must repair it
    centroids = spark.read.parquet(f"{path}/centroids")
    ivf_list_assign(
        waves[1].select("vec_id", "embedding"), "vec_id", "embedding", 16,
        centroids=centroids,
    ).select("vec_id", "cent_id").write.mode("append").parquet(f"{path}/lists")
    waves[1].select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)

    # wave 3: normal ingest through the SAME checkpoint lineage
    waves[2].select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(vecs)
    stream_index_ingest_job(spark, vecs, path)

    report = fsck_index(spark, path)  # strict: raises on any violation
    assert report["n_ids"] == corpus.count()

    # months of micro-batches -> many small files; compaction restores
    # the id-sorted layout and must not change a single row
    n_files_before = len(spark.read.parquet(f"{path}/codes").inputFiles())
    creport = compact_index(spark, path)
    assert creport["codes"]["files_after"] <= n_files_before
    fsck_index(spark, path)

    full = str(tmp_path / "soak_full")
    build_ivfpq_index(corpus, full, n_centroids=16, residual=residual, **PARAMS)
    for sub in ("codes", "lists"):
        got = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/{sub}").collect()
        )
        want = sorted(
            tuple(r) for r in spark.read.parquet(f"{full}/{sub}").collect()
        )
        assert got == want, sub
    got = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, full, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    assert got == want and len(got) == 15


# -- residual (IVFADC-proper) encoding ---------------------------------


def test_residual_append_equals_full_rebuild(spark, corpus, queries, tmp_path):
    """On a residual index, appended deltas must encode against the
    FROZEN coarse quantizer in the residual frame: codes and lists are
    bit-identical to a from-scratch residual rebuild over the union,
    and searches match exactly."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )

    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    inc = str(tmp_path / "inc")
    build_ivfpq_index(old, inc, n_centroids=16, residual=True, **PARAMS)
    append_to_pq_index(delta, inc)

    full = str(tmp_path / "full")
    # ids < max(n_centroids, n_codes) all in `old`, so both quantizers
    # (and therefore the residual frame) are identical across builds
    build_ivfpq_index(corpus, full, n_centroids=16, residual=True, **PARAMS)
    for sub in ("codes", "lists"):
        got = sorted(
            tuple(r) for r in spark.read.parquet(f"{inc}/{sub}").collect()
        )
        want = sorted(
            tuple(r) for r in spark.read.parquet(f"{full}/{sub}").collect()
        )
        assert got == want, sub
    got = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, inc, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, full, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    assert got == want and len(got) == 15


def test_residual_layout_refuses_plain_pq_search(spark, corpus, queries, tmp_path):
    """Plain ADC over residual codes scores the raw query against a
    residual-frame codebook — confidently wrong neighbors. The layout
    must refuse, naming the right entry point."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
    )

    path = str(tmp_path / "res_refuse")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=True, **PARAMS)
    with pytest.raises(ValueError, match="search_ivfpq_index"):
        search_pq_index(spark, path, queries, corpus, k=5)


def test_residual_meta_records_raw_types_and_flag(spark, corpus, tmp_path):
    """meta must flag the encoding AND keep the RAW corpus element
    type: vec_elem_type defines the ingest stream schema, and the
    residual table's double must not leak into it."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
    )

    path = str(tmp_path / "res_meta")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=True, **PARAMS)
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    assert meta["residual"] is True
    raw_elem = corpus.schema["embedding"].dataType.elementType.simpleString()
    assert meta["vec_elem_type"] == raw_elem
    # the raw build stamps residual=False, never absent (absence is
    # the legacy-format escape hatch only)
    raw_path = str(tmp_path / "raw_meta")
    build_ivfpq_index(corpus, raw_path, n_centroids=16, **PARAMS)
    raw_meta = spark.read.parquet(f"{raw_path}/meta").collect()[0].asDict()
    assert raw_meta["residual"] is False


def test_residual_crashed_build_is_unloadable(spark, corpus, queries, tmp_path):
    """The residual build writes IVF artifacts BEFORE the PQ ones; the
    commit marker still lands last, so a crash at any point must read
    as an incomplete index, never as a mixed-frame one."""
    import shutil

    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        invalidate_index_handles,
        search_ivfpq_index,
    )

    path = str(tmp_path / "res_crash")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=True, **PARAMS)
    shutil.rmtree(f"{path}/commit")
    invalidate_index_handles(path)
    with pytest.raises(ValueError, match="no matching commit marker"):
        search_ivfpq_index(spark, path, queries, corpus, n_probe=4, k=5)


def test_residual_recall_at_least_raw(spark, corpus, tmp_path):
    """The point of residual encoding: at identical code bytes, recall
    must not drop below the raw-vector form's on this corpus (measured
    0.94 vs 0.92 at n_probe=4/rerank=20; deterministic fixed-point
    pipeline, so the comparison is stable)."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    q10 = corpus.filter(F.col("vec_id") < 10)
    exact = _exact_l2_top5(corpus)

    def recall(residual: bool) -> float:
        path = str(tmp_path / f"recall_{residual}")
        build_ivfpq_index(
            corpus, path, n_centroids=16, residual=residual, **PARAMS
        )
        got: dict[int, set[int]] = {}
        for r in search_ivfpq_index(
            spark, path, q10, corpus, n_probe=4, k=5
        ).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)

    r_raw, r_res = recall(False), recall(True)
    assert r_res >= r_raw, f"residual recall {r_res:.3f} < raw {r_raw:.3f}"
    assert r_res >= 0.92, f"residual recall {r_res:.3f} below gate"


def test_residual_search_scan_stays_code_only(spark, corpus, queries, tmp_path):
    """The residual frame must not leak raw vectors into the
    corpus-sized scan: the per-list LUT is built from the QUERY side
    (queries x probed centroids, broadcast), so the codes and lists
    scans still read only their narrow columns."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    path = str(tmp_path / "res_plan")
    build_ivfpq_index(corpus, path, n_centroids=16, residual=True, **PARAMS)
    df = search_ivfpq_index(spark, path, queries, corpus, n_probe=4, k=5)
    # formatted mode: simpleString truncates this plan's Scan lines
    # before the path appears; the formatted node blocks carry full
    # Location + ReadSchema lines
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    blocks = plan.split("\n\n")
    for sub in ("/codes", "/lists"):
        scans = [
            b for b in blocks if "Scan parquet" in b and f"{sub}]" in b
        ]
        assert scans, (sub, plan)
        assert all("embedding" not in b for b in scans), sub


def test_residual_index_survives_compaction(spark, corpus, queries, tmp_path):
    """Compaction rewrites only the narrow code/list tables; on a
    residual index the meta flag and the coarse artifacts must ride
    through untouched, with search bit-identical pre/post."""
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        append_to_pq_index,
        build_ivfpq_index,
        compact_index,
        fsck_index,
        search_ivfpq_index,
    )

    path = str(tmp_path / "res_compact")
    build_ivfpq_index(
        corpus.filter(F.col("vec_id") < 400),
        path,
        n_centroids=16,
        residual=True,
        **PARAMS,
    )
    # a few appends -> small files worth compacting
    for lo, hi in ((400, 450), (450, 500), (500, 10_000)):
        append_to_pq_index(
            corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path,
        )
    before = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    compact_index(spark, path)
    fsck_index(spark, path)
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    assert meta["residual"] is True
    after = sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, queries, corpus, n_probe=4, k=5
        ).collect()
    )
    assert after == before and len(after) == 15


def test_fused_assign_residuals_matches_unfused_pair(spark, corpus):
    """ivf_assign_residuals (the r14 one-pass build/append path) is
    pinned identical to ivf_list_assign ∘ ivf_residuals — assignment
    (incl. argmax tie-breaks) AND residual vectors, including a
    zero-norm vector (cosine NULL -> coalesced to -1, lowest cent_id
    wins the all-tie) and a NaN component."""
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        ivf_assign_residuals,
        ivf_list_assign,
        ivf_residuals,
    )

    dim = corpus.select(F.size("embedding")).first()[0]
    degenerate = spark.createDataFrame(
        [
            (900_001, [0.0] * dim),                      # zero norm
            (900_002, [float("nan")] + [0.5] * (dim - 1)),  # NaN component
        ],
        "vec_id long, embedding array<float>",
    )
    cases = corpus.select("vec_id", "embedding").unionByName(degenerate)
    cents = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("__cent")
    )
    unfused_assign = ivf_list_assign(
        cases, "vec_id", "embedding", 16, centroids=cents
    )
    unfused = {
        r["vec_id"]: (r["cent_id"], tuple(map(repr, r["embedding"])))
        for r in ivf_residuals(cases, unfused_assign, cents)
        .join(unfused_assign.select("vec_id", "cent_id"), "vec_id")
        .collect()
    }
    fused = {
        r["vec_id"]: (r["cent_id"], tuple(map(repr, r["embedding"])))
        for r in ivf_assign_residuals(cases, cents).collect()
    }
    assert fused == unfused and len(fused) == cases.count()
