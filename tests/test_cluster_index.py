"""Persisted cluster assignments: O(delta) incremental maintenance.

The contract under test: merging a delta's candidate pairs into the
persisted clustering must land EXACTLY where a from-scratch
connected-components recompute over the union lands — including the
hard case where one delta document bridges two existing clusters —
and every mutation must be idempotent under crash-retry.
"""

import pytest
from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
    build_cluster_assignments,
    compact_cluster_assignments,
    ingest_and_update_clusters,
    load_cluster_assignments,
    merge_cluster_delta,
    resolve_cluster_assignments,
)
from etl_pricenow_to_leukerbadb_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
)
from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
    build_dedup_index,
)
from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table

GEOM = dict(k_shingle=3, n_hashes=8, bands=4)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _resolved_set(spark, path):
    return {
        (r.node, r.component)
        for r in resolve_cluster_assignments(spark, path).collect()
    }


def _cc_set(pairs_df):
    return {
        (r.node, r.component) for r in connected_components(pairs_df).collect()
    }


def _build_from_pairs(spark, pairs, path):
    labels = connected_components(_pairs_df(spark, pairs))
    return build_cluster_assignments(labels, path)


def test_merge_bridges_two_existing_clusters(spark, tmp_path):
    """The hard case: one delta node carries edges into TWO existing
    clusters (plus a brand-new standalone pair). The merged labels
    must equal a full recompute's — min over the merged union."""
    path = str(tmp_path / "cl")
    initial = [(1, 2), (3, 4), (10, 11)]
    _build_from_pairs(spark, initial, path)
    delta = [(2, 20), (20, 3), (21, 22)]
    stats = merge_cluster_delta(spark, path, _pairs_df(spark, delta))
    # cluster {3,4} folded into {1,2} via node 20 -> one merged label
    assert stats["merged_labels"] == 1
    assert stats["new_nodes"] == 3  # 20, 21, 22
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, initial + delta)
    )


def test_merge_is_idempotent_under_replay(spark, tmp_path):
    """Replaying the SAME merge (the crash-recovery action) must be a
    no-op: endpoints resolve to already-merged labels, the contraction
    collapses, and the base append anti-joins out existing rows."""
    path = str(tmp_path / "cl")
    initial = [(1, 2), (3, 4)]
    _build_from_pairs(spark, initial, path)
    delta = _pairs_df(spark, [(2, 3), (7, 8)])
    merge_cluster_delta(spark, path, delta)
    want = _resolved_set(spark, path)
    stats = merge_cluster_delta(spark, path, delta)
    assert stats["merged_labels"] == 0 and stats["new_nodes"] == 0
    assert _resolved_set(spark, path) == want


def test_chained_merges_compose_the_log_flat(spark, tmp_path):
    """a->b then b->c must be stored flattened (a->c): resolution is
    ONE broadcast join, never a chain walk. Proven by dragging one
    cluster's label down across two merges and checking both the
    resolved labels and the log's direct-pointer property."""
    path = str(tmp_path / "cl")
    initial = [(10, 11), (20, 21)]
    _build_from_pairs(spark, initial, path)
    all_pairs = list(initial)
    # merge 1: bridge {20,21} into {10,11} -> label 20 remaps to 10
    all_pairs += [(11, 20)]
    merge_cluster_delta(spark, path, _pairs_df(spark, [(11, 20)]))
    # merge 2: bridge {10,...} into a NEW lower id 1 -> 10 remaps to 1,
    # and the existing 20->10 entry must be rewritten to 20->1
    all_pairs += [(1, 2), (2, 10)]
    merge_cluster_delta(spark, path, _pairs_df(spark, [(1, 2), (2, 10)]))
    assert _resolved_set(spark, path) == _cc_set(_pairs_df(spark, all_pairs))
    _, log, _ = load_cluster_assignments(spark, path)
    entries = {(r.old_label, r.new_label) for r in log.collect()}
    assert entries == {(20, 1), (10, 1)}  # flattened, no 20->10 chain


def test_compact_folds_log_and_preserves_resolution(spark, tmp_path):
    path = str(tmp_path / "cl")
    initial = [(5, 6), (8, 9)]
    _build_from_pairs(spark, initial, path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(6, 8)]))
    want = _resolved_set(spark, path)
    report = compact_cluster_assignments(spark, path)
    assert report["log_entries_folded"] == 1
    assert _resolved_set(spark, path) == want
    _, log, _ = load_cluster_assignments(spark, path)
    assert log.isEmpty()
    # the clustering stays mergeable after a compaction
    merge_cluster_delta(spark, path, _pairs_df(spark, [(9, 3)]))
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, initial + [(6, 8), (9, 3)])
    )


def test_uncommitted_state_refuses_reads_but_retries_merges(spark, tmp_path):
    """A missing commit marker (crashed mutation) must refuse READS
    loudly, while re-running a mutation — the documented recovery —
    completes and restores the marker."""
    import shutil

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2)], path)
    shutil.rmtree(f"{path}/commit")
    with pytest.raises(ValueError, match="no matching commit marker"):
        resolve_cluster_assignments(spark, path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, [(1, 2), (2, 3)])
    )


def test_crashed_log_swap_restored_by_mutator_not_by_strict_read(
    spark, tmp_path
):
    """Simulate the swap's dark window as the real code leaves it
    (marker off, new log staged, live log deleted, crash before
    rename). A STRICT read must refuse loudly AND stay side-effect-
    free — a reader that adopted the stage could steal it out from
    under a live writer mid-swap — while retrying the merge (the
    mutator, which holds the single-writer role) adopts the stage and
    completes the recovery."""
    import os
    import shutil

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    delta = _pairs_df(spark, [(2, 3)])
    merge_cluster_delta(spark, path, delta)
    want = _resolved_set(spark, path)
    shutil.copytree(f"{path}/remap", f"{path}/.remap_stage")
    shutil.rmtree(f"{path}/remap")
    shutil.rmtree(f"{path}/commit")  # the swap runs inside the window
    with pytest.raises(ValueError, match="no matching commit marker"):
        resolve_cluster_assignments(spark, path)
    # the strict read performed no repair: the stage is untouched and
    # the live log still absent
    assert os.path.isdir(f"{path}/.remap_stage")
    assert not os.path.isdir(f"{path}/remap")
    # the mutator's replay adopts the stage and restores the marker
    merge_cluster_delta(spark, path, delta)
    assert _resolved_set(spark, path) == want


def test_ingest_loop_matches_full_recompute(spark, sf_small, tmp_path):
    """The daily loop end to end on real documents: index + clustering
    built over 80% of the corpus, the remaining 20% ingested through
    ``ingest_and_update_clusters`` (append -> probe -> merge). The
    resolved assignments must equal a from-scratch pairs + components
    recompute over the FULL corpus — i.e. the O(delta) loop loses
    nothing vs rebuilding the world."""
    docs = load_table(spark, sf_small, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    old = docs.filter(F.col("doc_id") <= mid)
    delta = docs.filter(F.col("doc_id") > mid)

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    build_dedup_index(old, index_path, **GEOM)
    old_sigs = minhash_signatures(old, "doc_id", "text", 3, 8)
    old_pairs = lsh_candidate_pairs(old_sigs, "doc_id", 8, 4)
    build_cluster_assignments(connected_components(old_pairs), clusters_path)

    ingest_and_update_clusters(delta, index_path, clusters_path)

    full_sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    full_pairs = lsh_candidate_pairs(full_sigs, "doc_id", 8, 4)
    assert _resolved_set(spark, clusters_path) == _cc_set(full_pairs)


def test_build_refuses_to_clobber(spark, tmp_path):
    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2)], path)
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        _build_from_pairs(spark, [(1, 2)], path)
    # overwrite=True rebuilds cleanly
    labels = connected_components(_pairs_df(spark, [(4, 5)]))
    build_cluster_assignments(labels, path, overwrite=True)
    assert _resolved_set(spark, path) == {(4, 4), (5, 4)}


def test_vec_ingest_loop_matches_full_recompute(spark, sf_small, tmp_path):
    """The embedding-side daily loop: sign-LSH index + clustering over
    80% of the vectors, the rest ingested through
    ``ingest_and_update_clusters_vec``. Resolved assignments must
    equal components over the union's full bucket-join candidate
    graph (the blocked structure both paths share)."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        ingest_and_update_clusters_vec,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        build_vec_dedup_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        sign_lsh_buckets_long,
    )

    geom = dict(n_planes=12, n_tables=8, dim=64)

    def candidate_pairs(vecs_df):
        b = sign_lsh_buckets_long(vecs_df, "vec_id", "embedding", **geom)
        return (
            b.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
            .join(
                b.select(F.col("vec_id").alias("id_b"), "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    )
    old = vecs.filter(F.col("vec_id") < 400)
    delta = vecs.filter(F.col("vec_id") >= 400)
    index_path = str(tmp_path / "vddx")
    clusters_path = str(tmp_path / "vcl")
    build_vec_dedup_index(old, index_path, **geom)
    build_cluster_assignments(
        connected_components(candidate_pairs(old)), clusters_path
    )
    ingest_and_update_clusters_vec(delta, index_path, clusters_path)
    assert _resolved_set(spark, clusters_path) == _cc_set(
        candidate_pairs(vecs)
    )


def test_streaming_cluster_job_matches_full_recompute(spark, sf_small, tmp_path):
    """The full streaming curation loop: documents arrive as parquet
    file waves through ONE checkpointed job lineage; each micro-batch
    extends the near-dup index AND the persisted clustering. After all
    waves, resolved assignments must equal the from-scratch
    pairs+components recompute over everything — and replaying the
    whole stream against the same checkpoint must change nothing."""
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_dedup_cluster_job,
    )

    docs = load_table(spark, sf_small, "documents")
    cut = docs.agg(F.expr("percentile(doc_id, 0.7)")).collect()[0][0]
    mid = docs.agg(F.expr("percentile(doc_id, 0.85)")).collect()[0][0]
    base = docs.filter(F.col("doc_id") <= cut)
    waves = [
        docs.filter((F.col("doc_id") > cut) & (F.col("doc_id") <= mid)),
        docs.filter(F.col("doc_id") > mid),
    ]

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    stream_dir = str(tmp_path / "docs_stream")
    build_dedup_index(base, index_path, **GEOM)
    base_sigs = minhash_signatures(base, "doc_id", "text", 3, 8)
    build_cluster_assignments(
        connected_components(lsh_candidate_pairs(base_sigs, "doc_id", 8, 4)),
        clusters_path,
    )

    snapshot_path = str(tmp_path / "snap")
    for wave in waves:
        wave.select("doc_id", "text").coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        stream_dedup_cluster_job(
            spark,
            stream_dir,
            index_path,
            clusters_path,
            snapshot_path=snapshot_path,
            snapshot_rows_threshold=1,
        )

    full_sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    want = _cc_set(lsh_candidate_pairs(full_sigs, "doc_id", 8, 4))
    assert _resolved_set(spark, clusters_path) == want
    # the job kept the always-on serving snapshot fresh unattended:
    # mid-stream publishes off the merge stats + the drain catch-up
    from etl_pricenow_to_leukerbadb_spark.fs import fs_read_text
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        read_cluster_snapshot,
    )

    assert {
        (r.node, r.component)
        for r in read_cluster_snapshot(spark, snapshot_path).collect()
    } == want
    gen_before = fs_read_text(spark, f"{snapshot_path}/CURRENT").strip()

    # replay the whole stream against a FRESH checkpoint: the epoch
    # markers are gone with it, so the marker-less replay classifier
    # and the merge's idempotency carry the exactly-once effect
    import shutil

    shutil.rmtree(index_path + "_ingest_ckpt")
    stream_dedup_cluster_job(
        spark,
        stream_dir,
        index_path,
        clusters_path,
        snapshot_path=snapshot_path,
        snapshot_rows_threshold=1,
    )
    assert _resolved_set(spark, clusters_path) == want
    # a no-op replay adds nothing, so the drain's snapshot_if_stale
    # SKIPS: no wasted republish of an unchanged table
    assert fs_read_text(spark, f"{snapshot_path}/CURRENT").strip() == gen_before


def test_streaming_vec_cluster_job_matches_full_recompute(
    spark, sf_small, tmp_path
):
    """The embedding-side streaming curation loop (r10 symmetry with
    the text job): vectors arrive as parquet waves through one
    checkpointed lineage; each micro-batch extends the sign-LSH index
    AND the persisted clustering. After all waves, resolved
    assignments must equal components over the union's full
    bucket-join candidate graph, and a full-stream replay against a
    fresh checkpoint must change nothing."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        build_cluster_assignments as _build,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        build_vec_dedup_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        sign_lsh_buckets_long,
    )
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_vec_dedup_cluster_job,
    )

    geom = dict(n_planes=12, n_tables=8, dim=64)

    def candidate_pairs(vecs_df):
        b = sign_lsh_buckets_long(vecs_df, "vec_id", "embedding", **geom)
        return (
            b.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
            .join(
                b.select(F.col("vec_id").alias("id_b"), "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    base = vecs.filter(F.col("vec_id") < 350)
    waves = [
        vecs.filter((F.col("vec_id") >= 350) & (F.col("vec_id") < 430)),
        vecs.filter(F.col("vec_id") >= 430),
    ]
    index_path = str(tmp_path / "vddx")
    clusters_path = str(tmp_path / "vcl")
    stream_dir = str(tmp_path / "vec_stream")
    build_vec_dedup_index(base, index_path, **geom)
    _build(connected_components(candidate_pairs(base)), clusters_path)

    for wave in waves:
        wave.coalesce(1).write.mode("append").parquet(stream_dir)
        stream_vec_dedup_cluster_job(
            spark, stream_dir, index_path, clusters_path
        )

    want = _cc_set(candidate_pairs(vecs))
    assert _resolved_set(spark, clusters_path) == want

    import shutil

    shutil.rmtree(index_path + "_ingest_ckpt")
    stream_vec_dedup_cluster_job(spark, stream_dir, index_path, clusters_path)
    assert _resolved_set(spark, clusters_path) == want


def test_fsck_clusters_clean_and_detects_corruption(spark, tmp_path):
    """fsck passes a healthy clustering (merged, with a live log) and
    catches each corruption class: a missing marker, duplicated base
    rows, and a chain-broken log."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        fsck_cluster_assignments,
    )

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(10, 11), (20, 21)], path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(11, 20)]))
    report = fsck_cluster_assignments(spark, path)
    assert not report["uncommitted"]
    assert report["dup_node_rows"] == 0
    assert report["log_entries"] == 1
    assert report["log_chain_entries"] == 0
    assert report["unanchored_components"] == 0

    # duplicated base row -> strict raises, lenient reports
    spark.createDataFrame([(11, 10)], "node long, component long").write.mode(
        "append"
    ).parquet(f"{path}/base")
    with pytest.raises(RuntimeError, match="inconsistent"):
        fsck_cluster_assignments(spark, path)
    assert (
        fsck_cluster_assignments(spark, path, strict=False)["dup_node_rows"]
        == 1
    )

    # chain-broken log (a->b with b also a key) on a fresh clustering
    path2 = str(tmp_path / "cl2")
    _build_from_pairs(spark, [(5, 6)], path2)
    spark.createDataFrame(
        [(7, 5), (8, 7)], "old_label long, new_label long"
    ).write.mode("overwrite").parquet(f"{path2}/remap")
    rep = fsck_cluster_assignments(spark, path2, strict=False)
    assert rep["log_chain_entries"] == 1

    # missing marker reports as uncommitted
    import shutil

    shutil.rmtree(f"{path2}/commit")
    assert fsck_cluster_assignments(spark, path2, strict=False)["uncommitted"]


def test_noop_merge_replay_restores_a_crashed_marker(spark, tmp_path):
    """The worst crash window: every data write landed but the marker
    rewrite didn't. The documented recovery — retry the same merge —
    resolves to a pure no-op, and that no-op must RESTORE the marker;
    otherwise strict reads stay wedged behind a retry that 'succeeds'
    without fixing anything (and the streaming job would silently
    advance past it)."""
    import shutil

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    delta = _pairs_df(spark, [(2, 3)])
    merge_cluster_delta(spark, path, delta)
    want = _resolved_set(spark, path)
    # simulate the crash: all merge writes done, marker gone
    shutil.rmtree(f"{path}/commit")
    stats = merge_cluster_delta(spark, path, delta)  # pure replay
    assert stats["merged_labels"] == 0 and stats["new_nodes"] == 0
    # the replay restored the marker; strict reads work again
    assert _resolved_set(spark, path) == want


def test_pending_token_refuses_a_foreign_mutation_over_crash_residue(
    spark, tmp_path, monkeypatch
):
    """The ADVICE r10 medium: a merge of delta A that crashes after
    its base append but before its remap-log swap leaves a
    half-merged state that fsck cannot see (both halves anchored, no
    dup rows) — and before the pending-operation token, the NEXT
    mutation's marker rewrite silently COMMITTED it. Now: merge B and
    compaction both refuse while A's token is pending, only A's own
    replay recovers, and afterwards B proceeds to the full-recompute
    answer."""
    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci

    path = str(tmp_path / "cl")
    initial = [(1, 2), (3, 4), (10, 11)]
    _build_from_pairs(spark, initial, path)
    delta_a = _pairs_df(spark, [(2, 3)])
    delta_b = _pairs_df(spark, [(4, 10)])

    # crash merge A inside its mutation window: base appended, remap
    # swap never lands (the first _swap_staged call in the merge)
    real_swap = ci._swap_staged
    def crash_swap(spark_, p, live, stage):
        raise RuntimeError("injected crash before the remap swap")

    monkeypatch.setattr(ci, "_swap_staged", crash_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_cluster_delta(spark, path, delta_a)
    monkeypatch.setattr(ci, "_swap_staged", real_swap)

    # a DIFFERENT merge refuses to commit A's residue
    with pytest.raises(RuntimeError, match="different operation"):
        merge_cluster_delta(spark, path, delta_b)
    # so does a compaction (folding the old log over A's half-landed
    # base would bless the half-merged state)
    with pytest.raises(RuntimeError, match="different operation"):
        compact_cluster_assignments(spark, path)

    # A's own replay (same edge-set fingerprint) recovers...
    merge_cluster_delta(spark, path, delta_a)
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, initial + [(2, 3)])
    )
    # ...and B then proceeds to the full-recompute answer
    merge_cluster_delta(spark, path, delta_b)
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, initial + [(2, 3), (4, 10)])
    )


def test_merge_proceeds_through_a_crashed_compaction_token(
    spark, tmp_path, monkeypatch
):
    """A crashed COMPACTION's residue is consistent for merges (a
    stale folded log matches no rows), so the unattended streaming
    loop must not wedge on its own auto-compaction's crash: the next
    merge passes the token guard and lands the right labels."""
    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci

    path = str(tmp_path / "cl")
    initial = [(5, 6), (8, 9)]
    _build_from_pairs(spark, initial, path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(6, 8)]))

    # crash the compaction inside its window (first swap = base swap)
    real_swap = ci._swap_staged
    monkeypatch.setattr(
        ci,
        "_swap_staged",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected crash")),
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_cluster_assignments(spark, path)
    monkeypatch.setattr(ci, "_swap_staged", real_swap)

    merge_cluster_delta(spark, path, _pairs_df(spark, [(9, 12)]))
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, initial + [(6, 8), (9, 12)])
    )


def test_legacy_parquet_pending_token_is_honored_and_upgraded(
    spark, tmp_path, monkeypatch
):
    """r13 stored the pending token as a text marker (two fs calls
    instead of a Spark job per read); a parquet ``pending/`` DIRECTORY
    written by the older layout must still be read — a crashed pre-r13
    merge's residue has to refuse foreign mutations across the upgrade
    — and the next owned mutation window must replace it with the text
    form cleanly."""
    from etl_pricenow_to_leukerbadb_spark.fs import fs_is_dir
    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        tiny_local_df,
    )

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2)], path)
    # plant an old-layout token: 1-row parquet directory
    tiny_local_df(spark, [("merge:1:123",)], "op_fp string").coalesce(
        1
    ).write.parquet(f"{path}/pending")
    assert fs_is_dir(spark, f"{path}/pending")
    assert ci._read_pending(spark, path) == "merge:1:123"
    # a foreign merge refuses over the legacy token + missing marker
    ci._fs_delete(spark, f"{path}/commit")
    with pytest.raises(RuntimeError, match="different operation"):
        merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    # restore the marker: the stale legacy token is debris; the next
    # mutation clears it, writes its own TEXT token mid-window, and
    # commits
    ci._write_commit(
        spark, path, ci.load_cluster_assignments(
            spark, path, _allow_uncommitted=True
        )[2]["build_id"],
    )
    merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    assert ci._read_pending(spark, path) is None
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, [(1, 2), (2, 3)])
    )


def test_stale_pending_token_after_a_committed_state_is_cleared(
    spark, tmp_path, monkeypatch
):
    """Crash between the marker rewrite and the token delete: the
    state is committed-consistent, so the token is debris — the next
    mutation clears it and proceeds."""
    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2)], path)
    delta = _pairs_df(spark, [(2, 3)])
    real_delete = ci._fs_delete
    def skip_token_delete(spark_, p):
        if p.endswith("/pending"):
            return  # simulate the crash: token never deleted
        return real_delete(spark_, p)

    monkeypatch.setattr(ci, "_fs_delete", skip_token_delete)
    merge_cluster_delta(spark, path, delta)
    monkeypatch.undo()
    assert ci._read_pending(spark, path) is not None
    # committed marker + stale token: the next mutation clears it
    merge_cluster_delta(spark, path, _pairs_df(spark, [(3, 4)]))
    assert ci._read_pending(spark, path) is None
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, [(1, 2), (2, 3), (3, 4)])
    )


def test_ingest_loop_auto_compacts_past_the_log_threshold(
    spark, sf_small, tmp_path
):
    """The r10 ask: the continuous loops fold the remap log themselves
    when a merge leaves it past the threshold — results unchanged, log
    gone — instead of trusting an operator to schedule
    compact_cluster_assignments."""
    docs = load_table(spark, sf_small, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    old = docs.filter(F.col("doc_id") <= mid)
    delta = docs.filter(F.col("doc_id") > mid)

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    build_dedup_index(old, index_path, **GEOM)
    old_sigs = minhash_signatures(old, "doc_id", "text", 3, 8)
    old_pairs = lsh_candidate_pairs(old_sigs, "doc_id", 8, 4)
    labels = connected_components(old_pairs)
    build_cluster_assignments(labels, clusters_path)

    # put a real entry in the remap log: bridge two distinct existing
    # clusters (the synthetic corpus' own deltas only ADD nodes, they
    # never merge old labels, so the log would stay empty)
    by_comp: dict = {}
    for r in labels.collect():
        by_comp.setdefault(r.component, r.node)
    reps = sorted(by_comp.values())
    assert len(reps) >= 2, "fixture needs two clusters to bridge"
    bridge = (reps[0], reps[1])
    stats = merge_cluster_delta(spark, clusters_path, _pairs_df(spark, [bridge]))
    assert stats["log_entries"] > 0

    # threshold=1: the loop folds the log right after its merge
    stats = ingest_and_update_clusters(
        delta, index_path, clusters_path, compact_log_threshold=1
    )
    assert stats["log_compacted"] and stats["log_entries"] == 0
    _, log, _ = load_cluster_assignments(spark, clusters_path)
    assert log.isEmpty()

    full_sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    full_pairs = lsh_candidate_pairs(full_sigs, "doc_id", 8, 4)
    want = _cc_set(
        full_pairs.unionByName(_pairs_df(spark, [bridge]).toDF("id_a", "id_b"))
    )
    assert _resolved_set(spark, clusters_path) == want


def test_compact_retries_across_its_own_crash_marker(spark, tmp_path):
    """Retrying a crashed compaction is its own documented recovery,
    so compaction must load through the uncommitted state it left."""
    import shutil

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(5, 6), (8, 9)], path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(6, 8)]))
    want = _resolved_set(spark, path)
    shutil.rmtree(f"{path}/commit")  # crash after the data writes
    compact_cluster_assignments(spark, path)
    assert _resolved_set(spark, path) == want


def test_ingest_loop_resolves_a_serving_layout_index(spark, sf_small, tmp_path):
    """The O(delta) loop must compose with the near-dup index's
    pointer-swap serving layout: appends and probes resolve CURRENT
    transparently, and the merged clustering still equals the full
    recompute."""
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        migrate_dedup_index_to_serving,
    )

    docs = load_table(spark, sf_small, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    old = docs.filter(F.col("doc_id") <= mid)
    delta = docs.filter(F.col("doc_id") > mid)

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    build_dedup_index(old, index_path, **GEOM)
    migrate_dedup_index_to_serving(spark, index_path)
    old_sigs = minhash_signatures(old, "doc_id", "text", 3, 8)
    build_cluster_assignments(
        connected_components(lsh_candidate_pairs(old_sigs, "doc_id", 8, 4)),
        clusters_path,
    )
    ingest_and_update_clusters(delta, index_path, clusters_path)
    full_sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    assert _resolved_set(spark, clusters_path) == _cc_set(
        lsh_candidate_pairs(full_sigs, "doc_id", 8, 4)
    )


def test_vec_ingest_loop_threshold_matches_full_recompute(
    spark, sf_small, tmp_path
):
    """The threshold-verified arm: clusters over TRUE near-dup pairs
    (bucket candidates exact-cosine-verified against the raw vectors)
    must equal components over the union's blocked-and-thresholded
    pair graph — and a corpus missing the delta must refuse loudly
    instead of silently under-clustering."""
    from etl_pricenow_to_leukerbadb_spark.functions.vector import (
        cosine_prenormed,
        norm_sq,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        ingest_and_update_clusters_vec,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        build_vec_dedup_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        sign_lsh_buckets_long,
    )

    geom = dict(n_planes=12, n_tables=8, dim=64)
    thr = 0.4

    def verified_pairs(vecs_df):
        b = sign_lsh_buckets_long(vecs_df, "vec_id", "embedding", **geom)
        cand = (
            b.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
            .join(
                b.select(F.col("vec_id").alias("id_b"), "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        v = vecs_df.select(
            F.col("vec_id"),
            F.col("embedding").alias("__v"),
            F.sqrt(norm_sq(F.col("embedding"))).alias("__n"),
        )
        return (
            cand.join(
                v.select(
                    F.col("vec_id").alias("id_a"),
                    F.col("__v").alias("__va"),
                    F.col("__n").alias("__na"),
                ),
                "id_a",
            )
            .join(
                v.select(
                    F.col("vec_id").alias("id_b"),
                    F.col("__v").alias("__vb"),
                    F.col("__n").alias("__nb"),
                ),
                "id_b",
            )
            .filter(
                F.round(
                    cosine_prenormed(
                        F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                    ),
                    6,
                )
                >= thr
            )
            .select("id_a", "id_b")
        )

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    )
    old = vecs.filter(F.col("vec_id") < 400)
    delta = vecs.filter(F.col("vec_id") >= 400)
    index_path = str(tmp_path / "vddx")
    clusters_path = str(tmp_path / "vcl")
    build_vec_dedup_index(old, index_path, **geom)
    build_cluster_assignments(
        connected_components(verified_pairs(old)), clusters_path
    )
    # a corpus missing DELTA ids fails before anything is appended
    # (the common stale-corpus mistake), so the full loop retries clean
    with pytest.raises(ValueError, match="missing from `corpus`"):
        ingest_and_update_clusters_vec(
            delta, index_path, clusters_path, corpus=old, threshold=thr
        )
    # a corpus missing INDEXED ids fails loudly at probe time (the
    # query-side coverage gate) — after the append has landed; the
    # documented recovery is the loop's tail with the fixed corpus,
    # exercised below by the successful full call
    with pytest.raises(ValueError, match="no raw vector in `corpus`"):
        ingest_and_update_clusters_vec(
            delta, index_path, clusters_path, corpus=delta, threshold=thr
        )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        query_vec_dedup_candidates,
    )

    merge_cluster_delta(
        spark,
        clusters_path,
        query_vec_dedup_candidates(
            spark, index_path, delta, corpus=vecs, threshold=thr
        ),
        src_col="probe_id",
        dst_col="corpus_id",
    )
    assert _resolved_set(spark, clusters_path) == _cc_set(
        verified_pairs(vecs)
    )


def test_cluster_writer_claim_enforces_single_writer(spark, tmp_path):
    """The clusters layout gets the same loud single-writer tripwire
    the indexes carry: under a live claim, an unclaimed merge or
    compaction refuses, the owner proceeds, force bypasses WITHOUT
    deleting the marker (reported), gc refuses too, and release is
    owner-scoped (a stranger's release is a no-op)."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        claim_cluster_writer,
        compact_cluster_assignments,
        gc_cluster_debris,
        release_cluster_writer,
    )

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    token_a = claim_cluster_writer(spark, path, "job-a")
    with pytest.raises(RuntimeError, match="claimed by a live writer"):
        merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    with pytest.raises(RuntimeError, match="claimed by a live writer"):
        compact_cluster_assignments(spark, path)
    with pytest.raises(RuntimeError, match="claimed by a live writer"):
        gc_cluster_debris(spark, path)
    # a second claim refuses, naming the holder
    with pytest.raises(RuntimeError, match="already claimed.*job-a"):
        claim_cluster_writer(spark, path, "job-b")
    # the owner proceeds through its own claim token
    merge_cluster_delta(
        spark, path, _pairs_df(spark, [(2, 3)]), writer_token=token_a
    )
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, [(1, 2), (2, 3), (3, 4)])
    )
    # force bypasses but leaves the marker (reported by gc)
    out = gc_cluster_debris(spark, path, force=True)
    assert out["bypassed_claim"].startswith("job-a nonce=")
    compact_cluster_assignments(spark, path, force=True)
    # a stranger's release is a no-op; the owner's clears it
    release_cluster_writer(spark, path, owner_token="job-b some-other-token")
    with pytest.raises(RuntimeError, match="claimed by a live writer"):
        compact_cluster_assignments(spark, path)
    release_cluster_writer(spark, path, owner_token=token_a)
    compact_cluster_assignments(spark, path)
    assert _resolved_set(spark, path) == _cc_set(
        _pairs_df(spark, [(1, 2), (2, 3), (3, 4)])
    )


def test_fsck_stage_adoption_is_age_gated(spark, tmp_path):
    """fsck holds no writer role and the BATCH loops hold no claim, so
    a scheduled sweep can land inside an unclaimed live writer's
    _swap_staged window (live deleted, stage present for a moment).
    Adopting that stage would fail the writer's own rename and abort a
    healthy mutation — so the sweep's restore is age-gated: a FRESH
    stage is left alone (loud mid-swap report instead of a repair), an
    AGED one is genuine crash residue and is adopted."""
    import os
    import shutil
    import time

    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        fsck_cluster_assignments,
    )

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    delta = _pairs_df(spark, [(2, 3)])
    merge_cluster_delta(spark, path, delta)
    want = _resolved_set(spark, path)
    shutil.copytree(f"{path}/remap", f"{path}/.remap_stage")
    shutil.rmtree(f"{path}/remap")
    shutil.rmtree(f"{path}/commit")  # the swap-window crash shape
    # fresh stage: an unclaimed writer may be mid-swap RIGHT NOW — the
    # sweep must not adopt it, and the failure names the recovery
    with pytest.raises(RuntimeError, match="mid-swap"):
        fsck_cluster_assignments(spark, path, strict=False)
    assert os.path.isdir(f"{path}/.remap_stage")
    assert not os.path.isdir(f"{path}/remap")
    # aged past the gate: genuine crash residue — the sweep adopts it
    # (and still reports the state uncommitted until the mutation is
    # retried)
    old = time.time() - 7200
    os.utime(f"{path}/.remap_stage", (old, old))
    rep = fsck_cluster_assignments(spark, path, strict=False)
    assert rep["uncommitted"]
    assert os.path.isdir(f"{path}/remap")
    assert not os.path.isdir(f"{path}/.remap_stage")
    # the mutator's replay completes the recovery
    merge_cluster_delta(spark, path, delta)
    assert _resolved_set(spark, path) == want


def test_cluster_writer_claim_distinguishes_forced_successor(spark, tmp_path):
    """Ownership is the exact claim TOKEN, not the deterministic tag:
    when a hung writer's claim is force-cleaned and a replacement with
    the SAME tag (same job name + path) claims, the unwedged
    predecessor must neither mutate through the successor's claim nor
    delete it on exit — a tag-prefix match allowed both, voiding
    exactly the exclusivity the claim exists for."""
    from etl_pricenow_to_leukerbadb_spark.fs import fs_delete, fs_read_text
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        claim_cluster_writer,
        release_cluster_writer,
    )

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    tag = "stream_dedup_cluster_job:" + path
    token_a = claim_cluster_writer(spark, path, tag)
    # operator force-cleans the hung writer's claim, successor claims
    fs_delete(spark, f"{path}/.WRITER_ACTIVE")
    token_b = claim_cluster_writer(spark, path, tag)
    assert token_a != token_b
    # the unwedged predecessor's merge refuses: the live claim is the
    # successor's, even though it shares the predecessor's tag
    with pytest.raises(RuntimeError, match="claimed by a live writer"):
        merge_cluster_delta(
            spark, path, _pairs_df(spark, [(2, 3)]), writer_token=token_a
        )
    # the predecessor's finally-block release is a no-op on the
    # successor's claim
    release_cluster_writer(spark, path, owner_token=token_a)
    assert fs_read_text(spark, f"{path}/.WRITER_ACTIVE") == token_b
    # the successor keeps working and releases its own claim
    merge_cluster_delta(
        spark, path, _pairs_df(spark, [(2, 3)]), writer_token=token_b
    )
    release_cluster_writer(spark, path, owner_token=token_b)
    assert fs_read_text(spark, f"{path}/.WRITER_ACTIVE") is None


def test_fsck_cli_routes_clusters_sweep_compact_and_gc(
    spark, tmp_path, monkeypatch, capsys
):
    """The ops entry point (tools/fsck_index.py) knows about the
    fourth persisted structure: --clusters routes the sweep to
    fsck_cluster_assignments, --compact folds the remap log, --gc
    sweeps aged staged-dir debris (live twin present) and never the
    restore-material stage (live twin missing); a crashed-mutation
    state exits 1."""
    import json
    import os
    import shutil
    import sys
    import time as _t

    from etl_pricenow_to_leukerbadb_spark import session as sess
    from tools import fsck_index as cli

    class _NoStop:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def stop(self):  # the CLI stops its session; ours is shared
            pass

    monkeypatch.setattr(
        sess, "get_spark", lambda app_name=None: _NoStop(spark)
    )

    path = str(tmp_path / "cl")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    # aged debris: a stage whose live twin exists
    shutil.copytree(f"{path}/remap", f"{path}/.remap_stage")
    old = _t.time() - 7200
    os.utime(f"{path}/.remap_stage", (old, old))

    def run(*argv):
        monkeypatch.setattr(sys, "argv", ["fsck_index", path, *argv])
        rc = cli.main()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    rc, rep = run("--clusters", "--gc")
    assert rc == 0 and not rep["uncommitted"]
    assert rep["gc"]["deleted"] == [".remap_stage"]
    assert not os.path.isdir(f"{path}/.remap_stage")

    rc, rep = run("--clusters", "--compact")
    assert rc == 0
    assert rep["compact"]["log_entries_folded"] > 0

    # a stage with a MISSING live twin is restore material, never
    # debris: the maintenance-role load ADOPTS it (rename to live),
    # the crashed state exits 1 and gc is skipped
    shutil.copytree(f"{path}/remap", f"{path}/.remap_stage")
    os.utime(f"{path}/.remap_stage", (old, old))
    shutil.rmtree(f"{path}/remap")
    shutil.rmtree(f"{path}/commit")  # the real crash window shape
    rc, rep = run("--clusters", "--gc")
    assert rc == 1 and rep["uncommitted"]
    assert rep["gc"] == "skipped: sweep found violations"
    assert os.path.isdir(f"{path}/remap")
    assert not os.path.isdir(f"{path}/.remap_stage")


def test_snapshot_if_stale_skips_current_and_publishes_on_change(
    spark, tmp_path
):
    """The cron-friendly publish: an unchanged clustering skips the
    full resolve+rewrite (a scheduled snapshot of an unchanged table
    is pure wasted IO); a merge that added rows publishes; a REBUILD
    publishes even at identical row counts (labels may have changed
    wholesale — build_id, not row delta, clears it); a missing or
    pre-provenance snapshot is treated as stale."""
    from etl_pricenow_to_leukerbadb_spark.fs import fs_read_text
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        build_cluster_assignments,
        snapshot_if_stale,
    )

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    # no snapshot yet: publish
    rep = snapshot_if_stale(spark, path, out)
    assert rep["published"] and rep["n_rows"] == 4
    gen1 = fs_read_text(spark, f"{out}/CURRENT").strip()
    # unchanged clustering: skip (and the generation is untouched)
    rep = snapshot_if_stale(spark, path, out)
    assert rep == {
        "published": False,
        "reason": "snapshot is current",
        "n_rows": 4,
        "rows_behind": 0,
    }
    assert fs_read_text(spark, f"{out}/CURRENT").strip() == gen1
    # a merge that added rows: publish
    merge_cluster_delta(spark, path, _pairs_df(spark, [(5, 6)]))
    rep = snapshot_if_stale(spark, path, out)
    assert rep["published"] and rep["rows_behind"] == 2 and rep["n_rows"] == 6
    assert fs_read_text(spark, f"{out}/CURRENT").strip() != gen1
    assert _snap_set(spark, out) == _resolved_set(spark, path)
    # threshold: a small delta below min_rows_behind stays skipped
    merge_cluster_delta(spark, path, _pairs_df(spark, [(7, 8)]))
    rep = snapshot_if_stale(spark, path, out, min_rows_behind=5)
    assert not rep["published"] and rep["rows_behind"] == 2
    # a rebuild at ANY row count: publish (build_id differs)
    build_cluster_assignments(
        connected_components(_pairs_df(spark, [(1, 2), (3, 4), (5, 6), (7, 8)])),
        path,
        overwrite=True,
    )
    rep = snapshot_if_stale(spark, path, out, min_rows_behind=10**9)
    assert rep["published"] and rep["reason"] == "source clustering was rebuilt"
    assert _snap_set(spark, out) == _resolved_set(spark, path)


def test_fsck_cli_routes_snapshot_sweep(spark, tmp_path, monkeypatch, capsys):
    """--snapshot routes the ops entry point at the snapshot serving
    root: clean sweep exits 0, --source adds the staleness fields, a
    broken pointer exits 1, and the mutating flags are refused (a
    snapshot root is repaired by re-publishing)."""
    import json
    import sys

    from etl_pricenow_to_leukerbadb_spark import session as sess
    from etl_pricenow_to_leukerbadb_spark.fs import fs_write_text
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        snapshot_cluster_assignments,
    )
    from tools import fsck_index as cli

    class _NoStop:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def stop(self):
            pass

    monkeypatch.setattr(
        sess, "get_spark", lambda app_name=None: _NoStop(spark)
    )

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    snapshot_cluster_assignments(spark, path, out)

    def run(*argv):
        monkeypatch.setattr(sys, "argv", ["fsck_index", out, *argv])
        rc = cli.main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(line)

    rc, rep = run("--snapshot")
    assert rc == 0 and rep["current_resolves"] and rep["provenance_rows_match"]
    rc, rep = run("--snapshot", "--source", path)
    assert rc == 0 and rep["source_rebuilt"] is False
    assert rep["rows_behind_source"] == 0
    # mutating flags are refused up front
    with pytest.raises(SystemExit):
        monkeypatch.setattr(sys, "argv", ["fsck_index", out, "--snapshot", "--gc"])
        cli.main()
    capsys.readouterr()
    # a broken pointer is a violation: exit 1 (0 under --lenient)
    fs_write_text(spark, f"{out}/CURRENT", "gen-" + "0" * 12)
    rc, rep = run("--snapshot")
    assert rc == 1 and rep["current_resolves"] is False
    rc, _ = run("--snapshot", "--lenient")
    assert rc == 0


def test_dd_cluster_merge_headline_builds_once_merges_fresh_and_is_exact(
    spark, sf_small
):
    """The r10 benched headline's contract: the standing index +
    clustering build ONCE per session (repeated bench runs measure the
    O(delta) loop, not a rebuild), every invocation advances to a
    FRESH delta slice (a timed run is a real merge, not a replay), and
    the standing clustering stays EQUAL to a from-scratch
    pairs+components recompute over everything ingested so far —
    the same equivalence the rest of this file pins, composed through
    the headline's own plumbing."""
    import os
    import tempfile

    from etl_pricenow_to_leukerbadb_spark.fs import fs_read_text
    from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY

    spec = REGISTRY["dd_cluster_merge"]
    assert spec.oracle is None and spec.headline and spec.multi_action
    r1 = spec.fn(spark, sf_small).collect()[0]
    tag = f"dd_cluster_merge_{os.path.basename(sf_small.rstrip('/'))}"
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_scratch",
        spark.sparkContext.applicationId,
        tag,
    )
    build_id = spark.read.parquet(f"{root}/cl/meta").first()["build_id"]
    r2 = spec.fn(spark, sf_small).collect()[0]
    assert r2.slice_idx == r1.slice_idx + 1  # fresh slice per run
    assert (
        spark.read.parquet(f"{root}/cl/meta").first()["build_id"] == build_id
    ), "repeat invocations must not rebuild the standing clustering"

    # exactness: resolved persisted clusters == from-scratch recompute
    # over base + every slice ingested so far (same geometry)
    max_id = int(fs_read_text(spark, f"{root}/meta.txt").strip())
    hi = (
        max_id
        if r2.slice_idx == 23
        else max_id * (54 + 2 * r2.slice_idx) // 100
    )
    ingested = load_table(spark, sf_small, "documents").filter(
        F.col("doc_id") <= F.lit(hi)
    )
    sigs = minhash_signatures(ingested, "doc_id", "text", 3, 8)
    pairs = lsh_candidate_pairs(sigs, "doc_id", 8, 4)
    assert _resolved_set(spark, f"{root}/cl") == _cc_set(pairs)

    # crash contract: a timed run that dies mid-merge must NOT advance
    # the slice counter (advancing first wedged the headline forever:
    # the next run appended slice k+1 over slice k's pending token and
    # every later run refused). The retry re-runs the SAME slice; its
    # index append already landed, so the fallback (probe + idempotent
    # merge) completes it and only THEN does the counter move.
    from etl_pricenow_to_leukerbadb_spark.fs import fs_write_text
    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci

    counter_before = fs_read_text(spark, f"{root}/counter.txt").strip()
    real_merge = ci.merge_cluster_delta
    calls = {"n": 0}

    def crash_mid_merge(*args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("injected crash inside the merge")

    ci.merge_cluster_delta = crash_mid_merge
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            spec.fn(spark, sf_small).collect()
    finally:
        ci.merge_cluster_delta = real_merge
    assert calls["n"] == 1
    assert (
        fs_read_text(spark, f"{root}/counter.txt").strip() == counter_before
    ), "a crashed run must not advance the slice counter"
    # the crashed slice's append landed; the retry replays it through
    # the no-re-append fallback and the counter advances exactly once
    r3 = spec.fn(spark, sf_small).collect()[0]
    assert r3.slice_idx == int(counter_before)
    assert (
        fs_read_text(spark, f"{root}/counter.txt").strip()
        == str(int(counter_before) + 1)
    )

    # PARTIAL-append refusal: crash again, then strip one band row of
    # the crashed slice's first doc — the retry must refuse loudly
    # (fsck repair + re-append is the recovery), never bless a
    # half-banded doc as a complete replay (its probes would
    # under-block forever). The completeness proof is per-id band-ROW
    # counts, which is exactly what catches this.
    import shutil as _sh

    counter2 = fs_read_text(spark, f"{root}/counter.txt").strip()
    ci.merge_cluster_delta = crash_mid_merge
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            spec.fn(spark, sf_small).collect()
    finally:
        ci.merge_cluster_delta = real_merge
    lo2 = max_id * (52 + 2 * int(counter2)) // 100
    bands = spark.read.parquet(f"{root}/idx/bands")
    victim = (
        bands.filter(F.col("doc_id") > lo2)
        .agg(F.min("doc_id"))
        .collect()[0][0]
    )
    removed = bands.filter(
        (F.col("doc_id") == victim) & (F.col("band") == 0)
    ).localCheckpoint()
    pruned = bands.filter(
        ~((F.col("doc_id") == victim) & (F.col("band") == 0))
    ).localCheckpoint()
    _sh.rmtree(f"{root}/idx/bands")
    pruned.write.partitionBy("bp").parquet(f"{root}/idx/bands")
    with pytest.raises(RuntimeError, match="PARTIALLY appended"):
        spec.fn(spark, sf_small).collect()
    assert fs_read_text(spark, f"{root}/counter.txt").strip() == counter2
    # repair (restore the missing band row — what fsck's prune +
    # re-append accomplishes) and retry: the replay completes and the
    # counter finally advances. This also leaves the session-cached
    # standing index CONSISTENT for any later invocation in this
    # session (bench runs invoke the headline repeatedly).
    removed.write.mode("append").partitionBy("bp").parquet(
        f"{root}/idx/bands"
    )
    r5 = spec.fn(spark, sf_small).collect()[0]
    assert r5.slice_idx == int(counter2)
    assert (
        fs_read_text(spark, f"{root}/counter.txt").strip()
        == str(int(counter2) + 1)
    )


def test_canonical_keep_table_matches_from_scratch_entry(
    spark, sf_small, tmp_path
):
    """Canonical selection off the persisted clustering must equal the
    from-scratch tx_dedup_keep_best (same pair graph, same
    keep-best-by-length, ties to the lower id) — including after an
    incremental merge, so the daily loop's keep-list never needs the
    graph recomputed."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        canonical_keep_table,
    )
    from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY

    docs = load_table(spark, sf_small, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    old = docs.filter(F.col("doc_id") <= mid)
    delta = docs.filter(F.col("doc_id") > mid)

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    build_dedup_index(old, index_path, **GEOM)
    old_sigs = minhash_signatures(old, "doc_id", "text", 3, 8)
    build_cluster_assignments(
        connected_components(lsh_candidate_pairs(old_sigs, "doc_id", 8, 4)),
        clusters_path,
    )
    ingest_and_update_clusters(delta, index_path, clusters_path)

    got = sorted(
        tuple(r)
        for r in canonical_keep_table(
            spark, clusters_path, docs.select("doc_id", "n_chars")
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in REGISTRY["tx_dedup_keep_best"].fn(spark, sf_small).collect()
    )
    assert got == want and got


# -- property: merge ≡ full recompute over random graphs ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_components(edges):
    """Reference labels via union-find: min reachable id per node, for
    nodes appearing in at least one (non-self) edge — the same
    contract as connected_components, computed without Spark so each
    hypothesis example costs one merge, not three graph jobs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    return {
        (n, min(members))
        for members in groups.values()
        for n in members
    }


edge_st = st.tuples(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base_edges=st.sets(edge_st, max_size=12),
    new_edges=st.sets(edge_st, min_size=1, max_size=10),
)
def test_property_merge_equals_full_recompute(spark, base_edges, new_edges):
    """For ANY base graph and ANY batch of new edges (delta-incident,
    old↔old, duplicates of existing edges, self-loops, chains that
    merge several clusters at once), merging into the persisted
    clustering must land exactly where a full recompute over the union
    lands."""
    import shutil
    import tempfile

    base_edges = {(a, b) for a, b in base_edges if a != b}
    initial = _py_components(base_edges)
    path = tempfile.mkdtemp(prefix="cl_prop_") + "/cl"
    try:
        labels = spark.createDataFrame(
            [(n, c) for n, c in sorted(initial)] or [(0, 0)],
            "node long, component long",
        )
        if not initial:
            labels = labels.filter("node < 0")  # typed empty clustering
        build_cluster_assignments(labels, path)
        merge_cluster_delta(
            spark, path, _pairs_df(spark, sorted(new_edges))
        )
        want = _py_components(base_edges | new_edges)
        assert _resolved_set(spark, path) == want
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


def test_merge_and_keep_best_support_string_ids(spark, tmp_path):
    """The layer is id-type-generic by contract (meta records id_type;
    least/greatest/min/max and the keep-best tie-break all work on
    strings): merge, resolve, and canonical selection over STRING ids
    must match the same graph over the lexicographically-equivalent
    semantics."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        canonical_keep_table,
    )

    def pairs_df(pairs):
        return spark.createDataFrame(pairs, "id_a string, id_b string")

    initial = [("a1", "a2"), ("b1", "b2")]
    labels = connected_components(pairs_df(initial))
    path = str(tmp_path / "cl")
    build_cluster_assignments(labels, path)
    merge_cluster_delta(
        spark, path, pairs_df([("a2", "b1"), ("c1", "c2")])
    )
    assert _resolved_set(spark, path) == {
        ("a1", "a1"), ("a2", "a1"), ("b1", "a1"), ("b2", "a1"),
        ("c1", "c1"), ("c2", "c1"),
    }
    docs = spark.createDataFrame(
        [("a1", 5), ("a2", 9), ("b1", 9), ("b2", 1), ("c1", 3), ("c2", 3), ("z", 7)],
        "doc_id string, n_chars int",
    )
    keep = {
        (r.component, r.keep_id, r.n_members)
        for r in canonical_keep_table(spark, path, docs).collect()
    }
    # ties to the LOWER id ('a2' < 'b1' at score 9); singleton 'z' kept
    assert keep == {("a1", "a2", 4), ("c1", "c1", 2), ("z", "z", 1)}


def test_streaming_cluster_job_recovers_from_mid_batch_crash(
    spark, sf_small, tmp_path, monkeypatch
):
    """Crash INSIDE the post-batch cluster merge (after the index
    append, before the epoch marker): the checkpoint holds the batch,
    the replay's classifier drops the already-appended ids from the
    append path, and the post_batch hook re-runs the merge with the
    FULL batch — landing exactly where an uninterrupted run lands."""
    import etl_pricenow_to_leukerbadb_spark.operators.cluster_index as ci
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_dedup_cluster_job,
    )

    docs = load_table(spark, sf_small, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    base = docs.filter(F.col("doc_id") <= mid)
    wave = docs.filter(F.col("doc_id") > mid)

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    stream_dir = str(tmp_path / "docs_stream")
    build_dedup_index(base, index_path, **GEOM)
    base_sigs = minhash_signatures(base, "doc_id", "text", 3, 8)
    build_cluster_assignments(
        connected_components(lsh_candidate_pairs(base_sigs, "doc_id", 8, 4)),
        clusters_path,
    )
    wave.select("doc_id", "text").coalesce(1).write.parquet(stream_dir)

    real_merge = ci.merge_cluster_delta
    calls = {"n": 0}

    def crash_once(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash inside the cluster merge")
        return real_merge(*args, **kwargs)

    monkeypatch.setattr(ci, "merge_cluster_delta", crash_once)
    with pytest.raises(Exception, match="injected crash"):
        stream_dedup_cluster_job(spark, stream_dir, index_path, clusters_path)
    # the replay: same stream, same checkpoint — completes the merge
    stream_dedup_cluster_job(spark, stream_dir, index_path, clusters_path)
    monkeypatch.undo()

    full_sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    assert _resolved_set(spark, clusters_path) == _cc_set(
        lsh_candidate_pairs(full_sigs, "doc_id", 8, 4)
    )


def test_streaming_vec_cluster_job_recovers_from_mid_batch_crash(
    spark, sf_small, tmp_path, monkeypatch
):
    """The vec twin of the mid-batch crash pin: a crash inside the
    post-batch merge (after the sign-LSH append, before the epoch
    marker) releases the writer claim on the way out, the retry
    re-claims and replays the FULL batch into the idempotent merge —
    landing exactly where an uninterrupted run lands."""
    import etl_pricenow_to_leukerbadb_spark.operators.cluster_index as ci
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        build_vec_dedup_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.similarity import (
        sign_lsh_buckets_long,
    )
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_vec_dedup_cluster_job,
    )

    geom = dict(n_planes=12, n_tables=8, dim=64)

    def candidate_pairs(vecs_df):
        b = sign_lsh_buckets_long(vecs_df, "vec_id", "embedding", **geom)
        return (
            b.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
            .join(
                b.select(F.col("vec_id").alias("id_b"), "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    base = vecs.filter(F.col("vec_id") < 400)
    wave = vecs.filter(F.col("vec_id") >= 400)
    index_path = str(tmp_path / "vddx")
    clusters_path = str(tmp_path / "vcl")
    stream_dir = str(tmp_path / "vec_stream")
    build_vec_dedup_index(base, index_path, **geom)
    build_cluster_assignments(
        connected_components(candidate_pairs(base)), clusters_path
    )
    wave.coalesce(1).write.parquet(stream_dir)

    real_merge = ci.merge_cluster_delta
    calls = {"n": 0}

    def crash_once(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash inside the cluster merge")
        return real_merge(*args, **kwargs)

    monkeypatch.setattr(ci, "merge_cluster_delta", crash_once)
    with pytest.raises(Exception, match="injected crash"):
        stream_vec_dedup_cluster_job(
            spark, stream_dir, index_path, clusters_path
        )
    stream_vec_dedup_cluster_job(spark, stream_dir, index_path, clusters_path)
    monkeypatch.undo()
    assert _resolved_set(spark, clusters_path) == _cc_set(
        candidate_pairs(vecs)
    )


def test_streaming_cluster_job_auto_compacts_mid_stream(
    spark, sf_small, tmp_path
):
    """The r10 #3 ask, verbatim through the STREAM: micro-batches whose
    merges leave the remap log past the threshold trigger the in-loop
    fold — log empty after the run, results unchanged vs the full
    recompute (plus the bridge that seeded the log)."""
    from etl_pricenow_to_leukerbadb_spark.streaming.jobs import (
        stream_dedup_cluster_job,
    )

    docs = load_table(spark, sf_small, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).collect()[0][0]
    base = docs.filter(F.col("doc_id") <= mid)
    wave = docs.filter(F.col("doc_id") > mid)

    index_path = str(tmp_path / "ddx")
    clusters_path = str(tmp_path / "cl")
    stream_dir = str(tmp_path / "docs_stream")
    build_dedup_index(base, index_path, **GEOM)
    labels = connected_components(
        lsh_candidate_pairs(minhash_signatures(base, "doc_id", "text", 3, 8), "doc_id", 8, 4)
    )
    build_cluster_assignments(labels, clusters_path)
    # seed the log: bridge two existing clusters so the stream's merge
    # sees a non-empty log and the threshold=1 hook must fire
    by_comp: dict = {}
    for r in labels.collect():
        by_comp.setdefault(r.component, r.node)
    reps = sorted(by_comp.values())
    bridge = (reps[0], reps[1])
    assert (
        merge_cluster_delta(spark, clusters_path, _pairs_df(spark, [bridge]))[
            "log_entries"
        ]
        > 0
    )

    wave.select("doc_id", "text").coalesce(1).write.parquet(stream_dir)
    stream_dedup_cluster_job(
        spark, stream_dir, index_path, clusters_path, compact_log_threshold=1
    )
    _, log, _ = load_cluster_assignments(spark, clusters_path)
    assert log.isEmpty(), "the stream's in-loop fold must have fired"
    full_sigs = minhash_signatures(docs, "doc_id", "text", 3, 8)
    want = _cc_set(
        lsh_candidate_pairs(full_sigs, "doc_id", 8, 4).unionByName(
            _pairs_df(spark, [bridge]).toDF("id_a", "id_b")
        )
    )
    assert _resolved_set(spark, clusters_path) == want


def _snap_set(spark, out):
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        read_cluster_snapshot,
    )

    return {
        (r.node, r.component)
        for r in read_cluster_snapshot(spark, out).collect()
    }


def test_snapshot_is_resolution_immune_to_the_mutation_window(spark, tmp_path):
    """The serving answer: a snapshot equals the resolution at write
    time, stays readable while a later mutation holds the dark window,
    and the strict read refuses to snapshot mid-mutation state."""
    import shutil

    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        snapshot_cluster_assignments,
    )

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    want = _resolved_set(spark, path)
    n = snapshot_cluster_assignments(spark, path, out)
    assert n == 4
    assert _snap_set(spark, out) == want
    # simulate a mutation in flight: marker off -> snapshot refuses,
    # but the EXISTING snapshot keeps serving
    shutil.rmtree(f"{path}/commit")
    with pytest.raises(ValueError, match="no matching commit marker"):
        snapshot_cluster_assignments(spark, path, str(tmp_path / "snap2"))
    assert _snap_set(spark, out) == want


def test_snapshot_publish_is_atomic_under_crash_and_concurrent_reads(
    spark, tmp_path, monkeypatch
):
    """The r9 design nit, closed: the snapshot was the one serving
    artifact with a non-atomic publish (plain overwrite deletes the
    old table before the new commit lands). Under the generation
    layout a reader that lands at ANY point of a re-snapshot — before
    the pointer swap, or after a crash that interrupted the publish —
    sees a COMPLETE old or new table, never a partial listing."""
    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    assert ci.snapshot_cluster_assignments(spark, path, out) == 4
    old = _snap_set(spark, out)

    # mutate the clustering, then crash the NEXT snapshot right before
    # its pointer swap (the staged generation is fully written). The
    # swap is the SHARED serving-root primitive (write_current_pointer
    # in operators/serving.py), so the injection patches it there.
    from etl_pricenow_to_leukerbadb_spark.operators import serving as sv

    merge_cluster_delta(spark, path, _pairs_df(spark, [(2, 3)]))
    real_delete = sv.fs_delete
    def crash_on_pointer(spark_, p):
        if p.endswith("/CURRENT"):
            raise RuntimeError("injected crash before the pointer swap")
        return real_delete(spark_, p)

    monkeypatch.setattr(sv, "fs_delete", crash_on_pointer)
    with pytest.raises(RuntimeError, match="injected crash"):
        ci.snapshot_cluster_assignments(spark, path, out)
    monkeypatch.undo()
    # mid-crash state: readers still see the complete OLD snapshot
    assert _snap_set(spark, out) == old
    # the retried publish lands the new resolution atomically. The
    # crashed publish's orphan generation is YOUNG, and young
    # non-current generations are protected by the sweep's age gate
    # (they are indistinguishable from a concurrently overlapping
    # publish's staged-but-not-yet-pointed output, whose deletion
    # would strand that publish's pointer swap on a missing dir) —
    # so it survives this publish and is swept once aged
    want = _resolved_set(spark, path)
    ci.snapshot_cluster_assignments(spark, path, out)
    assert _snap_set(spark, out) == want
    import os

    gens = [n for n in os.listdir(out) if n.startswith("gen-")]
    assert len(gens) <= 3
    # age everything, publish again: the aged debris is swept down to
    # CURRENT + the one-generation reader grace
    import time

    old_ts = time.time() - 7200
    for g in gens:
        os.utime(f"{out}/{g}", (old_ts, old_ts))
    ci.snapshot_cluster_assignments(spark, path, out)
    assert _snap_set(spark, out) == want
    gens = [n for n in os.listdir(out) if n.startswith("gen-")]
    assert len(gens) <= 2


def test_snapshot_sweep_never_deletes_a_concurrent_publishs_staged_gen(
    spark, tmp_path, monkeypatch
):
    """Two overlapping publishes (the scheduler mishap): slow publish X
    stages its generation, fast publish Y completes first. Y's sweep
    must NOT delete X's staged-but-not-yet-pointed generation — X's
    pointer swap would otherwise land on a deleted directory and take
    the serving root down until the next publish. The age gate is the
    protection: X's stage is young."""
    import os

    from etl_pricenow_to_leukerbadb_spark.operators import cluster_index as ci

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    ci.snapshot_cluster_assignments(spark, path, out)

    # publish X: crash right before its pointer swap, leaving its
    # fully-staged young generation on disk (exactly what a slower
    # concurrent publish looks like to Y's sweep)
    from etl_pricenow_to_leukerbadb_spark.operators import serving as sv

    real_delete = sv.fs_delete

    def crash_on_pointer(spark_, p):
        if p.endswith("/CURRENT"):
            raise RuntimeError("injected crash before the pointer swap")
        return real_delete(spark_, p)

    monkeypatch.setattr(sv, "fs_delete", crash_on_pointer)
    with pytest.raises(RuntimeError, match="injected crash"):
        ci.snapshot_cluster_assignments(spark, path, out)
    monkeypatch.undo()
    staged = {
        n
        for n in os.listdir(out)
        if n.startswith("gen-")
        and n != ci.fs_read_text(spark, f"{out}/CURRENT").strip()
    }
    assert staged  # X's generation is on disk, unpointed

    # publish Y completes: X's young generation survives the sweep
    ci.snapshot_cluster_assignments(spark, path, out)
    for g in staged:
        assert os.path.isdir(f"{out}/{g}")
    # so X's (delayed) pointer swap would land on an EXISTING dir and
    # readers keep resolving; with min_age_sec=0 (the old behavior)
    # the sweep would have deleted it
    assert _snap_set(spark, out) == _resolved_set(spark, path)


def test_snapshot_provenance_names_the_captured_build(spark, tmp_path):
    """Each published generation carries which clustering build it
    resolved and the row count (underscore file — invisible to the
    parquet scan), so an always-on reader can answer 'how stale am I'
    by comparing against the live clustering's meta."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        snapshot_cluster_assignments,
        snapshot_provenance,
    )

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    build_id = _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    n = snapshot_cluster_assignments(spark, path, out)
    prov = snapshot_provenance(spark, out)
    assert prov["source_build_id"] == build_id
    assert prov["n_rows"] == n == 4
    assert prov["source_path"] == path
    # the provenance file is invisible to readers of the data
    assert _snap_set(spark, out) == _resolved_set(spark, path)
    # a plain-table snapshot has none — loud, not silent
    plain = str(tmp_path / "plain")
    _pairs_df(spark, [(1, 1)]).toDF("node", "component").write.parquet(plain)
    with pytest.raises(ValueError, match="no CURRENT pointer"):
        snapshot_provenance(spark, plain)


def test_fsck_cluster_snapshot_checks_pointer_rows_and_staleness(
    spark, tmp_path
):
    """The snapshot root's scheduled sweep: clean on a fresh publish,
    reports incremental drift vs the source (informational), flags a
    broken pointer and a rows/provenance mismatch as corruption, and
    reads a plain-table root as layout=plain."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        fsck_cluster_snapshot,
        snapshot_cluster_assignments,
    )

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    snapshot_cluster_assignments(spark, path, out)
    rep = fsck_cluster_snapshot(spark, out, source_path=path)
    assert rep["current_resolves"] and rep["provenance_rows_match"]
    assert rep["source_rebuilt"] is False and rep["rows_behind_source"] == 0

    # the source moves on: drift is reported, not a violation
    merge_cluster_delta(spark, path, _pairs_df(spark, [(5, 6)]))
    rep = fsck_cluster_snapshot(spark, out, source_path=path)
    assert rep["rows_behind_source"] == 2 and rep["source_rebuilt"] is False

    # corruption: pointer naming an absent generation raises
    import shutil

    from etl_pricenow_to_leukerbadb_spark.fs import fs_write_text

    fs_write_text(spark, f"{out}/CURRENT", "gen-" + "0" * 12)
    with pytest.raises(RuntimeError, match="inconsistent"):
        fsck_cluster_snapshot(spark, out)
    assert fsck_cluster_snapshot(spark, out, strict=False)[
        "current_resolves"
    ] is False
    # repair is the documented one-liner: re-publish
    snapshot_cluster_assignments(spark, path, out)
    assert fsck_cluster_snapshot(spark, out)["current_resolves"]

    # plain-table roots read as layout=plain, nothing to check
    plain = str(tmp_path / "plain")
    _pairs_df(spark, [(1, 1)]).toDF("node", "component").write.parquet(plain)
    rep = fsck_cluster_snapshot(spark, plain)
    assert rep["layout"] == "plain" and rep["n_rows"] == 1


def test_fsck_cluster_snapshot_excludes_the_grace_from_extras(
    spark, tmp_path
):
    """extra_generations must not name the one-generation reader
    grace: an operator acting on the report would delete the
    generation an in-flight reader planned against is still
    streaming — the exact dark window the grace exists to prevent.
    The grace is identified EXACTLY from the current generation's
    provenance (prev_generation), so even a crash orphan whose mtime
    sits between the grace and CURRENT — the case a newest-older-mtime
    heuristic mislabels — never flips the true grace into the debris
    list. Young non-current dirs (possible in-flight publishes) are
    reported separately, never as deletable extras."""
    import os
    import time

    from etl_pricenow_to_leukerbadb_spark.fs import fs_read_text
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        fsck_cluster_snapshot,
        snapshot_cluster_assignments,
        snapshot_provenance,
    )

    path = str(tmp_path / "cl")
    out = str(tmp_path / "snap")
    _build_from_pairs(spark, [(1, 2), (3, 4)], path)
    snapshot_cluster_assignments(spark, path, out)
    grace = fs_read_text(spark, f"{out}/CURRENT").strip()
    time.sleep(0.05)
    # a crash orphan whose mtime lands BETWEEN the grace and the next
    # publish — the adversarial case for any mtime-only heuristic
    orphan = "gen-" + "f" * 12
    os.makedirs(f"{out}/{orphan}")
    time.sleep(0.05)
    merge_cluster_delta(spark, path, _pairs_df(spark, [(5, 6)]))
    snapshot_cluster_assignments(spark, path, out)
    current = fs_read_text(spark, f"{out}/CURRENT").strip()
    assert grace != current
    assert snapshot_provenance(spark, out)["prev_generation"] == grace
    # the young orphan is reported as possibly-in-flight, NOT as
    # deletable debris — and the grace appears in neither list
    rep = fsck_cluster_snapshot(spark, out)
    assert rep["young_generations"] == [orphan]
    assert "extra_generations" not in rep
    # aged past the gate it becomes debris; the grace still is not
    old = time.time() - 7200
    os.utime(f"{out}/{orphan}", (old, old))
    rep = fsck_cluster_snapshot(spark, out)
    assert rep["extra_generations"] == [orphan]
    assert "young_generations" not in rep
    assert grace not in rep["extra_generations"]


def test_read_cluster_snapshot_falls_back_to_a_plain_table(spark, tmp_path):
    """A pre-generation snapshot (or any plain parquet table a
    deployment already points readers at) stays readable through the
    same entry point."""
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        read_cluster_snapshot,
    )

    out = str(tmp_path / "plain")
    _pairs_df(spark, [(1, 1), (2, 1)]).toDF("node", "component").write.parquet(
        out
    )
    got = {(r.node, r.component) for r in read_cluster_snapshot(spark, out).collect()}
    assert got == {(1, 1), (2, 1)}
