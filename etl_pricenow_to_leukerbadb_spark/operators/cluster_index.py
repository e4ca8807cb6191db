"""Persisted near-dup cluster assignments with O(delta) maintenance.

``dd_cluster_components`` computes duplicate clusters from scratch:
connected components over the full candidate-pair graph. With the
persisted near-dup index (``dedup_index.py``) a daily ingest already
gets its candidate pairs in O(delta) (``query_dedup_candidates``), but
turning those pairs into updated CLUSTER ASSIGNMENTS previously meant
re-running components over the full union — the last O(corpus) step in
an otherwise O(delta) loop. This module removes it.

Layout under ``path`` (same marker discipline as the ANN index):

``meta/``    1-row parquet: id column name/type + generation build_id.
``base/``    (node, component) rows, range-partitioned + sorted by
             node so a merge's endpoint lookup prunes to the row
             groups covering the delta's id range (the same min/max
             trick as ``append_to_pq_index``'s ``_delta_scope``).
``remap/``   the FLATTENED label-remap log: (old_label, new_label)
             rows recording every cluster merge since the last
             compaction. Reading an assignment is
             ``base LEFT JOIN broadcast(remap) ON component =
             old_label`` — one broadcast hash join, no chains to walk,
             because each merge COMPOSES its remaps into the log
             (a -> b then b -> c is stored as a -> c).
``commit/``  1-row build_id marker, deleted before any mutation and
             rewritten after it — the dark-window discipline of
             ``repair_index``: a crash mid-merge reads as "incomplete,
             retry", never as a half-merged clustering.

Why a remap log instead of rewriting base rows: a merge touches
O(delta) edges but may relabel clusters with MANY members; rewriting
their base rows is O(touched members) data IO, and finding them in a
node-sorted table is a full scan. The log makes a merge O(delta +
log): the only per-merge writes are the delta's new base rows (append)
and the composed log (tiny — one row per cluster label ever merged
away, bounded by the number of merges, not corpus size).
``compact_cluster_assignments`` folds the log into base (one linear
rewrite of the narrow table) on whatever schedule keeps the log
broadcast-sized — the same amortization as the bucket/code table
compactions.

Incremental correctness argument (pytest-pinned against the
from-scratch recompute, including the merge-two-existing-clusters
case): appending documents never changes candidate pairs among OLD
documents (bucket membership is per-document), so the union graph is
old edges ∪ delta-incident edges. Contract each old endpoint to its
current label (labels are per-cluster minima), run components over the
CONTRACTED delta graph (delta-sized), and the merged label of each
contracted component is min(member labels ∪ new ids) = the true
minimum over the merged union — exactly what a full recompute yields.

Reader semantics during a mutation, honestly: a merge's dark window
(marker off while the base append + log swap land) makes STRICT reads
fail loudly rather than see a half-merged labeling — unlike the
indexes, there is no pointer-swap serving layout here, because merges
run per micro-batch and a generation copy per merge would be absurd.
The clustering is a pipeline artifact consumed between ingests; a
deployment that needs always-on reads should publish
``snapshot_cluster_assignments`` on its own schedule — one narrow
linear write into a fresh generation dir with an atomic
``CURRENT``-pointer swap (read back via ``read_cluster_snapshot``),
so the snapshot is immune to the window by construction AND its own
publish never exposes a half-deleted table. ``snapshot_if_stale`` is
the cron-friendly form: it skips the rewrite entirely when the
generation's provenance says the snapshot already matches the live
clustering.

Reference analog: the incremental update-vs-existing contract of
``scripts/pricenow_etl.py:329-358`` (new data integrated against
standing state without recomputing it), applied to cluster state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..fs import (
    fs_delete,
    fs_exists,
    fs_is_dir,
    fs_list_names,
    fs_mtime,
    fs_read_text,
    fs_rename,
    fs_write_text,
    fs_write_text_exclusive,
)
from ..session import tiny_local_df
# The shared serving-root machinery (generation pointers, claims,
# filesystem-clock GC) lives in its neutral home ``.serving``; the
# module-local underscore aliases keep this file's call sites stable.
from ..fs import fs_delete as _fs_delete, fs_rename as _fs_rename
from ..fs import try_read_parquet as _try_read_parquet
from .serving import (
    GEN_RE as _GEN_RE,
    fs_now_ms as _fs_now_ms,
    resolve_serving_root as _resolve_index_root,
    write_commit_marker as _write_commit,
    write_current_pointer as _write_current,
)
from .dedup import connected_components_twophase

_CLUSTER_META_COLS = ("id_col", "id_type", "build_id")

# The remap-log row budget that triggers auto-compaction in the
# continuous loops (``ingest_and_update_clusters[_vec]``,
# ``stream_dedup_cluster_job``). Rationale: resolution is
# ``base LEFT JOIN broadcast(log)``, so the log is shipped to every
# task as a broadcast hash relation — two ids of payload per row
# (~16 B) hashes to roughly 50-100 B/row on the JVM, putting 500k rows
# at ~25-50 MB per executor, the top of the comfortable explicit-
# broadcast budget. Folding is one linear rewrite of the narrow
# node-sorted base, so compacting at the budget's edge is cheap
# insurance against the join degrading (or the broadcast OOMing) on a
# merge-heavy stream that nobody is baby-sitting — the same
# engine-turns-the-dial argument as ``grouped_running_sum(mode='auto')``.
LOG_COMPACT_THRESHOLD = 500_000


def _restore_if_crashed(
    spark: SparkSession, path: str, min_stage_age_sec: float = 0.0
) -> None:
    """Adopt a staged table whose swap crashed between delete and
    rename: a stage is only written complete (parquet job committed)
    before its live twin is deleted, so live-missing + stage-present
    can only be that window, and the stage IS the intended next state.
    The commit marker stays absent until the interrupted operation is
    RETRIED to completion.

    Called only from MUTATOR loads (``_allow_uncommitted=True``), which
    hold the single-writer role: a strict READ that performed this
    rename could land inside a LIVE writer's swap window (live deleted,
    stage present for a moment) and adopt the stage out from under it,
    failing the writer's own rename and aborting a healthy mutation —
    so the read path stays side-effect-free and repairs belong to the
    writer.

    ``min_stage_age_sec`` is the maintenance caller's protection
    (``fsck_cluster_assignments``): fsck holds no writer role, and the
    batch loops hold no claim it could observe, so a scheduled sweep
    can land inside an UNCLAIMED live writer's swap window. A live
    swap's stage is milliseconds old; a crashed one is as old as the
    crash — an age gate (filesystem clock) tells them apart. Mutators
    pass 0: they ARE the single writer, and the only stage they can
    see is their own predecessor's crash residue."""
    now_ms = None
    for live, stage in (("remap", ".remap_stage"), ("base", ".base_stage")):
        # fast path (r13 optimization): a stage dir only exists in the
        # steady state as crash residue, so probe its EXISTENCE first —
        # one driver metadata call — before paying two parquet schema
        # inferences per table per mutator load (this runs on every
        # merge, i.e. once per micro-batch)
        if not fs_exists(spark, f"{path}/{stage}"):
            continue
        if (
            _try_read_parquet(spark, f"{path}/{live}") is None
            and _try_read_parquet(spark, f"{path}/{stage}") is not None
        ):
            if min_stage_age_sec > 0:
                if now_ms is None:
                    now_ms = _fs_now_ms(spark, path)
                m = fs_mtime(spark, f"{path}/{stage}")
                # mtime 0 = synthesized directory status: unknown age
                # reads as "possibly live", never as aged — the
                # maintenance caller skips it (a mutator's retry, age
                # gate 0, still adopts it)
                if m <= 0 or (now_ms - m) / 1000.0 < min_stage_age_sec:
                    continue
            _fs_rename(spark, f"{path}/{stage}", f"{path}/{live}")


def _swap_staged(spark: SparkSession, path: str, live: str, stage: str) -> None:
    _fs_delete(spark, f"{path}/{live}")
    _fs_rename(spark, f"{path}/{stage}", f"{path}/{live}")


_WRITER_ACTIVE = ".WRITER_ACTIVE"


def claim_cluster_writer(spark: SparkSession, path: str, tag: str) -> str:
    """Exclusively claim the clustering at ``path`` for a writer (a
    streaming loop or a long batch job) — the same loud single-writer
    tripwire the indexes carry (`.INGEST_ACTIVE`): the maintenance
    contract has always been one writer per clustering, but a contract
    that fails silently is a trap — two interleaving merges would race
    each other's marker dance and staged swaps. Raises when another
    claim is live; the marker records tag + a per-run nonce + UTC
    timestamp so a refused run can judge staleness from the error
    alone. Returns the full claim TOKEN — ownership is the exact
    token, not the tag: tags are deterministic (job name + path), so a
    tag-prefix match could not tell a hung predecessor from its
    force-cleaned successor, and the predecessor unwedging would both
    mutate through the successor's claim and delete it on exit. Pass
    the token as ``writer_token=`` to the mutators and
    ``owner_token=`` to ``release_cluster_writer``."""
    import datetime as _dt

    stamp = _dt.datetime.now(_dt.timezone.utc).isoformat(timespec="seconds")
    marker = f"{path.rstrip('/')}/{_WRITER_ACTIVE}"
    token = f"{tag} nonce={uuid.uuid4().hex[:12]} claimed_at={stamp}"
    try:
        fs_write_text_exclusive(spark, marker, token)
    except FileExistsError:
        holder = fs_read_text(spark, marker)
        if holder is None:
            raise RuntimeError(
                f"clustering at {path} was claimed by a concurrent "
                "writer whose claim was released while this one was "
                "being refused — retry the claim"
            ) from None
        raise RuntimeError(
            f"clustering at {path} is already claimed by a writer "
            f"({holder}); if that job was killed without cleanup, "
            f"delete {marker} to release the claim"
        ) from None
    return token


def release_cluster_writer(
    spark: SparkSession, path: str, owner_token: str | None = None
) -> None:
    """Release the claim. With ``owner_token`` (the exact token
    ``claim_cluster_writer`` returned), delete only the claim this
    writer wrote — an unconditional delete from a finally block would
    remove a SUCCESSOR's claim when this job's own marker was
    force-cleaned and another writer (possibly the same job restarted,
    with the same deterministic tag) claimed in between."""
    marker = f"{path.rstrip('/')}/{_WRITER_ACTIVE}"
    if owner_token is not None:
        cur = fs_read_text(spark, marker)
        if cur != owner_token:
            return
    fs_delete(spark, marker)


def _refuse_if_foreign_writer(
    spark: SparkSession,
    path: str,
    what: str,
    writer_token: str | None,
    force: bool = False,
) -> str | None:
    """Refuse a mutation under a live claim this caller does not own
    (``writer_token=None`` owns nothing; claims are OPTIONAL — with no
    claim live, the single-writer contract stays the caller's honor,
    unchanged). Ownership is the EXACT claim token returned by
    ``claim_cluster_writer`` — a prefix match on the deterministic tag
    would let a hung predecessor mutate through its force-cleaned
    successor's claim. ``force`` bypasses without deleting the marker:
    if the operator's "nothing is running" judgement was wrong,
    deleting a LIVE claim would let a second writer claim and run
    concurrently, voiding the exclusivity. Returns the observed claim
    content."""
    marker = f"{path.rstrip('/')}/{_WRITER_ACTIVE}"
    holder = fs_read_text(spark, marker)
    if holder is None:
        return None
    if writer_token is not None and holder == writer_token:
        return holder
    if not force:
        raise RuntimeError(
            f"{what}: clustering at {path} is claimed by a live writer "
            f"({holder}) — mutating now would interleave with its "
            f"marker dance and staged swaps. Wait for it to drain, or "
            f"if it was killed without cleanup delete {marker} (or "
            "pass force=True)"
        )
    return holder


def _read_pending(spark: SparkSession, path: str) -> str | None:
    """The pending-operation token, if one is persisted: the op
    fingerprint a mutator wrote before opening its mutation window.

    Stored as a driver-written text marker (r13 optimization): the
    token is read on EVERY merge's ``_guard_pending`` and written once
    per mutation window, and the previous 1-row-parquet form cost a
    Spark job on each side where a text marker is two filesystem
    calls — the same format every claim marker already uses. A
    parquet ``pending/`` DIRECTORY from an older layout is still
    honored (legacy arm)."""
    p = f"{path}/pending"
    if not fs_exists(spark, p):
        return None
    if fs_is_dir(spark, p):  # legacy 1-row-parquet token layout
        pend = _try_read_parquet(spark, p)
        rows = pend.collect() if pend is not None else []
        return rows[0]["op_fp"] if len(rows) == 1 else None
    txt = fs_read_text(spark, p)
    # a torn write (crash inside the marker write leaving a 0-byte or
    # whitespace file) degrades to "no token" — the documented
    # pre-token PERMISSIVE state — instead of reading as a DIFFERENT
    # operation's fingerprint and permanently refusing even the
    # crashed operation's own replay (ADVICE r13); matches the old
    # 1-row-parquet form, whose unreadable/partial token read as None
    return (txt.strip() or None) if txt is not None else None


def _guard_pending(
    spark: SparkSession,
    path: str,
    op_fp: str,
    params: dict,
    compatible: tuple[str, ...] = (),
) -> None:
    """Refuse to mutate over a DIFFERENT operation's crash residue.

    Every mutator persists a fingerprint of its operation beside the
    commit marker before opening the mutation window and removes it
    after the marker rewrite. Without this token, a merge of delta A
    that crashed after its base append but before its remap-log swap
    — and is never retried — would be silently COMMITTED by the next
    merge of delta B: B's marker rewrite blesses a state where A's new
    rows carry merged labels while the old cluster members keep the
    old ones, and ``fsck_cluster_assignments`` cannot see it (both
    halves stay anchored, no dup rows, no log chains). The token makes
    the documented recovery — retry the crashed operation — enforced:
    only the crashed operation's own replay (same fingerprint) may
    proceed through the uncommitted state.

    A token found while the commit marker is VALID is stale debris
    (the crash landed after the marker rewrite but before the token
    delete — a committed, consistent state); it is cleared here. A
    missing marker with NO token is a manually-cleared or pre-token
    state and stays permissive, preserving the original retry
    semantics.

    ``compatible`` lists token PREFIXES whose crash residue is provably
    consistent for this caller and may be proceeded through: a crashed
    COMPACTION leaves either the old state or a folded base with a
    stale log whose keys match no rows (argued in
    ``compact_cluster_assignments``), so merges pass
    ``compatible=("compact",)`` — an unattended streaming loop must
    not wedge on its own auto-compaction's crash. A crashed MERGE's
    residue is compatible with NOTHING but its own replay."""
    token = _read_pending(spark, path)
    if token is None:
        return
    commit = _try_read_parquet(spark, f"{path}/commit")
    rows = commit.collect() if commit is not None else []
    if len(rows) == 1 and rows[0]["build_id"] == params["build_id"]:
        _fs_delete(spark, f"{path}/pending")
        return
    if token != op_fp and not any(token.startswith(c) for c in compatible):
        raise RuntimeError(
            f"clustering at {path}: a different operation "
            f"({token!r}) crashed mid-mutation and was never retried — "
            f"refusing to commit its half-merged state under this one "
            f"({op_fp!r}). Retry the crashed operation first (merges "
            "and compactions are idempotent), or rebuild with "
            "build_cluster_assignments(overwrite=True)"
        )


def _write_pending(spark: SparkSession, path: str, op_fp: str) -> None:
    """Persist the token (text marker — see ``_read_pending``). The
    delete-then-write pair is only reachable by the operation that owns
    the token (``_guard_pending`` already refused foreign ones), so a
    crash between the two metadata ops merely downgrades a replay to
    the pre-token permissive state. The delete also clears a legacy
    parquet token DIRECTORY so the text write never lands inside one."""
    _fs_delete(spark, f"{path}/pending")
    fs_write_text(spark, f"{path}/pending", op_fp)


def build_cluster_assignments(
    labels: DataFrame,
    path: str,
    node_col: str = "node",
    component_col: str = "component",
    overwrite: bool = False,
    target_files: int | None = None,
) -> str:
    """Persist an initial clustering (the ``connected_components``
    output over the full pair graph — computed ONCE, then maintained
    incrementally by ``merge_cluster_delta``). Returns the generation
    ``build_id``. Base is written node-sorted so later merges'
    endpoint lookups prune on parquet min/max stats."""
    spark = labels.sparkSession
    build_id = uuid.uuid4().hex
    if overwrite:
        for sub in (
            "commit",
            "pending",
            "meta",
            "base",
            "remap",
            ".remap_stage",
            ".base_stage",
        ):
            _fs_delete(spark, f"{path}/{sub}")
    mode = "errorifexists"
    id_type = labels.schema[node_col].dataType.simpleString()
    tiny_local_df(
        spark,
        [(node_col, id_type, build_id)],
        "id_col string, id_type string, build_id string",
    ).coalesce(1).write.mode(mode).parquet(f"{path}/meta")
    base = labels.select(
        F.col(node_col).alias("node"), F.col(component_col).alias("component")
    )
    if target_files:
        base = base.repartitionByRange(target_files, "node")
    base.sortWithinPartitions("node").write.mode(mode).parquet(f"{path}/base")
    # empty log, typed like the ids (labels ARE node ids)
    spark.createDataFrame(
        [], f"old_label {id_type}, new_label {id_type}"
    ).write.mode(mode).parquet(f"{path}/remap")
    _write_commit(spark, path, build_id)
    return build_id


def load_cluster_assignments(
    spark: SparkSession,
    path: str,
    _allow_uncommitted: bool = False,
    _repair_staged: bool = True,
    _repair_stage_min_age: float = 0.0,
) -> tuple[DataFrame, DataFrame, dict]:
    """(base, remap_log, params), validating the commit marker — a
    crashed merge/compaction reads as "incomplete, retry the
    operation", never as a half-merged clustering.

    ``_allow_uncommitted`` is internal to the mutators: a missing
    marker is EXACTLY the state a crashed merge/compaction leaves, and
    re-running either one is the documented recovery (both are
    idempotent, each tolerates the other's crash residue — a stale
    folded log matches no rows; an already-appended base row is
    anti-joined out — and the pending-operation token refuses a
    DIFFERENT operation from committing over the residue). Read paths
    stay strict AND side-effect-free: crash-restore renames run only
    under the mutator flag, so a reader can never steal a live
    writer's staged swap (see ``_restore_if_crashed``).
    ``_repair_staged=False`` additionally suppresses the restore for
    maintenance callers that hold NO writer role (fsck under a live
    claim): they may read uncommitted state but must not rename the
    claimed writer's stage out from under it.
    ``_repair_stage_min_age`` (seconds, filesystem clock) further
    restricts the restore to stages at least that old — the fsck path
    uses it because an UNCLAIMED live writer (the batch loops never
    claim) is invisible to the claim check, but its in-flight swap's
    stage is always fresh."""
    if _allow_uncommitted and _repair_staged:
        _restore_if_crashed(spark, path, _repair_stage_min_age)
    if _allow_uncommitted and (not _repair_staged or _repair_stage_min_age > 0):
        # a live table still missing with its stage present means the
        # restore was suppressed (live claim) or age-gated (fresh
        # stage, possibly an unclaimed writer mid-swap): fail with the
        # recovery instead of a bare path-not-found from the read
        # below. Mutator loads (repair on, age 0) skip this re-check —
        # their restore just adopted any such stage, so the condition
        # cannot hold and the four extra footer reads would be pure
        # per-micro-batch overhead
        for live, stage in (("remap", ".remap_stage"), ("base", ".base_stage")):
            if (
                _try_read_parquet(spark, f"{path}/{live}") is None
                and _try_read_parquet(spark, f"{path}/{stage}") is not None
            ):
                raise RuntimeError(
                    f"clustering at {path} is mid-swap ({live} missing, "
                    f"{stage} present): either a writer is swapping "
                    "right now — retry shortly — or a crashed "
                    "mutation's stage is younger than the repair age "
                    "gate; retrying the crashed mutation adopts it "
                    "immediately"
                )
    meta = _try_read_parquet(spark, f"{path}/meta")
    meta_rows = meta.collect() if meta is not None else []
    if len(meta_rows) != 1 or set(_CLUSTER_META_COLS) - set(
        meta_rows[0].asDict()
    ):
        raise ValueError(
            f"load_cluster_assignments: no valid meta at {path}/meta"
        )
    params = meta_rows[0].asDict()
    if not _allow_uncommitted:
        commit = _try_read_parquet(spark, f"{path}/commit")
        commit_rows = commit.collect() if commit is not None else []
        if (
            len(commit_rows) != 1
            or commit_rows[0]["build_id"] != params["build_id"]
        ):
            raise ValueError(
                f"load_cluster_assignments: clustering at {path} has no "
                "matching commit marker — a merge or compaction was "
                "interrupted. Retry that operation (merges and "
                "compactions are idempotent), or rebuild with "
                "overwrite=True"
            )
    base = spark.read.parquet(f"{path}/base")
    log = spark.read.parquet(f"{path}/remap")
    return base, log, params


def _resolved(base: DataFrame, log: DataFrame) -> DataFrame:
    """Apply the flattened remap log: one broadcast join, no chains."""
    return base.join(
        F.broadcast(log), base.component == log.old_label, "left"
    ).select(
        "node",
        F.coalesce(F.col("new_label"), F.col("component")).alias("component"),
    )


def resolve_cluster_assignments(spark: SparkSession, path: str) -> DataFrame:
    """Current (node, component) assignments — base with the remap log
    applied. The broadcast-log join is the ONLY overhead vs a plain
    table read; compaction removes even that."""
    base, log, _ = load_cluster_assignments(spark, path)
    return _resolved(base, log)


def merge_cluster_delta(
    spark: SparkSession,
    path: str,
    new_pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    reliable_checkpoints: bool = False,
    writer_token: str | None = None,
) -> dict:
    """Merge a delta's candidate pairs into the persisted clustering in
    O(delta + log) — no pass over the standing corpus or its graph.

    ``new_pairs``: the edges INCIDENT TO THE DELTA — what
    ``query_dedup_candidates`` returns after the delta is appended to
    the near-dup index (delta↔corpus and delta↔delta pairs; edges
    among old documents cannot appear from an append, and passing any
    that duplicate existing ones is harmless — they contract to
    self-edges). Endpoints may be brand-new ids, never-clustered old
    ids, or members of existing clusters.

    Steps, all delta-sized except the range-pruned endpoint lookup:

    1. canonicalize + distinct the edges; resolve each endpoint to its
       current label via a min/max-pruned semi-join into the
       node-sorted base (+ broadcast log);
    2. CONTRACT: rewrite edges over labels, drop self-edges, run
       ``connected_components`` on the contracted graph (edges ≤ the
       delta's pair count — driver-loop rounds over a tiny frame);
    3. existing labels whose merged label differs become remap-log
       entries (composed into the flattened log); endpoints that had
       no assignment become new base rows, written with their FINAL
       merged label.

    Idempotent under retry (pytest-pinned): a replay resolves
    endpoints to the already-merged labels, the contraction collapses
    to self-edges, and the base append anti-joins out rows that
    already landed — so the recovery from any crash is simply running
    the same merge again.

    Returns ``{"merged_labels": n, "new_nodes": n, "log_entries": n}``.
    ``log_entries`` is the flattened log's post-merge size — one row
    per label ever merged away since the last compaction; schedule
    ``compact_cluster_assignments`` to keep it broadcast-sized."""
    _refuse_if_foreign_writer(spark, path, "merge_cluster_delta", writer_token)
    base, log, params = load_cluster_assignments(
        spark, path, _allow_uncommitted=True
    )
    src, dst = F.col(src_col), F.col(dst_col)
    # The operation fingerprint and the endpoint id range ride the
    # checkpoint materialization as OBSERVED metrics (r14: the r13
    # form already fused them into one agg job over the checkpointed
    # frame; the observation folds that remaining job into the
    # checkpoint itself — zero extra actions per merge):
    # - fingerprint: order-independent over the canonical distinct
    #   edge set (bit_xor of per-edge xxhash64 — XOR is safe because
    #   the set is distinct, and it cannot overflow under ANSI the way
    #   a sum can — plus the count), so a replay of the SAME delta —
    #   the documented crash recovery — fingerprints identically,
    #   while any other delta does not. The checkpoint job is the
    #   query's result stage, so the metrics are applied exactly once
    #   per task in local mode; a cluster stage-retry could in
    #   principle skew them, which for the FINGERPRINT could only
    #   refuse a replay loudly (guard raises; retry again), never
    #   bless a foreign one — op_fp gates equality, and the honest
    #   value is recomputed on the retry.
    # - range: edges are canonicalized u = least, v = greatest, so
    #   min(u) / max(v) ARE the endpoint set's global [lo, hi] (min and
    #   max are retry-insensitive) — no separate pass over the
    #   endpoints frame (a merge runs per micro-batch; every fused
    #   driver job is cadence headroom).
    obs_fp = Observation()
    edges = (
        new_pairs.select(src.alias("u"), dst.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .observe(
            obs_fp,
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            F.count(F.lit(1)).alias("n"),
            F.min("u").alias("lo"),
            F.max("v").alias("hi"),
        )
        # delta-sized by contract; materialize once — it feeds the
        # endpoint lookup, the contraction, and the stats above
        .localCheckpoint()
    )
    fp_row = obs_fp.get
    op_fp = f"merge:{fp_row['n']}:{fp_row['h']}"
    _guard_pending(spark, path, op_fp, params, compatible=("compact",))
    endpoints = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    def _restore_marker_if_missing() -> None:
        # a RETRIED merge that lands here as a no-op may be the
        # recovery of a crash that happened after every data write but
        # before the marker rewrite — the state is consistent (that is
        # what no-op means: nothing left to merge, nothing pending), so
        # the retry must restore the marker or strict reads stay
        # wedged forever behind a retry that "succeeds" without fixing
        # anything (the streaming job would silently advance past it)
        commit = _try_read_parquet(spark, f"{path}/commit")
        rows = commit.collect() if commit is not None else []
        if len(rows) != 1 or rows[0]["build_id"] != params["build_id"]:
            _write_commit(spark, path, params["build_id"])
            # any pending token still present here is OURS or a
            # compatible crashed compaction's (foreign merges were
            # refused at entry; compaction residue is consistent under
            # the marker we just restored) — the crash it recorded is
            # recovered either way, so clear it with the marker
            _fs_delete(spark, f"{path}/pending")

    stats = fp_row
    if stats["lo"] is None:
        _restore_marker_if_missing()
        return {"merged_labels": 0, "new_nodes": 0, "log_entries": log.count()}
    # current label of every endpoint that HAS one: range-pruned scan
    # of the node-sorted base (row groups outside [lo, hi] skipped via
    # parquet stats), then the broadcast log
    assigned = _resolved(
        base.filter(F.col("node").between(F.lit(stats["lo"]), F.lit(stats["hi"])))
        .join(endpoints, "node", "left_semi"),
        log,
    )
    rep = (
        endpoints.join(assigned, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("rep"),
            # carried so labels_now below derives from THIS checkpointed
            # frame: deriving it from `assigned` re-evaluated the whole
            # range-pruned base scan + broadcast-log join once per
            # downstream branch (remap entries, new rows, composed log,
            # both stat counts) — five extra base scans per merge (r13
            # optimization, guide §1.2: remove redundant passes)
            F.col("component").isNotNull().alias("had"),
        )
        .localCheckpoint()  # reused for both edge endpoints + label set
    )
    ru = rep.select(F.col("node").alias("u"), F.col("rep").alias("ru"))
    rv = rep.select(F.col("node").alias("v"), F.col("rep").alias("rv"))
    contracted = (
        edges.join(ru, "u")
        .join(rv, "v")
        .filter(F.col("ru") != F.col("rv"))
        .select("ru", "rv")
        .distinct()
    )
    if contracted.isEmpty():
        # nothing bridges anything: the only work is NEW endpoints
        # whose every pair collapsed within one cluster... which cannot
        # happen (a new id is its own rep), so new nodes always reach
        # here via cc below; an empty contraction means every endpoint
        # was already clustered consistently — a pure replay. No-op,
        # except that a replay RECOVERING a crashed marker rewrite must
        # still restore the marker.
        _restore_marker_if_missing()
        return {"merged_labels": 0, "new_nodes": 0, "log_entries": log.count()}
    # two-phase star contraction, not min-label propagation: the
    # contracted graph is delta-SIZED but not delta-DIAMETERED — a
    # templated-document delta can chain many existing clusters, and
    # min-label's round count equals that chain length while the
    # star contraction stays O(log^2 n) (the same reasoning that made
    # dd_cluster_components two-phase). Labels are identical between
    # the two algorithms (pytest-pinned in test_llm_ops).
    # MEASURED dead-end (r11, do not retry): replacing this with a
    # driver-local union-find over a bounded collect of the contracted
    # edges — "it's only a few hundred edges, skip ~10 Spark jobs" —
    # benched 50% SLOWER on dd_cluster_merge (median 13.24 s vs
    # 8.68 s, 5-run A/B at sf0.1): the star rounds run the tiny graph
    # under _loop_shuffle_partitions' bounded shuffle and checkpointed
    # lineage, while the collect forces extra full-width evaluations
    # of the probe->contract pipeline the twophase path never pays.
    cc = connected_components_twophase(
        contracted, "ru", "rv", reliable_checkpoints=reliable_checkpoints
    )  # (node = rep, component = merged label)
    # existing labels from the CHECKPOINTED rep frame (the `had` flag),
    # not from `assigned` — see the rep construction note above
    labels_now = rep.filter(F.col("had")).select(F.col("rep").alias("lbl")).distinct()
    # ONE materialization of cc x existing-labels; every downstream
    # branch (remap entries, new base rows, the composed log, the stat
    # counts) filters this delta-sized frame instead of re-running the
    # join per consumer. lbl is never NULL (labels are node ids), so
    # `existed` splits the frame exactly as the previous left_semi /
    # left_anti pair did.
    # merged-label count observed on the checkpoint materialization
    # (r14): the previous remap_new.count() was a separate driver job
    # over this just-checkpointed frame. n_merged feeds only the
    # returned stats dict (same caveat as n_new below).
    obs_m = Observation()
    cjoin = (
        cc.join(labels_now, cc.node == labels_now.lbl, "left")
        .select("node", "component", F.col("lbl").isNotNull().alias("existed"))
        .observe(
            obs_m,
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("existed") & (F.col("component") != F.col("node")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_merged"),
        )
        .localCheckpoint()
    )
    remap_new = (
        cjoin.filter(F.col("existed") & (F.col("component") != F.col("node")))
        .select(
            F.col("node").alias("old_label"),
            F.col("component").alias("new_label"),
        )
    )
    new_rows = cjoin.filter(~F.col("existed")).select("node", "component")
    # compose the flattened log: entries pointing at a just-merged
    # label are redirected to its final label, then the new entries
    # are unioned in (their keys are CURRENT labels, which by
    # construction are never existing log keys — a log key is stale)
    r_bc = F.broadcast(remap_new)
    composed = (
        log.join(r_bc, log.new_label == r_bc.old_label, "left")
        .select(
            log.old_label.alias("old_label"),
            F.coalesce(r_bc.new_label, log.new_label).alias("new_label"),
        )
        .unionByName(remap_new)
        .filter(F.col("old_label") != F.col("new_label"))
    )

    n_merged = int(obs_m.get["n_merged"])
    # --- mutation window: pending token on, marker off, idempotent
    # writes, marker on, token off — a crash anywhere in the window
    # leaves a token naming THIS operation, so only its own replay can
    # re-commit (any other mutator refuses in _guard_pending) ---
    _write_pending(spark, path, op_fp)
    _fs_delete(spark, f"{path}/commit")
    # base append, replay-safe: rows already landed by a crashed prior
    # attempt are anti-joined out (same discipline as the ANN lists
    # append) — range-pruned, so the probe cost tracks the delta.
    # Count and write share ONE evaluation via an observation (r13
    # optimization): the previous count-then-write pair ran the
    # anti-join's pruned base scan twice per merge.
    # Cluster caveat (ADVICE r13): CollectMetrics accumulators can
    # over-count when a stage is retried or tasks run speculatively.
    # n_new feeds only the returned stats dict (and through it the
    # streaming jobs' rows_since_snapshot cadence HEURISTIC — snapshot
    # a little early/late, never a correctness input); a deployment
    # that needs the exact landed count derives it from the committed
    # parquet instead.
    to_insert = new_rows.join(
        base.filter(
            F.col("node").between(F.lit(stats["lo"]), F.lit(stats["hi"]))
        ),
        "node",
        "left_anti",
    )
    obs_ins = Observation()
    to_insert.observe(obs_ins, F.count(F.lit(1)).alias("n")).write.mode(
        "append"
    ).parquet(f"{path}/base")
    n_new = int(obs_ins.get["n"])
    _fs_delete(spark, f"{path}/.remap_stage")
    # same fusion for the composed log: the observation counts the rows
    # streaming into the stage write, so the post-write read-back count
    # (one extra job per merge) is gone; the parquet job either commits
    # the stage completely or raises, so the swap below still only ever
    # sees a fully-written stage
    obs_log = Observation()
    composed.observe(obs_log, F.count(F.lit(1)).alias("n")).coalesce(
        1
    ).write.parquet(f"{path}/.remap_stage")
    n_log = int(obs_log.get["n"])
    _swap_staged(spark, path, "remap", ".remap_stage")
    _write_commit(spark, path, params["build_id"])
    _fs_delete(spark, f"{path}/pending")
    return {"merged_labels": n_merged, "new_nodes": n_new, "log_entries": n_log}


def compact_cluster_assignments(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    writer_token: str | None = None,
    force: bool = False,
) -> dict:
    """Fold the remap log into base (one linear rewrite of the narrow
    node-sorted table) and clear it — the amortized step that keeps
    every merge's log broadcast-sized, exactly like the bucket/code
    table compactions. Idempotent under retry: re-applying an already-
    folded log matches no rows (its keys are stale labels). Any two
    compactions are interchangeable, so the pending-operation token is
    a constant — a crashed compaction's residue can be recovered by
    ANY later compaction, while a crashed MERGE's residue refuses a
    compaction (folding the old log over the merge's half-landed base
    would commit the half-merged state)."""
    _refuse_if_foreign_writer(
        spark, path, "compact_cluster_assignments", writer_token, force
    )
    base, log, params = load_cluster_assignments(
        spark, path, _allow_uncommitted=True
    )
    _guard_pending(spark, path, "compact", params)
    n_rows = base.count()
    n_log = log.count()
    folded = _resolved(base, log)
    if target_files is None:
        target_files = max(1, min(len(base.inputFiles()), (n_rows + 3_999_999) // 4_000_000))
    staged = folded.repartitionByRange(target_files, "node").sortWithinPartitions(
        "node"
    )
    _fs_delete(spark, f"{path}/.base_stage")
    staged.write.parquet(f"{path}/.base_stage")
    if spark.read.parquet(f"{path}/.base_stage").count() != n_rows:
        _fs_delete(spark, f"{path}/.base_stage")
        raise RuntimeError(
            "compact_cluster_assignments: staged rewrite changed the row "
            "count — refusing to swap; the live table is untouched"
        )
    _write_pending(spark, path, "compact")
    _fs_delete(spark, f"{path}/commit")
    _swap_staged(spark, path, "base", ".base_stage")
    id_type = params["id_type"]
    _fs_delete(spark, f"{path}/.remap_stage")
    spark.createDataFrame(
        [], f"old_label {id_type}, new_label {id_type}"
    ).write.parquet(f"{path}/.remap_stage")
    _swap_staged(spark, path, "remap", ".remap_stage")
    _write_commit(spark, path, params["build_id"])
    _fs_delete(spark, f"{path}/pending")
    return {"n_rows": n_rows, "log_entries_folded": n_log}


def _compact_if_log_large(
    spark: SparkSession,
    clusters_path: str,
    stats: dict,
    threshold: int | None,
    writer_token: str | None = None,
) -> dict:
    """Auto-compaction hook for the continuous loops: when a merge
    leaves the flattened remap log past ``threshold`` rows, fold it
    into base right here instead of trusting an operator to notice the
    docstring. The resolution join's "one broadcast join" invariant
    only holds while the log is broadcast-sized; a merge-heavy stream
    that never compacts walks the log past that budget unattended (see
    ``LOG_COMPACT_THRESHOLD`` for the sizing rationale). ``None``
    disables the hook for callers that schedule compaction themselves.
    Returns the merge stats extended with ``log_compacted`` (and the
    folded row count when it fired)."""
    stats = dict(stats)
    stats["log_compacted"] = False
    if threshold is not None and stats.get("log_entries", 0) >= threshold:
        folded = compact_cluster_assignments(
            spark, clusters_path, writer_token=writer_token
        )
        stats["log_compacted"] = True
        stats["log_entries_folded"] = folded["log_entries_folded"]
        stats["log_entries"] = 0
    return stats


def ingest_and_update_clusters(
    docs_delta: DataFrame,
    index_path: str,
    clusters_path: str,
    text_col: str = "text",
    allow_short: bool = False,
    reliable_checkpoints: bool = False,
    compact_log_threshold: int | None = LOG_COMPACT_THRESHOLD,
    writer_token: str | None = None,
    stage_timings: dict[str, float] | None = None,
) -> dict:
    """The daily near-dup loop, end to end in O(delta): append the
    delta to the persisted near-dup index, probe it for ALL pairs the
    delta introduces (delta↔corpus and delta↔delta — probing AFTER the
    append makes one probe see both), and merge them into the
    persisted clustering. Equivalence to a from-scratch
    pairs-then-components recompute over the union is pytest-pinned.
    When the merge leaves the remap log at or past
    ``compact_log_threshold`` rows the loop compacts it in place
    (``None`` opts out), keeping the broadcast-resolution invariant
    without operator attention.

    ``stage_timings``: an optional dict the loop fills with per-stage
    wall seconds (``append``, ``probe_merge``, ``log_compact``) for
    bench attribution. The probe itself is LAZY — its cost executes
    inside the merge's edge materialization, so it is reported fused
    with the merge rather than pretending to a split that would
    require an extra timed action."""
    import time as _time

    from .dedup_index import append_to_dedup_index

    spark = docs_delta.sparkSession
    t0 = _time.perf_counter()
    append_to_dedup_index(
        docs_delta, index_path, text_col=text_col, allow_short=allow_short
    )
    if stage_timings is not None:
        stage_timings["append"] = _time.perf_counter() - t0
    return probe_and_merge_delta(
        spark,
        index_path,
        clusters_path,
        docs_delta,
        text_col=text_col,
        reliable_checkpoints=reliable_checkpoints,
        compact_log_threshold=compact_log_threshold,
        writer_token=writer_token,
        stage_timings=stage_timings,
    )


def probe_and_merge_delta(
    spark: SparkSession,
    index_path: str,
    clusters_path: str,
    docs_delta: DataFrame,
    text_col: str = "text",
    reliable_checkpoints: bool = False,
    compact_log_threshold: int | None = LOG_COMPACT_THRESHOLD,
    writer_token: str | None = None,
    count_pairs: bool = False,
    stage_timings: dict[str, float] | None = None,
) -> dict:
    """The probe → merge → auto-compact tail of the daily loop, shared
    by ``ingest_and_update_clusters`` and the composed
    ``orchestrate.curate_corpus_daily`` (whose append side differs:
    first-run build, verified replay, self-healed gaps) — ONE
    implementation of the pair-column contract and the compaction
    trigger so the two callers cannot drift. Assumes the delta is
    already in the index (probing after the append is what makes one
    probe see delta↔corpus and delta↔delta pairs).

    ``count_pairs=True`` additionally persists the candidate frame and
    reports its size as ``stats["pairs"]`` (the curation audit row);
    the default skips the extra action."""
    from .dedup_index import query_dedup_candidates

    return _merge_compact_tail(
        spark,
        clusters_path,
        lambda: query_dedup_candidates(
            spark, index_path, docs_delta, text_col=text_col
        ),
        reliable_checkpoints,
        compact_log_threshold,
        writer_token,
        count_pairs,
        stage_timings,
    )


def _merge_compact_tail(
    spark: SparkSession,
    clusters_path: str,
    pairs_fn,
    reliable_checkpoints: bool,
    compact_log_threshold: int | None,
    writer_token: str | None,
    count_pairs: bool,
    stage_timings: dict[str, float] | None,
) -> dict:
    """The merge → auto-compact tail both probe_and_merge variants
    share — ONE implementation of the pair-column contract, the
    optional pair count, the compaction trigger, and the stage-timing
    attribution, so the text and vector twins cannot drift.

    ``pairs_fn`` is a THUNK, not a DataFrame: the probe queries do
    eager work at construction time (``localCheckpoint`` + the
    prefix-layout driver collect in ``_probe_bucket_index``; the vec
    coverage-gate count), and that cost belongs to the recorded
    ``probe_merge`` stage — taking an already-built frame here was
    measured shifting ~0.8 s of dd_cluster_merge's probe cost into
    bench's unattributed "rest" (r12 review), which would let a probe
    regression hide from the stage tripwire.

    ``count_pairs`` rides the merge's own edge materialization as an
    observed metric (r14): the previous persist-then-count pair cost a
    separate driver job and a cached copy of the candidate frame per
    audited run; the merge consumes ``pairs`` exactly once (its edge
    canonicalization is checkpointed), so the observation sees every
    candidate row with zero extra actions. Audit-only value — the
    same retry caveat as the merge's other observed counts applies."""
    import time as _time

    t1 = _time.perf_counter()
    pairs = pairs_fn()
    obs_p = None
    if count_pairs:
        obs_p = Observation()
        pairs = pairs.observe(obs_p, F.count(F.lit(1)).alias("n"))
    stats = merge_cluster_delta(
        spark,
        clusters_path,
        pairs,
        src_col="probe_id",
        dst_col="corpus_id",
        reliable_checkpoints=reliable_checkpoints,
        writer_token=writer_token,
    )
    n_pairs = int(obs_p.get["n"]) if obs_p is not None else None
    t2 = _time.perf_counter()
    out = _compact_if_log_large(
        spark, clusters_path, stats, compact_log_threshold, writer_token
    )
    if stage_timings is not None:
        stage_timings["probe_merge"] = (
            stage_timings.get("probe_merge", 0.0) + (t2 - t1)
        )
        stage_timings["log_compact"] = (
            stage_timings.get("log_compact", 0.0)
            + (_time.perf_counter() - t2)
        )
    if n_pairs is not None:
        out = dict(out)
        out["pairs"] = n_pairs
    return out


def probe_and_merge_delta_vec(
    spark: SparkSession,
    index_path: str,
    clusters_path: str,
    vecs_delta: DataFrame,
    corpus: DataFrame | None = None,
    threshold: float | None = None,
    reliable_checkpoints: bool = False,
    compact_log_threshold: int | None = LOG_COMPACT_THRESHOLD,
    writer_token: str | None = None,
    count_pairs: bool = False,
    stage_timings: dict[str, float] | None = None,
) -> dict:
    """Vector twin of ``probe_and_merge_delta`` — the probe → merge →
    auto-compact tail shared by ``ingest_and_update_clusters_vec`` and
    the composed ``orchestrate.curate_corpus_daily_vec`` (whose append
    side differs: first-run build, verified replay, self-healed gaps).
    Pair semantics as ``query_vec_dedup_candidates``: candidate pairs
    by default; exact-cosine-verified near-dup pairs when ``corpus``
    and ``threshold`` are both given (the coverage gates inside the
    query refuse a corpus missing any candidate endpoint). Assumes the
    delta is already in the index."""
    from .dedup_index import query_vec_dedup_candidates

    return _merge_compact_tail(
        spark,
        clusters_path,
        lambda: query_vec_dedup_candidates(
            spark, index_path, vecs_delta, corpus=corpus, threshold=threshold
        ),
        reliable_checkpoints,
        compact_log_threshold,
        writer_token,
        count_pairs,
        stage_timings,
    )


def require_corpus_covers_delta(
    delta: DataFrame, corpus: DataFrame, id_col: str, job: str
) -> None:
    """Refuse an exact-verify ``corpus`` that is missing any delta id —
    the common stale-corpus mistake (yesterday's corpus without
    today's delta), checked delta-sized BEFORE anything is appended.
    Shared by ``ingest_and_update_clusters_vec`` and
    ``orchestrate.curate_corpus_daily_vec`` so the check's semantics
    and error text cannot drift; the INDEXED-id coverage gate (which
    can only fire at probe time) lives inside
    ``query_vec_dedup_candidates``."""
    n_missing = (
        delta.select(F.col(id_col))
        .join(corpus.select(F.col(id_col)), id_col, "left_anti")
        .count()
    )
    if n_missing:
        raise ValueError(
            f"{job}: {n_missing} delta id(s) are missing from `corpus` "
            "— the exact-cosine verify would silently drop their pairs. "
            "Pass the UNION including this delta (nothing has been "
            "appended yet)"
        )


def ingest_and_update_clusters_vec(
    vecs_delta: DataFrame,
    index_path: str,
    clusters_path: str,
    corpus: DataFrame | None = None,
    threshold: float | None = None,
    reliable_checkpoints: bool = False,
    compact_log_threshold: int | None = LOG_COMPACT_THRESHOLD,
    writer_token: str | None = None,
) -> dict:
    """The embedding-side daily loop — the vector twin of
    ``ingest_and_update_clusters``: append the delta to the persisted
    sign-LSH near-dup index, probe for the pairs it introduces, merge
    them into the persisted clustering in O(delta).

    Pair semantics follow ``query_vec_dedup_candidates``: without
    ``corpus``/``threshold`` the clusters form over CANDIDATE pairs
    (shared sign-LSH bucket — the blocked structure, exactly what a
    from-scratch bucket-join + components over the union computes,
    pytest-pinned); with both, candidates are first verified by the
    exact rounded cosine against the raw vectors and the clusters form
    over true near-dup pairs — the ``dd_embedding_near_dup``
    semantics. ``corpus`` must then cover EVERY candidate endpoint
    (the union including this delta): a delta id missing from it fails
    here BEFORE anything is appended (the common stale-corpus
    mistake, checked delta-sized); an INDEXED id missing from it fails
    loudly at probe time inside ``query_vec_dedup_candidates``'s
    coverage gate — silently dropping the pair is never an option. In
    that second case the index append has already landed; recover
    WITHOUT re-appending by fixing ``corpus`` and running the loop's
    own tail directly: ``probe_and_merge_delta_vec(spark, index_path,
    clusters_path, vecs_delta, corpus=fixed_corpus,
    threshold=threshold)`` — the merge is idempotent, so a partial
    prior attempt is harmless."""
    from .dedup_index import append_to_vec_dedup_index

    spark = vecs_delta.sparkSession
    if corpus is not None and threshold is not None:
        # delta-side coverage BEFORE the append (mutating nothing on
        # the common mistake — a stale corpus without today's delta);
        # the handle-cached index load makes the id_col read cheap
        from .dedup_index import load_vec_dedup_index

        _, params = load_vec_dedup_index(spark, index_path)
        require_corpus_covers_delta(
            vecs_delta, corpus, params["id_col"],
            "ingest_and_update_clusters_vec",
        )
    append_to_vec_dedup_index(vecs_delta, index_path)
    # the probe -> merge -> auto-compact tail is the SHARED
    # implementation (probe_and_merge_delta_vec) — one pair-column
    # contract and compaction trigger for both this loop and the
    # composed curate_corpus_daily_vec, mirroring the text side
    return probe_and_merge_delta_vec(
        spark,
        index_path,
        clusters_path,
        vecs_delta,
        corpus=corpus,
        threshold=threshold,
        reliable_checkpoints=reliable_checkpoints,
        compact_log_threshold=compact_log_threshold,
        writer_token=writer_token,
    )


def fsck_cluster_assignments(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    stage_repair_min_age_sec: float = 60.0,
) -> dict:
    """Whole-clustering consistency sweep — the scheduled-maintenance
    counterpart of the merge's per-delta guards, mirroring
    ``fsck_index`` for the other persisted structures.

    Checks, each a narrow-table aggregate:

    - ``uncommitted``: the commit marker is missing or stale (a
      crashed mutation nobody retried);
    - ``dup_node_rows``: base rows beyond one per node — a replayed
      append that somehow bypassed the anti-join (every reader would
      see the node in two clusters);
    - ``log_chain_entries``: log keys that also appear as log VALUES —
      the flattened-log invariant broken (resolution would need a
      chain walk it never performs, silently wrong labels);
    - ``log_dup_keys``: one stale label remapped to two targets;
    - ``unanchored_components``: resolved component labels that are
      not themselves nodes resolving to themselves — a label is by
      construction the minimum MEMBER of its cluster, so a dangling
      label means lost or corrupt rows.

    ``strict=True`` raises on any violation, naming the recovery
    (retry the crashed mutation; rebuild from a fresh
    ``connected_components`` run otherwise — the pair graph is always
    recomputable from the corpus + near-dup index).

    Under a LIVE writer claim the sweep stays strictly read-only: the
    crash-restore rename is suppressed (a scheduled fsck racing the
    claimed writer's own ``_swap_staged`` window must not adopt its
    stage — that would fail the writer's rename and abort a healthy
    mutation), and the claim is surfaced in the report. With no claim
    the sweep keeps its maintenance role and restores crashed swaps —
    but only stages at least ``stage_repair_min_age_sec`` old
    (filesystem clock): the batch loops (``ingest_and_update_clusters``
    and friends) hold NO claim, so the only way to tell their
    in-flight swap (stage milliseconds old) from genuine crash residue
    (stage as old as the crash) is age. A crashed swap younger than
    the gate is simply picked up by the next sweep, or immediately by
    retrying the crashed mutation (mutators repair their own residue
    regardless of age)."""
    claim = fs_read_text(spark, f"{path.rstrip('/')}/{_WRITER_ACTIVE}")
    base, log, params = load_cluster_assignments(
        spark,
        path,
        _allow_uncommitted=True,
        _repair_staged=claim is None,
        _repair_stage_min_age=stage_repair_min_age_sec,
    )
    commit = _try_read_parquet(spark, f"{path}/commit")
    commit_rows = commit.collect() if commit is not None else []
    report: dict = {
        "uncommitted": not (
            len(commit_rows) == 1
            and commit_rows[0]["build_id"] == params["build_id"]
        )
    }
    # the pending-operation token names WHICH mutation crashed (merges
    # carry their delta's edge-set fingerprint) — surfaced so the
    # sweep's operator knows what to retry; an uncommitted state
    # already flags as a violation above
    report["pending_op"] = _read_pending(spark, path)
    report["writer_claim"] = claim
    report["n_nodes"] = base.select("node").distinct().count()
    report["dup_node_rows"] = base.count() - report["n_nodes"]
    log_rows = log.count()
    report["log_entries"] = log_rows
    if log_rows:
        keys = log.select(F.col("old_label").alias("l"))
        vals = log.select(F.col("new_label").alias("l"))
        report["log_chain_entries"] = keys.join(vals, "l", "left_semi").count()
        report["log_dup_keys"] = log_rows - keys.distinct().count()
    else:
        report["log_chain_entries"] = 0
        report["log_dup_keys"] = 0
    resolved = _resolved(base, log)
    anchors = resolved.filter(F.col("node") == F.col("component")).select(
        F.col("component").alias("c")
    )
    report["unanchored_components"] = (
        resolved.select(F.col("component").alias("c"))
        .distinct()
        .join(anchors, "c", "left_anti")
        .count()
    )
    violations = (
        report["uncommitted"]
        or report["dup_node_rows"]
        or report["log_chain_entries"]
        or report["log_dup_keys"]
        or report["unanchored_components"]
    )
    if strict and violations:
        raise RuntimeError(
            f"fsck_cluster_assignments: clustering at {path} is "
            f"inconsistent — {report}. If a mutation crashed, retry it "
            "(merges and compactions are idempotent); otherwise rebuild "
            "from a fresh connected_components run over the pair graph "
            "(always recomputable from the corpus + near-dup index)"
        )
    return report


def gc_cluster_debris(
    spark: SparkSession,
    path: str,
    min_age_sec: float = 3600.0,
    force: bool = False,
) -> dict:
    """Sweep a clustering's crash debris — the ``gc_serving_root``
    counterpart for the fourth persisted structure:

    - staged swap dirs (``.base_stage``/``.remap_stage``) whose LIVE
      twin exists: leftovers of a mutation that re-staged after a
      crash, or of a crashed compaction a later merge proceeded
      through. A stage with a MISSING live twin is the intended next
      state (crash between delete and rename) and is adopted by the
      next mutator's ``_restore_if_crashed`` — never deleted here;
    - a pending-operation token beside a VALID commit marker (crash
      after the marker rewrite but before the token delete — a
      committed, consistent state; the token is debris the next
      mutation would clear anyway).

    Age-gated on the FILESYSTEM's own clock (``_fs_now_ms`` probe-file
    mtime — driver/store skew must not shrink the margin) so a
    mid-flight mutation's fresh stage survives a scheduler mishap; run
    from the same single-writer maintenance schedule as compaction."""
    p = path.rstrip("/")
    entry_claim = _refuse_if_foreign_writer(
        spark, p, "gc_cluster_debris", None, force
    )
    now_ms = _fs_now_ms(spark, p)
    deleted, retained_young = [], []

    def _aged(sub: str) -> bool:
        # some object stores synthesize directory statuses with mtime
        # 0 — that would read as "infinitely aged" and void the gate
        # on exactly the stores the fs-clock probe targets; unknown
        # age is RETAINED, never swept
        m = fs_mtime(spark, f"{p}/{sub}")
        return m > 0 and (now_ms - m) / 1000 >= min_age_sec

    for live, stage in (("remap", ".remap_stage"), ("base", ".base_stage")):
        if fs_exists(spark, f"{p}/{stage}") and fs_exists(spark, f"{p}/{live}"):
            if _aged(stage):
                fs_delete(spark, f"{p}/{stage}")
                deleted.append(stage)
            else:
                retained_young.append(stage)
    if fs_exists(spark, f"{p}/pending"):
        meta = _try_read_parquet(spark, f"{p}/meta")
        commit = _try_read_parquet(spark, f"{p}/commit")
        meta_rows = meta.collect() if meta is not None else []
        commit_rows = commit.collect() if commit is not None else []
        committed = (
            len(meta_rows) == 1
            and len(commit_rows) == 1
            and commit_rows[0]["build_id"] == meta_rows[0]["build_id"]
        )
        if committed and _aged("pending"):
            fs_delete(spark, f"{p}/pending")
            deleted.append("pending")
        elif committed:
            retained_young.append("pending")
        # an UNcommitted pending token is the crash-recovery signal
        # itself (fsck reports it; the named operation must be
        # retried) — never debris
    out = {"deleted": deleted, "retained_young": retained_young}
    if entry_claim is not None:
        out["bypassed_claim"] = entry_claim
    return out


def canonical_keep_table(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Canonical-document selection off the PERSISTED clustering — the
    step that turns the incrementally-maintained clusters into an
    actual deduplicated corpus, without recomputing any components:
    every document joins its persisted component (singletons are their
    own), and per component the highest-``score_col`` member wins
    (ties toward the lower id). Returns
    ``(component, keep_id, n_members, best_score)`` — the same audit
    shape as the from-scratch ``tx_dedup_keep_best`` entry, and
    pytest-pinned equal to it when the clustering covers the same pair
    graph.

    Scale shape: the persisted (node, component) read + broadcast log,
    one id-keyed join against ``docs``, one ``max_by`` aggregation on
    the component key — no window sort, no graph work. In the daily
    loop this runs AFTER ``ingest_and_update_clusters``; together they
    make corpus curation end-to-end O(delta + one linear keep pass),
    where the from-scratch form re-contracts the whole graph first."""
    from .dedup import keep_best_per_component

    resolved = resolve_cluster_assignments(spark, path)
    labeled = docs.select(F.col(id_col), F.col(score_col)).join(
        resolved, docs[id_col] == resolved["node"], "left"
    ).select(
        docs[id_col],
        F.coalesce(resolved["component"], docs[id_col]).alias("component"),
        F.col(score_col),
    )
    return keep_best_per_component(labeled, id_col, score_col)


# The snapshot's generation layout IS the shared serving-root
# protocol (gen-dirs + CURRENT pointer + staged pointer swap) — one
# protocol, one implementation: the regex, the pointer swap, and the
# resolve retry are imported from operators/serving.py rather than
# re-implemented, so a future fix to the swap discipline lands in
# every persisted structure at once.
_SNAP_GEN_RE = _GEN_RE


def snapshot_cluster_assignments(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_files: int | None = None,
    min_age_sec: float = 3600.0,
) -> int:
    """Publish the RESOLVED assignments under ``out_path`` — the
    always-on serving answer the module docstring prescribes: merges
    mutate ``path`` behind the dark window, while readers point at the
    last snapshot. Returns the row count. Strict read: refuses a
    mid-mutation clustering rather than snapshotting a half-merged one.

    ATOMIC publish via the generation/CURRENT-pointer layout (the same
    discipline as the ANN serving root — a plain
    ``write.mode("overwrite")`` deletes the old table before the new
    commit lands, so the one artifact built FOR always-on readers
    would itself have a reader dark window): the new snapshot lands
    complete in ``out_path/gen-<id>/``, is count-verified against the
    source, and only then does the tiny ``CURRENT`` pointer swap.
    A reader planned against the PREVIOUS generation keeps streaming
    its own files untouched (one-generation grace: older generations
    are swept here, the previous one survives until the next
    snapshot). The sweep is additionally AGE-GATED (``min_age_sec``,
    filesystem clock): a young non-current generation may be a
    concurrently overlapping publish's staged-but-not-yet-pointed
    output, and deleting it would strand that publish's pointer swap
    on a missing directory — the same protection ``gc_serving_root``
    gives the index roots. Read through ``read_cluster_snapshot``; a crash
    anywhere OUTSIDE the two-metadata-op pointer swap leaves
    ``CURRENT`` on the last complete generation, with at worst one
    orphaned (never-pointed-at) generation dir that a later successful
    snapshot sweeps once it ages past ``min_age_sec``. A crash INSIDE the swap (pointer
    deleted, rename pending — sub-millisecond) makes readers fail
    loudly after their retry budget rather than see partial data;
    re-running the snapshot repairs it."""
    import json as _json

    base, log, params = load_cluster_assignments(spark, path)
    resolved = _resolved(base, log)
    n_rows = resolved.count()
    if target_files is None:
        target_files = max(1, (n_rows + 3_999_999) // 4_000_000)
    root = out_path.rstrip("/")
    gen = f"gen-{uuid.uuid4().hex[:12]}"
    resolved.repartitionByRange(target_files, "node").sortWithinPartitions(
        "node"
    ).write.parquet(f"{root}/{gen}")
    # provenance rides INSIDE the generation (underscore-prefixed, so
    # parquet scans ignore it): which clustering build this snapshot
    # captured and how many rows — the staleness answer an always-on
    # reader otherwise has no way to ask (mtimes lie across stores) —
    # plus the generation this publish supersedes (prev_generation:
    # the one-generation reader grace), so fsck can identify the
    # grace EXACTLY instead of guessing from mtimes (a young crash
    # orphan between the grace and CURRENT would fool a
    # newest-older-mtime heuristic into listing the true grace as
    # deletable debris). Written before the count-verify, so a
    # published generation always carries it.
    prev = fs_read_text(spark, f"{root}/CURRENT")
    fs_write_text(
        spark,
        f"{root}/{gen}/_PROVENANCE.json",
        _json.dumps(
            {
                "source_path": path,
                "source_build_id": params["build_id"],
                "n_rows": n_rows,
                "id_col": params["id_col"],
                "prev_generation": prev.strip() if prev else None,
            }
        ),
    )
    staged_n = spark.read.parquet(f"{root}/{gen}").count()
    if staged_n != n_rows:
        fs_delete(spark, f"{root}/{gen}")
        raise RuntimeError(
            "snapshot_cluster_assignments: staged generation row count "
            f"({staged_n}) != source resolution ({n_rows}) — refusing "
            "to publish; CURRENT is untouched"
        )
    _write_current(spark, root, gen)
    if prev is not None:
        keep = {gen, prev.strip()}
        # age-gate the sweep the way gc_serving_root does: a non-keep
        # generation YOUNGER than min_age_sec may be a concurrent
        # publish's staged-but-not-yet-pointed generation (the exact
        # scheduler mishap two overlapping crons produce) — deleting
        # it would leave that publish swapping CURRENT onto a deleted
        # directory, taking the serving root down until the next
        # publish. Aged by the FILESYSTEM's clock (driver/store skew
        # must not shrink the margin). Old aged debris is still swept
        # every publish, so storage stays bounded at CURRENT + grace
        # + (transient) in-flight publishes.
        now_ms = _fs_now_ms(spark, root)
        for name in fs_list_names(spark, root):
            if _SNAP_GEN_RE.match(name) and name not in keep:
                m = fs_mtime(spark, f"{root}/{name}")
                # mtime 0 = synthesized directory status (some object
                # stores): unknown age is RETAINED, never swept —
                # same rule as gc_serving_root/gc_cluster_debris
                if m > 0 and (now_ms - m) / 1000.0 >= min_age_sec:
                    fs_delete(spark, f"{root}/{name}")
    # prev None = first publish (nothing to sweep) OR the recovery of
    # a crashed pointer swap — in the second case WHICH generation
    # in-flight readers are still streaming is unknowable (the old
    # CURRENT content died with the crash), so sweep NOTHING this
    # publish rather than delete a generation mid-scan; the next
    # successful publish sees a valid CURRENT and sweeps normally.
    return n_rows


def read_cluster_snapshot(spark: SparkSession, out_path: str) -> DataFrame:
    """Read the live snapshot generation: resolve ``CURRENT`` (with a
    brief retry covering the sub-millisecond pointer-swap gap, same as
    the index resolver) and read that generation's parquet. Falls back
    to reading ``out_path`` as a plain table when no pointer and no
    generation dirs exist (a pre-generation snapshot or any plain
    parquet table a deployment already points dashboards at)."""
    root = out_path.rstrip("/")
    try:
        # the shared serving-root resolver: live generation when a
        # CURRENT pointer exists (retrying across the sub-ms swap
        # gap), the root itself when neither pointer nor generation
        # dirs do (plain-table fallback)
        return spark.read.parquet(_resolve_index_root(spark, root))
    except RuntimeError:
        raise RuntimeError(
            f"cluster snapshot at {out_path}: CURRENT pointer missing "
            "or naming an absent generation after retries — a pointer "
            "swap crashed mid-flight; re-run "
            "snapshot_cluster_assignments (it publishes a fresh "
            "generation and restores the pointer)"
        ) from None


def fsck_cluster_snapshot(
    spark: SparkSession,
    out_path: str,
    source_path: str | None = None,
    strict: bool = True,
    min_age_sec: float = 3600.0,
) -> dict:
    """Consistency sweep for a snapshot serving root — the scheduled
    check for the artifact always-on readers actually point at:

    - ``current_resolves``: the ``CURRENT`` pointer names an existing
      generation (False = a pointer swap crashed mid-flight; re-run
      the snapshot). A plain-table root reports ``layout="plain"``
      with its row count and nothing else to check.
    - ``provenance_rows_match``: the generation's row count equals
      what its ``_PROVENANCE.json`` recorded at publish (False = the
      generation lost or gained files after commit — corruption).
    - ``extra_generations``: AGED generation dirs beyond CURRENT + the
      one-generation grace — repeated-crash debris a later successful
      publish sweeps (informational). The grace is EXCLUDED: it is
      identified exactly from the current generation's provenance
      (``prev_generation``; mtime-heuristic fallback for pre-field
      generations), because an operator acting on the report must
      never be told to delete the generation an in-flight reader may
      still be streaming. Non-current dirs YOUNGER than
      ``min_age_sec`` (filesystem clock) are reported separately as
      ``young_generations`` — they may be a concurrently in-flight
      publish's staged-but-not-yet-pointed output, the same window
      the publish sweep age-gates.
    - with ``source_path``: ``source_rebuilt`` (the live clustering's
      build_id differs from the one the snapshot captured — a rebuild
      happened, the snapshot is definitely stale) and
      ``rows_behind_source`` (live resolution row count minus the
      snapshot's — incremental drift since the publish; merges only
      add nodes, so this is the freshness gap a re-snapshot closes).
      Both informational: staleness is a cadence decision, not
      corruption.

    ``strict=True`` raises only on the corruption classes
    (``current_resolves`` False, ``provenance_rows_match`` False)."""
    import json as _json

    root = out_path.rstrip("/")
    report: dict = {}
    gen = fs_read_text(spark, f"{root}/CURRENT")
    if gen is None:
        if not any(_SNAP_GEN_RE.match(n) for n in fs_list_names(spark, root)):
            report["layout"] = "plain"
            report["n_rows"] = spark.read.parquet(root).count()
            return report
        report["layout"] = "generation"
        report["current_resolves"] = False
    else:
        report["layout"] = "generation"
        gen = gen.strip()
        report["current_resolves"] = bool(
            _SNAP_GEN_RE.match(gen) and fs_exists(spark, f"{root}/{gen}")
        )
    if report["current_resolves"]:
        report["generation"] = gen
        n = spark.read.parquet(f"{root}/{gen}").count()
        report["n_rows"] = n
        text = fs_read_text(spark, f"{root}/{gen}/_PROVENANCE.json")
        prov = _json.loads(text) if text is not None else None
        if prov is not None:
            report["provenance_rows_match"] = prov["n_rows"] == n
            if source_path is not None:
                meta = _try_read_parquet(spark, f"{source_path}/meta")
                rows = meta.collect() if meta is not None else []
                if len(rows) == 1:
                    report["source_rebuilt"] = (
                        rows[0]["build_id"] != prov["source_build_id"]
                    )
                    live_n = resolve_cluster_assignments(
                        spark, source_path
                    ).count()
                    report["rows_behind_source"] = live_n - n
        others = [
            x
            for x in fs_list_names(spark, root)
            if _SNAP_GEN_RE.match(x) and x != gen
        ]
        if others:
            # exclude the one-generation reader grace from the debris
            # list: an operator acting on extra_generations must never
            # be told to delete the generation an in-flight reader may
            # still be streaming. The grace is EXACT when the current
            # generation's provenance recorded it (prev_generation —
            # what CURRENT pointed at when this publish swapped);
            # pre-field generations fall back to the mtime heuristic
            # (newest non-current dir not newer than CURRENT), which a
            # young crash orphan sitting between the grace and CURRENT
            # can fool — one more reason the provenance records it.
            grace = None
            if prov is not None and prov.get("prev_generation") is not None:
                grace = prov["prev_generation"]
            else:
                # prev_generation null (the current generation was
                # published as a crashed-pointer-swap recovery, where
                # WHICH generation readers were streaming is
                # unknowable — the publish sweep deliberately swept
                # nothing) or a pre-field generation: fall back to
                # the conservative mtime heuristic rather than
                # treating "no recorded grace" as "no grace exists"
                cur_m = fs_mtime(spark, f"{root}/{gen}")
                stamped = sorted(
                    (fs_mtime(spark, f"{root}/{x}"), x) for x in others
                )
                older = [x for m, x in stamped if m <= cur_m]
                grace = older[-1] if older else None
            rest = [x for x in others if x != grace]
            if rest:
                # age-split what remains: an AGED non-current dir is
                # crash debris a later publish sweeps; a YOUNG one may
                # be a concurrently in-flight publish's
                # staged-but-not-yet-pointed generation (the exact
                # window the publish sweep age-gates) — report it
                # separately so nobody deletes it out from under the
                # publish about to point CURRENT at it. mtime 0 =
                # a synthesized directory status (some object
                # stores): UNKNOWN age classifies as young/retained,
                # never as deletable — same rule as gc_serving_root
                now_ms = _fs_now_ms(spark, root)
                aged, young = [], []
                for x in rest:
                    m = fs_mtime(spark, f"{root}/{x}")
                    is_aged = m > 0 and (now_ms - m) / 1000.0 >= min_age_sec
                    (aged if is_aged else young).append(x)
                if aged:
                    report["extra_generations"] = sorted(aged)
                if young:
                    report["young_generations"] = sorted(young)
    violations = not report.get("current_resolves", True) or (
        report.get("provenance_rows_match") is False
    )
    if strict and violations:
        raise RuntimeError(
            f"fsck_cluster_snapshot: snapshot at {out_path} is "
            f"inconsistent — {report}. Re-run "
            "snapshot_cluster_assignments (it publishes a fresh "
            "generation and restores the pointer)"
        )
    return report


def snapshot_provenance(spark: SparkSession, out_path: str) -> dict:
    """What the live snapshot generation captured: the source
    clustering path, the ``build_id`` it resolved, and the row count —
    the staleness/lineage answer for dashboards and fsck runbooks
    (compare ``source_build_id`` against the live clustering's meta to
    see whether a re-snapshot is due). Raises on a plain-table
    (pre-generation) snapshot, which carries no provenance."""
    import json as _json

    root = out_path.rstrip("/")
    gen = fs_read_text(spark, f"{root}/CURRENT")
    if gen is None:
        raise ValueError(
            f"snapshot_provenance: {out_path} has no CURRENT pointer — "
            "a plain-table snapshot carries no provenance; re-publish "
            "with snapshot_cluster_assignments"
        )
    text = fs_read_text(spark, f"{root}/{gen.strip()}/_PROVENANCE.json")
    if text is None:
        raise ValueError(
            f"snapshot_provenance: generation {gen.strip()} at "
            f"{out_path} has no _PROVENANCE.json (published before the "
            "provenance was added) — re-publish to stamp it"
        )
    out = _json.loads(text)
    out["generation"] = gen.strip()
    return out


def snapshot_if_stale(
    spark: SparkSession,
    path: str,
    out_path: str,
    min_rows_behind: int = 1,
    target_files: int | None = None,
    min_age_sec: float = 3600.0,
) -> dict:
    """Publish a snapshot only when the live clustering actually
    moved — the cron-friendly wrapper around
    ``snapshot_cluster_assignments``. A scheduled publish of an
    UNCHANGED clustering pays the full resolve + linear rewrite +
    count-verify for a byte-equivalent table; this compares the live
    state against the CURRENT generation's provenance first and skips
    the write when it is current — the same engine-turns-the-dial
    argument as the loops' remap-log auto-compaction.

    Publishes when any of: no generation snapshot exists yet (or a
    pre-provenance one — unknowable staleness is treated as stale),
    the live clustering was REBUILT (build_id differs — labels may
    have changed wholesale at identical row counts, so row deltas
    cannot clear it), or the live resolution has at least
    ``min_rows_behind`` more rows than the snapshot captured (merges
    only add nodes, so the row delta IS the freshness gap).

    The skip path costs one meta read + one resolved count (a linear
    scan of the narrow base, no shuffle beyond the broadcast-log
    join, no write); the publish path costs exactly what
    ``snapshot_cluster_assignments`` always costs. Returns
    ``{published, reason, n_rows, rows_behind}``."""
    base, log, params = load_cluster_assignments(spark, path)
    try:
        prov = snapshot_provenance(spark, out_path)
    except ValueError:
        n = snapshot_cluster_assignments(
            spark, path, out_path, target_files, min_age_sec
        )
        return {
            "published": True,
            "reason": "no provenance-stamped snapshot at out_path",
            "n_rows": n,
            "rows_behind": None,
        }
    if prov["source_build_id"] != params["build_id"]:
        n = snapshot_cluster_assignments(
            spark, path, out_path, target_files, min_age_sec
        )
        return {
            "published": True,
            "reason": "source clustering was rebuilt",
            "n_rows": n,
            "rows_behind": None,
        }
    # reuse the tables already loaded above — a second
    # resolve_cluster_assignments would repeat the meta/commit reads
    # on the hot skip path this function exists to make cheap
    live_n = _resolved(base, log).count()
    behind = live_n - prov["n_rows"]
    if behind >= min_rows_behind:
        n = snapshot_cluster_assignments(
            spark, path, out_path, target_files, min_age_sec
        )
        return {
            "published": True,
            "reason": f"snapshot {behind} rows behind the live resolution",
            "n_rows": n,
            "rows_behind": behind,
        }
    return {
        "published": False,
        "reason": "snapshot is current",
        "n_rows": prov["n_rows"],
        "rows_behind": behind,
    }
