"""Serving-root machinery shared by every persisted structure.

Four structures persist state under a pointer-indirected "serving
layout" — the ANN index (``ann_index``), the text and vector near-dup
bucket indexes (``dedup_index``), the cluster-assignment store and its
published snapshot (``cluster_index``) — and all of them need the same
operational core: generation dirs named by a ``CURRENT`` pointer,
atomic pointer swaps, single-writer ingest claims with nonce tokens,
pre-swap late-writer tripwires, filesystem-clock GC, and staged
sorted compaction with row-count verification. That core grew up
inside ``ann_index`` and was imported by its siblings as private
helpers (the r10 verdict's "what's missing" #4); this module is its
neutral home. ``ann_index`` re-exports everything under the original
private names so its public test seams stay stable.

Design notes carried over unchanged:

- Layout decisions MUST go through Spark's filesystem (``..fs``),
  never ``os.path`` — the structures live wherever ``spark.write``
  put them (HDFS/S3 in production), and a driver-local check is
  silently False there.
- The pointer swap is two metadata ops (delete + rename); readers
  retry the sub-millisecond pointer-absent window.
- Single-writer is the contract; the claim/tripwire helpers make any
  realistic violation loud rather than making concurrency safe.
"""

from __future__ import annotations

import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..fs import (
    fs_delete,
    fs_exists,
    fs_list_names,
    fs_mkdirs,
    fs_mtime,
    fs_read_text,
    fs_rename,
    fs_write_text,
    fs_write_text_exclusive,
    parent,
    try_read_parquet,
)
from ..session import tiny_local_df

# ---------------------------------------------------------------------------
# Generation pointer: artifacts live under `path/gen-<id>/`, a tiny
# `path/CURRENT` text marker names the live generation, readers resolve
# the pointer at plan time, and maintenance compacts a COPY into a new
# generation and atomically swaps the pointer. Old-generation FILES
# stay on disk until the NEXT compaction (one-generation grace), so a
# search planned against the previous generation keeps streaming its
# own files untouched.
# ---------------------------------------------------------------------------

CURRENT = "CURRENT"
GEN_RE = re.compile(r"^gen-[0-9a-f]{12}$")


def resolve_serving_root(spark: SparkSession, path: str) -> str:
    """The directory the artifacts actually live in: the live
    generation dir when ``path`` is a serving-layout root (has a
    ``CURRENT`` pointer), else ``path`` itself (flat layout — also the
    fixed point, so resolving an already-resolved path is a no-op and
    every public entry point can resolve unconditionally).

    The pointer swap is two metadata ops (delete + rename), so a
    reader can catch the microsecond gap where ``CURRENT`` is absent;
    generation dirs existing WITHOUT a pointer disambiguate that race
    from a genuine flat layout, and the read retries briefly before
    failing loudly."""
    p = path.rstrip("/")
    for _ in range(40):
        gen = fs_read_text(spark, f"{p}/{CURRENT}")
        if gen is not None:
            gen = gen.strip()
            gen_path = f"{p}/{gen}"
            if GEN_RE.match(gen) and fs_exists(spark, gen_path):
                return gen_path
        elif not any(GEN_RE.match(n) for n in fs_list_names(spark, p)):
            return p
        time.sleep(0.05)
    raise RuntimeError(
        f"index at {path}: CURRENT pointer missing or naming an absent "
        "generation after retries — a pointer swap crashed mid-flight; "
        "restore CURRENT to point at the newest complete generation"
    )


def require_untorn_serving_root(
    spark: SparkSession, path: str, job: str
) -> tuple[str, DataFrame | None]:
    """Resolve ``path`` and read its ``meta``, refusing with a named
    error when the root RESOLVED to a live generation whose meta is
    unreadable — a torn write, not a fresh structure. Returns
    ``(resolved_root, meta_df_or_None)``; ``None`` meta on an
    unresolved (flat) root genuinely means "nothing here yet".

    Callers with a build-if-fresh arm need this exact refusal: treating
    the torn state as fresh would build a SECOND flat structure next to
    the generation dirs, and readers — which resolve ``CURRENT`` — keep
    hitting the torn generation while the job reports success
    (split-brain). One shared site keeps the two daily-curation twins'
    refusal condition and recovery recipe from drifting apart."""
    root = resolve_serving_root(spark, path)
    meta = try_read_parquet(spark, f"{root}/meta")
    if meta is None and root != path.rstrip("/"):
        raise RuntimeError(
            f"{job}: serving-layout root at {path} resolves to {root} "
            "but its meta is unreadable — a torn write in the live "
            "generation, not a fresh structure. Restore CURRENT to the "
            "newest complete generation (then the structure's fsck "
            "sweeps clean); as a last resort delete the ENTIRE root "
            "and rebuild from the corpus (a flat rebuild at this root "
            "would land next to the generation dirs and never be read "
            "— CURRENT keeps resolving past it)"
        )
    return root, meta


def write_current_pointer(spark: SparkSession, path: str, gen_name: str) -> None:
    """Swap the generation pointer: stage the new marker, then
    delete + rename. The sub-millisecond pointer-absent window is
    covered by the resolver's retry; the data dirs themselves are
    never touched, which is the whole point of the indirection."""
    tmp = f"{path}/.CURRENT.next"
    fs_write_text(spark, tmp, gen_name)
    fs_delete(spark, f"{path}/{CURRENT}")
    fs_rename(spark, tmp, f"{path}/{CURRENT}")


def write_commit_marker(spark: SparkSession, path: str, build_id: str) -> None:
    """1-row ``commit/`` parquet written LAST within a build or
    generation: a load verifies commit.build_id == meta.build_id, so a
    build that crashed anywhere mid-way reads as "incomplete", never
    as a silently mixed-generation structure. mode=overwrite is safe:
    any pre-existing marker belongs to a superseded generation and was
    already deleted on the overwrite path; on a fresh build the meta
    write has already enforced errorifexists for the structure as a
    whole."""
    tiny_local_df(spark, [(build_id,)], "build_id string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/commit")


# ---------------------------------------------------------------------------
# Single-writer tripwires. The maintenance contract has always been
# "one writer per index; no compaction concurrent with an ingest" —
# but a contract that fails SILENTLY when violated is a trap: a
# serving compaction racing a streaming ingest would sweep the
# ingest's generation, with the epoch markers (which claim the
# batches committed) swept along with it and the stream's checkpoint
# already advanced — permanent, invisible data loss. These helpers
# make the violation loud from both sides:
#   - ingest jobs CLAIM the index (create-exclusive `.INGEST_ACTIVE`
#     at the LOGICAL root, held for the job's lifetime, released in
#     the job's finally — so it also rejects a second concurrent
#     ingest on the same index);
#   - compaction/migration REFUSE while the claim exists
#     (`force=True` overrides after a hard-killed ingest left a stale
#     claim — the error names that recovery);
#   - each ingest batch re-checks AFTER its commit marker lands that
#     the serving pointer still names the generation it appended to,
#     failing the batch (checkpoint does not advance; replay under
#     the new generation classifies the ids and re-appends) instead
#     of committing into a dead generation.
# The compaction side additionally re-checks the claim AND the live
# generation's file counts immediately before the pointer swap
# (`assert_no_late_writers`): an ingest that claimed after the entry
# check and committed a batch is detected (any committed batch adds
# files to every compacted dir) and the swap aborts with the live
# generation untouched. What remains unprovable on a filesystem
# without compare-and-swap: an ingest whose claim + first committed
# batch BOTH land inside the sub-second gap between that final check
# and the pointer rename — physically implausible (a batch commit is
# several Spark jobs), and on the ingest side the post-marker
# stability check covers the symmetric ordering. Honest contract:
# single-writer is still the rule; these tripwires make any realistic
# violation loud rather than making concurrency safe.
# ---------------------------------------------------------------------------

INGEST_ACTIVE = ".INGEST_ACTIVE"


def claim_index_for_ingest(spark: SparkSession, path: str, tag: str) -> str:
    """Exclusively claim ``path`` (logical root) for a streaming
    ingest. Raises when another claim is live — a concurrent ingest,
    or a stale claim from a hard-killed job (delete the marker or
    pass the compactor ``force=True`` after confirming nothing runs).
    The marker records the claim's UTC timestamp and a per-run nonce
    alongside the tag so a refused maintenance run can judge staleness
    from the error alone (a claim hours older than the ingest cadence
    is a corpse). Returns the full claim TOKEN; pass it to
    ``release_index_ingest_claim(owner_token=...)`` — ownership is the
    exact token, not the tag, because tags are deterministic (job name
    + path): after a force-clean + same-job restart, a tag match could
    not tell the hung predecessor from its live successor, and the
    predecessor's finally-block release would delete the successor's
    claim."""
    import datetime as _dt

    stamp = _dt.datetime.now(_dt.timezone.utc).isoformat(timespec="seconds")
    marker = f"{path.rstrip('/')}/{INGEST_ACTIVE}"
    token = f"{tag} nonce={uuid.uuid4().hex[:12]} claimed_at={stamp}"
    try:
        fs_write_text_exclusive(spark, marker, token)
    except FileExistsError:
        # read the competing marker ONCE; if it was released in the
        # race window the message must not tell the operator to delete
        # a marker that no longer exists
        holder = fs_read_text(spark, marker)
        if holder is None:
            raise RuntimeError(
                f"index at {path} was claimed by a concurrent ingest "
                "job whose claim was released while this one was being "
                "refused — retry the claim"
            ) from None
        raise RuntimeError(
            f"index at {path} is already claimed by an ingest job "
            f"({holder}); if that job was killed "
            f"without cleanup, delete {marker} to release the claim"
        ) from None
    return token


def release_index_ingest_claim(
    spark: SparkSession, path: str, owner_token: str | None = None
) -> None:
    """Release the claim. With ``owner_token`` (the exact token
    ``claim_index_for_ingest`` returned), delete only the claim this
    job wrote — an unconditional delete from a job's finally block
    would remove a SUCCESSOR's claim when this job's own marker was
    force-cleaned and another ingest (possibly the same job restarted,
    with the same deterministic tag) claimed in between; a tag-prefix
    match could not tell those apart."""
    marker = f"{path.rstrip('/')}/{INGEST_ACTIVE}"
    if owner_token is not None:
        cur = fs_read_text(spark, marker)
        if cur != owner_token:
            return
    fs_delete(spark, marker)


def release_claim_if_proven_stale(
    spark: SparkSession, path: str, entry_tag: str | None
) -> bool:
    """Post-run corpse cleanup for FORCED serving compactions: the
    run's pre-swap file-count check proved no ingest wrote anything
    for the run's whole duration, so a claim whose content is still
    byte-identical to what entry observed demonstrably did nothing —
    delete it so the next legitimate ingest can claim. A claim whose
    content changed belongs to a new job and is left alone."""
    if entry_tag is None:
        return False
    marker = f"{path.rstrip('/')}/{INGEST_ACTIVE}"
    if fs_read_text(spark, marker) == entry_tag:
        fs_delete(spark, marker)
        return True
    return False


def refuse_if_ingest_active(
    spark: SparkSession, path: str, what: str, force: bool
) -> str | None:
    """Refuse (or, with ``force``, bypass) a live ingest claim.
    Returns the claim content observed, for the caller's post-run
    corpse cleanup. ``force`` only BYPASSES — it must not delete the
    marker here: if the operator's "nothing is running" judgement was
    wrong, deleting a LIVE claim would let a second ingest claim the
    index and run concurrently with the first, voiding the exclusivity
    this marker exists for. The serving compactions instead release
    the claim AFTER their pre-swap file-count check proves it made no
    writes during the entire run (``assert_no_late_writers`` +
    unchanged content — a corpse by demonstration, not assertion)."""
    marker = f"{path.rstrip('/')}/{INGEST_ACTIVE}"
    tag = fs_read_text(spark, marker)
    if tag is None:
        return None
    if not force:
        raise RuntimeError(
            f"{what}: index at {path} is claimed by a live ingest job "
            f"({tag}) — compacting now would strand its appends in a "
            f"swept generation. Wait for the ingest to drain, or if it "
            f"was killed without cleanup delete {marker} (or pass "
            "force=True)"
        )
    return tag


def serving_root_report(spark: SparkSession, path: str) -> dict:
    """Report-only root observations for fsck on a serving-layout
    root, classified against the CURRENT generation's mtime:

    - ``superseded_generation``: the newest generation OLDER than
      current — the DELIBERATE reader grace ``keep_previous`` retains,
      present after every healthy compaction, not a finding;
    - ``generation_debris``: older-than-current generations beyond
      that one — leftovers the next successful compaction sweeps;
    - ``orphaned_generations``: generations NEWER than current —
      partial builds from a crashed or swap-aborted compaction (the
      pre-swap tripwire deliberately leaves these), also swept by the
      next successful run. Anchoring on current's mtime matters: a
      naive newest-is-grace rule would hide exactly these as healthy
      while mislabelling the real grace as debris;
    - ``ingest_claim``: the claim tag if one exists (maybe live, maybe
      a corpse — fsck reports rather than judges; the tag carries its
      claimed_at timestamp for that triage).

    Recency comes from directory mtimes with the name as tiebreak
    (gen names are random hex, deliberately unordered). Caveat: some
    object stores synthesize directory mtimes (prefixes have none), so
    treat the split as ADVISORY there — the authoritative liveness
    signal is always the ``CURRENT`` pointer, and every listed
    generation is equally safe to leave for the next compaction's
    sweep."""
    p = path.rstrip("/")
    out: dict = {}
    claim = fs_read_text(spark, f"{p}/{INGEST_ACTIVE}")
    if claim is not None:
        out["ingest_claim"] = claim
    cur = fs_read_text(spark, f"{p}/{CURRENT}")
    if cur is not None:
        cur = cur.strip()
        cur_mtime = fs_mtime(spark, f"{p}/{cur}")
        older, newer = [], []
        for n in sorted(
            n for n in fs_list_names(spark, p) if GEN_RE.match(n) and n != cur
        ):
            m = fs_mtime(spark, f"{p}/{n}")
            (older if m <= cur_mtime else newer).append((m, n))
        if older:
            older.sort()
            out["superseded_generation"] = older[-1][1]
            if len(older) > 1:
                out["generation_debris"] = [n for _, n in older[:-1]]
        if newer:
            newer.sort()
            out["orphaned_generations"] = [n for _, n in newer]
    return out


def fs_now_ms(spark: SparkSession, root: str) -> float:
    """The filesystem's own notion of "now": the mtime of a probe file
    written under ``root`` this instant. GC ages its candidates by
    comparing THEIR mtimes against this reference instead of the
    driver's ``time.time()`` — on HDFS/S3 a driver/store clock skew
    silently shrinks (or inflates) the ``min_age_sec`` margin that
    protects a concurrently-staging compaction, while a same-store
    probe keeps both sides of the age comparison on one clock. The
    probe is deleted immediately; its dotted name is invisible to the
    generation regex either way."""
    probe = f"{root}/.gc_clock_probe"
    fs_write_text(spark, probe, "clock probe — safe to delete")
    try:
        return float(fs_mtime(spark, probe))
    finally:
        fs_delete(spark, probe)


def gc_serving_root(
    spark: SparkSession,
    path: str,
    min_age_sec: float = 3600.0,
    force: bool = False,
) -> dict:
    """Delete the crash debris ``serving_root_report`` only REPORTS:
    aged older-than-grace generations (``generation_debris``) and
    newer-than-CURRENT orphans (``orphaned_generations``, crashed or
    swap-aborted compactions). Without a sweep these accumulate
    forever on a root whose compactions keep failing — the 1.35-2x
    storage grace is only "until the next compaction" if something
    actually runs the sweep.

    Safety envelope (the same reasoning the serving compaction's own
    post-swap sweep relies on, minus the just-swapped knowledge):

    - NEVER the CURRENT generation, NEVER the one-generation reader
      grace (``superseded_generation``) — classification is anchored
      on CURRENT's mtime exactly like the fsck report;
    - refuses under a live ``.INGEST_ACTIVE`` claim unless ``force``
      — not because an ingest writes into debris (it appends into
      CURRENT), but because a claim means a writer is active and GC
      must stay single-writer like every other maintenance op;
    - only deletes dirs whose mtime is at least ``min_age_sec`` old
      (default 1 h): a CONCURRENT serving compaction stages its new
      generation as a newer-than-CURRENT dir before the pointer swap,
      and an age gate is what keeps a scheduler mishap (gc and
      compaction overlapping) from sweeping a build mid-flight. Run
      GC from the same single-writer maintenance schedule as
      compaction; the age gate is the belt to that suspender. Ages
      against the FILESYSTEM'S clock (``fs_now_ms`` probe-file
      mtime), not the driver's — driver/store clock skew on HDFS/S3
      would silently shrink this margin.

    Returns ``{"deleted": [...], "retained_young": [...],
    "kept_current": name, "kept_grace": name | None}``. Works on any
    serving-layout root (ANN or bucket index — the generation layout
    is shared); raises on a flat-layout path."""
    p = path.rstrip("/")
    entry_claim = refuse_if_ingest_active(spark, p, "gc_serving_root", force)
    cur = fs_read_text(spark, f"{p}/{CURRENT}")
    if cur is None:
        raise ValueError(
            f"gc_serving_root: {path} is not a serving-layout root "
            "(no CURRENT pointer) — nothing to sweep; flat layouts are "
            "compacted in place"
        )
    report = serving_root_report(spark, p)
    sweepable = list(report.get("generation_debris", [])) + list(
        report.get("orphaned_generations", [])
    )
    now_ms = fs_now_ms(spark, p)
    deleted, retained_young = [], []
    for n in sweepable:
        # mtime 0 = a synthesized directory status (object-store
        # prefixes) — unknown age is RETAINED, never "infinitely aged"
        m = fs_mtime(spark, f"{p}/{n}")
        if m > 0 and (now_ms - m) / 1000 >= min_age_sec:
            fs_delete(spark, f"{p}/{n}")
            deleted.append(n)
        else:
            retained_young.append(n)
    out = {
        "deleted": deleted,
        "retained_young": retained_young,
        "kept_current": cur.strip(),
        "kept_grace": report.get("superseded_generation"),
    }
    if entry_claim is not None:
        out["bypassed_claim"] = entry_claim
    return out


def assert_generation_stable(
    spark: SparkSession, path: str, resolved_root: str
) -> None:
    """Raise when the live generation of ``path`` is no longer
    ``resolved_root`` — an ingest batch calls this AFTER its commit
    marker lands, so a pointer swap mid-ingest fails the batch loudly
    (checkpoint holds; replay lands in the new generation) instead of
    committing into a generation the next compaction sweeps."""
    live = resolve_serving_root(spark, path)
    if live.rstrip("/") != resolved_root.rstrip("/"):
        raise RuntimeError(
            f"index at {path}: generation changed mid-ingest "
            f"(appended into {resolved_root}, live is now {live}) — a "
            "compaction or migration ran concurrently with this ingest "
            "in violation of the single-writer contract. This batch is "
            "NOT committed; restart the ingest (replay re-classifies "
            "the batch against the live generation) and keep "
            "maintenance off the index while it runs"
        )


def assert_no_late_writers(
    spark: SparkSession,
    cur: str,
    report: dict,
    what: str,
    entry_claim: str | None = None,
    marker_root: str | None = None,
) -> None:
    """Pre-swap guard for the serving compactions: re-check the ingest
    claim AND that no data/marker files were added to the live
    generation since the snapshot (any committed ingest batch adds at
    least one file to each compacted dir). Closes the entry-check
    TOCTOU: an ingest that claims after compaction started would
    otherwise commit batches into the generation the swap is about to
    supersede — its rows swept with the old generation while the
    stream's checkpoint has advanced. An abort here leaves the live
    generation untouched and the new one orphaned (swept by the next
    successful run). Residual window: a full claim+append+marker cycle
    landing entirely between this check and the pointer rename —
    multiple Spark jobs inside a sub-second metadata gap, and the
    claim check at the INGEST side (assert_generation_stable, after
    its marker) covers that ordering too.

    ``entry_claim`` is the claim content a FORCED run bypassed at
    entry: that exact content is tolerated here too (same corpse, not
    a new writer); any OTHER claim — appeared, or changed content —
    is a job that started mid-compaction and aborts the swap.

    ``marker_root`` is where the ``.INGEST_ACTIVE`` claim lives; it
    defaults to ``parent(cur)`` (the serving layout, where ``cur`` is
    a generation dir under the logical root). The in-place compactors
    pass the logical root explicitly because on a FLAT layout
    ``parent(cur)`` would point ABOVE the index."""
    p = marker_root if marker_root is not None else parent(cur)
    marker = f"{p.rstrip('/')}/{INGEST_ACTIVE}"
    now_claim = fs_read_text(spark, marker)
    if now_claim is not None and now_claim != entry_claim:
        raise RuntimeError(
            f"{what} (pre-swap): index at {p} was claimed by an ingest "
            f"job ({now_claim}) after this compaction started — "
            "aborting the swap; the live generation is untouched. "
            "Re-run after the ingest drains"
        )
    for d, stats in report.items():
        if not isinstance(stats, dict) or "files_before" not in stats:
            continue
        now = len(spark.read.parquet(f"{cur}/{d}").inputFiles())
        if now != stats["files_before"]:
            raise RuntimeError(
                f"{what}: {cur}/{d} gained files since the compaction "
                f"snapshot ({stats['files_before']} -> {now}) — an ingest "
                "ran concurrently in violation of the single-writer "
                "contract. The live generation is untouched and still "
                "current; the orphaned new generation will be swept by "
                "the next successful compaction. Re-run after the "
                "ingest drains"
            )


def migrate_root_to_serving(
    spark: SparkSession, path: str, validate, force: bool = False
) -> str:
    """One-time, resumable migration of a flat-layout structure into
    the serving layout: validate the flat structure, move every
    artifact dir into a fresh ``gen-<id>/``, then write the
    ``CURRENT`` pointer. Per-directory renames are atomic, so a crash
    mid-migration leaves a partial generation WITHOUT a pointer —
    re-running detects it and finishes moving the remaining dirs (the
    flat structure stays loadable until ``meta`` itself moves, and the
    pointer — what readers trust — appears only once everything is in
    place). Single-writer op; do not run under live traffic (that is
    what the migration buys you for every compaction AFTER it).

    ``validate(spark, path)`` is the loader that must succeed before
    and after the move — each structure passes its own (the
    generation/pointer mechanics are layout-agnostic)."""
    p = path.rstrip("/")
    refuse_if_ingest_active(spark, p, "migrate_index_to_serving", force)
    if fs_read_text(spark, f"{p}/{CURRENT}") is not None:
        raise ValueError(f"index at {path} is already in the serving layout")
    partial = [n for n in fs_list_names(spark, p) if GEN_RE.match(n)]
    if len(partial) > 1:
        raise RuntimeError(
            f"index at {path}: multiple pointer-less generation dirs "
            f"({partial}) — cannot tell which migration to resume; "
            "delete the incomplete one(s) manually"
        )
    if partial:
        gen_name = partial[0]  # resume a crashed migration
    else:
        validate(spark, p)  # refuse to migrate a broken index
        gen_name = f"gen-{uuid.uuid4().hex[:12]}"
    gen_path = f"{p}/{gen_name}"
    # The destination parent must exist BEFORE the renames: HDFS's
    # rename returns false (-> fs_rename raises) on a missing parent,
    # and the local FS only succeeds via Hadoop's copy+delete fallback,
    # which forfeits the per-directory atomicity this crash contract
    # relies on. mkdirs is idempotent, so the resume path is unaffected.
    fs_mkdirs(spark, gen_path)
    for n in fs_list_names(spark, p):
        if GEN_RE.match(n) or n == CURRENT or n.startswith("."):
            continue
        fs_rename(spark, f"{p}/{n}", f"{gen_path}/{n}")
    write_current_pointer(spark, p, gen_name)
    validate(spark, p)  # end-to-end: pointer resolves, index valid
    return gen_path


# ---------------------------------------------------------------------------
# Staged sorted compaction + epoch-marker swap: shared by every
# structure's compactor (ANN codes/lists, dedup bands, cluster logs).
# ---------------------------------------------------------------------------


def compact_sorted(
    spark: SparkSession,
    src: str,
    staging: str,
    sort_cols: list,
    target_files: int | None,
    partition_col: str | None = None,
) -> tuple[int, int, int]:
    """Rewrite ``src`` into ``staging`` as ``target_files`` files,
    range-partitioned + sorted on ``sort_cols``. Returns (rows,
    files_before, files_after). The row count is asserted unchanged by
    the caller BEFORE any swap — a compaction that drops rows must
    never replace live data. ``partition_col`` preserves a hive-
    partitioned layout (the bucket indexes' point-probe ``bp`` key):
    the range partitioning leads with it so each task holds contiguous
    partition values and writes ~one file per directory, keeping the
    total near max(target_files, #partitions)."""
    df = spark.read.parquet(src)
    n_rows = df.count()
    files_before = len(df.inputFiles())
    if target_files is None:
        # narrow int/string tables: ~4M rows/file keeps files in the
        # tens-of-MB range; never EXPAND the file count
        target_files = max(1, min(files_before, (n_rows + 3_999_999) // 4_000_000))
    cols = ([partition_col] if partition_col else []) + sort_cols
    out = df.repartitionByRange(target_files, *cols).sortWithinPartitions(*cols)
    writer = out.write
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(staging)
    staged = spark.read.parquet(staging)
    if staged.count() != n_rows:
        fs_delete(spark, staging)
        raise RuntimeError(
            f"compact: staged rewrite of {src} changed the row count — "
            "refusing to swap. The live table is untouched"
        )
    return n_rows, files_before, len(staged.inputFiles())


def restore_markers_if_crashed(spark: SparkSession, path: str) -> None:
    """Recover the epoch-marker table from a swap that crashed between
    renames: live dir absent + backup present -> rename the backup
    back. Run at compaction start, BEFORE the staging wipe — the
    backup deliberately lives OUTSIDE the staging dir precisely so a
    crashed swap's only marker copy survives that wipe (the old
    staged-copy design silently lost it there)."""
    live, old = f"{path}/ingest_epochs", f"{path}/.ingest_epochs.old"
    if (
        try_read_parquet(spark, live) is None
        and try_read_parquet(spark, old) is not None
    ):
        fs_delete(spark, live)  # an empty husk dir would block the rename
        fs_rename(spark, old, live)


def swap_in_markers(spark: SparkSession, path: str, staged: str) -> None:
    """Rename-first marker swap: live -> hidden backup, staged -> live,
    then drop the backup. A crash between the renames leaves the full
    marker copy in the backup (restored by
    ``restore_markers_if_crashed`` on the next run) instead of as the
    staging dir's only copy, which the next compaction's startup wipe
    would silently delete. Losing markers is benign (replay falls back
    to bands/codes classification) but silent loss is not — this keeps
    the loss-free invariant without widening the dark window: markers
    have no commit protection by design."""
    live, old = f"{path}/ingest_epochs", f"{path}/.ingest_epochs.old"
    fs_delete(spark, old)  # stale backup from a completed prior swap
    fs_rename(spark, live, old)
    fs_rename(spark, staged, live)
    fs_delete(spark, old)
