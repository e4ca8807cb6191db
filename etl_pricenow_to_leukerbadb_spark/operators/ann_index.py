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
                id_col, vec_col, build_id) — the build parameters, so
                search never has to guess them and a mismatched caller
                fails loudly instead of computing garbage distances.
    commit/     1-row parquet: (build_id) — written LAST. A load
                verifies commit.build_id == meta.build_id, so a build
                that crashed anywhere mid-way (fresh OR overwrite)
                reads as "incomplete", never as a silently
                mixed-generation index (old codes under a new
                codebook).
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

import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fs import (
    fs_copy,
    fs_delete,
    parent,
    fs_exists,
    fs_list_names,
    fs_mkdirs,
    fs_mtime,
    fs_read_text,
    fs_rename,
    fs_write_text,
    fs_write_text_exclusive,
    try_read_parquet,
)
from ..session import tiny_local_df
from .similarity import (
    _RESIDUAL_LUT_ROW_BUDGET,
    _pq_codebook,
    ivf_list_assign,
    ivf_pq_search,
    ivf_residuals,
    kmeans_centroids_2iter,
    pq_adc_search,
    pq_assign_codes,
    trained_pq_codebook,
)

_META_COLS = ("n_subspaces", "sub_dim", "n_codes", "id_col", "vec_col")


# Layout decisions MUST go through Spark's filesystem, never
# ``os.path`` — the index lives wherever ``spark.write`` put it
# (HDFS/S3 in production), and a driver-local check is silently False
# there, which turns "append to both tables" into "append to one",
# the exact corruption this module exists to prevent. The helpers
# were promoted to ``..fs`` so the parquet merge sinks share them;
# the private aliases keep this module's call sites (and its public
# test seam) stable.
_try_read_parquet = try_read_parquet
_fs_delete = fs_delete
_fs_rename = fs_rename


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    overwrite: bool = False,
    train: bool = False,
    _commit: bool = True,
    _meta_vec_elem_type: str | None = None,
    _meta_residual: bool = False,
) -> str:
    """Quantize the corpus and persist the PQ index under ``path``.

    One pass over the raw vectors (the ``pq_assign_codes`` broadcast
    argmin — no data-sized shuffle) plus a dimension-sized codebook
    write. ``overwrite=False`` (default) refuses to clobber an
    existing index — rebuilds are deliberate, not accidental.

    ``train=True`` swaps the fixed id-seeded codebook for
    ``trained_pq_codebook`` (one deterministic Lloyd refinement per
    subspace — better-centered codes, measurably higher recall at the
    same search cost). Everything downstream is codebook-agnostic:
    search loads whatever codebook was persisted, and appends
    quantize deltas against it frozen, so the flag exists only at
    build time.

    Crash safety is generation-tokened: every build stamps a fresh
    ``build_id`` into meta and writes a 1-row ``commit`` marker LAST;
    ``load_pq_index`` requires the two to agree. An overwrite rebuild
    deletes the old commit marker (and any stale IVFADC artifacts —
    a plain-PQ rebuild over an IVFADC path must not leave old
    inverted lists pointing at new codes) BEFORE touching anything,
    so a crash at any point leaves the index loudly unloadable
    instead of silently pairing old codes with a new codebook.
    Returns the ``build_id``. ``_commit=False`` is internal for
    ``build_ivfpq_index``, which writes the marker after its own
    artifacts; ``_meta_vec_elem_type`` / ``_meta_residual`` likewise —
    a residual IVFADC build passes the RESIDUAL table as ``corpus``
    here, but meta must record the RAW corpus's element type (it
    defines the ingest stream schema) and flag the codes as
    residual-encoded so every later reader scores them in the right
    coordinate frame."""
    build_id = uuid.uuid4().hex
    mode = "overwrite" if overwrite else "errorifexists"
    spark = corpus.sparkSession
    if overwrite:
        for sub in ("commit", "ivf_meta", "centroids", "lists"):
            _fs_delete(spark, f"{path}/{sub}")
    # the COLUMN TYPES ride in meta too: a streaming ingest must read
    # its delta with exactly the corpus's id / vector-element types, or
    # the appended parquet files carry a different physical type than
    # the existing ones (schema-merge failures or silent widening on
    # later reads). Names alone cannot reconstruct that.
    meta = tiny_local_df(
        spark,
        [
            (
                n_subspaces,
                sub_dim,
                n_codes,
                id_col,
                vec_col,
                build_id,
                train,
                corpus.schema[id_col].dataType.simpleString(),
                _meta_vec_elem_type
                or corpus.schema[vec_col].dataType.elementType.simpleString(),
                _meta_residual,
            )
        ],
        "n_subspaces int, sub_dim int, n_codes int, id_col string, "
        "vec_col string, build_id string, trained boolean, "
        "id_type string, vec_elem_type string, residual boolean",
    )
    # meta first: a crashed build leaves meta without a commit marker,
    # which load_pq_index turns into a clean "incomplete build" error
    # rather than a silently param-less or mixed-generation index
    meta.coalesce(1).write.mode(mode).parquet(f"{path}/meta")
    if train:
        cb = trained_pq_codebook(
            corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes
        )
    else:
        cb = _pq_codebook(corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes)
    cb.write.mode(mode).parquet(f"{path}/codebook")
    # assign against the PERSISTED codebook (read back, not the
    # in-memory plan): for train=True the codebook is itself a
    # two-stage aggregate, and re-deriving it inside the assignment
    # plan would recompute it per-partition; the written parquet is
    # the broadcast-sized artifact searches will use anyway, so codes
    # are quantized against byte-identical entries
    cb_disk = spark.read.parquet(f"{path}/codebook")
    pq_assign_codes(
        corpus, id_col, vec_col, n_subspaces, sub_dim, n_codes, codebook=cb_disk
    ).select(id_col, "subspace", "code").write.mode(mode).parquet(f"{path}/codes")
    if _commit:
        _write_commit(spark, path, build_id)
    return build_id


def _write_commit(spark: SparkSession, path: str, build_id: str) -> None:
    # mode=overwrite is safe here: any pre-existing marker belongs to
    # a superseded generation and was already deleted on the overwrite
    # path; on a fresh build the meta write above has already enforced
    # errorifexists for the index as a whole
    tiny_local_df(spark, [(build_id,)], "build_id string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/commit")


# ---------------------------------------------------------------------------
# Serving layout: pointer indirection for zero-downtime compaction.
#
# The flat layout keeps the artifacts directly under `path/` and
# compacts IN PLACE (`compact_index`): correct, but not reader-isolated
# — a search planned before the swap holds file paths the swap removes
# (FileNotFound), and one planned during the dark window fails the
# commit-marker check. The serving layout removes both failure modes:
# artifacts live under `path/gen-<id>/`, a tiny `path/CURRENT` text
# marker names the live generation, readers resolve the pointer at
# plan time, and `compact_index_serving` compacts a COPY into a new
# generation and atomically swaps the pointer. Old-generation FILES
# stay on disk until the NEXT compaction (one-generation grace), so a
# search planned against the previous generation keeps streaming its
# own files untouched. Cost of the isolation: the small artifacts
# (meta/codebook/centroids, broadcast-sized) are copied per compaction
# and two generations of codes/lists coexist between compactions —
# ~2x index storage at the compaction cadence, the standard
# MVCC-layout rent (measured in SCALE.md).
# ---------------------------------------------------------------------------

_CURRENT = "CURRENT"
_GEN_RE = re.compile(r"^gen-[0-9a-f]{12}$")


def _resolve_index_root(spark: SparkSession, path: str) -> str:
    """The directory the index artifacts actually live in: the live
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
        gen = fs_read_text(spark, f"{p}/{_CURRENT}")
        if gen is not None:
            gen = gen.strip()
            gen_path = f"{p}/{gen}"
            if _GEN_RE.match(gen) and fs_exists(spark, gen_path):
                return gen_path
        elif not any(_GEN_RE.match(n) for n in fs_list_names(spark, p)):
            return p
        time.sleep(0.05)
    raise RuntimeError(
        f"index at {path}: CURRENT pointer missing or naming an absent "
        "generation after retries — a pointer swap crashed mid-flight; "
        "restore CURRENT to point at the newest complete generation"
    )


def _write_current(spark: SparkSession, path: str, gen_name: str) -> None:
    """Swap the generation pointer: stage the new marker, then
    delete + rename. The sub-millisecond pointer-absent window is
    covered by the resolver's retry; the data dirs themselves are
    never touched, which is the whole point of the indirection."""
    tmp = f"{path}/.CURRENT.next"
    fs_write_text(spark, tmp, gen_name)
    fs_delete(spark, f"{path}/{_CURRENT}")
    fs_rename(spark, tmp, f"{path}/{_CURRENT}")


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
# (`_assert_no_late_writers`): an ingest that claimed after the entry
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

_INGEST_ACTIVE = ".INGEST_ACTIVE"


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
    marker = f"{path.rstrip('/')}/{_INGEST_ACTIVE}"
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
    marker = f"{path.rstrip('/')}/{_INGEST_ACTIVE}"
    if owner_token is not None:
        cur = fs_read_text(spark, marker)
        if cur != owner_token:
            return
    fs_delete(spark, marker)


def _release_claim_if_proven_stale(
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
    marker = f"{path.rstrip('/')}/{_INGEST_ACTIVE}"
    if fs_read_text(spark, marker) == entry_tag:
        fs_delete(spark, marker)
        return True
    return False


def _refuse_if_ingest_active(
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
    writes during the entire run (``_assert_no_late_writers`` +
    unchanged content — a corpse by demonstration, not assertion)."""
    marker = f"{path.rstrip('/')}/{_INGEST_ACTIVE}"
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


def _root_report(spark: SparkSession, path: str) -> dict:
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
    claim = fs_read_text(spark, f"{p}/{_INGEST_ACTIVE}")
    if claim is not None:
        out["ingest_claim"] = claim
    cur = fs_read_text(spark, f"{p}/{_CURRENT}")
    if cur is not None:
        cur = cur.strip()
        cur_mtime = fs_mtime(spark, f"{p}/{cur}")
        older, newer = [], []
        for n in sorted(
            n for n in fs_list_names(spark, p) if _GEN_RE.match(n) and n != cur
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


def _fs_now_ms(spark: SparkSession, root: str) -> float:
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
    """Delete the crash debris ``_root_report`` only REPORTS: aged
    older-than-grace generations (``generation_debris``) and
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
      against the FILESYSTEM'S clock (``_fs_now_ms`` probe-file
      mtime), not the driver's — driver/store clock skew on HDFS/S3
      would silently shrink this margin.

    Returns ``{"deleted": [...], "retained_young": [...],
    "kept_current": name, "kept_grace": name | None}``. Works on any
    serving-layout root (ANN or bucket index — the generation layout
    is shared); raises on a flat-layout path."""
    p = path.rstrip("/")
    entry_claim = _refuse_if_ingest_active(spark, p, "gc_serving_root", force)
    cur = fs_read_text(spark, f"{p}/{_CURRENT}")
    if cur is None:
        raise ValueError(
            f"gc_serving_root: {path} is not a serving-layout root "
            "(no CURRENT pointer) — nothing to sweep; flat layouts are "
            "compacted in place"
        )
    report = _root_report(spark, p)
    sweepable = list(report.get("generation_debris", [])) + list(
        report.get("orphaned_generations", [])
    )
    now_ms = _fs_now_ms(spark, p)
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
    live = _resolve_index_root(spark, path)
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


def _assert_no_late_writers(
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
    marker = f"{p.rstrip('/')}/{_INGEST_ACTIVE}"
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


def migrate_index_to_serving(
    spark: SparkSession, path: str, _validate=None, force: bool = False
) -> str:
    """One-time, resumable migration of a flat-layout index into the
    serving layout: validate the flat index, move every artifact dir
    into a fresh ``gen-<id>/``, then write the ``CURRENT`` pointer.
    Per-directory renames are atomic, so a crash mid-migration leaves
    a partial generation WITHOUT a pointer — re-running detects it and
    finishes moving the remaining dirs (the flat index stays loadable
    until ``meta`` itself moves, and the pointer — what readers trust —
    appears only once everything is in place). Single-writer op; do
    not run under live traffic (that is what the migration buys you
    for every compaction AFTER it).

    ``_validate(spark, path)`` is the loader that must succeed before
    and after the move — defaults to ``load_pq_index``; the dedup
    bucket indexes pass their own loaders through their ``migrate_*``
    wrappers (the generation/pointer mechanics are layout-agnostic)."""
    if _validate is None:
        _validate = load_pq_index
    p = path.rstrip("/")
    _refuse_if_ingest_active(spark, p, "migrate_index_to_serving", force)
    if fs_read_text(spark, f"{p}/{_CURRENT}") is not None:
        raise ValueError(f"index at {path} is already in the serving layout")
    partial = [n for n in fs_list_names(spark, p) if _GEN_RE.match(n)]
    if len(partial) > 1:
        raise RuntimeError(
            f"index at {path}: multiple pointer-less generation dirs "
            f"({partial}) — cannot tell which migration to resume; "
            "delete the incomplete one(s) manually"
        )
    if partial:
        gen_name = partial[0]  # resume a crashed migration
    else:
        _validate(spark, p)  # refuse to migrate a broken index
        gen_name = f"gen-{uuid.uuid4().hex[:12]}"
    gen_path = f"{p}/{gen_name}"
    # The destination parent must exist BEFORE the renames: HDFS's
    # rename returns false (-> fs_rename raises) on a missing parent,
    # and the local FS only succeeds via Hadoop's copy+delete fallback,
    # which forfeits the per-directory atomicity this crash contract
    # relies on. mkdirs is idempotent, so the resume path is unaffected.
    fs_mkdirs(spark, gen_path)
    for n in fs_list_names(spark, p):
        if _GEN_RE.match(n) or n == _CURRENT or n.startswith("."):
            continue
        fs_rename(spark, f"{p}/{n}", f"{gen_path}/{n}")
    _write_current(spark, p, gen_name)
    _validate(spark, p)  # end-to-end: pointer resolves, index valid
    return gen_path


def compact_index_serving(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    keep_previous: bool = True,
    force: bool = False,
) -> dict:
    """Reader-isolated compaction: compact a COPY of the live
    generation into a new ``gen-<id>/`` and atomically swap the
    ``CURRENT`` pointer — searches planned before, during, or after
    the swap all succeed (pytest-gated), because no file a reader can
    hold a reference to is deleted.

    Same rewrite semantics as ``compact_index`` (codes id-sorted +
    range-partitioned, lists by id, epoch markers to one file, row
    counts verified BEFORE the pointer moves); the small artifacts
    (meta/codebook/centroids/ivf_meta) are byte-copied. The new
    generation's commit marker is written LAST within the generation,
    and the pointer swap happens only after it — a crash anywhere
    leaves ``CURRENT`` on the old, fully-intact generation, and the
    orphaned partial generation is swept by the next successful run's
    cleanup.

    ``keep_previous=True`` (default) retains the superseded generation
    until the NEXT compaction, giving in-flight readers a full
    compaction interval to finish — the doubled storage is the rent
    for zero-downtime (SCALE.md). Generations older than that are
    deleted here. Single-writer per index, and not concurrent with a
    streaming ingest (whose appends would land in the generation it
    resolved at job start) — ingest claims are refused unless
    ``force=True`` bypasses (hard-killed-job recovery: the bypassed
    claim is released at the END of the run, once the pre-swap
    file-count check has proven it wrote nothing — a live claim the
    operator misjudged as stale keeps its exclusivity and aborts the
    swap the moment it writes)."""
    p = path.rstrip("/")
    entry_claim = _refuse_if_ingest_active(
        spark, p, "compact_index_serving", force
    )
    cur_name = fs_read_text(spark, f"{p}/{_CURRENT}")
    if cur_name is None:
        raise ValueError(
            f"index at {path} is in the flat layout — run "
            "migrate_index_to_serving() once, or use compact_index() "
            "in a maintenance window"
        )
    cur_name = cur_name.strip()
    cur = f"{p}/{cur_name}"
    _, _, params = load_pq_index(spark, cur)  # validates marker + geometry
    id_col = params["id_col"]
    new_name = f"gen-{uuid.uuid4().hex[:12]}"
    new = f"{p}/{new_name}"

    report: dict = {}
    children = fs_list_names(spark, cur)
    rows, fb, fa = _compact_sorted(
        spark, f"{cur}/codes", f"{new}/codes", [id_col, "subspace"], target_files
    )
    report["codes"] = {"rows": rows, "files_before": fb, "files_after": fa}
    if "lists" in children and "ivf_meta" in children:
        rows, fb, fa = _compact_sorted(
            spark, f"{cur}/lists", f"{new}/lists", [id_col], target_files
        )
        report["lists"] = {"rows": rows, "files_before": fb, "files_after": fa}
    if "ingest_epochs" in children:
        rows, fb, fa = _compact_sorted(
            spark,
            f"{cur}/ingest_epochs",
            f"{new}/ingest_epochs",
            ["query_id", "epoch_id"],
            1,
        )
        report["ingest_epochs"] = {
            "rows": rows,
            "files_before": fb,
            "files_after": fa,
        }
    for n in children:
        if n in ("codes", "lists", "ingest_epochs", "commit") or n.startswith("."):
            continue
        fs_copy(spark, f"{cur}/{n}", f"{new}/{n}")
    if "build_id" in params:
        _write_commit(spark, new, params["build_id"])  # completes the gen
    _assert_no_late_writers(
        spark, cur, report, "compact_index_serving", entry_claim
    )
    _write_current(spark, p, new_name)
    keep = {new_name} | ({cur_name} if keep_previous else set())
    for n in fs_list_names(spark, p):
        if _GEN_RE.match(n) and n not in keep:
            fs_delete(spark, f"{p}/{n}")
    # the run just PROVED the bypassed claim wrote nothing for its
    # whole duration — release the corpse so the next ingest can claim
    if _release_claim_if_proven_stale(spark, p, entry_claim):
        report["stale_claim_released"] = entry_claim
    report["generation"] = {"previous": cur_name, "current": new_name}
    return report


# Per-process handle cache: the small immutable-within-a-generation
# artifacts (meta params, codebook plan, IVF geometry) keyed by
# (application, resolved path). A cache HIT is validated by re-reading
# the 1-row commit marker and comparing build_id — one tiny driver job
# instead of the 3-5 (meta collect, commit collect, codebook count,
# ivf_meta collect, centroids count) a cold load runs — so at serving
# QPS the per-search driver overhead drops without weakening the crash
# contract: any rebuild writes a new build_id (miss -> full re-check),
# a crashed build has no matching marker (miss -> the loud load error),
# and repair/compaction keep build_id but only rewrite codes/lists,
# which are ALWAYS re-read fresh per call (appends must be visible, so
# the big-table file listing is never cached). Legacy indexes without
# a build_id cannot be validated and bypass the cache entirely.
_HANDLE_CACHE: dict[tuple, dict] = {}


def _cache_key(spark: SparkSession, path: str) -> tuple:
    return (spark.sparkContext.applicationId, path)


def invalidate_index_handles(path: str | None = None) -> None:
    """Drop cached handles (all, or those for one resolved path) —
    test seam and escape hatch; normal invalidation is the build_id
    check on every hit."""
    if path is None:
        _HANDLE_CACHE.clear()
        return
    p = path.rstrip("/")
    for k in [k for k in _HANDLE_CACHE if k[1] == p]:
        _HANDLE_CACHE.pop(k, None)


def load_pq_index(
    spark: SparkSession, path: str, use_cache: bool = True
) -> tuple[DataFrame, DataFrame, dict]:
    """Load (codes, codebook, params) from a ``build_pq_index`` path.

    Validates (a) that the commit marker exists and its build_id
    matches meta's — a crashed fresh build has no marker, a crashed
    OVERWRITE rebuild has the old generation's marker under the new
    meta, and both must read as "incomplete", never as an index whose
    codes and codebook come from different builds — and (b) that the
    codebook row count matches the persisted parameters
    (n_subspaces x n_codes), the cheap structural check that catches
    a half-written or hand-edited index before a search silently
    computes distances against missing codes.

    Format compatibility: indexes persisted before the generation-token
    format (meta without a ``build_id`` column, no ``commit/``) load
    through the structural codebook-count check alone — the legacy
    format cannot distinguish a crashed build from a complete one, so
    the stronger guarantee starts at the first rebuild, without forcing
    one.

    Serving-layout roots (``migrate_index_to_serving``) resolve their
    ``CURRENT`` pointer here, so every search path reads the live
    generation transparently. ``use_cache=True`` (default) serves the
    small artifacts from the validated per-process handle cache (see
    ``_HANDLE_CACHE``); the codes table is re-read fresh either way."""
    path = _resolve_index_root(spark, path)
    key = _cache_key(spark, path)
    if use_cache and key in _HANDLE_CACHE:
        cached = _HANDLE_CACHE[key]
        commit = _try_read_parquet(spark, f"{path}/commit")
        rows = commit.collect() if commit is not None else []
        if len(rows) == 1 and rows[0]["build_id"] == cached["build_id"]:
            codes = spark.read.parquet(f"{path}/codes")
            return codes, cached["codebook"], dict(cached["params"])
        _HANDLE_CACHE.pop(key, None)  # superseded or crashed generation
    meta_rows = spark.read.parquet(f"{path}/meta").collect()
    if len(meta_rows) != 1 or set(_META_COLS) - set(meta_rows[0].asDict()):
        raise ValueError(f"load_pq_index: malformed meta at {path}/meta")
    params = meta_rows[0].asDict()
    if "build_id" in params:
        commit = _try_read_parquet(spark, f"{path}/commit")
        commit_rows = commit.collect() if commit is not None else []
        if len(commit_rows) != 1 or commit_rows[0]["build_id"] != params.get(
            "build_id"
        ):
            raise ValueError(
                f"load_pq_index: index at {path} has no matching commit "
                "marker — the build (or an overwrite rebuild) crashed "
                "before completing, and the artifacts may mix generations. "
                "Rebuild with overwrite=True"
            )
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
    if use_cache and "build_id" in params:
        _HANDLE_CACHE[key] = {
            "build_id": params["build_id"],
            "codebook": codebook,
            "params": dict(params),
        }
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
    from scratch with the build's parameters (pytest-gated).

    Refuses a residual-encoded IVFADC layout: its codes quantize
    ``vector - coarse centroid``, and plain ADC would score them
    against the RAW query's lookup table — every distance silently
    shifted by the centroid term, confidently wrong neighbors. Use
    ``search_ivfpq_index``, which reconstructs the per-list frame."""
    codes, codebook, params = load_pq_index(spark, path)
    if params.get("residual"):
        raise ValueError(
            f"search_pq_index: the index at {path} is residual-encoded "
            "(build_ivfpq_index(residual=True)) — its codes quantize "
            "vector - coarse centroid, which a plain ADC scan would "
            "score in the wrong coordinate frame. Search it with "
            "search_ivfpq_index instead"
        )
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

    Guards, each failing loudly instead of corrupting searches, and
    each scoped to the DELTA's ids so that per-append cost is flat in
    index size (a streaming ingest calls this every micro-batch; an
    O(full index) sweep per small append is the wrong place for
    whole-index hygiene — that lives in ``fsck_index``, run on a
    schedule):

    - delta vectors must cover the index geometry (short/NULL vectors
      would append NULL-code rows whose undercounted ADC sums wrongly
      PROMOTE the vector);
    - delta ids must be internally unique and disjoint from the
      index's code table (duplicates double-count in every ADC sum) —
      skippable with ``assume_new_ids=True`` when the ingest
      guarantees fresh ids. The probe into the existing tables is
      range-pruned on the delta's [min, max] id before the semi-join,
      so log-structured ingests with monotonically increasing ids skip
      nearly every parquet row group via min/max statistics — the scan
      cost tracks the OVERLAP, not the index;
    - on an IVFADC layout the delta is ALSO probed against lists/:
      ids already listed but absent from codes are a prior append that
      crashed between its lists and codes writes, and the natural
      recovery is retrying the same delta — those ids are anti-joined
      OUT of the lists append (retry is idempotent and REPAIRS the
      half-append; the old codes-first order made retry fail loudly,
      and before that guard existed a retry silently duplicated list
      rows, doubling adc_dist_fp for exactly those ids at search
      time);
    - a post-append invariant over the delta's ids verifies exactly
      n_subspaces code rows per id and (IVFADC) exactly one list row
      per id with no duplicates — so a replayed
      ``assume_new_ids=True`` append that double-writes still fails
      loudly here instead of poisoning searches."""
    spark = delta.sparkSession
    # appends land in the CURRENT generation of a serving-layout index
    # (resolved once; do not compact concurrently with an append)
    path = _resolve_index_root(spark, path)
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
    # One delta-sized aggregate always runs: internal-duplicate check
    # plus the delta's [min, max] id range, which prunes every probe
    # into the existing tables below (parquet row-group min/max stats
    # skip non-overlapping files — for sorted ingest ids that is nearly
    # the whole index; a bloom filter on id would prune unsorted
    # ingests too, at the cost of maintaining it per append).
    dstats = delta.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.min(F.col(id_col)).alias("lo"),
        F.max(F.col(id_col)).alias("hi"),
    ).collect()[0]
    n_delta, lo, hi = dstats["n"], dstats["lo"], dstats["hi"]
    if dstats["n"] != dstats["nd"]:
        raise ValueError(
            f"append_to_pq_index: delta contains {dstats['n'] - dstats['nd']} "
            "internally duplicated id(s) — each would emit duplicate code "
            "rows and double-count in every ADC sum. Deduplicate the delta"
        )

    def _delta_scope(table: DataFrame) -> DataFrame:
        """Range-prune, then keep only rows whose id is in the delta."""
        return table.filter(F.col(id_col).between(F.lit(lo), F.lit(hi))).join(
            delta.select(F.col(id_col)), id_col, "left_semi"
        )

    if not assume_new_ids:
        # semi-join from the delta into the (range-pruned) code table:
        # catches collisions with the EXISTING index; the aggregate
        # above caught internal duplicates. Neither alone covers both.
        n_dup = (
            delta.select(F.col(id_col))
            .join(
                codes.filter(F.col(id_col).between(F.lit(lo), F.lit(hi))),
                id_col,
                "left_semi",
            )
            .count()
        )
        if n_dup:
            raise ValueError(
                f"append_to_pq_index: {n_dup} delta id(s) already exist in "
                f"the index at {path} — appending would double-count their "
                "code rows in every ADC sum. Deduplicate the delta (or pass "
                "assume_new_ids=True only when ids are provably fresh)"
            )
    # An IVFADC index (build_ivfpq_index layout) must ALSO extend the
    # inverted lists: search_ivfpq_index inner-joins codes to lists, so
    # codes-only appends would be silently invisible to IVFADC search
    # (while plain PQ search over the same path saw them). Layout
    # detection goes through Spark's filesystem (_try_read_parquet) —
    # an os.path probe is driver-local and silently False on HDFS/S3,
    # which would reintroduce exactly that corruption one layer up.
    ivf_meta = _try_read_parquet(spark, f"{path}/ivf_meta")
    if ivf_meta is not None:
        # lists BEFORE codes: the two appends cannot be atomic across
        # directories, and this order makes the crash window benign —
        # a list row whose id has no codes yet is invisible to BOTH
        # search paths (PQ scans codes; IVFADC inner-joins codes to
        # lists). The natural recovery from a crash in that window is
        # RETRYING the same delta, so retry must be idempotent: delta
        # ids already present in lists/ (they passed the codes
        # disjointness check above, so they can only be a prior
        # half-append of this delta) are anti-joined out of the lists
        # append — the retry then completes the codes side and repairs
        # the index instead of duplicating list rows, which would
        # silently double adc_dist_fp for exactly those ids at search
        # time. Under assume_new_ids=True the anti-join still runs
        # (it is what makes crash-retry safe); only the codes
        # disjointness semi-join is skipped.
        n_centroids = ivf_meta.collect()[0]["n_centroids"]
        centroids = spark.read.parquet(f"{path}/centroids")
        lists_now = _try_read_parquet(spark, f"{path}/lists")
        # assign the FULL delta against the frozen coarse quantizer
        # once: the lists append below filters it, and a residual
        # layout also needs the assignment for ids anti-joined OUT of
        # that append (their prior half-append wrote list rows, and
        # the frozen quantizer makes the recomputed cent_id identical)
        assign_full = ivf_list_assign(
            delta, id_col, vec_col, n_centroids, centroids=centroids
        ).select(id_col, "cent_id")
        to_list = assign_full
        if lists_now is not None:
            to_list = assign_full.join(
                lists_now.filter(
                    F.col(id_col).between(F.lit(lo), F.lit(hi))
                ),
                id_col,
                "left_anti",
            )
        to_list.write.mode("append").parquet(f"{path}/lists")
    # a residual layout quantizes the delta's RESIDUALS against the
    # frozen coarse quantizer — same frame the build encoded in, so
    # append-then-search stays bit-identical to a full rebuild
    to_code = delta
    if params.get("residual"):
        if ivf_meta is None:
            raise ValueError(
                f"append_to_pq_index: meta at {path} says residual-encoded "
                "but ivf_meta/ is missing — the coarse quantizer the codes "
                "were built against is gone. The index is corrupt; rebuild "
                "with build_ivfpq_index(..., residual=True, overwrite=True)"
            )
        to_code = ivf_residuals(delta, assign_full, centroids, id_col, vec_col)
    new_codes = pq_assign_codes(
        to_code,
        id_col,
        vec_col,
        params["n_subspaces"],
        params["sub_dim"],
        params["n_codes"],
        codebook=codebook,
    ).select(id_col, "subspace", "code")
    new_codes.write.mode("append").parquet(f"{path}/codes")
    # Post-append invariant over the DELTA's ids only (range-pruned
    # semi-join — per-append cost tracks the delta, not the index): a
    # partially-committed append (crash during job commit) leaves some
    # of THESE vectors with fewer than n_subspaces code rows, which
    # searches would read as undercounted ADC sums. A violation names
    # the recovery instead of poisoning every later search.
    # Whole-index hygiene (ids outside this delta) is fsck_index's job.
    cstats = (
        _delta_scope(spark.read.parquet(f"{path}/codes"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.count(
                F.when(F.col("n") != params["n_subspaces"], F.lit(1))
            ).alias("bad"),
        )
        .collect()[0]
    )
    if cstats["bad"] or cstats["n_ids"] != n_delta:
        raise RuntimeError(
            f"append_to_pq_index: delta ids in {path}/codes are incomplete "
            f"after the append ({cstats['bad']} with a partial code set, "
            f"{cstats['n_ids']}/{n_delta} present) — the append crashed "
            "mid-commit. Retry the append, or rebuild with "
            "build_pq_index(..., overwrite=True) before searching"
        )
    if ivf_meta is not None:
        # the delta's lists rows must be exactly one per id with no
        # duplicates: count(*) == count_distinct(id) == n_delta. This
        # is what catches a replayed assume_new_ids=True append that
        # double-wrote list rows — count(*) doubles while the distinct
        # count does not — as well as a crash between this append's
        # lists and codes writes on the NEXT retry.
        lstats = (
            _delta_scope(spark.read.parquet(f"{path}/lists"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col(id_col)).alias("n_ids"),
            )
            .collect()[0]
        )
        if lstats["n_rows"] != lstats["n_ids"] or lstats["n_ids"] != n_delta:
            raise RuntimeError(
                f"append_to_pq_index: inverted lists at {path} carry "
                f"{lstats['n_rows']} rows over {lstats['n_ids']} distinct "
                f"delta id(s) (expected {n_delta} of each) — a replayed or "
                "crashed append left duplicates or gaps. Rebuild the index "
                "with build_ivfpq_index(..., overwrite=True) before "
                "searching"
            )


def fsck_index(
    spark: SparkSession, path: str, strict: bool = True, repair: bool = False
) -> dict:
    """Whole-index consistency sweep — the scheduled-maintenance
    counterpart of ``append_to_pq_index``'s delta-scoped guards.

    The per-append guards deliberately verify only the ids just
    written (flat cost per micro-batch); this sweep is the O(index)
    pass that catches anything outside a delta's scope — partial code
    sets from a crash no one retried, duplicated list rows from a
    replayed ``assume_new_ids=True`` append, and codes/lists id-set
    disagreement on an IVFADC layout. Run it on a schedule (or before
    promoting an index to serving), not per append.

    Returns a report dict:
        ``n_ids`` distinct ids in codes/, ``partial_code_ids`` ids with
        != n_subspaces code rows, and for IVFADC layouts
        ``n_list_ids``, ``dup_list_rows`` (rows beyond one per id) and
        ``codes_lists_id_mismatch`` (distinct-id count disagreement).
    ``strict=True`` (default) raises RuntimeError on any violation,
    naming the recovery.

    ``repair=True`` prunes the violations in place instead of raising
    (see :func:`repair_index`) and adds its ``repair`` sub-report; the
    post-repair state is re-verified strictly. Repair is the CHEAP
    recovery: a rewrite of the narrow codes/lists tables, never a
    re-quantization of the corpus — at billion-vector scale that is
    the difference between minutes and a full rebuild.

    On a serving-layout root the report also carries the root's
    non-violation observations (``_root_report``): orphaned
    generation dirs (crash debris the next successful serving
    compaction sweeps) and a live/stale ``.INGEST_ACTIVE`` claim —
    report-only, since a claim may be a legitimately running ingest
    and an orphan is benign until disk pressure says otherwise."""
    root_report = _root_report(spark, path)
    path = _resolve_index_root(spark, path)
    codes, _, params = load_pq_index(spark, path)
    id_col = params["id_col"]
    cstats = (
        codes.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.count(
                F.when(F.col("n") != params["n_subspaces"], F.lit(1))
            ).alias("bad"),
        )
        .collect()[0]
    )
    report = {
        "n_ids": cstats["n_ids"],
        "partial_code_ids": cstats["bad"],
        **root_report,
    }
    if _try_read_parquet(spark, f"{path}/ivf_meta") is not None:
        lstats = (
            spark.read.parquet(f"{path}/lists")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col(id_col)).alias("n_ids"),
            )
            .collect()[0]
        )
        report["n_list_ids"] = lstats["n_ids"]
        report["dup_list_rows"] = lstats["n_rows"] - lstats["n_ids"]
        report["codes_lists_id_mismatch"] = lstats["n_ids"] != cstats["n_ids"]
    violations = report["partial_code_ids"] or report.get(
        "dup_list_rows"
    ) or report.get("codes_lists_id_mismatch")
    if violations and repair:
        report["repair"] = repair_index(spark, path)
        post = fsck_index(spark, path, strict=True, repair=False)
        report["post_repair"] = post
        return report
    if strict and violations:
        raise RuntimeError(
            f"fsck_index: index at {path} is inconsistent — {report}. "
            "A prior append crashed between the lists and codes writes "
            "(or a replayed append double-wrote). Run "
            "fsck_index(repair=True) to prune the offending ids (cheap: "
            "rewrites only the narrow code/list tables), or rebuild with "
            "overwrite=True, before searching"
        )
    return report


def repair_index(spark: SparkSession, path: str) -> dict:
    """Prune inconsistencies out of a persisted index WITHOUT
    re-quantizing: rewrite the narrow ``codes/`` (and ``lists/``)
    tables keeping only coherent ids, then swap them in.

    What gets repaired, and why pruning is sound:

    - **Identical duplicate rows** (a replayed ``assume_new_ids=True``
      append): code assignment is deterministic given the frozen
      codebook, so a double-append writes byte-identical rows —
      ``distinct()`` reconstructs the single-append state exactly.
    - **Partial code sets** (a crash during a codes file-commit): the
      id's surviving rows are a subset of one coherent assignment, but
      parquet cannot retract them in place — the id is DROPPED from
      the index entirely (codes and lists), which restores the
      "never appended" state; re-ingesting the same delta afterwards
      appends it cleanly (absent ids pass every guard).
    - **codes/lists id-set disagreement** (IVFADC crash between the
      lists and codes writes that nobody retried): only ids present
      in BOTH tables are kept — ``ivf_pq_search`` inner-joins the two,
      so a one-sided id is unsearchable dead weight either way.

    Crash safety mirrors the build path: the rewritten tables land in
    a hidden ``.repair/`` staging dir first, the commit marker is
    removed BEFORE the swap and re-written (same ``build_id`` — repair
    is not a new generation) only after it, so a crash mid-swap reads
    as "incomplete index" at the next load, never as a silently
    half-repaired one. Single-writer per index is the caller's
    contract, as with overwrite builds. (Repair itself loads through
    the strict marker check — repairing an UNcommitted index could
    "repair" mixed-generation artifacts into a coherent-looking lie —
    so a crash inside repair's own swap window, after the marker
    delete, needs a rebuild; that window is a handful of metadata ops,
    and the failure is loud.)

    Returns ``{"pruned_ids": n, "n_ids_before": n, "n_ids_after": n}``.
    Pruned ids are gone from the index — recover them by re-ingesting
    their vectors (the streaming path treats them as absent).

    When to repair vs rebuild, measured honestly (SCALE.md): at bench
    scale REBUILD is ~2x faster (64 k vectors: 3.2 s vs 6.3 s) —
    repair's ~20 small jobs (detect, prune, swap, re-verify) dominate
    while re-quantizing 64 k vectors is trivial. Repair wins where it
    matters: (a) its data volume is the narrow code/list ints
    (~40 B/vector) vs the rebuild's raw-float read (4·dim B/vector)
    PLUS the O(N x n_subspaces x n_codes) assignment compute, so the
    ratio inverts as N grows past the fixed-overhead regime; (b)
    repair needs NO raw corpus at all — a rebuild must re-assemble the
    exact vector snapshot, which at the billion-vector target means
    re-reading 25x the bytes repair touches, from tables that may be
    cold or already compacted away."""
    path = _resolve_index_root(spark, path)
    codes, _, params = load_pq_index(spark, path)
    id_col = params["id_col"]
    n_sub = int(params["n_subspaces"])
    staging = f"{path}/.repair"
    _fs_delete(spark, staging)  # stale from a prior crashed repair

    codes = codes.select(id_col, "subspace", "code").distinct()
    complete = (
        codes.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == F.lit(n_sub))
        .select(id_col)
    )
    ivfadc = _try_read_parquet(spark, f"{path}/ivf_meta") is not None
    if ivfadc:
        lists = (
            spark.read.parquet(f"{path}/lists")
            .select(id_col, "cent_id")
            .distinct()
        )
        keep = complete.join(lists.select(id_col), id_col, "left_semi")
    else:
        keep = complete
    n_before = codes.select(id_col).distinct().count()
    codes.join(keep, id_col, "left_semi").write.parquet(f"{staging}/codes")
    if ivfadc:
        lists.join(keep, id_col, "left_semi").write.parquet(f"{staging}/lists")
    n_after = spark.read.parquet(f"{staging}/codes").select(id_col).distinct().count()

    # the dark window: no commit marker -> any load fails loudly
    if "build_id" in params:
        _fs_delete(spark, f"{path}/commit")
    _fs_delete(spark, f"{path}/codes")
    _fs_rename(spark, f"{staging}/codes", f"{path}/codes")
    if ivfadc:
        _fs_delete(spark, f"{path}/lists")
        _fs_rename(spark, f"{staging}/lists", f"{path}/lists")
    _fs_delete(spark, staging)
    if "build_id" in params:
        _write_commit(spark, path, params["build_id"])
    return {
        "pruned_ids": n_before - n_after,
        "n_ids_before": n_before,
        "n_ids_after": n_after,
    }


def _compact_sorted(
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
        _fs_delete(spark, staging)
        raise RuntimeError(
            f"compact: staged rewrite of {src} changed the row count — "
            "refusing to swap. The live table is untouched"
        )
    return n_rows, files_before, len(staged.inputFiles())


def _restore_markers_if_crashed(spark: SparkSession, path: str) -> None:
    """Recover the epoch-marker table from a swap that crashed between
    renames: live dir absent + backup present -> rename the backup
    back. Run at compaction start, BEFORE the staging wipe — the
    backup deliberately lives OUTSIDE the staging dir precisely so a
    crashed swap's only marker copy survives that wipe (the old
    staged-copy design silently lost it there)."""
    live, old = f"{path}/ingest_epochs", f"{path}/.ingest_epochs.old"
    if (
        _try_read_parquet(spark, live) is None
        and _try_read_parquet(spark, old) is not None
    ):
        _fs_delete(spark, live)  # an empty husk dir would block the rename
        _fs_rename(spark, old, live)


def _swap_in_markers(spark: SparkSession, path: str, staged: str) -> None:
    """Rename-first marker swap: live -> hidden backup, staged -> live,
    then drop the backup. A crash between the renames leaves the full
    marker copy in the backup (restored by
    ``_restore_markers_if_crashed`` on the next run) instead of as the
    staging dir's only copy, which the next compaction's startup wipe
    would silently delete. Losing markers is benign (replay falls back
    to bands/codes classification) but silent loss is not — this keeps
    the loss-free invariant without widening the dark window: markers
    have no commit protection by design."""
    live, old = f"{path}/ingest_epochs", f"{path}/.ingest_epochs.old"
    _fs_delete(spark, old)  # stale backup from a completed prior swap
    _fs_rename(spark, live, old)
    _fs_rename(spark, staged, live)
    _fs_delete(spark, old)


def compact_index(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    force: bool = False,
) -> dict:
    """Compact a streaming-ingested index's small files — the
    scheduled-maintenance pass the ingest jobs defer to (each
    micro-batch appends one small file to ``codes/`` — plus ``lists/``
    on IVFADC — and one marker file to ``ingest_epochs/``; at a
    batch-per-minute cadence that is ~43k files/directory/month, and
    both the file-listing and the footer reads of every later search
    and append-guard probe scale with that count).

    The rewrite is also a SORT: codes by (id, subspace), lists by id,
    range-partitioned so each output file covers a disjoint id range.
    That makes the append guards' range-pruned probes (``[min, max]``
    of the delta before the semi-join) actually skip files via parquet
    min/max statistics for ANY ingest order — the "log-structured ids
    prune everything" property, restored by maintenance even when the
    ingest ids arrived shuffled.

    Crash safety is ``repair_index``'s dance: staged rewrite under a
    hidden dir, row-count invariant checked BEFORE the swap, commit
    marker deleted first and re-written (same ``build_id`` — compaction
    is not a new generation) only after both directories swapped, so a
    crash anywhere reads as "incomplete index" loudly. The marker
    table is compacted LAST and outside the dark window: it has no
    commit protection, but losing markers is benign (replay falls back
    to the classification guard) while losing codes would not be.
    Single-writer per index is the caller's contract; do not run
    concurrently with an ingest job on the same path. Readers are not
    isolated either: a search PLANNED before the swap reads file paths
    that the swap removes (FileNotFound, loud), and a search planned
    DURING the dark window fails the marker check — run THIS variant in
    the same maintenance slot as ``fsck_index``, not under live query
    traffic. For zero-downtime compaction, migrate the index once with
    ``migrate_index_to_serving`` and use ``compact_index_serving``,
    which compacts a copy and swaps a pointer instead.

    Returns ``{"codes": {...}, "lists": {...}, "ingest_epochs":
    {...}}`` with rows / files_before / files_after per directory."""
    entry_claim = _refuse_if_ingest_active(spark, path, "compact_index", force)
    logical_root = path  # where the ingest claim lives, pre-resolution
    path = _resolve_index_root(spark, path)  # in-place compact of the live gen
    _, _, params = load_pq_index(spark, path)  # strict: marker must match
    id_col = params["id_col"]
    _restore_markers_if_crashed(spark, path)
    staging = f"{path}/.compact_stage"
    _fs_delete(spark, staging)  # stale from a prior crashed compaction

    report: dict = {}
    rows, fb, fa = _compact_sorted(
        spark, f"{path}/codes", f"{staging}/codes", [id_col, "subspace"], target_files
    )
    report["codes"] = {"rows": rows, "files_before": fb, "files_after": fa}
    ivfadc = _try_read_parquet(spark, f"{path}/ivf_meta") is not None
    if ivfadc:
        rows, fb, fa = _compact_sorted(
            spark, f"{path}/lists", f"{staging}/lists", [id_col], target_files
        )
        report["lists"] = {"rows": rows, "files_before": fb, "files_after": fa}

    # Pre-swap tripwire (the serving variants' guard, ported): a
    # forced run past a claim the operator misjudged as stale must
    # still ABORT if that ingest was actually alive — re-check the
    # claim and re-count the snapshot's source files; any delta means
    # committed batches the in-place swap below would sweep.
    # assert_generation_stable is a no-op on a flat layout (the root
    # resolves to itself), so this check is the only late-writer
    # defense the in-place path has.
    _assert_no_late_writers(
        spark, path, report, "compact_index", entry_claim,
        marker_root=logical_root,
    )

    # the dark window: no commit marker -> any load fails loudly
    if "build_id" in params:
        _fs_delete(spark, f"{path}/commit")
    _fs_delete(spark, f"{path}/codes")
    _fs_rename(spark, f"{staging}/codes", f"{path}/codes")
    if ivfadc:
        _fs_delete(spark, f"{path}/lists")
        _fs_rename(spark, f"{staging}/lists", f"{path}/lists")
    if "build_id" in params:
        _write_commit(spark, path, params["build_id"])

    markers = _try_read_parquet(spark, f"{path}/ingest_epochs")
    if markers is not None:
        rows, fb, fa = _compact_sorted(
            spark,
            f"{path}/ingest_epochs",
            f"{staging}/ingest_epochs",
            ["query_id", "epoch_id"],
            1,
        )
        _swap_in_markers(spark, path, f"{staging}/ingest_epochs")
        report["ingest_epochs"] = {
            "rows": rows,
            "files_before": fb,
            "files_after": fa,
        }
    _fs_delete(spark, staging)
    return report


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
    train: bool = False,
    residual: bool = False,
) -> str:
    """Persist the full IVFADC index: the PQ artifacts plus
    ``centroids/`` (cent_id, __cent — the coarse quantizer, always
    broadcast-sized) and ``lists/`` (<id_col>, cent_id — the inverted-
    list assignment). Two linear passes over the corpus (PQ argmin +
    IVF argmax, both broadcast aggregations), zero data-sized
    shuffles; everything a search needs afterwards except the raw
    vectors for the final re-rank.

    ``train=True`` trains BOTH quantizers deterministically: the
    coarse centroids via ``kmeans_centroids_2iter`` (one Lloyd
    refinement of the id seeds under cosine — the composition
    ``emb_kmeans_assign`` was designed to slot into) and the PQ
    codebook via ``trained_pq_codebook``. Search and append are
    quantizer-agnostic — they load whatever tables were persisted —
    so the flag changes index QUALITY (recall at equal probe cost),
    never the search contract.

    ``residual=True`` persists the classic IVFADC encoding: PQ codes
    (and the codebook, trained or fixed) are computed over
    ``vector - assigned coarse centroid`` (``ivf_residuals``) instead
    of raw vectors — the same code bytes describe within-list variance
    only, the standard recall lever at identical storage. The flag is
    stamped into meta; ``search_ivfpq_index`` reads it back so a
    search always scores codes in the coordinate frame they were
    encoded in, ``append_to_pq_index`` residualizes deltas against the
    frozen quantizers, and plain ``search_pq_index`` REFUSES the
    layout (raw-query ADC over residual codes is confidently wrong).
    Build order differs from the raw path — centroids and lists land
    first because the codes derive from them — but the commit marker
    still lands last, so a crash anywhere leaves the index loudly
    unloadable, never mixed-frame."""
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
    spark = corpus.sparkSession
    if residual:
        # Residual build order: the codes DERIVE from the coarse
        # quantizer, so ivf_meta + centroids + lists land first, then
        # the PQ artifacts over the residual table, then the commit
        # marker — same loud-until-committed property, different
        # dependency order. The overwrite cleanup happens HERE (not in
        # build_pq_index, which would delete the just-written IVF
        # artifacts): the commit marker goes first so a crashed
        # rebuild reads as incomplete, never as the old generation.
        if overwrite:
            for sub in (
                "commit", "meta", "codebook", "codes",
                "ivf_meta", "centroids", "lists",
            ):
                _fs_delete(spark, f"{path}/{sub}")
        mode = "errorifexists"
        tiny_local_df(spark, [(n_centroids,)], "n_centroids int").coalesce(
            1
        ).write.mode(mode).parquet(f"{path}/ivf_meta")
        if train:
            cents = kmeans_centroids_2iter(
                corpus, id_col, vec_col, n_centroids
            ).select("cent_id", "__cent")
        cents.write.mode(mode).parquet(f"{path}/centroids")
        # persisted-artifact discipline (same as the codebook): assign
        # lists and residualize against the centroids read BACK from
        # disk, so codes are encoded against byte-identical entries to
        # what every later search's probe and query-residual will use
        cents_disk = spark.read.parquet(f"{path}/centroids")
        ivf_list_assign(
            corpus, id_col, vec_col, n_centroids, centroids=cents_disk
        ).select(id_col, "cent_id").write.mode(mode).parquet(f"{path}/lists")
        resid = ivf_residuals(
            corpus,
            spark.read.parquet(f"{path}/lists"),
            cents_disk,
            id_col,
            vec_col,
        )
        build_id = build_pq_index(
            resid,
            path,
            id_col,
            vec_col,
            n_subspaces,
            sub_dim,
            n_codes,
            overwrite=False,  # this path already cleaned the dir
            train=train,
            _commit=False,
            # meta records the RAW corpus element type (it defines the
            # ingest stream schema), not the residual table's double
            _meta_vec_elem_type=corpus.schema[
                vec_col
            ].dataType.elementType.simpleString(),
            _meta_residual=True,
        )
        _write_commit(spark, path, build_id)
        return build_id
    # _commit=False: the marker must land only after the IVF artifacts
    # below, so a crash mid-IVF-write leaves the whole index loudly
    # unloadable rather than a "complete" PQ index with half an IVFADC
    # layout beside it
    build_id = build_pq_index(
        corpus,
        path,
        id_col,
        vec_col,
        n_subspaces,
        sub_dim,
        n_codes,
        overwrite,
        train=train,
        _commit=False,
    )
    mode = "overwrite" if overwrite else "errorifexists"
    n_cent = tiny_local_df(spark, [(n_centroids,)], "n_centroids int")
    n_cent.coalesce(1).write.mode(mode).parquet(f"{path}/ivf_meta")
    if train:
        cents = kmeans_centroids_2iter(
            corpus, id_col, vec_col, n_centroids
        ).select("cent_id", "__cent")
    cents.write.mode(mode).parquet(f"{path}/centroids")
    # same persisted-artifact discipline as the codebook: assign the
    # lists against the centroids read back from disk, so trained
    # (multi-stage-aggregate) centroids are computed once and the
    # lists are exactly what a search's coarse probe will see
    ivf_list_assign(
        corpus,
        id_col,
        vec_col,
        n_centroids,
        centroids=spark.read.parquet(f"{path}/centroids"),
    ).select(id_col, "cent_id").write.mode(mode).parquet(f"{path}/lists")
    _write_commit(spark, path, build_id)
    return build_id


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    n_probe: int = 4,
    k: int = 5,
    rerank_factor: int = 20,
    lut_row_budget: int | None = _RESIDUAL_LUT_ROW_BUDGET,
    chunk_oversized: bool = False,
) -> DataFrame:
    """Top-k IVFADC over a persisted index: coarse-probe the persisted
    centroid table, ADC-scan only the probed lists of the persisted
    code table, exact-re-rank the shortlist against ``corpus`` raw
    vectors. Bit-identical to ``ivf_pq_topk`` run from scratch with
    the build's parameters (pytest-gated). ``lut_row_budget`` bounds a
    residual layout's per-probed-list query LUT broadcast — see
    ``ivf_pq_search`` for the |Q| x n_probe x m x k sizing and the
    exact query-chunking recipe the guard prints (or pass
    ``chunk_oversized=True`` to run that recipe automatically)."""
    path = _resolve_index_root(spark, path)
    codes, codebook, params = load_pq_index(spark, path)
    # the IVF geometry is immutable within a generation; piggyback on
    # the handle cache entry load_pq_index just validated (same
    # build_id check covers it — a rebuild evicts the whole entry)
    cached = _HANDLE_CACHE.get(_cache_key(spark, path))
    if cached is not None and "centroids" in cached:
        centroids = cached["centroids"]
    else:
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
        if cached is not None:
            cached["centroids"] = centroids
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
        # meta-stamped at build time: codes must be scored in the
        # coordinate frame they were encoded in (legacy meta → raw)
        residual=bool(params.get("residual") or False),
        lut_row_budget=lut_row_budget,
        chunk_oversized=chunk_oversized,
    )
