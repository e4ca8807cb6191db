"""Persisted near-dup (MinHash+LSH) index: build once, check deltas
against it forever.

The in-memory dedup operators (``dd_minhash_lsh`` and friends)
re-minhash the whole corpus on every call — the right shape for an
oracle-checkable query, not for the production contract at 100 TB:
there the corpus grows by a daily delta, and "is anything in today's
delta a near-dup of the existing corpus?" must cost O(delta), never
O(corpus). This module is the dedup-family analog of
``operators/ann_index.py``: the LSH blocking structure (the banded
bucket table) is materialized to parquet next to the data, deltas are
minhashed alone and probed against it by bucket equi-join, and
accepted deltas append their buckets so tomorrow's delta sees them.

Layout under ``path/``:

    meta/    1-row parquet: (k_shingle, n_hashes, bands, id_col,
             text_col, id_type, build_id) — the signature geometry
             plus column names/types. Probing with different
             parameters than the corpus was hashed with would
             silently produce incomparable buckets, so the geometry
             is persisted and never guessed; the id type lets a
             streaming ingest derive its schema from the index.
    commit/  1-row parquet: (build_id), written LAST — same
             generation-token contract as the ANN index (a crashed
             build or overwrite reads as "incomplete", loudly).
    bands/   (<id_col>, band, bucket) — the blocking structure,
             ``bands`` rows per document. THE scan side of every
             probe; narrow (id + small int + hex string), no text.

Why persist the BAND TABLE and not the signatures: a probe needs only
the bucket equi-join, and banding is a per-row expression — but
re-banding on every probe would re-read n_hashes hash columns to
reconstruct what is already known. The band table is the join-ready
form; signatures are derivable from text at append time for the delta
alone. (An operator needing raw signatures — e.g. signature-level
Jaccard estimation — recomputes them from text, which the corpus
tables keep anyway.)

Scale shape of a probe: minhash the delta (O(delta) shingling, one
per-id shuffle), then one shuffle join of ``bands x |delta|`` rows
against the bucket table on (band, bucket) — Catalyst dispatches a
broadcast join automatically when the delta is small. Hot buckets
(boilerplate documents) fan out exactly as the in-memory operator
does; the same ``bands``/``n_hashes`` sizing law applies (see
SCALE.md's LSH bits-per-table probe).

Reference analog: the twice-daily incremental upsert contract of
``scripts/pricenow_etl.py:329-358`` — new data integrated against
standing state without recomputing it.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import tiny_local_df
from .ann_index import _fs_delete, _try_read_parquet
from .dedup import band_table, minhash_signatures

_META_COLS = (
    "k_shingle",
    "n_hashes",
    "bands",
    "id_col",
    "text_col",
    "id_type",
    "build_id",
)


def build_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    n_hashes: int = 8,
    bands: int = 4,
    overwrite: bool = False,
) -> str:
    """Minhash + band the corpus and persist the bucket table under
    ``path``. Returns the generation ``build_id``.

    Same crash contract as ``build_pq_index``: meta (with the
    ``build_id``) first, data, then the 1-row ``commit`` marker LAST —
    a load of a crashed build fails loudly instead of probing a
    half-written bucket table (which would silently MISS duplicates,
    the worst failure mode a dedup gate can have)."""
    spark = docs.sparkSession
    build_id = uuid.uuid4().hex
    if overwrite:
        for sub in ("commit", "bands", "meta"):
            _fs_delete(spark, f"{path}/{sub}")
    mode = "overwrite" if overwrite else "errorifexists"
    # id_type persisted so a streaming ingest can derive its readStream
    # schema from the index instead of assuming one (an index over int
    # ids would otherwise get long-typed appends: schema-merge failures
    # or silent widening on later reads)
    id_type = docs.schema[id_col].dataType.simpleString()
    tiny_local_df(
        spark,
        [
            (
                int(k_shingle),
                int(n_hashes),
                int(bands),
                id_col,
                text_col,
                id_type,
                build_id,
            )
        ],
        "k_shingle int, n_hashes int, bands int, id_col string, "
        "text_col string, id_type string, build_id string",
    ).coalesce(1).write.mode(mode).parquet(f"{path}/meta")
    sigs = minhash_signatures(docs, id_col, text_col, k_shingle, n_hashes)
    band_table(sigs, id_col, n_hashes, bands).write.mode(mode).parquet(
        f"{path}/bands"
    )
    tiny_local_df(spark, [(build_id,)], "build_id string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/commit")
    return build_id


def load_dedup_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """Load (bands, params); verifies the commit marker's build_id
    matches meta's — the generation-token check."""
    meta_rows = spark.read.parquet(f"{path}/meta").collect()
    if len(meta_rows) != 1 or set(_META_COLS) - set(meta_rows[0].asDict()):
        raise ValueError(f"load_dedup_index: malformed meta at {path}/meta")
    params = meta_rows[0].asDict()
    commit = _try_read_parquet(spark, f"{path}/commit")
    commit_rows = commit.collect() if commit is not None else []
    if len(commit_rows) != 1 or commit_rows[0]["build_id"] != params["build_id"]:
        raise ValueError(
            f"load_dedup_index: index at {path} has no matching commit "
            "marker — the build (or an overwrite rebuild) crashed before "
            "completing. Rebuild with overwrite=True"
        )
    return spark.read.parquet(f"{path}/bands"), params


def query_dedup_candidates(
    spark: SparkSession,
    path: str,
    probe_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs between ``probe_docs`` (the delta) and
    the INDEXED corpus: ``(probe_id, corpus_id)`` rows sharing any
    band bucket, distinct. The signature geometry comes from the
    persisted meta — a probe can never hash with different parameters
    than the corpus did.

    Cost, stated precisely: O(delta) shingling/hashing, then ONE
    linear scan of the narrow band table (id + band + hex bucket — no
    text, no re-hashing) joined to the delta's buckets; with a small
    delta Catalyst broadcasts the probe side, so the corpus-sized
    table is never shuffled. The scan is linear in the CORPUS — that
    is inherent to bucket blocking (the index cannot know which
    buckets a future probe will carry) and it reads ~1% of the corpus
    bytes; what the index saves vs the in-memory operator is the
    corpus-sized SHINGLE+MINHASH pass, the dominant cost. The caller
    decides what a candidate means (drop, exact-verify via
    ``ngram_jaccard_pairs`` on the candidate ids, or route to review)
    — same contract as the in-memory ``lsh_candidate_pairs``.

    Probe ids that are ALSO already in the index match themselves
    (identical signature → identical buckets); callers probing with
    not-yet-appended ids need no self-pair filtering beyond the
    ``probe_id != corpus_id`` guard applied here."""
    bands_df, params = load_dedup_index(spark, path)
    id_col = params["id_col"]
    sigs = minhash_signatures(
        probe_docs, id_col, text_col, params["k_shingle"], params["n_hashes"]
    )
    probe_bands = band_table(
        sigs, id_col, params["n_hashes"], params["bands"]
    ).select(
        F.col(id_col).alias("probe_id"), "band", "bucket"
    )
    return (
        probe_bands.join(
            bands_df.select(
                F.col(id_col).alias("corpus_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .filter(F.col("probe_id") != F.col("corpus_id"))
        .select("probe_id", "corpus_id")
        .distinct()
    )


def fsck_dedup_index(
    spark: SparkSession, path: str, strict: bool = True, repair: bool = False
) -> dict:
    """Whole-index consistency sweep for the dedup index — scheduled
    maintenance, not a per-append tax (the append guard is
    delta-scoped).

    Every indexed id must carry exactly ``bands`` distinct
    (band, bucket) rows: fewer/more distinct rows = a partial append
    (crash during the bands file-commit), raw > distinct = a
    double-append's byte-identical duplicates (banding is
    deterministic under the frozen geometry). Report:
    ``n_ids``, ``dup_rows`` (raw minus distinct), ``partial_ids``
    (ids whose distinct row count != bands).

    ``repair=True`` prunes in place — ``distinct()`` reconstructs
    double-appends exactly, partial ids are dropped back to their
    never-appended state (re-ingest recovers them) — via the same
    staged-swap + commit-marker dance as the ANN index's
    ``repair_index``, then re-verifies strictly. One narrow table, no
    re-minhashing."""
    from .ann_index import _fs_rename

    bands_df, params = load_dedup_index(spark, path)
    id_col = params["id_col"]
    n_bands = int(params["bands"])
    per_id = bands_df.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_distinct(F.col("band"), F.col("bucket")).alias("n_distinct"),
    )
    stats = per_id.agg(
        F.count(F.lit(1)).alias("n_ids"),
        F.sum(F.col("n_raw") - F.col("n_distinct")).alias("dup_rows"),
        F.count(
            F.when(F.col("n_distinct") != F.lit(n_bands), F.lit(1))
        ).alias("partial_ids"),
    ).collect()[0]
    report = {
        "n_ids": stats["n_ids"],
        "dup_rows": int(stats["dup_rows"] or 0),
        "partial_ids": stats["partial_ids"],
    }
    violations = report["dup_rows"] or report["partial_ids"]
    if violations and repair:
        distinct = bands_df.select(id_col, "band", "bucket").distinct()
        keep = (
            distinct.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == F.lit(n_bands))
            .select(id_col)
        )
        staging = f"{path}/.repair"
        _fs_delete(spark, staging)
        distinct.join(keep, id_col, "left_semi").write.parquet(
            f"{staging}/bands"
        )
        n_after = (
            spark.read.parquet(f"{staging}/bands")
            .select(id_col)
            .distinct()
            .count()
        )
        _fs_delete(spark, f"{path}/commit")  # dark window: loads fail loudly
        _fs_delete(spark, f"{path}/bands")
        _fs_rename(spark, f"{staging}/bands", f"{path}/bands")
        _fs_delete(spark, staging)
        tiny_local_df(spark, [(params["build_id"],)], "build_id string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/commit")
        report["repair"] = {
            "pruned_ids": report["n_ids"] - n_after,
            "n_ids_after": n_after,
        }
        report["post_repair"] = fsck_dedup_index(
            spark, path, strict=True, repair=False
        )
        return report
    if strict and violations:
        raise RuntimeError(
            f"fsck_dedup_index: index at {path} is inconsistent — "
            f"{report}. A prior append crashed mid-commit or was "
            "double-applied. Run fsck_dedup_index(repair=True) to prune "
            "(cheap: one narrow-table rewrite, no re-minhashing), then "
            "re-ingest any pruned ids"
        )
    return report


def append_to_dedup_index(
    docs_delta: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Minhash ONLY the delta under the frozen geometry and append its
    buckets, so later probes see today's corpus.

    Disjointness guard (delta-scoped, same range-pruning shape as
    ``append_to_pq_index``): delta ids already present in ``bands/``
    are rejected loudly — a double-append would duplicate bucket rows,
    and although the probe's ``distinct()`` hides duplicates from
    RESULTS, they'd inflate the join fan-out forever. Appending is
    atomic per parquet job; a crashed append leaves partial bucket
    rows for some delta ids, which a RETRY of the same delta then
    reports — recovery is ``fsck_dedup_index(repair=True)`` (one
    narrow-table rewrite, no re-minhashing), then re-append.
    Exactly-once streaming ingest is ``stream_dedup_ingest_job``
    (epoch markers + this guard, mirroring the ANN index's)."""
    spark = docs_delta.sparkSession
    bands_df, params = load_dedup_index(spark, path)
    id_col = params["id_col"]
    dstats = docs_delta.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.min(F.col(id_col)).alias("lo"),
        F.max(F.col(id_col)).alias("hi"),
    ).collect()[0]
    if dstats["n"] == 0:
        return
    if dstats["n"] != dstats["nd"]:
        raise ValueError(
            "append_to_dedup_index: delta carries internally duplicated "
            f"ids ({dstats['n']} rows, {dstats['nd']} distinct) — each "
            "would double its bucket rows"
        )
    span = dstats
    n_existing = (
        bands_df.filter(
            F.col(id_col).between(F.lit(span["lo"]), F.lit(span["hi"]))
        )
        .join(docs_delta.select(id_col), id_col, "left_semi")
        .select(id_col)
        .distinct()
        .count()
    )
    if n_existing:
        raise ValueError(
            f"append_to_dedup_index: {n_existing} delta id(s) already "
            f"exist in {path}/bands — re-appending would duplicate their "
            "bucket rows and inflate every later probe's join fan-out. "
            "Probe first, append once"
        )
    sigs = minhash_signatures(
        docs_delta, id_col, text_col, params["k_shingle"], params["n_hashes"]
    )
    band_table(sigs, id_col, params["n_hashes"], params["bands"]).write.mode(
        "append"
    ).parquet(f"{path}/bands")
