"""Document deduplication operators for LLM-training-data pipelines.

Four families, all expressed as DataFrame compositions (no UDFs):

- **exact**: md5 fingerprint of normalized text, hash group-by.
- **MinHash + LSH**: word-shingle minhash signatures (min over
  seed-salted md5 hex strings — portable across engines), banded into
  LSH buckets; candidate pairs come from a bucket self-join.
- **n-gram Jaccard**: shingle inverted-index self-join with exact
  Jaccard on distinct-shingle sets.
- **SimHash**: 64-bit (16-nibble) bit-majority fingerprint over
  per-token md5s.

Scale notes: every pair-producing join is blocked (LSH buckets or
shared shingles), never a cross join; shingle explosion is the
dominant cost and shuffles once per group-by. For skewed buckets
(very common shingles), ``max_shingle_df`` caps inverted-index
fan-out the way production near-dup pipelines drop ubiquitous
shingles. Hash values are hex *strings* (md5) rather than engine
hashes so DuckDB oracles can reproduce them byte-for-byte.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation, functions as F

from ..functions.text import content_fingerprint, tokens, word_shingles
from ..sources.tables import fan_out

# NOTE on iteration overhead (measured, so nobody retries this): the
# contraction loops below run ~12 AQE stage-jobs per round at bench
# scale, and it is tempting to disable AQE for the rounds once the
# edge count is known to be tiny. Measured at sf0.1: one round is
# 0.9 s WITH AQE vs 1.8 s without — AQE's runtime broadcast-join
# conversion and partition coalescing beat the static SortMergeJoin
# plan even though the static plan schedules a third as many jobs.
# AQE stays on. A second tempting non-win, also measured: LAZY
# localCheckpoint(eager=False) to fold each round's materialization
# into its convergence-count job. Back-to-back at sf0.1 it is WORSE —
# median 8.3 s vs 4.7 s eager, with 2-3x the spread (16 s outliers):
# the lazily-registered blocks race the ContextCleaner and later
# rounds intermittently recompute pre-checkpoint lineage. Eager
# materialization per round is the stable plan; the extra driver job
# is noise next to that.


def iter_checkpoint(df: DataFrame, reliable: bool) -> DataFrame:
    """Per-round lineage truncation for iterative operators.

    ``reliable=False`` (default): ``localCheckpoint(eager=True)`` —
    executor-local blocks, zero extra I/O, materialized immediately so
    every later consumer (convergence count, exceptAll, next round)
    reads settled blocks. The right choice on a healthy cluster and in
    local mode, with the documented caveat that losing an executor
    loses its blocks and fails the query. (eager=False was measured
    slower AND noisier back-to-back — see the module NOTE above.)

    ``reliable=True``: ``checkpoint(eager=True)`` to the session's
    checkpoint directory (HDFS/S3 in production) — survives executor
    loss, which is the correct trade for many-round jobs on large
    clusters where the probability of losing SOME executor before
    convergence approaches 1. Costs one distributed write per round.
    The DataFrame is ``persist()``ed around the eager checkpoint so
    the write reads cached blocks instead of recomputing the round's
    whole lineage a second time (Spark's documented checkpoint
    behavior for unpersisted RDDs), and the cache is released HERE,
    immediately after the write — the data now lives in the
    checkpoint files, and unpersisting the *returned* DataFrame from
    caller code frees nothing (the persist belongs to the
    pre-checkpoint plan; verified empirically, and the reason a
    many-round reliable job used to accumulate one round's cache per
    iteration). Checkpoint files themselves are reclaimed on GC only
    when ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
    (off by default) — set it, or point the checkpoint dir at scratch
    storage with a lifecycle policy.
    Raises with setup instructions if no checkpoint dir is configured,
    instead of Spark's late SparkException mid-iteration."""
    if not reliable:
        return df.localCheckpoint(eager=True)
    if df.sparkSession.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "reliable_checkpoints=True requires a checkpoint directory: "
            "call spark.sparkContext.setCheckpointDir('<hdfs/s3/local path>') "
            "before running the operator"
        )
    cached = df.persist()
    try:
        return cached.checkpoint(eager=True)
    finally:
        cached.unpersist()


@contextmanager
def _loop_shuffle_partitions(spark, n_rows: int, rows_per_partition: int = 2_000_000):
    """Bound ``spark.sql.shuffle.partitions`` to the MEASURED size of an
    iterative loop's working set, restoring the caller's value on exit.

    The contraction loops below run a dozen shuffle stages per round
    over an edge set that is usually tiny (LSH candidate pairs, not the
    corpus). With the session default (e.g. 32-200, or thousands on a
    real cluster), every one of those stages plans the full partition
    count and AQE coalesces it back down — pure scheduling overhead
    that dominates when the data is small. Measured at sf0.1 (826
    edges): 3.5 s -> 2.0 s for the whole contraction just by sizing the
    loop's shuffles to the data. Scale-safe by construction: the bound
    is ceil(n_rows / 2M) capped below by 1 and above by the caller's
    own setting — a billion-edge graph keeps full parallelism, and the
    conf is restored even on error. (Session confs are session-global;
    a caller running concurrent queries on the same session during the
    loop would see the narrowed value — the documented trade.)"""
    conf = spark.conf
    before = conf.get("spark.sql.shuffle.partitions")
    target = max(1, min(int(before), (n_rows + rows_per_partition - 1) // rows_per_partition))
    try:
        conf.set("spark.sql.shuffle.partitions", str(target))
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", before)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group documents by content fingerprint: (fingerprint, keep_id,
    n_docs) with the minimum id as the canonical representative."""
    return (
        df.select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs of k-gram word shingles, distinct by default.

    The explode multiplies each document into ~|tokens| rows, so the
    input is fanned out across the cluster first (no-op when the scan
    is already parallel — see ``fan_out``). Pass ``distinct=False``
    when the consumer is duplicate-insensitive (e.g. a ``min`` over
    shingle hashes): it removes an entire (id, shingle)-keyed shuffle
    from the plan."""
    sh = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(word_shingles(tokens(text_col), k)).alias("shingle")
    )
    return sh.distinct() if distinct else sh


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k_shingle: int = 3, n_hashes: int = 8
) -> DataFrame:
    """Per-document minhash signature: for each seed i, the minimum
    ``md5(i || ':' || shingle)`` hex string over the document's
    shingles. One shuffle (group-by id); documents with fewer than
    ``k_shingle`` tokens produce no signature."""
    # duplicate shingles can't change a min, so skip the distinct and
    # its (id, shingle)-keyed shuffle: explode feeds the partial agg
    # map-side and only the per-id minima shuffle.
    sh = doc_shingles(df, id_col, text_col, k_shingle, distinct=False)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_table(
    signatures: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(id, band, bucket) rows: the LSH blocking structure — each
    signature split into ``bands`` buckets of ``n_hashes // bands``
    concatenated hashes. Shared by the in-memory candidate-pair
    self-join and the persisted dedup index (which materializes
    exactly this table).

    ``bands`` must divide ``n_hashes``: bands > n_hashes would make
    every bucket key the empty string (the blocking degenerates to the
    all-pairs cross join LSH exists to prevent), and a non-divisor
    would silently ignore the trailing hash columns, lowering recall
    below what the caller configured."""
    if bands <= 0 or n_hashes % bands != 0:
        raise ValueError(
            f"band_table: bands={bands} must evenly divide "
            f"n_hashes={n_hashes}"
        )
    rows_per_band = n_hashes // bands
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band the signature (rows_per_band = n_hashes // bands) and emit
    distinct candidate pairs sharing any band bucket. Pair generation
    is blocked on (band, bucket_key) — no quadratic blow-up unless the
    data genuinely collides. Parameter validation lives in
    :func:`band_table`.

    Pairs come from ONE pass: group the band table by (band, bucket),
    collect each bucket's member ids, and explode the ordered pairs —
    not from a bucket-keyed self-join (r14 restructure, guide
    §1.2/§2.4). The self-join's two sides were separate plan subtrees,
    so the whole signature pipeline — shingle explode + n_hashes md5
    minima, the dominant cost — ran once PER SIDE; r13 fixed that with
    an eager localCheckpoint of the signatures, which de-duplicated the
    compute but serialized the query into checkpoint-then-join jobs and
    cost 25-45% wall at bench scale (the r13 driver record). The
    grouped form needs no materialization at all: the signatures have
    exactly one consumer, the plan stays lazy end to end, and one
    (band, bucket) shuffle replaces the join's two. Work and skew match
    the self-join exactly — a bucket of B members yields B(B-1)/2 pairs
    either way, all on one key's partition (the collected id array is
    O(B) next to that quadratic output; LSH blocking exists to keep B
    small). Result set pytest+oracle-identical to the join form."""
    banded = band_table(signatures, id_col, n_hashes, bands)
    return (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def _shingle_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int,
    max_shingle_df: int | None,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Shared inverted-index stage for the n-gram pair metrics:
    (id_a, id_b, n_common, n_a, n_b) over the distinct k-shingle sets
    of every document pair sharing at least one shingle.

    ``max_shingle_df`` drops shingles appearing in more than that many
    documents — the standard hot-shingle skew guard at scale. The set
    SIZES are computed from the SAME filtered shingle universe as the
    intersections: mixing pre-filter sizes with post-filter
    intersections would understate every metric (two identical docs
    whose shingles are mostly ubiquitous would score n_common=1 over
    n_a=n_b=10 — Jaccard 0.05 for a true duplicate). With the cap,
    every downstream metric is therefore the EXACT metric over the
    rare-shingle universe; without it, over the full shingle sets."""
    # materialize the distinct shingle set once (r13 optimization,
    # guide §1.2): it feeds the rare-shingle DF count, the per-id
    # sizes, AND both sides of the intersection self-join — four
    # separate subtrees that each re-ran the tokenize+explode+distinct
    # pipeline. This is the operator's working set either way (the
    # distinct already shuffles it); checkpointing trades one
    # materialization for three recomputations.
    # ``reliable_checkpoints=True`` (r14, threading the existing
    # iter_checkpoint knob — ADVICE r13): on a real cluster an
    # executor loss mid-self-join cannot recompute executor-local
    # blocks; the reliable path writes the one materialization to the
    # session's checkpoint dir instead, same trade the iterative
    # operators already expose.
    sh = iter_checkpoint(
        doc_shingles(df, id_col, text_col, k_shingle), reliable_checkpoints
    )
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return common.join(sa, "id_a").join(sb, "id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    min_jaccard: float = 0.2,
    max_shingle_df: int | None = None,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Exact Jaccard similarity over distinct k-shingle sets for every
    pair sharing at least one (sufficiently rare) shingle — see
    ``_shingle_pair_counts`` for the blocking, the hot-shingle cap
    semantics (sizes and intersections share one shingle universe),
    and the ``reliable_checkpoints`` cluster-scale trade."""
    return (
        _shingle_pair_counts(
            df, id_col, text_col, k_shingle, max_shingle_df,
            reliable_checkpoints,
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    min_containment: float = 0.5,
    max_shingle_df: int | None = None,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT:
    ``n_common / min(|A|, |B|)`` — catches quote/excerpt/superset
    relationships that Jaccard structurally misses (a short doc fully
    contained in a long one has Jaccard ~ |short|/|long| -> 0 but
    containment 1.0; Broder's resemblance-vs-containment distinction).
    Shares ``_shingle_pair_counts`` with ``ngram_jaccard_pairs`` —
    shuffle proportional to shared-shingle pairs, never all-pairs;
    ``reliable_checkpoints`` as there."""
    return (
        _shingle_pair_counts(
            df, id_col, text_col, k_shingle, max_shingle_df,
            reliable_checkpoints,
        )
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment")
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over the
    near-dup pair graph via iterative min-label propagation.

    Each node starts labeled with itself; every iteration each node
    takes the minimum label among itself and its neighbors, until a
    fixpoint (checked with a driver-side count of changed labels —
    an O(1)-row action per iteration, not a data collect). Converges
    in O(diameter) iterations; near-dup cluster diameters are tiny in
    practice. ``localCheckpoint`` truncates lineage each iteration so
    the plan doesn't grow exponentially — the standard pattern for
    iterative DataFrame algorithms Spark has no native operator for.

    Returns (node, component) with component = min node id reachable.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` iterations (a component's diameter exceeded the cap —
    e.g. a very long templated-document chain): returning the
    non-converged labels silently would yield WRONG components.
    Min-label propagation needs O(diameter) rounds; raise the cap for
    pathological graphs, or use ``connected_components_twophase``
    (alternating large-star/small-star, O(log^2 n) rounds) when long
    chains are the norm — it is pytest-verified to produce identical
    labels.

    ``reliable_checkpoints=True`` writes each round to the session's
    checkpoint directory instead of executor-local blocks — see
    ``iter_checkpoint`` for the cluster-scale trade.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # the edge count rides the checkpoint materialization as an
    # observed metric (r14 optimization, guide §1.2-adjacent: don't run
    # an action per statistic) — the separate edges.count() job is gone
    obs_e = Observation()
    edges = iter_checkpoint(
        pairs.select(src.alias("a"), dst.alias("b"))
        .unionByName(pairs.select(dst.alias("a"), src.alias("b")))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n")),
        # eager materialization per round — measured faster and far
        # more stable than lazy (module NOTE above)
        reliable_checkpoints,
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    changed = -1
    n_edges = int(obs_e.get["n"])  # sizes the loop
    with _loop_shuffle_partitions(pairs.sparkSession, n_edges):
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.a == labels.node)
                .groupBy(F.col("b").alias("node2"))
                .agg(F.min("component").alias("nmin"))
            )
            # convergence count observed ON the round's checkpoint
            # materialization (r14): the previous per-round
            # filter().count() was a second driver job over the
            # just-checkpointed frame — pure job-cadence cost in a loop
            # whose data is usually tiny. Accumulator caveat: a retried
            # task could over-count, but `changed` only gates LOOP EXIT
            # (changed == 0), and a retry can never turn a genuinely
            # zero count nonzero — every task of a no-change round
            # contributes 0 — so convergence is exact.
            obs_r = Observation()
            new_labels = iter_checkpoint(
                labels.join(neighbor_min, labels.node == F.col("node2"), "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nmin"), F.col("component")),
                    ).alias("new_component"),
                    "component",
                )
                .observe(
                    obs_r,
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("new_component") != F.col("component"), 1
                            ).otherwise(0)
                        ),
                        F.lit(0),
                    ).alias("changed"),
                ),
                reliable_checkpoints,
            )
            changed = int(obs_r.get["changed"])
            # per-round block hygiene lives inside iter_checkpoint: the
            # reliable path releases its backing cache right after the
            # eager checkpoint write (unpersisting the RETURNED frame
            # here would free nothing — the persist belongs to the
            # pre-checkpoint plan), and localCheckpoint blocks are
            # reclaimed by the ContextCleaner once the previous round's
            # references go out of scope.
            labels = new_labels.select(
                "node", F.col("new_component").alias("component")
            )
            if changed == 0:
                break
    if changed != 0:
        raise RuntimeError(
            f"connected_components: labels still changing after {max_iter} "
            f"iterations ({changed} updates in the last round) — a component's "
            "diameter exceeds max_iter; raise it rather than use wrong labels"
        )
    return labels


def connected_components_twophase(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 30,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — the O(log^2 n)-round companion to the O(diameter)
    ``connected_components``. Use this when near-dup chains are long
    (templated/boilerplate corpora), where min-label propagation's
    round count equals the chain length.

    Each round is one neighbor-list group-by (per-node minimum) joined
    back to the edges — no state beyond the shrinking edge set, and
    per-iteration ``localCheckpoint`` keeps lineage O(1). Terminates
    when the edge set reaches a fixpoint of star graphs centered on
    each component's minimum id; raises if ``max_rounds`` is hit
    (log^2-round growth means 30 covers any realistic graph).

    Returns (node, component), component = min reachable id — the
    same contract (and pytest-verified the same output) as
    ``connected_components``. ``reliable_checkpoints=True`` writes
    each round to the session's checkpoint directory instead of
    executor-local blocks — see ``iter_checkpoint``.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # edge count observed on the checkpoint materialization — see the
    # matching note in connected_components (r14: one job, not two)
    obs_e = Observation()
    edges = iter_checkpoint(
        pairs.select(src.alias("u"), dst.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n")),
        # eager materialization — see connected_components
        reliable_checkpoints,
    )

    def neighbor_min(e: DataFrame) -> DataFrame:
        nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        return nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))

    def star_round(e: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
        nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = neighbor_min(e).withColumnRenamed("u", "mu")
        joined = nbrs.join(m, nbrs.u == F.col("mu")).select("u", "v", "m")
        if large:
            out = joined.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            )
        else:
            out = joined.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            ).unionByName(joined.select(F.col("u").alias("a"), F.col("m").alias("b")))
        out = out.filter(F.col("a") != F.col("b")).select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        # Duplicate edges cannot change any min-based contraction
        # (neighbor_min's MIN and the star join are duplicate-
        # insensitive), so the intra-round dedup between the large- and
        # small-star halves is skippable — one less shuffle per round;
        # the round's final output stays distinct'd (that one bounds
        # growth across rounds and makes the count fixpoint test exact).
        return out.distinct() if dedup else out

    prev_count = int(obs_e.get["n"])
    spark = pairs.sparkSession
    converged = False
    with _loop_shuffle_partitions(spark, prev_count):
        for _ in range(max_rounds):
            # One large+small contraction pair per checkpoint. Tempting
            # to fuse TWO pairs per cycle to halve the driver-side job
            # count, but each star round references its input ~4x (nbrs
            # union + neighbor-min + join), so an uncheckpointed 4-star
            # chain recomputes the intermediate O(4^depth) times —
            # measured 2.97 -> 11.2 s at sf0.1. The checkpoint every
            # pair IS the optimization.
            # The round's edge count rides the checkpoint job as an
            # observed metric (r14, verdict ask #5): the separate
            # after.count() was a second driver job per round — pure
            # job cadence over a usually-tiny edge set.
            obs_r = Observation()
            after = iter_checkpoint(
                star_round(
                    star_round(edges, large=True, dedup=False), large=False
                ).observe(obs_r, F.count(F.lit(1)).alias("n")),
                reliable_checkpoints,
            )
            # Fixpoint test, cheapest-first: a count mismatch (now free
            # — observed on the checkpoint) proves non-convergence
            # without any join; only on a count MATCH re-count exactly
            # and run ONE one-sided exceptAll — after ⊆ edges as
            # multisets plus |after| = |edges| implies set equality, so
            # the second exceptAll the naive check runs every round is
            # never needed. The exact re-count guards the one scenario
            # an observation cannot: a stage-retried task over-counting
            # the metric into a false |after| = |edges| on a round where
            # after ⊊ edges, which the subset-only exceptAll would then
            # bless as convergence. Match rounds are rare (normally just
            # the final one), so the count job the observation removed
            # from EVERY round comes back at most once per query; a
            # mismatch round — the common case — stays one job. An
            # over-count on a mismatch round only delays the probe a
            # round (prev_count is re-exacted on every match round),
            # never passes it wrongly.
            cnt = int(obs_r.get["n"])
            if cnt == prev_count:
                cnt = after.count()
                converged = (
                    cnt == prev_count and after.exceptAll(edges).isEmpty()
                )
            else:
                converged = False
            # block hygiene lives inside iter_checkpoint — see the
            # matching note in connected_components
            edges, prev_count = after, cnt
            if converged:
                break
        if not converged:
            raise RuntimeError(
                f"connected_components_twophase: no fixpoint after "
                f"{max_rounds} rounds"
            )
        # fixpoint edges are stars (member, center): members point at
        # the component minimum; centers label themselves. Built (and
        # its one distinct-shuffle materialized) INSIDE the bounded-
        # partition scope — a lazy return would run that shuffle under
        # the caller's restored partition count.
        members = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        centers = edges.select(F.col("v").alias("node")).distinct().withColumn(
            "component", F.col("node")
        )
        return iter_checkpoint(
            members.unionByName(centers), reliable_checkpoints
        )


def keep_best_per_component(
    labeled: DataFrame,
    id_col: str,
    score_col: str,
    keep_alias: str = "keep_id",
    best_alias: str = "best_score",
) -> DataFrame:
    """Canonical selection over labeled clusters: one row per
    ``component`` with its highest-``score_col`` member (ties toward
    the LOWER id), the member count, and the best score. ``labeled``
    is (id_col, component, score_col) with singletons already labeled
    as their own component.

    One ``min_by`` aggregation on the component key — no window sort.
    The argmin rides (-score, id), so the id tie-break is
    type-agnostic (string ids negate nothing; negating the id instead
    would NULL the tie-break field for string ids and make the kept
    document nondeterministic); ``score_col`` must be numeric. Shared
    by the from-scratch ``tx_dedup_keep_best`` entry and the persisted
    ``cluster_index.canonical_keep_table`` — ONE implementation of the
    keep semantics over two cluster sources, so they cannot drift."""
    return labeled.groupBy("component").agg(
        F.min_by(
            id_col,
            F.struct(
                (-F.col(score_col)).alias("q"), F.col(id_col).alias("t")
            ),
        ).alias(keep_alias),
        F.count(F.lit(1)).alias("n_members"),
        F.max(score_col).alias(best_alias),
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-hex-character SimHash over the document's distinct tokens.

    For nibble position p (0..15) of each token's md5, each of its 4
    bits votes +1/-1; the fingerprint bit is 1 iff the vote sum is
    positive. Pure expression pipeline: explode tokens x positions,
    two group-bys (doc,pos) then (doc)."""
    toks = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    pos = toks.select(
        id_col,
        F.md5(F.col("tok").cast("binary")).alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("p"),
    )
    nib = pos.withColumn(
        "nib", F.conv(F.col("h").substr(F.col("p") + 1, F.lit(1)), 16, 10).cast("int")
    )
    votes = nib.groupBy(id_col, "p").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("nib"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(4)
        ]
    )
    nibble_out = (
        F.when(F.col("s0") > 0, 1).otherwise(0)
        + F.when(F.col("s1") > 0, 2).otherwise(0)
        + F.when(F.col("s2") > 0, 4).otherwise(0)
        + F.when(F.col("s3") > 0, 8).otherwise(0)
    )
    chars = votes.withColumn(
        "ch", F.lit("0123456789abcdef").substr(nibble_out + 1, F.lit(1))
    )
    return chars.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("p"), F.col("ch")))),
                lambda x: x["ch"],
            ),
            "",
        ).alias("simhash")
    )
