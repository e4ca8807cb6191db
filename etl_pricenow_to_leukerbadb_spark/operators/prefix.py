"""Distributed exact per-group running sums (prefix scan).

The natural Spark form of "cumulative sum per group in priority
order" is a window:

    W = Window.partitionBy(group).orderBy(ord)
    F.sum(value).over(W.rowsBetween(unboundedPreceding, 0))

which is exact and single-shuffle — and serializes each GROUP into
one task. For the training-data admission operators
(`tx_token_budget_mix`, `tx_pack_sequences`, `tx_cap_per_source`
— plans/analytics_llm.py) that is the known skew point SCALE.md
documents: if one source holds most of a 100 TB corpus, its window
runs on one executor core no matter how many the cluster has.

``grouped_running_sum`` removes the serialization WITHOUT changing a
single output value, via the classic two-level scan (the same
decomposition GPU/MPI prefix scans use — Blelloch '90):

1. range-partition by (group, order) into N contiguous blocks and pin
   the placement (``localCheckpoint``) — each group's rows now span
   an ordered run of blocks, in order within and across blocks;
2. one narrow partial aggregate: SUM(value) per (block, group) —
   ≈ N + #groups rows, metadata-sized, collected to the driver;
3. sequential exclusive prefix over each group's block sums ON THE
   DRIVER (tiny: one pass over step 2's rows) → per-(block, group)
   OFFSETS, shipped back as a broadcast join;
4. running sum within each (block, group) — a window whose partition
   key now includes the block id, so no window partition can exceed a
   BLOCK, whatever the group distribution — plus the block's offset.

Cost: one extra balanced shuffle (the range partition) + one
metadata-sized collect, in exchange for per-group parallelism bounded
only by the block count. The plain window stays the right choice when
groups are known small; this is the 100 TB path for dominant-group
layouts. Exactness requires (group_cols + order_cols) to be a TOTAL
order (unique per row): range partitioning may split equal keys
across blocks, and "cumulative sum at a tie" is not well-defined
under any engine; all callers here order by a unique id tiebreak.

Why ``localCheckpoint`` is load-bearing (not an optimization): the
offsets collect (step 2) and the final query (step 4) are separate
actions; un-pinned, each would re-evaluate the range partitioner —
whose sampled bounds are not guaranteed stable across evaluations —
and offsets computed against one placement would be applied to
another, silently corrupting sums. Checkpointing materializes ONE
placement that both actions read. The pin goes through
``dedup.iter_checkpoint`` — ``reliable=True`` writes it to the
session checkpoint dir (executor-loss-surviving, for long cluster
jobs; fails fast with setup instructions when no dir is configured)
instead of executor-local blocks, the iterative operators' contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..session import tiny_local_df

_BLOCK = "__prefix_block"


def _window_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """The plain one-window-per-group form — single shuffle, exact,
    serializes each group into one task (fine while every group fits
    one task's memory; see module docstring)."""
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return df.withColumn(
        out_col,
        F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


# Measured crossover on the dev box (SCALE.md, 97%-dominant-group
# layout): the window form wins at <= 12M dominant-group rows; the
# scan overtakes by 48M, where the single window partition spills.
# The true spill point is executor-memory-dependent; this default sits
# just above the measured window-wins region so auto only pays the
# scan's extra shuffle when a group plausibly spills.
WINDOW_MAX_GROUP_ROWS = 16_000_000

# Driver-side bound for the scan's offsets collect: range partitioning
# by (group, order) makes each group a contiguous block run, so the
# collect is <= #groups + #blocks - 1 rows. A group key with more
# distinct values than this belongs on the window form (many small
# groups partition fine; the scan exists for FEW, LARGE groups).
MAX_PARTIALS = 1_000_000

# Rows sampled by mode='auto' to estimate the max group share.
_AUTO_SAMPLE_ROWS = 100_000


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_blocks: int | None = None,
    reliable: bool = False,
    mode: str = "scan",
    window_max_group_rows: int = WINDOW_MAX_GROUP_ROWS,
    max_partials: int = MAX_PARTIALS,
) -> DataFrame:
    """``df`` plus ``out_col`` = inclusive running sum of ``value_col``
    per ``group_cols`` group in ``order_cols`` order — value-identical
    between all three modes (pytest-pinned equality on both arms).

    ``mode``:
      * ``'scan'`` — the two-level prefix scan below: no window
        partition larger than one range block, the 100 TB path for
        dominant-group layouts.
      * ``'window'`` — the plain per-group window: one shuffle, best
        while every group fits one task (callers with a known-small
        key pass this as a hint and skip auto's sampling jobs).
      * ``'auto'`` — decide from the data: one stats job
        (count + approx_count_distinct of the group key) plus one
        bounded-sample job estimating the max group's row count; picks
        the window unless a group plausibly exceeds
        ``window_max_group_rows`` (spill territory), and refuses the
        scan outright when the estimated group cardinality would blow
        the driver-side offsets bound (``max_partials``).

    ``order_cols`` must make rows unique within a group (see module
    docstring), and ``value_col`` must be non-null (a null-skipping
    running sum's value at a null row differs between the two
    decompositions; every caller here sums a computed count — the
    precondition is enforced inside the scan arm's partials job; the
    window arm, like any Spark window, just skips nulls).
    ``num_blocks`` defaults to the session's shuffle parallelism.
    The scan arm runs one Spark job (the offsets collect) before the
    returned DataFrame's own action; auto adds two small jobs.

    Driver-side cost bound (scan arm): the offsets collect is one row
    per (block, group) pair — <= #groups + #blocks - 1 thanks to the
    contiguous range placement — metadata-sized for the source-keyed
    callers here (#groups ~ tens) but O(#groups) in general; the
    ``max_partials`` guard raises rather than OOM-ing the driver
    silently on a high-cardinality key."""
    from .dedup import iter_checkpoint

    if mode not in ("scan", "window", "auto"):
        raise ValueError(f"mode must be scan|window|auto, got {mode!r}")
    if mode == "window":
        return _window_running_sum(
            df, group_cols, order_cols, value_col, out_col
        )

    spark = df.sparkSession
    if num_blocks is not None and num_blocks < 1:
        raise ValueError(f"num_blocks must be >= 1, got {num_blocks}")
    if num_blocks is None:
        try:
            n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:  # conf may be 'auto' under AQE-managed shuffles
            n = spark.sparkContext.defaultParallelism
    else:
        n = num_blocks

    if mode == "auto":
        key = F.struct(*[F.col(c) for c in group_cols])
        stats = df.select(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct(key).alias("n_groups"),
            # piggyback the non-null precondition on the stats job:
            # without this, the SAME null-carrying input would raise on
            # the scan arm but silently null-skip on the window arm —
            # semantics flipping with data volume, the worst kind of
            # auto-dispatch surprise. Explicit mode='window' keeps
            # plain Spark window semantics (documented).
            F.count(F.when(F.col(value_col).isNull(), F.lit(1))).alias(
                "n_null"
            ),
        ).first()
        n_rows, n_groups = stats["n_rows"], stats["n_groups"]
        if stats["n_null"]:
            raise ValueError(
                f"grouped_running_sum: {value_col} has {stats['n_null']} "
                "null row(s) — a null-skipping running sum is not "
                "decomposable consistently between the window and scan "
                "arms, so mode='auto' refuses it on either arm. Filter "
                "or coalesce the nulls first (or pass mode='window' "
                "explicitly for plain null-skipping window semantics)"
            )
        if n_rows == 0 or n_groups + n > max_partials:
            # empty input, or a key so wide the scan's driver collect
            # would be data-sized — the window partitions fine there
            return _window_running_sum(
                df, group_cols, order_cols, value_col, out_col
            )
        frac = min(1.0, _AUTO_SAMPLE_ROWS / n_rows)
        samp = (
            df.select(*group_cols)
            .sample(fraction=frac, seed=7)
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"), F.sum("c").alias("t"))
            .first()
        )
        if not samp["t"]:  # degenerate sample — cheap default
            return _window_running_sum(
                df, group_cols, order_cols, value_col, out_col
            )
        est_max_group = n_rows * samp["m"] / samp["t"]
        if est_max_group <= window_max_group_rows:
            return _window_running_sum(
                df, group_cols, order_cols, value_col, out_col
            )
        # fall through to the scan

    sort_cols = [F.col(c) for c in (*group_cols, *order_cols)]
    ranged = iter_checkpoint(
        df.repartitionByRange(n, *sort_cols).withColumn(
            _BLOCK, F.spark_partition_id()
        ),
        reliable,
    )

    partials = (
        ranged.groupBy(_BLOCK, *group_cols)
        .agg(
            F.sum(value_col).alias("s"),
            # enforce the documented non-null precondition in the SAME
            # job: a null value makes the two decompositions disagree
            # (null-skipping sums carry differently across blocks) and
            # an all-null block would crash the driver prefix below
            F.count(F.when(F.col(value_col).isNull(), F.lit(1))).alias(
                "nulls"
            ),
        )
        # LIMIT bounds the DRIVER, not just the error message: without
        # it a 200M-group key OOMs inside .collect() before any guard
        # runs. Under the bound LIMIT returns every row (the prefix is
        # computed driver-side from the full set, sorted below); over
        # it the driver holds exactly max_partials + 1 rows and raises.
        .limit(max_partials + 1)
        .collect()
    )
    if len(partials) > max_partials:
        raise ValueError(
            f"grouped_running_sum: offsets collect exceeded "
            f"max_partials={max_partials} (block, group) rows — the "
            "group key is too wide for the scan decomposition's "
            "driver-side prefix; use mode='window' (many small groups "
            "partition fine) or raise max_partials deliberately"
        )
    n_null = sum(r["nulls"] for r in partials)
    if n_null:
        raise ValueError(
            f"grouped_running_sum: {value_col} has {n_null} null row(s) — "
            "a null-skipping running sum is not decomposable consistently "
            "with the window form; coalesce or filter nulls first"
        )
    # sequential exclusive prefix per group over its blocks — one
    # driver pass over ~(#blocks + #groups) rows; ascending block
    # order alone suffices (the per-group accumulator keys the dict)
    offsets = []
    running: dict[tuple, object] = {}
    for r in sorted(partials, key=lambda r: r[_BLOCK]):
        key = tuple(r[c] for c in group_cols)
        offsets.append((r[_BLOCK], *key, running.get(key, 0)))
        running[key] = running.get(key, 0) + r["s"]

    group_schema = ", ".join(
        f"{c} {t}" for c, t in df.select(*group_cols).dtypes
    )
    off_schema = (
        f"{_BLOCK} int, {group_schema}, "
        f"__prefix_offset {dict(ranged.select(F.sum(value_col).alias('s')).dtypes)['s']}"
    )
    off_df = tiny_local_df(spark, offsets, off_schema)

    # NULL-SAFE join keys: groupBy (step 2) and window partitioning
    # both treat a null group key as a real group, but a plain
    # equi-join would silently DROP null-keyed rows (Catalyst inserts
    # isnotnull filters) — the offsets must come back to every row
    off_aliased = off_df.select(
        F.col(_BLOCK).alias("__ob"),
        *[F.col(c).alias(f"__og{i}") for i, c in enumerate(group_cols)],
        "__prefix_offset",
    )
    cond = F.col(_BLOCK) == F.col("__ob")
    for i, c in enumerate(group_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__og{i}"))

    w = Window.partitionBy(_BLOCK, *group_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    local_sum = F.sum(value_col).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(off_aliased), cond)
        .withColumn(out_col, local_sum + F.col("__prefix_offset"))
        .drop(
            _BLOCK,
            "__ob",
            *[f"__og{i}" for i in range(len(group_cols))],
            "__prefix_offset",
        )
    )
