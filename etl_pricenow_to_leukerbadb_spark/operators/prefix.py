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


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_blocks: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """``df`` plus ``out_col`` = inclusive running sum of ``value_col``
    per ``group_cols`` group in ``order_cols`` order — value-identical
    to the plain one-window-per-group form (pytest-pinned), with no
    window partition larger than one range block.

    ``order_cols`` must make rows unique within a group (see module
    docstring), and ``value_col`` must be non-null (a null-skipping
    running sum's value at a null row differs between the two
    decompositions; every caller here sums a computed count).
    ``num_blocks`` defaults to the session's shuffle parallelism.
    Internally runs one Spark job (the offsets collect) before the
    returned DataFrame's own action."""
    from .dedup import iter_checkpoint

    spark = df.sparkSession
    n = num_blocks or int(spark.conf.get("spark.sql.shuffle.partitions"))
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
        .collect()
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
