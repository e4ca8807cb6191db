"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.9 — the reference is batch-only;
this is the streaming-native form of the w3 batch sessionizer).

Per-user state carries the open session across micro-batches
(session counter, event count, start/last seconds); each batch's
events extend or close sessions, closed sessions are emitted
immediately and the still-open session is emitted too (update mode),
so a run over a finite input converges to exactly the batch answer.

Arrow moves rows to Python in column batches — the per-key loop is
pandas-vectorized except the unavoidable sequential gap walk, which is
O(events-per-user-per-batch) and runs in parallel across users (the
stream is hash-partitioned on the group key by the state operator).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start_s", LongType()),
        StructField("session_end_s", LongType()),
    ]
)

#: open-session carry-over: (session_id, n_events, start_s, last_s)
STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
    ]
)


def _sessionize_fn(gap_s: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        # ts_s is unix_timestamp() computed JVM-SIDE before the state
        # operator: Arrow hands Python tz-NAIVE timestamps rendered in
        # the session timezone, so flooring those to "epoch" seconds
        # here would be off by the zone offset whenever the session tz
        # is not UTC and would repeat/skip an hour across DST
        # transitions (merging/splitting sessions wrongly). A plain
        # BIGINT column has no timezone to get wrong, and matches the
        # batch twin's unix_timestamp() bit-for-bit. Ordering by
        # (ts_s, event_id) is deterministic; sub-second order within a
        # second cannot change gap decisions, which see only seconds.
        batch = batch.sort_values(["ts_s", "event_id"], kind="mergesort")
        secs = batch["ts_s"].astype("int64").to_list()

        if state.exists:
            sid, n, start, last = state.get
        else:
            sid, n, start, last = 0, 0, None, None

        out: list[tuple[int, int, int, int, int]] = []
        for t in secs:
            if last is None:
                sid, n, start, last = sid + 1, 1, t, t
            elif t - last > gap_s:
                out.append((user_id, sid, n, start, last))
                sid, n, start, last = sid + 1, 1, t, t
            else:
                n, last = n + 1, t
        # emit the still-open session too (update mode): re-emitted
        # with more events if a later batch extends it
        out.append((user_id, sid, n, start, last))
        state.update((sid, n, start, last))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_id", "n_events", "session_start_s", "session_end_s"],
        )

    return fn


def sessionize_stream(
    spark: SparkSession, events_path: str, gap_s: int = 1800
) -> DataFrame:
    """Run the stateful sessionizer over the events stream to
    completion (availableNow) and return the final per-session rows.

    The memory sink in update mode appends every emission, so the
    final state per (user_id, session_id) is the row with the highest
    n_events — deduplicated here. On a finite input this equals the
    batch w3 sessionization exactly.
    """
    from .jobs import _event_stream

    from pyspark.sql import functions as F

    stream = _event_stream(spark, events_path).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    from pyspark.sql import Window

    from .jobs import _drain_memory_sink

    w = Window.partitionBy("user_id", "session_id").orderBy(F.col("n_events").desc())
    return _drain_memory_sink(
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
        name,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA fold — the incremental twin of the batch ts_ewma_smooth
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_fixed", LongType()),
    ]
)

#: carry-over: (n_events, acc) — O(1) state per key, unlike the batch
#: form's whole-group list. This is why the streaming fold is the
#: scale path for unbounded keys.
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("acc", LongType()),
    ]
)


def _ewma_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user integer EWMA: e_0 = v_0; e_i = e - e//4 + v_i//4 —
    IDENTICAL recurrence to plans.analytics_olap.ts_ewma_smooth (the
    batch/backfill twin; pytest asserts row-level equality of the two
    on a finite input). `v` is quantized JVM-side (floor(max(value,0)
    * 1e6)) for the same reason the timestamp is: Arrow-side
    re-derivation could disagree with the batch twin; a plain BIGINT
    cannot. Ordering uses MICROSECOND-precision unix_micros, not
    whole seconds: EWMA is order-dependent, the batch twin (and its
    shared oracle) order by the full-precision ts, and the events
    fixture carries same-user same-second collisions whose sub-second
    order disagrees with event_id order — a seconds-truncated sort
    key would fold those in a different order and diverge. (The
    sessionize fold can truncate to seconds because its OUTPUT is
    second-granular; this one cannot.)
    Within a batch, rows fold in (ts_us, event_id) order; across
    batches, state folds in arrival order — exact batch equality
    holds when the finite input arrives in one availableNow batch
    (the test path) or in time-ordered batches (a watermarked
    production source)."""
    (user_id,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
    vals = batch["v"].astype("int64").to_list()

    if state.exists:
        n, acc = state.get
    else:
        n, acc = 0, None

    for v in vals:
        if acc is None:
            acc = v
        else:
            acc = acc - acc // 4 + v // 4
        n += 1
    state.update((n, acc))
    yield pd.DataFrame(
        [(user_id, n, acc)], columns=["user_id", "n_events", "ewma_fixed"]
    )


def ewma_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """Run the stateful EWMA fold over the events stream to completion
    (availableNow) and return the final per-user rows. Update-mode
    memory sink appends every emission; the final state per user is
    the row with the highest n_events."""
    from pyspark.sql import functions as F

    from .jobs import _drain_memory_sink, _event_stream

    stream = (
        _event_stream(spark, events_path)
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.floor(F.greatest(F.col("value"), F.lit(0.0)) * 1000000)
            .cast("long")
            .alias("v"),
        )
    )
    folded = stream.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        folded.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return _drain_memory_sink(
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
        name,
    )
