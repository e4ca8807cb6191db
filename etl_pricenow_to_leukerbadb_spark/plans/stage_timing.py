"""Per-stage wall-time attribution for multi-action bench headlines.

The two lifecycle headlines (``ann_ivfpq_trained_e2e``,
``dd_cluster_merge``) are each several Spark actions — build + search,
append + probe + merge — and were the bench record's noisiest rows
(r10: spreads 1.7 s / 1.8 s, 53% of the recorded total). A flagged
riser on one of them could only be argued about ("probably the
build"); with stage attribution it becomes a mechanical read
(r10 verdict ask #6).

The query functions wrap their EAGER stages in ``time_stage`` and the
bench harness pops the accumulated dict after each timed run. Stages
that execute lazily (the returned DataFrame's final action runs inside
the harness's ``count()``) cannot be timed here by construction — the
harness derives them as ``value - sum(recorded stages)`` and labels
the derivation (e.g. the ANN headline's ``search``).

Not thread-safe by design — the bench harness is single-threaded and
this sink exists for it; concurrent query invocations would interleave
accumulation, so production callers should not rely on it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

_SINK: dict[str, dict[str, float]] = {}


@contextmanager
def time_stage(query: str, stage: str):
    """Accumulate the wall time of the enclosed block under
    ``(query, stage)``. Accumulates (not overwrites) so a stage that
    runs twice in one invocation (e.g. a retry) reports its total."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        q = _SINK.setdefault(query, {})
        q[stage] = q.get(stage, 0.0) + (time.perf_counter() - t0)


def record_stages(query: str, stages: dict[str, float]) -> None:
    """Merge a dict of stage seconds (for callees that time internally
    and hand the result back, e.g. ``ingest_and_update_clusters``'s
    ``stage_timings`` parameter)."""
    q = _SINK.setdefault(query, {})
    for stage, sec in stages.items():
        q[stage] = q.get(stage, 0.0) + sec


def pop_stages(query: str) -> dict[str, float] | None:
    """Remove and return the accumulated stage seconds for one query
    invocation (None when the query records no stages)."""
    out = _SINK.pop(query, None)
    if out is None:
        return None
    return {k: round(v, 3) for k, v in out.items()}
