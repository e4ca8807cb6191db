"""Scheduling/orchestration analog of the reference's CI trigger.

The reference runs its pipeline from a twice-daily cron with a
concurrency group and a 30-minute timeout
(``/root/reference/.github/workflows/run_pricenow.yml:3-16,21``:
``cron: "0 6 * * *"`` + ``"0 14 * * *"``, ``concurrency.group:
pricenow-etl`` with ``cancel-in-progress: false``, manual dispatch
allowed). An engine embedded in Airflow/Dagster/cron needs the same
three semantics, engine-side and scheduler-agnostic:

- ``next_due`` / ``is_due``: pure functions over a UTC-hour schedule —
  when is the next slot, and has a slot elapsed since the last
  successful run (so a missed slot is made up on the next tick, which
  is how cron-with-catchup behaves).
- ``RunLock``: a filesystem mutex (atomic create-with-content via
  ``os.link``, pid + timestamp inside, stale-lock takeover) — the
  workflow's concurrency
  group for environments without one. ``cancel-in-progress: false``
  maps to "second runner skips instead of killing the first".
- ``run_guarded``: compose both around a callable and record the
  outcome stamp the next ``is_due`` reads; an idempotent pipeline
  (every sink here upserts) makes re-runs safe, which is the actual
  correctness contract behind the reference's schedule.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from collections.abc import Callable

#: the reference's slots: 06:00 and 14:00 UTC (yml:6-7)
DEFAULT_UTC_HOURS: tuple[int, ...] = (6, 14)


def _utc(ts: dt.datetime) -> dt.datetime:
    if ts.tzinfo is None:
        return ts.replace(tzinfo=dt.timezone.utc)
    return ts.astimezone(dt.timezone.utc)


def next_due(after: dt.datetime, utc_hours: tuple[int, ...] = DEFAULT_UTC_HOURS) -> dt.datetime:
    """First schedule slot strictly after ``after``."""
    after = _utc(after)
    hours = sorted(utc_hours)
    day = after.date()
    for d in (day, day + dt.timedelta(days=1)):
        for h in hours:
            slot = dt.datetime(d.year, d.month, d.day, h, tzinfo=dt.timezone.utc)
            if slot > after:
                return slot
    raise AssertionError("unreachable: tomorrow always has a slot")


def is_due(
    now: dt.datetime,
    last_success: dt.datetime | None,
    utc_hours: tuple[int, ...] = DEFAULT_UTC_HOURS,
) -> bool:
    """True iff a schedule slot has elapsed since the last successful
    run (never ran -> due). Missed slots are made up on the next tick;
    multiple missed slots collapse into one run (idempotent sinks make
    that safe)."""
    if last_success is None:
        return True
    return next_due(last_success, utc_hours) <= _utc(now)


class RunLock:
    """Filesystem concurrency group: at most one holder per ``path``.

    ``acquire`` atomically publishes the lock file — contents included
    (private temp + ``os.link``) — with the holder's pid and UTC
    timestamp; a lock older than
    ``stale_after_s`` is considered abandoned (crashed runner) and
    taken over — the moral equivalent of the workflow timeout freeing
    the concurrency group (yml:21: ``timeout-minutes: 30``)."""

    def __init__(self, path: str, stale_after_s: float = 30 * 60) -> None:
        self.path = path
        self.stale_after_s = stale_after_s

    def acquire(self, now: dt.datetime | None = None) -> bool:
        now = _utc(now or dt.datetime.now(dt.timezone.utc))
        # Publish the lock atomically WITH its contents: write a private
        # temp file first, then os.link it to the lock path — link fails
        # with FileExistsError instead of overwriting. The previous
        # O_CREAT|O_EXCL + write-after scheme made the lock visible
        # EMPTY for a moment; a contender reading the empty file in that
        # window judged it unreadable->stale and stole a live lock (two
        # holders). With create-with-content there is no such window:
        # an unreadable lock can only be real corruption.
        tmp = f"{self.path}.new.{os.getpid()}.{id(self):x}"
        with open(tmp, "w") as fh:
            json.dump({"pid": os.getpid(), "acquired_at": now.isoformat()}, fh)
        try:
            os.link(tmp, self.path)
        except FileExistsError:
            os.unlink(tmp)
            try:
                with open(self.path) as fh:
                    held = json.load(fh)
                held_at = dt.datetime.fromisoformat(held["acquired_at"])
            except (OSError, ValueError, KeyError):
                held_at = None  # unreadable lock: treat as stale
            if held_at is not None and (now - held_at).total_seconds() < self.stale_after_s:
                return False
            # Stale: claim via atomic rename to a private name — a bare
            # unlink here could race another contender and delete the
            # WINNER'S fresh lock. FileNotFoundError on the rename is
            # contention (someone else claimed first), not an error: retry
            # and see their fresh lock. Because the claim itself races the
            # winner's re-create, re-check staleness on what we actually
            # grabbed; if it turns out fresh we stole a live lock — put it
            # back and report contention.
            takeover = f"{self.path}.stale.{os.getpid()}.{id(self):x}"
            try:
                os.rename(self.path, takeover)
            except FileNotFoundError:
                return self.acquire(now)
            try:
                with open(takeover) as fh:
                    grabbed_at = dt.datetime.fromisoformat(
                        json.load(fh)["acquired_at"]
                    )
            except (OSError, ValueError, KeyError):
                grabbed_at = None
            if (
                grabbed_at is not None
                and (now - grabbed_at).total_seconds() < self.stale_after_s
            ):
                # Give the live lock back. While self.path is absent a third
                # contender's link-publish can succeed, so a rename here
                # would atomically clobber THEIR fresh lock (two holders).
                # link() fails with FileExistsError instead of overwriting:
                # if someone re-created the path, leave their lock alone —
                # the live holder we robbed keeps running under our takeover
                # copy's content either way, and we report contention.
                try:
                    os.link(takeover, self.path)
                except FileExistsError:
                    pass
                os.unlink(takeover)
                return False
            os.unlink(takeover)
            return self.acquire(now)
        os.unlink(tmp)
        return True

    def release(self) -> None:
        # Only unlink a lock this process owns: if our lock was deemed stale
        # and taken over, self.path now belongs to another process and
        # unlinking it would break THEIR mutual exclusion. An unreadable
        # lock FAILS CLOSED (return, don't unlink): it isn't provably
        # ours, and deleting a live contender's lock would let a third
        # runner in — the exact failure this class exists to prevent.
        try:
            with open(self.path) as fh:
                if json.load(fh).get("pid") != os.getpid():
                    return
        except (OSError, ValueError):
            return
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


def run_guarded(
    job: Callable[[], object],
    state_dir: str,
    now: dt.datetime | None = None,
    utc_hours: tuple[int, ...] = DEFAULT_UTC_HOURS,
    force: bool = False,
) -> dict:
    """Schedule + concurrency guard around ``job`` (the engine-side
    form of the reference's workflow trigger). Returns a status dict:
    ``ran`` False with a reason when skipped (not due / already
    running), else the job's outcome; a success stamps
    ``last_success.json`` for the next ``is_due``. ``force`` is the
    manual ``workflow_dispatch`` path — it skips the schedule check
    but never the lock."""
    os.makedirs(state_dir, exist_ok=True)
    now = _utc(now or dt.datetime.now(dt.timezone.utc))
    stamp_path = os.path.join(state_dir, "last_success.json")
    last = None
    # a corrupt stamp (crash mid-write on an older version, disk fault)
    # reads as never-ran -> due now, instead of crash-looping the
    # scheduler forever on a JSONDecodeError
    try:
        with open(stamp_path) as fh:
            last = dt.datetime.fromisoformat(json.load(fh)["finished_at"])
    except (OSError, ValueError, KeyError):
        last = None
    if not force and not is_due(now, last, utc_hours):
        return {"ran": False, "reason": "not_due", "next_due": next_due(now, utc_hours).isoformat()}
    lock = RunLock(os.path.join(state_dir, "run.lock"))
    if not lock.acquire(now):
        return {"ran": False, "reason": "already_running"}
    try:
        result = job()
        # write-then-rename: the stamp is never visible half-written
        # (a truncate-then-write left a zero-byte stamp on crash)
        tmp = f"{stamp_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"finished_at": now.isoformat()}, fh)
        os.replace(tmp, stamp_path)
        return {"ran": True, "result": result}
    finally:
        lock.release()
