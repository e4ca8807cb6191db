"""Scheduler-analog tests: due-slot math, concurrency lock, guarded
runs (the reference's twice-daily cron + concurrency group,
run_pricenow.yml:3-16)."""

from __future__ import annotations

import datetime as dt
import json

from etl_pricenow_to_leukerbadb_spark.orchestrate import (
    RunLock,
    is_due,
    next_due,
    run_guarded,
)

UTC = dt.timezone.utc


def test_next_due_slots():
    assert next_due(dt.datetime(2026, 1, 1, 5, 0, tzinfo=UTC)) == dt.datetime(2026, 1, 1, 6, tzinfo=UTC)
    assert next_due(dt.datetime(2026, 1, 1, 6, 0, tzinfo=UTC)) == dt.datetime(2026, 1, 1, 14, tzinfo=UTC)
    # after the last slot of the day -> tomorrow's first
    assert next_due(dt.datetime(2026, 1, 1, 20, 0, tzinfo=UTC)) == dt.datetime(2026, 1, 2, 6, tzinfo=UTC)


def test_is_due_semantics():
    ran_at = dt.datetime(2026, 1, 1, 6, 30, tzinfo=UTC)
    assert is_due(dt.datetime(2026, 1, 1, 7, 0, tzinfo=UTC), None)  # never ran
    assert not is_due(dt.datetime(2026, 1, 1, 13, 59, tzinfo=UTC), ran_at)
    assert is_due(dt.datetime(2026, 1, 1, 14, 0, tzinfo=UTC), ran_at)
    # two missed slots collapse into one due run
    assert is_due(dt.datetime(2026, 1, 3, 9, 0, tzinfo=UTC), ran_at)


def test_run_lock_excludes_and_takes_over_stale(tmp_path):
    lock = RunLock(str(tmp_path / "l.lock"), stale_after_s=600)
    now = dt.datetime(2026, 1, 1, 6, 0, tzinfo=UTC)
    assert lock.acquire(now)
    assert not RunLock(str(tmp_path / "l.lock"), stale_after_s=600).acquire(
        now + dt.timedelta(minutes=5)
    )  # held and fresh
    assert RunLock(str(tmp_path / "l.lock"), stale_after_s=600).acquire(
        now + dt.timedelta(minutes=11)
    )  # stale -> takeover


def test_run_lock_stale_takeover_race_is_contention(tmp_path, monkeypatch):
    """Two contenders observing the same stale lock: the loser's rename
    hits FileNotFoundError and must resolve as contention (False when
    the winner's fresh lock exists), never propagate."""
    import os as _os

    path = str(tmp_path / "l.lock")
    now = dt.datetime(2026, 1, 1, 6, 0, tzinfo=UTC)
    stale_holder = RunLock(path, stale_after_s=600)
    assert stale_holder.acquire(now)  # becomes stale below

    loser = RunLock(path, stale_after_s=600)
    real_rename = _os.rename
    intervened = []

    def winner_steals_first(src, dst):
        # simulate the interleaving once: the winner takes over and
        # re-acquires between the loser's stat and its claim-rename, so
        # the loser's rename grabs the winner's FRESH lock
        if not intervened:
            intervened.append(1)
            real_rename(src, src + ".won")
            _os.unlink(src + ".won")
            assert RunLock(path, stale_after_s=600).acquire(
                now + dt.timedelta(minutes=11)
            )
        return real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", winner_steals_first)
    got = loser.acquire(now + dt.timedelta(minutes=11))
    monkeypatch.undo()
    assert got is False  # winner holds a fresh lock; loser backed off
    assert _os.path.exists(path)  # ...and the fresh lock was given back
    # a third contender still sees the winner's live lock
    assert not RunLock(path, stale_after_s=600).acquire(
        now + dt.timedelta(minutes=12)
    )


def test_run_guarded_schedule_lock_and_stamp(tmp_path):
    state = str(tmp_path / "state")
    calls = []
    t0 = dt.datetime(2026, 1, 1, 6, 5, tzinfo=UTC)

    out = run_guarded(lambda: calls.append(1) or "ok", state, now=t0)
    assert out == {"ran": True, "result": "ok"} and calls == [1]
    # same slot again: not due
    out2 = run_guarded(lambda: calls.append(2), state, now=t0 + dt.timedelta(minutes=10))
    assert out2["ran"] is False and out2["reason"] == "not_due" and calls == [1]
    # forced manual dispatch runs anyway
    out3 = run_guarded(lambda: calls.append(3) or "ok", state, now=t0 + dt.timedelta(minutes=10), force=True)
    assert out3["ran"] is True and calls == [1, 3]
    # concurrent FRESH holder -> skip, not cancel (a stale one would be
    # taken over, per the timeout semantics)
    RunLock(str(tmp_path / "state" / "run.lock")).acquire(
        t0 + dt.timedelta(hours=8, minutes=55)
    )
    out4 = run_guarded(lambda: calls.append(4), state, now=t0 + dt.timedelta(hours=9))
    assert out4 == {"ran": False, "reason": "already_running"} and calls == [1, 3]
    # a failing job must release the lock and not stamp success
    RunLock(str(tmp_path / "state" / "run.lock")).release()
    stamp = json.load(open(tmp_path / "state" / "last_success.json"))
    try:
        run_guarded(lambda: 1 / 0, state, now=t0 + dt.timedelta(days=1))
    except ZeroDivisionError:
        pass
    assert json.load(open(tmp_path / "state" / "last_success.json")) == stamp
    assert run_guarded(lambda: "after-fail", state, now=t0 + dt.timedelta(days=1))["ran"] is True


def test_run_lock_give_back_does_not_clobber_third_contender(tmp_path, monkeypatch):
    """If a third contender acquires while the loser holds the stolen
    fresh lock under its takeover name, the give-back must NOT replace
    the third contender's lock (two-holder violation); link() fails
    closed where rename() would clobber."""
    import os as _os

    path = str(tmp_path / "l.lock")
    now = dt.datetime(2026, 1, 1, 6, 0, tzinfo=UTC)
    assert RunLock(path, stale_after_s=600).acquire(now)  # goes stale below

    loser = RunLock(path, stale_after_s=600)
    real_rename, real_link = _os.rename, _os.link
    staged = []

    def winner_steals_first(src, dst):
        # winner takes over the stale lock and re-acquires fresh, so the
        # loser's claim-rename grabs the winner's FRESH lock
        if not staged:
            staged.append("rename")
            real_rename(src, src + ".won")
            _os.unlink(src + ".won")
            assert RunLock(path, stale_after_s=600).acquire(
                now + dt.timedelta(minutes=11)
            )
        return real_rename(src, dst)

    def third_sneaks_in(src, dst):
        # between the loser's rename-away and its give-back, a third
        # contender sees no lock file and acquires
        if "link" not in staged:
            staged.append("link")
            assert RunLock(path, stale_after_s=600).acquire(
                now + dt.timedelta(minutes=12)
            )
        return real_link(src, dst)

    monkeypatch.setattr(_os, "rename", winner_steals_first)
    monkeypatch.setattr(_os, "link", third_sneaks_in)
    got = loser.acquire(now + dt.timedelta(minutes=11))
    monkeypatch.undo()
    assert got is False
    # the surviving lock is the THIRD contender's (minute 12), untouched
    held = json.load(open(path))
    assert held["acquired_at"] == (now + dt.timedelta(minutes=12)).isoformat()
    # and no takeover temp file leaked
    assert _os.listdir(tmp_path) == ["l.lock"]


def test_run_lock_release_by_non_owner_is_noop(tmp_path):
    """release() must not unlink a lock held by another process — a
    holder whose lock was stolen-as-stale would otherwise break the new
    holder's mutual exclusion on its way out."""
    import os as _os

    path = str(tmp_path / "l.lock")
    now = dt.datetime(2026, 1, 1, 6, 0, tzinfo=UTC)
    other = RunLock(path, stale_after_s=600)
    assert other.acquire(now)
    # rewrite the lock as if owned by a different pid
    with open(path, "w") as fh:
        json.dump({"pid": _os.getpid() + 99999, "acquired_at": now.isoformat()}, fh)
    RunLock(path, stale_after_s=600).release()
    assert _os.path.exists(path)  # foreign lock untouched
    # an unreadable lock FAILS CLOSED on release: it is not provably
    # ours, and unlinking a live contender's mid-takeover lock would
    # admit a third holder. Recovery belongs to acquire(), whose
    # rename-based stale takeover handles corrupt locks without ever
    # bare-unlinking a fresh one.
    with open(path, "w") as fh:
        fh.write("not json")
    RunLock(path, stale_after_s=600).release()
    assert _os.path.exists(path)
    # ...and the next acquire() still recovers the corrupt lock
    assert RunLock(path, stale_after_s=600).acquire(now)
