"""The repaired recorded-bench chain (r11 verdict ask #1 + what's-wrong
#1): bench.py's prior loader must survive every artifact shape the
chain has produced — full side files, driver wrappers, and the
BENCH_r11 failure (``parsed: null`` with a truncated tail) — and the
round inference must never let bench's own side files advance the
label (a second in-round run overwrites, it does not mint round N+1).
Pure-python: the helpers read a directory of JSON files, redirected
here by monkeypatching the module's ``__file__``."""

from __future__ import annotations

import json

import bench


def _point_at(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))


def test_no_artifacts_means_no_prior_and_round_one(monkeypatch, tmp_path):
    _point_at(monkeypatch, tmp_path)
    assert bench._load_prior_queries() == ({}, None)
    assert bench._bench_round() == 1


def test_parsed_null_with_headless_tail_degrades_to_older_prior(
    monkeypatch, tmp_path
):
    """The exact BENCH_r11 shape: parsed null, tail starting mid-line
    past the queries dict — unrecoverable, so the loader falls back to
    the newest OLDER record instead of running with no prior."""
    _point_at(monkeypatch, tmp_path)
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps(
            {"parsed": None, "tail": 'ead": {"a": 0.1}, "sf": 0.1}'}
        )
    )
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 1.5}}})
    )
    assert bench._load_prior_queries() == ({"q1": 1.5}, "BENCH_r10.json")


def test_tail_recovery_salvages_marginal_overflow(monkeypatch, tmp_path):
    """When the truncation DOES leave the queries dict intact (a small
    overflow), the per-query floats are recovered from the tail."""
    _point_at(monkeypatch, tmp_path)
    (tmp_path / "BENCH_r9.json").write_text(
        json.dumps(
            {
                "parsed": None,
                "tail": '{"metric": "x", "queries": {"q1": 1.25, '
                '"q2": 3.0}, "spr',
            }
        )
    )
    queries, src = bench._load_prior_queries()
    assert queries == {"q1": 1.25, "q2": 3.0} and src == "BENCH_r9.json"


def test_tail_recovery_handles_scientific_notation(monkeypatch, tmp_path):
    """json.dumps emits scientific notation for sub-1e-4 timings
    (ADVICE r12): the salvage regex must capture the exponent, not the
    mantissa alone — 8.3e-05 read as 8.3s would inflate the 2.5x
    re-run baseline for that query by five orders of magnitude."""
    _point_at(monkeypatch, tmp_path)
    (tmp_path / "BENCH_r9.json").write_text(
        json.dumps(
            {
                "parsed": None,
                "tail": '{"metric": "x", "queries": {"q1": 8.3e-05, '
                '"q2": 1.2E+01, "q3": 2e3, "q4": 0.5}, "spr',
            }
        )
    )
    queries, src = bench._load_prior_queries()
    assert queries == {
        "q1": 8.3e-05,
        "q2": 12.0,
        "q3": 2000.0,
        "q4": 0.5,
    } and src == "BENCH_r9.json"


def test_full_record_preferred_over_same_round_wrapper(
    monkeypatch, tmp_path
):
    _point_at(monkeypatch, tmp_path)
    (tmp_path / "BENCH_r7.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 9.9}}})
    )
    (tmp_path / "BENCH_FULL_r7.json").write_text(
        json.dumps({"queries": {"q1": 1.1}})
    )
    assert bench._load_prior_queries() == ({"q1": 1.1}, "BENCH_FULL_r7.json")


def test_round_anchors_on_driver_records_only(monkeypatch, tmp_path):
    """BENCH_FULL files must not advance the round label: after bench
    writes BENCH_FULL_r12, a re-run in the same round still targets
    r12 (overwrite), because only the driver's BENCH_r*.json anchor."""
    _point_at(monkeypatch, tmp_path)
    (tmp_path / "BENCH_r11.json").write_text("{}")
    assert bench._bench_round() == 12
    (tmp_path / "BENCH_FULL_r12.json").write_text("{}")
    assert bench._bench_round() == 12  # re-run overwrites, no r13 mint
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "11")
    assert bench._bench_round() == 11  # explicit backfill override


def test_corrupt_artifacts_skipped_not_fatal(monkeypatch, tmp_path):
    _point_at(monkeypatch, tmp_path)
    (tmp_path / "BENCH_FULL_r8.json").write_text("{not json")
    (tmp_path / "BENCH_r7.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 2.0}}})
    )
    assert bench._load_prior_queries() == ({"q1": 2.0}, "BENCH_r7.json")
