"""Every oracle-paired registry query must match DuckDB exactly at
sf0.001 — a local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY

from .oracle_util import compare_query

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_small, name):
    compare_query(spark, sf_small, name, REGISTRY[name])


def test_registry_nonempty():
    assert len(REGISTRY) >= 10


def test_all_queries_return_rows(spark, sf_small):
    for name, spec in REGISTRY.items():
        n = spec.fn(spark, sf_small).count()
        assert n >= 0, name


def test_driver_window_pins_resolve_and_fill_window():
    """Every pinned driver-window name must exist in the registry (a
    typo would silently fall out of the correctness window), the
    window must hold exactly 50 entries with the pinned names first,
    and every pin must be ORACLE-PAIRED — a no-oracle entry can never
    produce a green driver row, so pinning one burns a hard-signal
    slot (the r4 ann_pq_adc_topk lesson)."""
    from etl_pricenow_to_leukerbadb_spark.plans import _DRIVER_WINDOW_FIRST

    missing = [n for n in _DRIVER_WINDOW_FIRST if n not in REGISTRY]
    assert not missing, f"pinned names not in REGISTRY: {missing}"
    assert list(REGISTRY)[: len(_DRIVER_WINDOW_FIRST)] == list(_DRIVER_WINDOW_FIRST)
    assert len(_DRIVER_WINDOW_FIRST) == 50
    no_oracle_pins = [
        n for n in _DRIVER_WINDOW_FIRST if REGISTRY[n].oracle is None
    ]
    assert not no_oracle_pins, (
        f"no-oracle entries pinned into the driver window: {no_oracle_pins}"
    )


def test_no_oracle_paired_entry_goes_stale():
    """Explicit staleness policy for the 50-slot driver window over a
    124-entry registry: under the CURRENT pin list, no oracle-paired
    entry may end the upcoming round more than STALENESS_BUDGET (3)
    rounds since its last green driver row. Catches both a pin list
    that forgets an aging entry and a new registration that never gets
    front-loaded."""
    from tools.last_green import stale_entries

    stale = stale_entries(REGISTRY)
    assert not stale, (
        "oracle-paired entries would exceed the staleness budget under "
        f"the current driver-window pins: {stale}"
    )
