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
    typo would silently fall out of the correctness window), and the
    window must hold exactly 50 entries with the pinned names first."""
    from etl_pricenow_to_leukerbadb_spark.plans import _DRIVER_WINDOW_FIRST

    missing = [n for n in _DRIVER_WINDOW_FIRST if n not in REGISTRY]
    assert not missing, f"pinned names not in REGISTRY: {missing}"
    assert list(REGISTRY)[: len(_DRIVER_WINDOW_FIRST)] == list(_DRIVER_WINDOW_FIRST)
    assert len(_DRIVER_WINDOW_FIRST) == 50
