"""Spark 4 Python DataSource for the paginated REST endpoint.

The fully Catalyst-integrated form of the connector (SURVEY S1-S5,
reference ``pricenow_etl.py:116-190``): register once with
``spark.dataSource.register(RestPricesDataSource)`` and the scan
becomes declarative —

    spark.read.format("pricenow_prices")
         .option("api_path", "/api/pricing/admin/prices")
         .load()
         .filter((F.col("valid_at") >= "2025-12-13") & ...)

- **Partition-per-page parallelism**: ``partitions()`` emits one
  ``InputPartition`` per page up to ``max_pages``; each executor task
  fetches its own page, so ingest scales with the cluster, not the
  driver socket (the at-scale form of the reference's serial page
  loop, py:179-190).
- **Filter pushdown** (``pushFilters``, Spark 4.1): date-range bounds
  on ``valid_at`` and id equality/IN-lists on
  ``product_definition_id`` become API query parameters — the same
  parameters the reference hand-wires (py:145,165-168). All filters
  are also returned as leftovers so Spark re-evaluates them after the
  scan: pushdown here is a *hint* to the remote source, and a server
  that ignores a parameter can't corrupt results.
- **Injectable transport**: the ``transport`` option is a
  ``module:attr`` import path resolved on each executor (callables
  don't survive serialization into scan options); tests point it at a
  deterministic fake, production at ``rest.default_transport``.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from ..config import RestSourceConfig

PRICES_SCHEMA = "product_definition_id bigint, valid_at string, price bigint"

#: relational column -> API payload field (the payload is camelCase,
#: reference py:178)
FIELD_MAP = {
    "product_definition_id": "productDefinitionId",
    "valid_at": "validAt",
    "price": "price",
}


def resolve_transport(spec: str):
    """Import a transport callable from a ``module:attr`` spec."""
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


@dataclass
class _PagePartition(InputPartition):
    page: int


class RestPricesReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.pushed_params: dict[str, str] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Map sargable predicates onto API query parameters.

        Date bounds on valid_at -> date_from/date_to; id equality or
        IN-list -> the CSV ids parameter (the reference's pushed
        filters, py:145,165-168). Everything is returned as leftover:
        Spark re-applies each predicate post-scan, so a remote server
        that over-returns rows stays correct.
        """
        for f in filters:
            col = f.attribute[-1] if getattr(f, "attribute", None) else None
            if col == "valid_at":
                if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self.pushed_params["date_from"] = str(f.value)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self.pushed_params["date_to"] = str(f.value)
            elif col == "product_definition_id":
                if isinstance(f, EqualTo):
                    self.pushed_params["ids"] = str(f.value)
                elif isinstance(f, In):
                    # drop NULLs before sorting: IN (..., NULL) can
                    # never match NULL anyway, and sorted() on a
                    # None-containing list raises TypeError at plan
                    # time; the filter stays a leftover either way, so
                    # Spark re-applies the exact original semantics
                    vals = sorted(v for v in f.value if v is not None)
                    if vals:
                        self.pushed_params["ids"] = ",".join(str(v) for v in vals)
        return iter(filters)  # conservative: every filter re-checked by Spark

    def partitions(self) -> Sequence[InputPartition]:
        return [_PagePartition(p) for p in range(int(self.options.get("max_pages", 8)))]

    def read(self, partition: _PagePartition) -> Iterator[tuple[Any, ...]]:
        from .rest import PaginatedRestSource

        cfg = RestSourceConfig(
            base_url=self.options.get("base_url", ""),
            auth_url=self.options.get("auth_url", ""),
            client_id=self.options.get("client_id", ""),
            client_secret=self.options.get("client_secret", ""),
            page_size=int(self.options.get("page_size", 1000)),
            max_pages=int(self.options.get("max_pages", 8)),
        )
        transport = resolve_transport(
            self.options.get(
                "transport", "etl_pricenow_to_leukerbadb_spark.sources.rest:default_transport"
            )
        )
        src = PaginatedRestSource(cfg, transport)
        names = [f.name for f in self.schema.fields]
        rows = src.fetch_page(
            self.options.get("api_path", "/api/pricing/admin/prices"),
            dict(self.pushed_params),
            partition.page,
        )
        for r in rows:
            yield tuple(r.get(FIELD_MAP.get(n, n)) for n in names)


class RestPricesDataSource(DataSource):
    """``spark.read.format("pricenow_prices")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pricenow_prices"

    def schema(self) -> str:
        return PRICES_SCHEMA

    def reader(self, schema: StructType) -> RestPricesReader:
        return RestPricesReader(schema, dict(self.options))
