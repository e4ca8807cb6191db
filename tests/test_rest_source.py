"""REST source connector semantics (SURVEY S1-S7) with fake transports."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from etl_pricenow_to_leukerbadb_spark.config import RestSourceConfig
from etl_pricenow_to_leukerbadb_spark.sources.rest import (
    PaginatedRestSource,
    TokenProvider,
    extract_rows,
    fetch_pages_distributed,
)

CFG = RestSourceConfig(
    base_url="https://api.example.test",
    auth_url="https://auth.example.test/token",
    client_id="id",
    client_secret="secret",
    page_size=3,
    max_pages=10,
)


class FakeApi:
    """60 rows, served 3 per page, auth-checked."""

    def __init__(self, n_rows=8, expires_in=3600, fail_first_get_with_401=False):
        self.rows = [{"productDefinitionId": i, "validAt": "2026-01-01", "price": i * 10} for i in range(n_rows)]
        self.token_calls = 0
        self.get_calls = 0
        self.expires_in = expires_in
        self.fail_first = fail_first_get_with_401
        self.seen_params: list[dict] = []

    def __call__(self, method, url, params=None, headers=None, data=None):
        if method == "POST":
            self.token_calls += 1
            return 200, {"access_token": f"tok{self.token_calls}", "expires_in": self.expires_in}
        self.get_calls += 1
        if self.fail_first and self.get_calls == 1:
            return 401, None
        if headers.get("Authorization", "").startswith("Bearer tok") is False:
            return 401, None
        self.seen_params.append(dict(params))
        page, ps = params["page"], params["pageSize"]
        return 200, {"data": self.rows[page * ps : (page + 1) * ps]}


def test_envelope_variants():
    rows = [{"a": 1}]
    assert extract_rows(rows) == rows
    assert extract_rows({"data": rows}) == rows
    assert extract_rows({"items": rows}) == rows
    assert extract_rows({"results": rows}) == rows
    assert extract_rows({"other": rows}) == []
    assert extract_rows("garbage") == []


def test_pagination_stops_on_short_page():
    api = FakeApi(n_rows=8)  # pages: 3,3,2 -> short page ends the loop
    src = PaginatedRestSource(CFG, transport=api)
    rows = src.fetch_all("/prices", {"ids": "1,2"})
    assert [r["productDefinitionId"] for r in rows] == list(range(8))
    assert api.get_calls == 3  # no extra empty-page probe


def test_pagination_exact_page_boundary_probes_next():
    api = FakeApi(n_rows=6)  # pages: 3,3,0 -> empty page ends the loop
    src = PaginatedRestSource(CFG, transport=api)
    assert len(src.fetch_all("/prices", {})) == 6
    assert api.get_calls == 3


def test_max_pages_bound():
    api = FakeApi(n_rows=1000)
    src = PaginatedRestSource(CFG, transport=api)
    rows = src.fetch_all("/prices", {})
    assert len(rows) == CFG.max_pages * CFG.page_size  # bounded, no runaway


def test_pushdown_params_reach_the_wire():
    api = FakeApi(n_rows=1)
    src = PaginatedRestSource(CFG, transport=api)
    src.fetch_all("/prices", {"ids": "1,2,3", "dateFrom": "2026-01-01", "dateTo": "2026-04-12"})
    assert api.seen_params[0]["ids"] == "1,2,3"
    assert api.seen_params[0]["dateFrom"] == "2026-01-01"


def test_token_cached_in_memory_and_file(tmp_path):
    clock = [1000.0]
    cache = str(tmp_path / "tok.json")
    cfg = RestSourceConfig(**{**CFG.__dict__, "token_cache_path": cache})
    api = FakeApi()
    tp = TokenProvider(cfg, api, clock=lambda: clock[0])
    t1 = tp.get()
    t2 = tp.get()  # memory cache hit
    assert t1 == t2 and api.token_calls == 1
    # a new provider instance reads the file cache
    tp2 = TokenProvider(cfg, api, clock=lambda: clock[0])
    assert tp2.get() == t1 and api.token_calls == 1
    assert json.load(open(cache))["token"] == t1


def test_token_refreshed_before_expiry_skew():
    clock = [0.0]
    api = FakeApi(expires_in=100)
    tp = TokenProvider(CFG, api, clock=lambda: clock[0])
    tp.get()
    clock[0] = 45.0  # valid (100 - 60s skew = 40s boundary crossed at 40)
    assert api.token_calls == 1
    tp.get()
    assert api.token_calls == 2  # refreshed early, 55 s before expiry


def test_401_triggers_single_refresh_retry():
    api = FakeApi(n_rows=1, fail_first_get_with_401=True)
    src = PaginatedRestSource(CFG, transport=api)
    rows = src.fetch_all("/prices", {})
    assert len(rows) == 1
    assert api.token_calls == 2  # initial token + refresh after 401


def test_driver_side_dataframe(spark):
    api = FakeApi(n_rows=5)
    src = PaginatedRestSource(CFG, transport=api)
    schema = T.StructType(
        [
            T.StructField("productDefinitionId", T.LongType()),
            T.StructField("validAt", T.StringType()),
            T.StructField("price", T.LongType()),
        ]
    )
    df = src.to_dataframe(spark, "/prices", {}, schema)
    assert df.count() == 5
    assert df.columns == ["productDefinitionId", "validAt", "price"]


def test_distributed_page_fetch(spark):
    schema = T.StructType(
        [
            T.StructField("productDefinitionId", T.LongType()),
            T.StructField("validAt", T.StringType()),
            T.StructField("price", T.LongType()),
        ]
    )
    # the fake transport must be constructible on executors
    def make_source():
        return PaginatedRestSource(CFG, transport=FakeApi(n_rows=30))

    df = fetch_pages_distributed(spark, make_source, "/prices", {}, n_pages=10, schema=schema)
    assert df.count() == 30
    assert df.agg({"price": "max"}).collect()[0][0] == 290


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource (rest_datasource.py)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.datasource import (  # noqa: E402
    GreaterThanOrEqual,
    In,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType  # noqa: E402

from etl_pricenow_to_leukerbadb_spark.sources.rest_datasource import (  # noqa: E402
    PRICES_SCHEMA,
    RestPricesDataSource,
    RestPricesReader,
)

FIXTURE_TRANSPORT = "etl_pricenow_to_leukerbadb_spark.sources.rest_fixtures:fixture_transport"


def test_datasource_pushdown_param_mapping(spark):
    reader = RestPricesReader(StructType.fromDDL(PRICES_SCHEMA), {})
    filters = [
        In(("product_definition_id",), (3, 1, 2)),
        GreaterThanOrEqual(("valid_at",), "2025-12-10"),
        LessThanOrEqual(("valid_at",), "2025-12-20"),
    ]
    leftover = list(reader.pushFilters(filters))
    assert reader.pushed_params == {
        "ids": "1,2,3",
        "date_from": "2025-12-10",
        "date_to": "2025-12-20",
    }
    assert leftover == filters  # conservative: Spark re-checks everything


def test_datasource_end_to_end_with_pushdown(spark):
    spark.dataSource.register(RestPricesDataSource)
    df = (
        spark.read.format("pricenow_prices")
        .option("transport", FIXTURE_TRANSPORT)
        .option("base_url", "https://api.example.test")
        .option("auth_url", "https://auth.example.test/token")
        .option("client_id", "id")
        .option("client_secret", "secret")
        .option("page_size", "40")
        .option("max_pages", "4")
        .load()
    )
    filtered = df.filter(
        F.col("product_definition_id").isin(2, 3)
        & (F.col("valid_at") >= "2025-12-05")
        & (F.col("valid_at") <= "2025-12-31")
    )
    rows = filtered.collect()
    assert len(rows) > 0
    assert all(r.product_definition_id in (2, 3) for r in rows)
    assert all("2025-12-05" <= r.valid_at <= "2025-12-31" for r in rows)
    # the fixture's sentinel (price = -1) appears only when the id
    # filter was NOT pushed into the request: its absence proves the
    # predicate reached the remote source, not just the post-scan filter
    assert not any(r.price == -1 for r in rows)


def test_datasource_unfiltered_scan_sees_sentinel(spark):
    spark.dataSource.register(RestPricesDataSource)
    df = (
        spark.read.format("pricenow_prices")
        .option("transport", FIXTURE_TRANSPORT)
        .option("base_url", "https://api.example.test")
        .option("auth_url", "https://auth.example.test/token")
        .option("client_id", "id")
        .option("client_secret", "secret")
        .option("page_size", "300")
        .option("max_pages", "2")
        .load()
    )
    prices = [r.price for r in df.collect()]
    assert -1 in prices  # no pushdown params -> sentinel present
    assert len(prices) == 251


def test_config_validation_fails_fast():
    """Reference-parity fail-fast (py:405-412) — but checking every
    field, not the reference's secret-checked-twice bug (SURVEY §2.10:
    documented, not reproduced)."""
    with pytest.raises(ValueError, match="client_id") as ei:
        RestSourceConfig(base_url="https://x", auth_url="").validate()
    assert "auth_url" in str(ei.value) and "client_secret" in str(ei.value)
    CFG.validate()  # fully-populated config passes


def test_datasource_parallel_pages_partition_per_page(spark):
    """The scan must parallelize page fetches: one input partition per
    page, each fetching exactly its own page slice, and the union of
    the partitions reconstructing the full result with no duplicates."""
    spark.dataSource.register(RestPricesDataSource)
    df = (
        spark.read.format("pricenow_prices")
        .option("transport", FIXTURE_TRANSPORT)
        .option("base_url", "https://api.example.test")
        .option("auth_url", "https://auth.example.test/token")
        .option("client_id", "id")
        .option("client_secret", "secret")
        .option("page_size", "64")
        .option("max_pages", "8")
        .load()
    )
    per_part = {
        r.pid: r.n
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(per_part.values())
    # several partitions fetched concurrently, each bounded by the page
    # size, and their union is the complete de-duplicated result set
    assert len(per_part) >= 3
    assert all(n <= 64 for n in per_part.values())
    assert total == 251  # universe rows + the no-pushdown sentinel
    assert df.distinct().count() == total
