"""Deterministic fake transport for the REST source/DataSource tests.

Serves the reference API's shape (``pricenow_etl.py:163-178``) from a
synthetic 250-row change-point universe with no network. Honors the
pushed-down query parameters (ids CSV, date range, page/pageSize) the
way the real endpoint does.

Pushdown sentinel: when the ``ids`` parameter is ABSENT the payload
includes one extra row with ``price = -1`` that would survive an
engine-side ``product_definition_id`` filter — so an end-to-end test
can distinguish "the filter was pushed into the request" from "Spark
filtered after an unfiltered fetch".
"""

from __future__ import annotations

import datetime as dt

_D0 = dt.date(2025, 12, 1)


def _universe() -> list[dict]:
    rows = []
    for i in range(250):
        rows.append(
            {
                "productDefinitionId": (i % 8) + 1,
                "validAt": (_D0 + dt.timedelta(days=i % 45)).isoformat(),
                "price": 1000 + i,
            }
        )
    return rows


def fixture_transport(method: str, url: str, params=None, headers=None, data=None):
    if method == "POST":  # token endpoint
        return 200, {"access_token": "fixture-token", "expires_in": 3600}
    params = params or {}
    if headers is None or "Bearer" not in str(headers.get("Authorization", "")):
        return 401, None
    page = int(params.get("page", 0))
    ps = int(params.get("pageSize", 1000))
    rows = _universe()
    if "ids" in params:
        ids = {int(x) for x in str(params["ids"]).split(",") if x}
        rows = [r for r in rows if r["productDefinitionId"] in ids]
    else:
        # sentinel: only present when the id filter was NOT pushed down
        rows = rows + [
            {"productDefinitionId": 2, "validAt": "2025-12-05", "price": -1}
        ]
    if "date_from" in params:
        rows = [r for r in rows if r["validAt"] >= str(params["date_from"])]
    if "date_to" in params:
        rows = [r for r in rows if r["validAt"] <= str(params["date_to"])]
    return 200, {"data": rows[page * ps : (page + 1) * ps]}
