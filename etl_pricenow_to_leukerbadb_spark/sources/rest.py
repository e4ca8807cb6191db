"""Paginated, authenticated REST source (SURVEY S1-S7).

Re-expresses the reference's connector semantics
(``pricenow_etl.py:16-190``) as an injectable-transport source:

- OAuth2 client-credentials token with a two-level cache (memory +
  JSON state file) and early-refresh skew (S7, py:16-68);
- bearer-auth GET with a single refresh-and-retry on 401 (S6,
  py:71-85,127-141);
- page loop that stops on an empty or short page, bounded by
  ``max_pages`` (S3, py:179-190);
- filter parameters (id set, date range) pushed down to the remote
  endpoint (predicate pushdown, py:145,165-168).

``transport`` is any callable ``(method, url, params, headers, data)
-> (status, body_dict)``; tests inject fakes, production wires an HTTP
client. Driver-side fetch + ``createDataFrame`` is the default
materialization (dimension-scale payloads); ``fetch_pages_distributed``
fans pages out across executors via ``mapInPandas`` for large scans —
each partition fetches its own page range, so ingest parallelism
scales with the cluster rather than the driver's socket.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import RestSourceConfig

Transport = Callable[..., tuple[int, Any]]


def default_transport(method: str, url: str, params=None, headers=None, data=None):
    """stdlib urllib transport (no extra deps); 30 s timeout like the
    reference's requests calls (py:48,79)."""
    import urllib.parse
    import urllib.request

    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(
        url,
        method=method,
        headers=headers or {},
        data=urllib.parse.urlencode(data).encode() if data else None,
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode() or "null")
    except urllib.error.HTTPError as e:  # pragma: no cover - needs live server
        return e.code, None


@dataclass
class _CachedToken:
    token: str
    expires_at: float


class TokenProvider:
    """Client-credentials token with memory + file cache and a refresh
    skew so tokens are renewed *before* they expire (S7)."""

    def __init__(self, cfg: RestSourceConfig, transport: Transport, clock=time.time):
        self.cfg = cfg
        self.transport = transport
        self.clock = clock
        self._mem: _CachedToken | None = None
        if cfg.token_cache_path and os.path.exists(cfg.token_cache_path):
            try:
                with open(cfg.token_cache_path) as f:
                    d = json.load(f)
                self._mem = _CachedToken(d["token"], d["expires_at"])
            except (OSError, KeyError, ValueError):
                self._mem = None

    def _valid(self, tok: _CachedToken | None) -> bool:
        return bool(tok) and self.clock() < tok.expires_at - self.cfg.token_refresh_skew_s

    def invalidate(self) -> None:
        self._mem = None

    def get(self) -> str:
        if self._valid(self._mem):
            return self._mem.token
        status, body = self.transport(
            "POST",
            self.cfg.auth_url,
            data={
                "grant_type": "client_credentials",
                "client_id": self.cfg.client_id,
                "client_secret": self.cfg.client_secret,
            },
        )
        if status != 200 or not body or "access_token" not in body:
            raise RuntimeError(f"token endpoint returned {status}")
        self._mem = _CachedToken(
            body["access_token"], self.clock() + float(body.get("expires_in", 3600))
        )
        if self.cfg.token_cache_path:
            try:
                with open(self.cfg.token_cache_path, "w") as f:
                    json.dump(
                        {"token": self._mem.token, "expires_at": self._mem.expires_at}, f
                    )
            except OSError:
                pass
        return self._mem.token


def extract_rows(payload: Any) -> list[dict]:
    """Envelope normalization (S5, py:153-161): accept a bare list or a
    dict wrapping rows under data/items/results; anything else -> []."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict):
        for k in ("data", "items", "results"):
            v = payload.get(k)
            if isinstance(v, list):
                return v
    return []


class PaginatedRestSource:
    """Authenticated paginated scan with pushdown parameters."""

    def __init__(self, cfg: RestSourceConfig, transport: Transport | None = None, clock=time.time):
        self.cfg = cfg
        self.transport = transport or default_transport
        self.tokens = TokenProvider(cfg, self.transport, clock)

    def _authed_get(self, path: str, params: dict) -> Any:
        """Bearer GET with one refresh-retry on 401 (S6, py:80-84)."""
        url = self.cfg.base_url.rstrip("/") + path
        status, body = self.transport(
            "GET", url, params=params, headers={"Authorization": f"Bearer {self.tokens.get()}"}
        )
        if status == 401:
            self.tokens.invalidate()
            status, body = self.transport(
                "GET", url, params=params, headers={"Authorization": f"Bearer {self.tokens.get()}"}
            )
        if status != 200:
            raise RuntimeError(f"GET {path} returned {status}")
        return body

    def fetch_page(self, path: str, params: dict, page: int, page_size: int | None = None) -> list[dict]:
        """S2: one page, with the id/date filters as pushed-down params."""
        ps = page_size or self.cfg.page_size
        return extract_rows(
            self._authed_get(path, {**params, "page": page, "pageSize": ps})
        )

    def fetch_all(self, path: str, params: dict, page_size: int | None = None) -> list[dict]:
        """S3: loop pages until an empty or short page; hard bound at
        max_pages (py:179-190, same silent-cap semantics as the
        reference). Hitting the bound on a FULL page means the
        endpoint may hold more rows than were returned — logged as a
        warning so truncation is distinguishable from natural
        termination."""
        ps = page_size or self.cfg.page_size
        rows: list[dict] = []
        batch: list[dict] = []
        for page in range(self.cfg.max_pages):
            batch = self.fetch_page(path, params, page, ps)
            rows.extend(batch)
            if len(batch) < ps:
                break
        else:
            if len(batch) >= ps:
                import logging

                logging.getLogger(__name__).warning(
                    "fetch_all(%s): stopped at max_pages=%d with a full last "
                    "page — result may be truncated (%d rows returned)",
                    path,
                    self.cfg.max_pages,
                    len(rows),
                )
        return rows

    def to_dataframe(
        self, spark: SparkSession, path: str, params: dict, schema: T.StructType
    ) -> DataFrame:
        """Driver-side fetch -> DataFrame (fine at dimension scale)."""
        rows = self.fetch_all(path, params)
        return spark.createDataFrame([tuple(r.get(f.name) for f in schema.fields) for r in rows], schema)


def fetch_pages_distributed(
    spark: SparkSession,
    make_source: Callable[[], PaginatedRestSource],
    path: str,
    params: dict,
    n_pages: int,
    schema: T.StructType,
    page_size: int | None = None,
) -> DataFrame:
    """Executor-parallel page fetch: one task per page via mapInPandas
    over ``spark.range(n_pages)``. ``make_source`` is constructed per
    partition (transports/sockets are not serializable); the U1
    union-of-pages happens implicitly across partitions."""
    import pandas as pd

    names = [f.name for f in schema.fields]

    def fetch(batches: Iterable["pd.DataFrame"]):
        src = make_source()
        for pdf in batches:
            out = []
            for page in pdf["id"].tolist():
                for r in src.fetch_page(path, params, int(page), page_size):
                    out.append(tuple(r.get(n) for n in names))
            yield pd.DataFrame(out, columns=names)

    return (
        spark.range(n_pages)
        .repartition(min(n_pages, 64))
        .mapInPandas(fetch, schema=schema)
    )
