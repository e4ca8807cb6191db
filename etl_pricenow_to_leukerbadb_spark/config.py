"""Configuration surface for the engine.

The reference hardcodes its season window and closure calendar
(``scripts/pricenow_etl.py:331-332`` and ``:353-358``); per SURVEY §7.1
those are lifted into parameters here. The credential surface mirrors
the reference's ``.env.example`` shape without naming any real system.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field


def _d(s: str | dt.date) -> dt.date:
    return s if isinstance(s, dt.date) else dt.date.fromisoformat(s)


@dataclass(frozen=True)
class SeasonConfig:
    """Season window + closure calendar for the active-flag derivation.

    Mirrors the semantics of the reference's hardcoded values
    (``pricenow_etl.py:331-332,353-358``) as parameters:

    - ``day_overrides``: exact dates whose days-left value is forced
      (reference: 2025-12-13 -> 2, 2025-12-14 -> 1).
    - ``closed_open_intervals``: (lo, hi) *open* intervals where the
      resort is closed, days-left forced to 0 (reference:
      (2025-12-14, 2025-12-19)).
    """

    start: dt.date
    end: dt.date
    day_overrides: dict[dt.date, int] = field(default_factory=dict)
    closed_open_intervals: list[tuple[dt.date, dt.date]] = field(default_factory=list)

    @staticmethod
    def reference_2025() -> "SeasonConfig":
        """The exact configuration the reference hardcodes."""
        return SeasonConfig(
            start=_d("2025-12-13"),
            end=_d("2026-04-12"),
            day_overrides={_d("2025-12-13"): 2, _d("2025-12-14"): 1},
            closed_open_intervals=[(_d("2025-12-14"), _d("2025-12-19"))],
        )


@dataclass(frozen=True)
class RestSourceConfig:
    """Connection surface for the paginated REST source (SURVEY S1-S7).

    Values default from environment variables mirroring the reference's
    ``.env.example`` credential surface; no live endpoint is required —
    tests inject a fake transport.
    """

    base_url: str = ""
    auth_url: str = ""
    client_id: str = ""
    client_secret: str = ""
    page_size: int = 1000
    max_pages: int = 1000
    timeout_s: float = 30.0
    token_refresh_skew_s: float = 60.0  # refresh 60 s before expiry (py:17-24)
    token_cache_path: str | None = None

    @staticmethod
    def from_env(prefix: str = "PRICE_API") -> "RestSourceConfig":
        g = os.environ.get
        return RestSourceConfig(
            base_url=g(f"{prefix}_BASE_URL", ""),
            auth_url=g(f"{prefix}_AUTH_URL", ""),
            client_id=g(f"{prefix}_CLIENT_ID", ""),
            client_secret=g(f"{prefix}_CLIENT_SECRET", ""),
        )

    def validate(self) -> None:
        """Fail fast on missing credentials (reference py:405-412 —
        note the reference's bug of checking the secret twice and never
        the client id; we check both)."""
        missing = [
            n
            for n, v in [
                ("base_url", self.base_url),
                ("auth_url", self.auth_url),
                ("client_id", self.client_id),
                ("client_secret", self.client_secret),
            ]
            if not v
        ]
        if missing:
            raise ValueError(f"missing REST source config: {', '.join(missing)}")
