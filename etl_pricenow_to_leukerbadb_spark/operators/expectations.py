"""Declarative data-quality expectations, evaluated in one pass.

The validation suite a 100 TB ingest runs before accepting a batch:
not-null, uniqueness, range, accepted-values, and referential-
integrity rules declared as data, compiled into the FEWEST Spark
passes that can evaluate them:

- every scalar rule (not_null / in_range / accepted_values) becomes a
  conditional-count expression in ONE aggregate over ONE scan of the
  table, however many rules there are (the Deequ/Great-Expectations
  execution trick — rule count must not multiply scan count at 100 TB);
- uniqueness rules ride the same single aggregate via
  count_if(all key cols non-null) - count_distinct(cols) — SQL
  UNIQUE-constraint semantics, NULL-keyed rows exempt;
- referential rules each add one LEFT ANTI join against the referenced
  key set (broadcast when the dimension is small, which is the normal
  shape for FK targets).

Output: one row per rule — (rule, kind, n_violations, passed) — tiny
by construction, whatever the input size.

No counterpart in the reference (its quality checking is implicit in
pandas dropna, scripts/pricenow_etl.py:60-66); modeled instead on the
published Deequ "compute all metrics in one aggregation" design.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """One declared rule. ``kind`` selects the semantics:

    - ``not_null``:        col must not be NULL
    - ``unique``:          cols must be row-unique (violations = rows
                           beyond the first per duplicate key;
                           NULL-keyed rows are exempt, as in a SQL
                           UNIQUE constraint — pair with not_null to
                           forbid NULL keys)
    - ``in_range``:        lo <= col <= hi (NULLs don't violate —
                           pair with not_null to forbid them)
    - ``accepted_values``: col must be one of ``values``
    - ``referential``:     col's non-null values must exist in
                           ``ref_df``'s ``ref_col`` key set.
                           ``ref_broadcast`` hints a broadcast of the
                           key set — right for the usual dim-sized FK
                           target; set False for a large reference
                           (FK into a fact table) so the planner/AQE
                           picks the join strategy from actual sizes
    """

    name: str
    kind: str
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    ref_df: DataFrame | None = None
    ref_col: str | None = None
    ref_broadcast: bool = True
    tags: tuple[str, ...] = field(default_factory=tuple)


def _violation_expr(e: Expectation) -> Column:
    col = F.col(e.cols[0]) if e.cols else None
    if e.kind == "not_null":
        return F.count_if(col.isNull())
    if e.kind == "unique":
        # SQL UNIQUE-constraint semantics: rows with any NULL key
        # component are exempt (count_distinct already skips them, so
        # the minuend must too — counting ALL rows made every
        # NULL-keyed row a violation even with no duplicate present;
        # declare a not_null rule alongside to forbid NULL keys)
        all_nonnull = reduce(and_, (F.col(c).isNotNull() for c in e.cols))
        return F.count_if(all_nonnull) - F.count_distinct(
            *[F.col(c) for c in e.cols]
        )
    if e.kind == "in_range":
        return F.count_if((col < F.lit(e.lo)) | (col > F.lit(e.hi)))
    if e.kind == "accepted_values":
        return F.count_if(~col.isin(list(e.values)) & col.isNotNull())
    raise ValueError(f"unknown scalar expectation kind: {e.kind!r}")


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all rules; returns (rule, kind, n_violations, passed).

    Scalar rules share one aggregate over one scan; each referential
    rule adds one anti-join count (broadcast-hinted right side by
    default — the typical dim-sized FK shape; per-rule
    ``ref_broadcast=False`` leaves the strategy to the planner for
    large references). Deterministic output order: rules in declared
    order via an explicit sort key, so the tiny result is stable."""
    if not expectations:
        raise ValueError("check_expectations: no expectations declared")
    # carry each rule's position in the declared list as its sort key —
    # positional, not equality-based (two field-identical rules must
    # keep distinct ordinals, and .index() would collapse them)
    scalar = [(i, e) for i, e in enumerate(expectations) if e.kind != "referential"]
    referential = [(i, e) for i, e in enumerate(expectations) if e.kind == "referential"]

    parts: list[DataFrame] = []

    if scalar:
        agg = df.agg(
            *[_violation_expr(e).alias(f"__v{i}") for i, (_, e) in enumerate(scalar)]
        )
        # one source row -> one row per scalar rule, via the same
        # struct-array explode dq_profile uses (still a single scan)
        structs = F.array(
            *[
                F.struct(
                    F.lit(ord_).alias("__ord"),
                    F.lit(e.name).alias("rule"),
                    F.lit(e.kind).alias("kind"),
                    F.col(f"__v{i}").cast("long").alias("n_violations"),
                )
                for i, (ord_, e) in enumerate(scalar)
            ]
        )
        parts.append(
            agg.select(F.explode(structs).alias("r")).select("r.*")
        )

    for ord_, e in referential:
        if e.ref_df is None or e.ref_col is None or not e.cols:
            raise ValueError(f"referential expectation {e.name!r} needs cols+ref")
        keys = e.ref_df.select(F.col(e.ref_col).alias("__k")).distinct()
        if e.ref_broadcast:
            keys = F.broadcast(keys)
        missing = (
            df.select(F.col(e.cols[0]).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(keys, "__k", "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        parts.append(
            missing.select(
                F.lit(ord_).alias("__ord"),
                F.lit(e.name).alias("rule"),
                F.lit(e.kind).alias("kind"),
                "n_violations",
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.withColumn("passed", F.col("n_violations") == 0)
        .orderBy("__ord")
        .drop("__ord")
    )
