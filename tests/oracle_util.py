"""Replicates the driver's DuckDB-oracle comparison locally.

Runs a registry query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then asserts exact (order-insensitive) equality of
values — the same bar the driver's value-hash check sets.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

from etl_pricenow_to_leukerbadb_spark.sources.tables import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm(v.item())
    except ImportError:
        pass
    return v


def rows_normalized(cols, rows):
    """Sort columns by name and rows by value for order-insensitive compare."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in idx], out


# Spark simpleString dtype -> the pandas dtype class toPandas() yields for a
# null-free column.  Only numeric/bool types are listed: the driver's value
# hash diverges when one engine renders a column as int64 and the other as
# float64 (DuckDB HUGEINT) or int32 vs int64 (Spark IntegerType vs DuckDB
# BIGINT) — the two bug classes behind every red driver row in r2/r3.
# Strings/dates/decimals are normalized by value elsewhere; not dtype-checked.
_SPARK_DTYPE_CLASS = {
    "bigint": ("int", 8),
    "int": ("int", 4),
    "smallint": ("int", 2),
    "tinyint": ("int", 1),
    "double": ("float", 8),
    "float": ("float", 4),
    "boolean": ("bool",),
}


def _pandas_dtype_class(series):
    k = series.dtype.kind
    if k in "iu":
        return ("int", series.dtype.itemsize)
    if k == "f":
        return ("float", series.dtype.itemsize)
    if k == "b":
        return ("bool",)
    return None


def compare_dtypes(name: str, spark_dtypes, d_pdf, null_cols) -> None:
    """Assert every numeric column lands in pandas with the same dtype
    class from both engines — a local replica of the dtype sensitivity
    of the driver's content hash (5 vs 5.0 hash differently even when
    values are equal).  ``spark_dtypes`` is ``DataFrame.dtypes``;
    ``d_pdf`` the DuckDB result as pandas; ``null_cols`` columns with
    nulls on either side (skipped: pandas widens nullable ints to
    float64/object asymmetrically)."""
    for col, s_dtype in spark_dtypes:
        if col not in d_pdf.columns or col in null_cols:
            continue
        sc = _SPARK_DTYPE_CLASS.get(s_dtype)
        dc = _pandas_dtype_class(d_pdf[col])
        if sc is None or dc is None:
            continue
        assert sc == dc, (
            f"{name}.{col}: pandas dtype class diverges: "
            f"spark={s_dtype} ({sc}) vs duckdb={d_pdf[col].dtype} ({dc}) — "
            "this WILL red-flag in the driver's value hash; cast both "
            "sides to the same width (e.g. CAST(... AS BIGINT) / "
            ".cast('long'))"
        )


def compare_query(spark, sf_dir: str, name: str, spec) -> None:
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    res = con.execute(spec.oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    # Driver-parity dtype check: re-fetch the oracle as pandas (cheap at
    # test SF) and compare against the Spark schema's toPandas mapping.
    d_pdf = con.execute(spec.oracle).df()
    null_cols = {
        c
        for i, c in enumerate(s_cols)
        if any(r[i] is None for r in s_rows)
    } | {
        c
        for i, c in enumerate(d_cols)
        if any(r[i] is None for r in d_rows)
    }
    compare_dtypes(name, sdf.dtypes, d_pdf, null_cols)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_norm = rows_normalized(s_cols, s_rows)
    _, d_norm = rows_normalized(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
