"""Full-registry oracle-parity sweep at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01; this tool re-runs the
same Spark-vs-DuckDB value comparison for every oracle-paired registry
entry at any testdata scale (default sf0.1 — 10x the gate), which is
how SCALE.md's "zero mismatches at sf0.1" claim is produced each
round. Run:

    python -m tools.parity_sweep             # whole registry, sf0.1
    python -m tools.parity_sweep dd j        # name range [dd, j)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python -m tools.parity_sweep

At sf0.1 the whole registry takes ~25 min; the optional [lo, hi) name
range splits the run into restartable chunks. Uses the engine session
(get_spark) — the documented way to run the engine; a default-heap
vanilla session OOMs on the heaviest graph query at sf0.1 (see
SCALE.md's operational note).
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from etl_pricenow_to_leukerbadb_spark.session import get_spark

    lo = sys.argv[1] if len(sys.argv) > 1 else ""
    hi = sys.argv[2] if len(sys.argv) > 2 else "￿"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fails, n_ok = [], 0
    names = [n for n in sorted(qs) if n in osql and lo <= n < hi]
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(osql[name])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
            scols = sdf.columns
            i_s = sorted(range(len(scols)), key=lambda i: scols[i])
            i_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sn = sorted([tuple(_norm(r[i]) for i in i_s) for r in srows], key=str)
            dn = sorted([tuple(_norm(r[i]) for i in i_d) for r in drows], key=str)
            ok = sorted(scols) == sorted(dcols) and sn == dn
            tag = "MISMATCH"
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            ok, tag = False, f"ERROR ({str(ex)[:120]})"
        if ok:
            n_ok += 1
        else:
            fails.append(name)
            print(f"{tag} {name}", flush=True)
    print(f"DONE [{lo},{hi}) sf_dir={sf_dir} n={len(names)} ok={n_ok} fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
