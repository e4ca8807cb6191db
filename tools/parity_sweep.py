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

The compare reuses ``tests/oracle_util.py`` (same view registration,
same value normalization incl. NaN -> "NaN") so a query this sweep
passes is a query the driver-sim gate passes — a private _norm here
already diverged once (raw NaN compares unequal to itself, yielding a
false MISMATCH on any legitimately-NaN output).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry
    from etl_pricenow_to_leukerbadb_spark.session import get_spark
    from tests.oracle_util import duckdb_con, rows_normalized

    lo = sys.argv[1] if len(sys.argv) > 1 else ""
    hi = sys.argv[2] if len(sys.argv) > 2 else "￿"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb_con(sf_dir)

    fails, n_ok = [], 0
    names = [n for n in sorted(qs) if n in osql and lo <= n < hi]
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols, s_rows = rows_normalized(
                sdf.columns, [tuple(r) for r in sdf.collect()]
            )
            res = con.execute(osql[name])
            d_cols, d_rows = rows_normalized(
                [c[0] for c in res.description], res.fetchall()
            )
            ok = s_cols == d_cols and s_rows == d_rows
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
