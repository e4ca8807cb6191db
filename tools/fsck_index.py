"""CLI for the whole-index consistency sweeps (ANN and dedup).

``python -m tools.fsck_index /path/to/index [--lenient] [--repair] [--dedup]``

``append_to_pq_index`` verifies only the ids each append writes (flat
cost per micro-batch — the right scope for a streaming ingest); this
tool is the scheduled O(index) pass that catches everything else:
partial code sets nobody retried, duplicated inverted-list rows from a
replayed ``assume_new_ids=True`` append, and codes/lists id-set
disagreement on IVFADC layouts. Exit code 0 = consistent (or
--lenient), 1 = violations found.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("index_path")
    ap.add_argument(
        "--lenient",
        action="store_true",
        help="print the report instead of failing on violations",
    )
    ap.add_argument(
        "--repair",
        action="store_true",
        help="prune violations in place (rewrite of the narrow "
        "codes/lists tables, no re-quantization; pruned ids must be "
        "re-ingested) and re-verify",
    )
    ap.add_argument(
        "--dedup",
        action="store_true",
        help="the path is a near-dup (MinHash+LSH) index "
        "(operators/dedup_index.py) instead of an ANN index",
    )
    args = ap.parse_args()

    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import fsck_index
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        fsck_dedup_index,
    )
    from etl_pricenow_to_leukerbadb_spark.session import get_spark

    fsck = fsck_dedup_index if args.dedup else fsck_index
    spark = get_spark(app_name="fsck-index")
    try:
        report = fsck(spark, args.index_path, strict=False, repair=args.repair)
    finally:
        spark.stop()
    print(json.dumps({"index": args.index_path, **report}))
    if "post_repair" in report:  # repaired and re-verified clean
        return 0
    if args.dedup:
        bad = report["dup_rows"] or report["partial_ids"]
    else:
        bad = report["partial_code_ids"] or report.get(
            "dup_list_rows"
        ) or report.get("codes_lists_id_mismatch")
    return 0 if (args.lenient or not bad) else 1


if __name__ == "__main__":
    raise SystemExit(main())
