#!/usr/bin/env python
"""Capture .explain("formatted") output for registry queries into
plans/r14/<query>_<tag>.txt — the optimization round's before/after
plan evidence.

Usage: python tools/capture_plans_r14.py <before|after> [name ...]

With no names, captures every HEADLINE query. Multi-action lifecycle
queries (dd_cluster_merge, llm_curation_e2e, dd_index_probe,
ann_ivfpq_trained_e2e) build their standing state on the first
invocation in a fresh session (the bench warm-up's job); the captured
plan is the steady-state returned DataFrame's, and for the lifecycle
queries the file also records the per-stage wall seconds popped from
plans.stage_timing — the stage split is where those queries' cost
lives, not in the final (often metadata-sized) returned plan.
"""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.plans.stage_timing import pop_stages  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or [n for n, s in REGISTRY.items() if s.headline]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plan-capture-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY[name]
        stage_note = ""
        if spec.multi_action:
            # first invocation builds the session-cached standing state
            # (the untimed warm-up's job); capture the steady-state run
            spec.fn(spark, sf_dir).count()
            pop_stages(name)
        df = spec.fn(spark, sf_dir)
        stages = pop_stages(name)
        if stages:
            stage_note = f"\n-- eager-stage wall seconds: {stages}\n"
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"-- {name} ({tag}) explain('formatted') at {sf_dir}\n"
                f"-- multi_action={spec.multi_action}"
                f"{stage_note}\n"
            )
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
