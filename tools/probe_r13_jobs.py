#!/usr/bin/env python
"""Count Spark jobs + scan tasks for ONE steady-state invocation of a
registry query — a machine-state-independent measure of the r13 merge
restructure (fewer redundant subtree evaluations => fewer jobs).

Usage: python tools/probe_r13_jobs.py <query> [reps]
Prints: jobs and wall seconds per steady-state run (first run builds
the session-cached standing state and is excluded).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pricenow_to_leukerbadb_spark.plans import REGISTRY  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.plans.stage_timing import pop_stages  # noqa: E402
from etl_pricenow_to_leukerbadb_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"probe-jobs-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spec = REGISTRY[name]
    spec.fn(spark, sf_dir).count()  # warm-up / standing-state build
    pop_stages(name)
    # the session has the UI disabled, so count jobs per run by
    # wrapping each run in its own job group and asking the status
    # tracker for that group's ids (retained-job window is far above
    # one run's count)
    for i in range(reps):
        group = f"probe-{name}-{i}"
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        st = pop_stages(name)
        print(f"{name}: {jobs} jobs, {dt:.3f}s, stages={st}")
    spark.stop()


if __name__ == "__main__":
    main()
