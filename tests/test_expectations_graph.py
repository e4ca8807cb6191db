"""Unit tests for the declarative expectations engine and fixed-point
PageRank (oracle parity at sf0.001 is covered by test_oracle_parity;
these pin the operator semantics on hand-computable inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.operators.expectations import (
    Expectation,
    check_expectations,
)
from etl_pricenow_to_leukerbadb_spark.operators.graph import (
    SCALE,
    pagerank_fixed_iters,
)


def test_expectations_counts_each_violation_kind(spark):
    rows = [
        (1, 10.0, "click", 100),
        (2, -5.0, "click", 100),      # value out of range
        (2, 20.0, "zap", 999),        # duplicate id + bad type + missing FK
        (None, 30.0, "view", 100),    # null id
        (4, 2000.0, None, 101),       # value out of range; null type is NOT
                                      # an accepted_values violation
    ]
    df = spark.createDataFrame(rows, "id long, value double, kind string, fk long")
    dim = spark.createDataFrame([(100,), (101,)], "key long")
    rules = [
        Expectation("id_not_null", "not_null", ("id",)),
        Expectation("id_unique", "unique", ("id",)),
        Expectation("value_range", "in_range", ("value",), lo=0, hi=1000),
        Expectation("kind_ok", "accepted_values", ("kind",), values=("click", "view")),
        Expectation("fk_ok", "referential", ("fk",), ref_df=dim, ref_col="key"),
    ]
    got = [(r.rule, r.n_violations, r.passed) for r in check_expectations(df, rules).collect()]
    assert got == [
        ("id_not_null", 1, False),
        # 4 non-null-keyed rows, distinct ids {1,2,4} -> 4-3=1 (only the
        # duplicate; the NULL-keyed row is exempt per SQL UNIQUE semantics
        # and is flagged by id_not_null instead)
        ("id_unique", 1, False),
        ("value_range", 2, False),
        ("kind_ok", 1, False),
        ("fk_ok", 1, False),
    ]


def test_expectations_all_green_and_single_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    rules = [
        Expectation("id_not_null", "not_null", ("id",)),
        Expectation("id_unique", "unique", ("id",)),
        Expectation("v_range", "in_range", ("v",), lo=0, hi=6),
    ]
    out = check_expectations(df, rules)
    assert [(r.n_violations, r.passed) for r in out.collect()] == [(0, True)] * 3
    # all scalar rules must share ONE aggregate over ONE scan
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Scan ") <= 1, plan


def test_expectations_bad_kind_raises(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unknown scalar"):
        check_expectations(df, [Expectation("x", "regex", ("id",))]).collect()
    with pytest.raises(ValueError, match="needs cols\\+ref"):
        check_expectations(df, [Expectation("x", "referential", ("id",))])


def test_pagerank_matches_hand_computation(spark):
    # A<->B, A<->C: outdeg A=2, B=1, C=1
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")], "src string, dst string"
    )
    r1 = {r.node: r.rank for r in pagerank_fixed_iters(edges, n_iters=1).collect()}
    damp = (SCALE * 85) // 100              # 8.5e8
    tele = (SCALE * 15) // 100              # 1.5e8
    assert r1 == {
        "A": tele + 2 * damp,               # B and C each send full damped rank
        "B": tele + damp // 2,
        "C": tele + damp // 2,
    }
    r2 = {r.node: r.rank for r in pagerank_fixed_iters(edges, n_iters=2).collect()}
    a1, b1 = r1["A"], r1["B"]
    assert r2 == {
        "A": tele + 2 * ((b1 * 85) // 100),
        "B": tele + ((a1 * 85) // 100) // 2,
        "C": tele + ((a1 * 85) // 100) // 2,
    }


def test_pagerank_dedups_parallel_edges_and_validates(spark):
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "B"), ("B", "A")], "src string, dst string"
    )
    once = {r.node: r.rank for r in pagerank_fixed_iters(edges, n_iters=1).collect()}
    dedup = {
        r.node: r.rank
        for r in pagerank_fixed_iters(edges.distinct(), n_iters=1).collect()
    }
    assert once == dedup
    with pytest.raises(ValueError, match="n_iters"):
        pagerank_fixed_iters(edges, n_iters=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_fixed_iters(edges, damping_pct=100)


def test_reliable_checkpoints_match_local_and_require_dir(spark, tmp_path):
    """The reliable-checkpoint path (cluster-scale: rounds written to
    the checkpoint dir, surviving executor loss) must produce byte-
    identical results to the executor-local default, actually write
    round files under the configured dir, and fail fast with setup
    instructions when no dir is configured."""
    from etl_pricenow_to_leukerbadb_spark.operators.dedup import (
        connected_components,
        connected_components_twophase,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "id_a long, id_b long"
    )
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")], "src string, dst string"
    )

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    for fn in (connected_components, connected_components_twophase):
        with pytest.raises(ValueError, match="setCheckpointDir"):
            fn(pairs, reliable_checkpoints=True)
    with pytest.raises(ValueError, match="setCheckpointDir"):
        pagerank_fixed_iters(edges, reliable_checkpoints=True)

    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        for fn in (connected_components, connected_components_twophase):
            local = {(r.node, r.component) for r in fn(pairs).collect()}
            reliable = {
                (r.node, r.component)
                for r in fn(pairs, reliable_checkpoints=True).collect()
            }
            assert local == reliable
        pr_local = {r.node: r.rank for r in pagerank_fixed_iters(edges).collect()}
        pr_rel = {
            r.node: r.rank
            for r in pagerank_fixed_iters(edges, reliable_checkpoints=True).collect()
        }
        assert pr_local == pr_rel
        import os

        rdd_dirs = [
            f
            for root, dirs, _files in os.walk(ckpt)
            for f in dirs
            if f.startswith("rdd-")
        ]
        assert rdd_dirs, "reliable checkpoints wrote no rdd-* dirs"
    finally:
        # conftest's session is shared and tmp_path is torn down: reset
        # the dir so no later test can accidentally checkpoint into it
        # (the scala setter's JVM name contains '$', hence getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_pagerank_hub_node_no_overflow(spark):
    """Regression for the fixed-point scale: a hub with many
    in-neighbors must aggregate exactly, not overflow. With SCALE=1e9
    the in-sum bound is in_degree * 8.5e8, so 20k spokes stays far
    under Long.MAX while the old 1e12 scale put real web hubs past it;
    the spoke contribution is exactly (SCALE*85)//100 (outdeg 1)."""
    n = 20_000
    spokes = spark.range(1, n + 1).selectExpr("id AS src", "CAST(0 AS LONG) AS dst")
    ranks = {
        r.node: r.rank
        for r in pagerank_fixed_iters(spokes, n_iters=1, assume_distinct=True).collect()
    }
    tele = (SCALE * 15) // 100
    assert ranks[0] == tele + n * ((SCALE * 85) // 100)
    assert ranks[1] == tele  # spokes have no in-edges
    assert ranks[0] > 0  # and no silent wraparound


def test_triangle_counts_hand_graph(spark):
    """K4 on {1,2,3,4} plus a pendant edge 4-5: every K4 node is in
    C(3,2)=3 triangles, node 5 in none. Input arrives messy — mixed
    directions, duplicates, a self-loop — and must be cleaned."""
    from etl_pricenow_to_leukerbadb_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (4, 5), (5, 4), (3, 3)], ["src", "dst"]
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_free_bipartite(spark):
    """A bipartite graph (odd cycles impossible) yields zero rows."""
    from etl_pricenow_to_leukerbadb_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(a, b) for a in (1, 2, 3) for b in (10, 20)], ["src", "dst"]
    )
    assert triangle_counts(edges).count() == 0


def test_triangle_counts_degree_tie_exactly_once(spark):
    """All-equal degrees (a single triangle): the (degree, id)
    tie-break must still enumerate the triangle exactly once per
    corner, not zero or three times."""
    from etl_pricenow_to_leukerbadb_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
