"""Property-based checks (SURVEY §5.3) with hypothesis: invariants of
the flagship forward-fill, the merge sink, and the dedup family that
hold for *any* input, not just the golden fixtures.

Spark jobs are slow per-example, so each property runs a small number
of generated cases (max_examples) with deadline disabled — the point
is shrinking counterexamples, not fuzz volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pricenow_to_leukerbadb_spark.operators.dedup import minhash_signatures
from etl_pricenow_to_leukerbadb_spark.operators.forward_fill import forward_fill_daily
from etl_pricenow_to_leukerbadb_spark.sinks.upsert import merge_upsert_df

GRID_START = dt.date(2026, 1, 10)
GRID_END = dt.date(2026, 1, 24)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # stable example set: the CI gate must not flake
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# change points: per-key lists of (day offset from 2026-01-01, price)
change_sets = st.dictionaries(
    keys=st.integers(min_value=1, max_value=4),  # product ids
    values=st.lists(
        st.tuples(st.integers(min_value=0, max_value=40), st.integers(0, 10_000)),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=4,
)


def _changes_df(spark, data):
    rows = [
        (pid, dt.date(2026, 1, 1) + dt.timedelta(days=off), price, seq)
        for pid, pts in data.items()
        for seq, (off, price) in enumerate(pts)
    ]
    return spark.createDataFrame(rows, "pid long, d date, price long, seq long")


@given(data=change_sets)
@SETTINGS
def test_forward_fill_is_dense_step_function(spark, data):
    changes = _changes_df(spark, data)
    out = forward_fill_daily(
        changes,
        key_cols=["pid"],
        date_col="d",
        value_col="price",
        grid_start=GRID_START,
        grid_end=GRID_END,
        tie_break_cols=["seq"],
    ).collect()

    by_pid: dict[int, dict[dt.date, int]] = {}
    for r in out:
        by_pid.setdefault(r.pid, {})[r.day] = r.price

    for pid, pts in data.items():
        # reference semantics: price on day D = value of the latest
        # change with date <= D (ties: last by seq), None if no such change
        def expected(day):
            cands = [
                (dt.date(2026, 1, 1) + dt.timedelta(days=off), seq, price)
                for seq, (off, price) in enumerate(pts)
                if dt.date(2026, 1, 1) + dt.timedelta(days=off) <= day
            ]
            return max(cands, key=lambda c: (c[0], c[1]))[2] if cands else None

        got = by_pid.get(pid, {})
        day = GRID_START
        while day <= GRID_END:
            exp = expected(day)
            assert got.get(day) == exp, (pid, day, got.get(day), exp)
            day += dt.timedelta(days=1)
        # denseness: once a value exists, every later grid day has a row
        first = min((d for d in got), default=None)
        if first is not None:
            n_days = (GRID_END - first).days + 1
            assert len(got) == n_days


upsert_tables = st.tuples(
    st.dictionaries(st.integers(0, 20), st.integers(0, 100), max_size=15),  # base
    st.dictionaries(st.integers(0, 20), st.integers(0, 100), max_size=15),  # updates
)


@given(tables=upsert_tables)
@SETTINGS
def test_merge_upsert_properties(spark, tables):
    base_d, upd_d = tables
    base = spark.createDataFrame(list(base_d.items()) or [(None, None)], "k long, v long").filter(
        F.col("k").isNotNull()
    )
    upd = spark.createDataFrame(list(upd_d.items()) or [(None, None)], "k long, v long").filter(
        F.col("k").isNotNull()
    )
    once = merge_upsert_df(base, upd, keys=["k"])
    got = {r.k: r.v for r in once.collect()}
    assert got == {**base_d, **upd_d}  # updates win, others survive
    # idempotence: applying the same updates again changes nothing
    twice = merge_upsert_df(once, upd, keys=["k"])
    assert {r.k: r.v for r in twice.collect()} == got


texts = st.lists(
    st.text(alphabet="abcdefg ", min_size=12, max_size=60),
    min_size=1,
    max_size=6,
)


@given(docs=texts)
@SETTINGS
def test_minhash_signature_invariants(spark, docs):
    # duplicate every doc under a new id: signatures must be identical
    rows = [(i, t) for i, t in enumerate(docs)] + [
        (1000 + i, t) for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(df, "doc_id", "text").collect()}
    for i, t in enumerate(docs):
        if len([w for w in t.split() if w]) >= 3:  # has at least one 3-shingle
            assert sigs[i] == sigs[1000 + i], t
        else:
            assert i not in sigs  # too short -> no signature, not a junk one


cdc_logs = st.tuples(
    st.dictionaries(st.integers(0, 15), st.integers(0, 100), max_size=10),  # base
    st.lists(  # op log: (key, value, op)
        st.tuples(st.integers(0, 15), st.integers(0, 100), st.sampled_from(["I", "U", "D"])),
        max_size=12,
    ),
)


@given(data=cdc_logs)
@SETTINGS
def test_apply_cdc_matches_sequential_fold(spark, data):
    from etl_pricenow_to_leukerbadb_spark.sinks.upsert import apply_cdc

    base_d, log = data
    base = spark.createDataFrame(
        list(base_d.items()) or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull())
    ops = spark.createDataFrame(
        [(k, v, op, i) for i, (k, v, op) in enumerate(log)] or [(None, None, None, None)],
        "k long, v long, op string, seq long",
    ).filter(F.col("k").isNotNull())

    # model: fold the log sequentially over a dict
    expect = dict(base_d)
    for k, v, op in log:
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v

    got = {r.k: r.v for r in apply_cdc(base, ops, keys=["k"]).collect()}
    assert got == expect
    # idempotence: folding the same log onto the result changes nothing
    again = apply_cdc(
        spark.createDataFrame(list(got.items()) or [(None, None)], "k long, v long").filter(
            F.col("k").isNotNull()
        ),
        ops,
        keys=["k"],
    )
    assert {r.k: r.v for r in again.collect()} == expect


asof_inputs = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=10),  # left (k, t)
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)), max_size=10),  # right (k, t, v)
)


@given(data=asof_inputs)
@SETTINGS
def test_asof_join_matches_model(spark, data):
    from etl_pricenow_to_leukerbadb_spark.operators.asof import asof_join

    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "id long, k long, t long"
    )
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "k long, t long, v long"
    ).filter(F.col("k").isNotNull())
    # dedup right per (k, t): keep max v (mirror right_tie_break="v")
    best = {}
    for k, t, v in right_rows:
        if (k, t) not in best or v > best[(k, t)]:
            best[(k, t)] = v

    def model(k, t):
        cands = [(rt, v) for (rk, rt), v in best.items() if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    out = asof_join(left, right, on=["k"], ts_col="t", value_cols=["v"], right_tie_break="v")
    got = {r.id: r.asof_v for r in out.collect()}
    assert len(got) == len(left_rows)  # left join: every left row survives
    for i, (k, t) in enumerate(left_rows):
        assert got[i] == model(k, t), (i, k, t)


# interval sets: lists of (start offset hours, duration hours) — zero
# durations included deliberately (empty under half-open semantics)
interval_sets = st.lists(
    st.tuples(st.integers(min_value=0, max_value=72), st.integers(min_value=0, max_value=18)),
    min_size=1,
    max_size=10,
)


@given(a_set=interval_sets, b_set=interval_sets)
@SETTINGS
def test_interval_overlap_join_equals_naive_predicate(spark, a_set, b_set):
    """For ANY two interval sets, the binned overlap join must emit
    exactly the pairs of the raw overlap predicate, each exactly once
    — across bin-boundary straddles, nested/equal intervals, and
    empty [t, t) degenerates the generator produces freely."""
    from etl_pricenow_to_leukerbadb_spark.operators.interval_join import (
        interval_overlap_join,
    )

    base = dt.datetime(2026, 3, 1)

    def df_of(pairs, prefix):
        rows = [
            (i, base + dt.timedelta(hours=s), base + dt.timedelta(hours=s + d))
            for i, (s, d) in enumerate(pairs)
        ]
        return spark.createDataFrame(
            rows, f"{prefix}_id long, {prefix}_start timestamp, {prefix}_end timestamp"
        )

    a = df_of(a_set, "a")
    b = df_of(b_set, "b")
    got = [
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, "a_start", "a_end", b, "b_start", "b_end", bin="day"
        ).collect()
    ]
    naive = {
        (r.a_id, r.b_id)
        for r in a.crossJoin(b)
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
            & (F.col("a_end") > F.col("a_start"))
            & (F.col("b_end") > F.col("b_start"))
        )
        .collect()
    }
    assert len(got) == len(set(got))  # no duplicate pairs, ever
    assert set(got) == naive


# --- PageRank vs a sequential integer-arithmetic reference model -----------

pr_edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=25,
)


def _pagerank_model(edges, n_iters=2, damping_pct=85):
    """Driver-side reference of the exact integer recurrence in
    operators/graph.py (SCALE fixed point, double floor-division)."""
    from etl_pricenow_to_leukerbadb_spark.operators.graph import SCALE

    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    ranks = {n: SCALE for n in nodes}
    tele = (SCALE * (100 - damping_pct)) // 100
    for _ in range(n_iters):
        nxt = {n: tele for n in nodes}
        for u, v in e:
            nxt[v] += ((ranks[u] * damping_pct) // 100) // outdeg[u]
        ranks = nxt
    return ranks


@given(edges=pr_edge_lists)
@SETTINGS
def test_pagerank_matches_sequential_model(spark, edges):
    from etl_pricenow_to_leukerbadb_spark.operators.graph import pagerank_fixed_iters

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_fixed_iters(df, n_iters=2).collect()}
    assert got == _pagerank_model(edges)


@given(edges=pr_edge_lists)
@SETTINGS
def test_pagerank_symmetric_fast_path_matches_general(spark, edges):
    """symmetric=True must produce identical BIGINT ranks on any
    symmetrized edge list (both directions present) — the contract the
    fast path's dropped node-union and left-join rely on."""
    from etl_pricenow_to_leukerbadb_spark.operators.graph import pagerank_fixed_iters

    sym = sorted({(u, v) for u, v in edges if u != v} | {(v, u) for u, v in edges if u != v})
    if not sym:
        return
    df = spark.createDataFrame(sym, "src long, dst long")
    fast = {
        r.node: r.rank
        for r in pagerank_fixed_iters(
            df, n_iters=2, assume_distinct=True, symmetric=True
        ).collect()
    }
    general = {r.node: r.rank for r in pagerank_fixed_iters(df, n_iters=2).collect()}
    assert fast == general == _pagerank_model(sym)


# --- Expectations vs a pandas-free sequential reference --------------------

exp_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 5)),        # id (dup/null-prone)
        st.one_of(st.none(), st.integers(-50, 150)),    # value
        st.one_of(st.none(), st.integers(0, 3)),        # fk
    ),
    min_size=1,
    max_size=30,
)


@given(rows=exp_rows)
@SETTINGS
def test_expectations_match_sequential_counts(spark, rows):
    from etl_pricenow_to_leukerbadb_spark.operators.expectations import (
        Expectation,
        check_expectations,
    )

    df = spark.createDataFrame(rows, "id long, value long, fk long")
    dim = spark.createDataFrame([(0,), (1,)], "key long")
    out = {
        r.rule: r.n_violations
        for r in check_expectations(
            df,
            [
                Expectation("nn", "not_null", ("id",)),
                Expectation("uq", "unique", ("id",)),
                Expectation("rg", "in_range", ("value",), lo=0, hi=100),
                Expectation("fk", "referential", ("fk",), ref_df=dim, ref_col="key"),
            ],
        ).collect()
    }
    ids = [r[0] for r in rows]
    values = [r[1] for r in rows]
    fks = [r[2] for r in rows]
    assert out["nn"] == sum(1 for i in ids if i is None)
    # SQL UNIQUE semantics: NULL-keyed rows exempt
    nn_ids = [i for i in ids if i is not None]
    assert out["uq"] == len(nn_ids) - len(set(nn_ids))
    assert out["rg"] == sum(1 for v in values if v is not None and not 0 <= v <= 100)
    assert out["fk"] == sum(1 for f in fks if f is not None and f not in (0, 1))


# --- Triangle counting vs a brute-force reference --------------------------

tc_edge_lists = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=28,
)


def _triangle_model(edges):
    """Brute force: count triangles per node on the cleaned undirected
    simple graph."""
    e = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj: dict[int, set[int]] = {}
    for u, v in e:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    counts: dict[int, int] = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b not in adj[a]:
                continue
            for c in nodes:
                if c > b and c in adj[a] and c in adj[b]:
                    for n in (a, b, c):
                        counts[n] = counts.get(n, 0) + 1
    return counts


@given(edges=tc_edge_lists)
@SETTINGS
def test_triangle_counts_match_bruteforce(spark, edges):
    from etl_pricenow_to_leukerbadb_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == _triangle_model(edges)
