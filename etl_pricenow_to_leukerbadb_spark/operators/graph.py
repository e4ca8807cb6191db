"""Graph centrality over edge-list DataFrames.

``pagerank_fixed_iters``: PageRank with a FIXED iteration count in
exact fixed-point integer arithmetic — the link-analysis quality
signal a web-scale corpus pipeline attaches to documents (rank a page
by who links to it, then weight its text accordingly).

Why fixed-point integers instead of doubles: each iteration is a
join + groupBy-sum, and floating-point summation order differs
between engines and between runs (AQE can repartition). With BIGINT
ranks every sum is exact and order-independent, so the result is a
pure function of the edge list — which is what lets a SQL oracle
reproduce it bit-for-bit with unrolled CTEs, and what makes reruns
at 100 TB byte-stable.

Semantics (standard damped PageRank, unnormalized fixed-point):
    r_0(n)   = SCALE                        (SCALE = 10^9)
    r_{k+1}(n) = (SCALE * 15) div 100
               + sum_{m -> n} ((r_k(m) * 85) div 100) div outdeg(m)
Contributions use integer floor-division twice (damping first, then
out-degree split) — both engines (Spark `div`, DuckDB `//`) floor the
same way for non-negative operands, and ranks stay non-negative by
construction. Nodes = every endpoint of the edge list; a node with no
in-edges keeps the teleport term only. Dangling nodes (no out-edges)
simply don't redistribute — acceptable for a fixed-iteration scoring
signal (rank mass need not be conserved to rank by it).

Scale shape: each iteration is one shuffle on dst + one broadcast-or-
shuffle join of ranks to edges; K iterations = K rounds of linear
work in |E|. No driver-side loop state beyond the unrolled plan (K is
small and fixed), no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 10^9 fixed-point unit rank. The scale trades precision (9 decimal
# digits of rank — far beyond what a corpus-quality signal needs)
# against BIGINT headroom on hub nodes: a node's in-sum is bounded by
# in_degree * (SCALE*damping//100) before its own div, so with 10^9 a
# hub overflows Long.MAX only past ~1.08e10 in-neighbors — above any
# observed web-graph in-degree. The previous 10^12 overflowed (ANSI:
# job failure; non-ANSI: silent wraparound) at ~1.08e7 in-neighbors,
# which real hub pages exceed.
SCALE = 1_000_000_000


def pagerank_fixed_iters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 2,
    damping_pct: int = 85,
    assume_distinct: bool = False,
    symmetric: bool = False,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """PageRank after exactly ``n_iters`` iterations over the distinct
    directed edge list. Returns (node, rank) with BIGINT fixed-point
    ranks (SCALE = 1.0).

    The edge list is deduplicated first (parallel edges would double-
    count contributions) unless the caller proves distinctness with
    ``assume_distinct=True`` (e.g. a symmetrized list built as
    distinct-pairs UNION swapped-pairs, where the two directions can't
    collide — skipping the shuffle over the doubled list). Prefer
    integer node ids: every stage keys on the node, and numeric
    hash/sort beats string keys in each of the K+1 shuffles.
    Out-degrees are computed once and reused by every iteration.

    ``symmetric=True`` declares that the list contains each undirected
    edge in BOTH directions (a symmetrized build). That implies every
    node has out-edges AND in-edges, which removes the node-set
    union-distinct and the per-iteration left-join entirely and folds
    out-degrees into the edge list — one join per iteration instead of
    three. Identical BIGINT output on inputs satisfying the contract;
    on a NON-symmetric list it would silently drop in-edge-only nodes,
    so only set it when the construction guarantees symmetry.

    The deduped edge list, node set, and out-degrees are checkpointed
    so each is computed ONCE (on first use) however the iteration
    references them —
    without that, every iteration's join re-derives the whole edge
    subtree from source scans and the plan rereads the input
    O(iterations²) times (measured 80 parquet scans for 2 iterations
    over a 4-scan edge derivation; 4.1 s -> well under 1 s at sf0.1).
    Same pattern and caveat as ``dedup.connected_components``: local
    checkpoint blocks are executor-local; pass
    ``reliable_checkpoints=True`` (with a configured checkpoint dir)
    to write them to reliable storage instead — the right trade for
    long jobs on large clusters, where some executor loss before the
    final action is the expected case."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100): {damping_pct}")
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1: {n_iters}")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # Checkpoint the loop-invariant tables once, eagerly: every
    # iteration re-reads them from the block store instead of
    # re-deriving from the raw edge list (1 edge-derivation scan
    # total, not O(iterations)). Eager materialization is deliberate —
    # lazy localCheckpoint was measured slower and far noisier
    # back-to-back (see the module NOTE in operators/dedup.py). The
    # rank-update loop itself stays UNmaterialized: each iteration
    # references the previous ranks exactly once, so the whole
    # n_iters-deep plan runs as ONE action with no recompute blow-up,
    # and AQE re-plans each join at runtime.
    from .dedup import iter_checkpoint

    e = iter_checkpoint(e, reliable_checkpoints)
    teleport = F.lit((SCALE * (100 - damping_pct)) // 100)
    contrib_expr = F.expr(f"(rank * {damping_pct}) div 100 div outdeg").alias("c")

    if symmetric:
        # Symmetrized-list fast path (each undirected edge present in
        # BOTH directions — the trade/near-dup graph shape): every
        # node then appears as src AND as dst, so (a) the node set IS
        # the out-degree key set (no union-distinct over 2|E| rows),
        # and (b) every node receives at least one contribution, so
        # the per-iteration left-join back to the node table is
        # vacuous and dropped. Out-degrees are folded into the edge
        # list ONCE ((src, dst, outdeg), checkpointed) so each
        # iteration is a single ranks-to-edges join + one shuffle on
        # dst — half the joins of the general path, same BIGINT
        # result (pytest-verified identical on symmetrized graphs).
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        ew = iter_checkpoint(e.join(outdeg, "src"), reliable_checkpoints)
        ranks = outdeg.select("src", F.lit(SCALE).cast("long").alias("rank"))
        for _ in range(n_iters):
            ranks = (
                ew.join(ranks, "src")
                .select(F.col("dst").alias("node"), contrib_expr)
                .groupBy("node")
                .agg((teleport + F.sum("c")).cast("long").alias("rank"))
                .withColumnRenamed("node", "src")
            )
        return ranks.withColumnRenamed("src", "node")

    nodes = iter_checkpoint(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        reliable_checkpoints,
    )
    outdeg = iter_checkpoint(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")),
        reliable_checkpoints,
    )

    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(n_iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), contrib_expr)
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (teleport + F.coalesce(F.col("in_sum"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph, by
    degree-oriented wedge enumeration — the shape that scales to
    web-size graphs (each triangle is enumerated exactly once, from
    its lowest-degree corner).

    Input: an edge list in either or both directions, possibly with
    duplicates and self-loops (both are cleaned here). Output:
    ``(node, triangles)`` for every node in at least one triangle.

    Why orient by degree instead of joining the raw edge list: the
    wedge join's cost is sum(out_degree^2). Orienting every edge from
    its lower-(degree, id) endpoint to the higher one caps out-degree
    at O(sqrt(|E|)) (a node of degree d only keeps out-edges to
    neighbors of degree >= d, and there can be at most ~2|E|/d such
    neighbors), so a power-law hub with millions of raw neighbors
    contributes wedges only from its few high-degree peers. The
    closing-edge probe is an equi-join on the oriented pair — no
    nested loop, no cartesian, three shuffles total (degree, wedge,
    close). The (degree, id) total order ties identical degrees
    deterministically, so the enumeration — hence the count — is a
    pure function of the edge set.

    ``reliable_checkpoints=True`` writes the two working-set
    materializations below to the session's checkpoint directory
    instead of executor-local blocks (r14, threading the existing
    ``iter_checkpoint`` knob — ADVICE r13: at cluster scale an
    executor loss mid-wedge-join cannot recompute local blocks).
    """
    from .dedup import iter_checkpoint

    a, b = F.col(src), F.col(dst)
    # materialize the cleaned edge set and the oriented edge set ONCE
    # (r13 optimization, guide §1.2). Without the checkpoints, every
    # multi-consumer frame here re-evaluated its whole upstream per
    # consumer — `e` fed the degree union (2x) plus the orientation
    # join, `oriented` fed both wedge sides plus the closing probe —
    # and because the fan-outs MULTIPLY through the tree, the caller's
    # edge derivation (for gr_triangle_count: the per-order quadratic
    # pair self-join over lineitem) sat under up to 27 plan copies.
    # Exchange reuse recovers some of that inside one plan, but the
    # measured cost at sf0.1 was 38-50 s/run vs ~1.3 s with the two
    # checkpoints. The degree and corner unions also fold into single
    # explode passes (one subtree instead of 2-3 in-plan copies).
    e = iter_checkpoint(
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") < F.col("v"))  # drops self-loops and null ends
        .distinct(),
        reliable_checkpoints,
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = iter_checkpoint(
        ed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
        ),
        reliable_checkpoints,
    )
    w1 = oriented.select(
        F.col("src").alias("apex"), F.col("dst").alias("b"), F.col("dst_deg").alias("db")
    )
    w2 = oriented.select(
        F.col("src").alias("apex"), F.col("dst").alias("c"), F.col("dst_deg").alias("dc")
    )
    wedges = w1.join(w2, "apex").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("apex", "b", "c")
    corners = tri.select(
        F.explode(F.array("apex", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
