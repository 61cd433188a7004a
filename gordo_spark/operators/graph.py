"""Graph analytics over co-occurrence edges.

:mod:`gordo_spark.operators.dedup` already runs one graph algorithm
(alternating-pointer connected components for duplicate clusters); this
module holds the rest of the fleet-screen toolkit: building a bounded
co-occurrence graph from transactional data and counting its triangles
— the standard cohesion statistic (global clustering coefficient)
behind "are these items bought in CLIQUES or just pairwise?".

Scale posture: the raw pair space is quadratic per group — the
``min_support`` filter is applied BEFORE any self-join so the edge
table (not the pair-instance stream) is what the triangle join touches.
Triangle enumeration with canonical ``a < b < c`` orientation touches
each triangle exactly once and each edge at most ``deg`` times — the
standard distributed formulation (one shuffle per join hop, all on
edge-key columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround

__all__ = [
    "co_occurrence_edges",
    "k_core",
    "link_prediction",
    "pagerank",
    "triangle_stats",
]


def co_occurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Undirected co-occurrence edges ``(a, b, n_groups)`` with
    ``a < b``: items appearing together in at least ``min_support``
    groups. Pairs are generated ROW-LOCALLY from per-group sorted
    distinct item arrays (k(k-1)/2 fan-out per group — no self-join of
    the raw table), the same shape as ``affinity.pair_counts``.
    """
    items = df.groupBy(group_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("_items")
    )
    pairs = items.select(
        F.explode(
            F.expr(
                "flatten(transform(_items, (x, i) -> "
                "transform(slice(_items, i + 2, size(_items)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .filter(F.col("n_groups") >= int(min_support))
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 8,
) -> DataFrame:
    """PageRank by fixed-iteration power method over an undirected edge
    list (columns ``a, b`` with ``a < b``, each edge once) — the item-
    centrality readout over the co-purchase graph ("which parts anchor
    the basket network?"). Deterministic: a FIXED iteration count (no
    convergence test, no driver-side loop decision), so the exact same
    arithmetic runs on any engine and the result is oracle-checkable.

    Shape per iteration: ranks ``(v, r)`` equi-join the symmetrized
    direction table on ``src``, contributions ``r/deg`` hash-aggregate
    on ``dst``, and the node table left-joins the sums back —
    two shuffles per iteration, all on node keys, nothing quadratic.
    The symmetrized-edge and degree frames are materialized ONCE via
    eager ``localCheckpoint`` (the :func:`~gordo_spark.operators.dedup.
    connected_components` precedent): without truncation every
    iteration's lineage re-derives the whole upstream edge build —
    measured 9.0 -> ~2 s at sf0.1 on the co-purchase contract.
    Dangling mass is structurally absent: symmetrizing guarantees every
    node has out-degree >= 1. Output: ``(v, rank)`` rounded to 6.

    At 100 TB the node/rank frames are item-cardinality (not corpus-
    cardinality), so checkpointing them is bounded; each iteration is
    then one AQE-planned shuffle pair instead of a driver-materialized
    loop step.
    """
    e = edges.select("a", "b")
    dirs = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst").localCheckpoint()
    deg = (
        dirs.groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).alias("_d"))
        .localCheckpoint()
    )
    total = deg.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    nodes = deg.crossJoin(F.broadcast(total))
    ranks = nodes.select("v", "_d", "_n", (1.0 / F.col("_n")).alias("r"))
    d = float(damping)
    for i in range(int(iterations)):
        contrib = (
            ranks.select("v", (F.col("r") / F.col("_d")).alias("_c"))
            .join(dirs, F.col("v") == F.col("src"))
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(contrib, "v", "left").select(
            "v",
            "_d",
            "_n",
            (
                (1.0 - d) / F.col("_n")
                + d * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("r"),
        )
        # the carried frame's lineage grows linearly over the unrolled
        # loop — fine at 8 iterations, Catalyst-quadratic at 50: truncate
        # every 10th iteration so raising `iterations` stays safe.
        # EAGER checkpoint (r11): eager=False is not actually lazy
        # under AQE — Dataset.checkpoint goes through .rdd, which
        # executes every upstream shuffle stage at build time anyway;
        # eager=True additionally pins the final stage's partitions so
        # downstream actions do not recompute it.
        if (i + 1) % 10 == 0 and (i + 1) < int(iterations):
            ranks = ranks.localCheckpoint()
    return ranks.select("v", qround("r", 6).alias("rank"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census of an undirected edge list (columns
    ``a, b`` with ``a < b``, each edge once): returns ONE row
    ``(n_nodes, n_edges, n_wedges, n_triangles, global_clustering)``
    where ``global_clustering = 3 * triangles / wedges`` (the
    transitivity ratio; null when the graph has no wedges).

    Triangles join canonically oriented edges twice — ``(a,b) x (b,c)``
    then probe ``(a,c)`` — so each triangle counts exactly once and no
    orientation-dedup pass is needed. Wedges come from the degree
    distribution (``sum(deg * (deg - 1) / 2)``), one explode + two tiny
    aggregations. All shuffles key on edge endpoints; the edge table is
    already support-filtered upstream, which is what bounds the join
    fan-out at scale.

    The edge list is materialized once via eager ``localCheckpoint``
    (the :func:`pagerank` / connected_components precedent): it feeds
    FOUR consumers (three join arms + the degree explode), and lazy
    lineage re-derives the whole upstream edge build per consumer —
    the audit showed 22 scans for the co-purchase contract before the
    truncation. Edge tables are item²-bounded by the upstream support
    filter, so pinning them is the cheap side of the trade.
    """
    e = edges.select("a", "b").localCheckpoint()
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges_open = ab.join(bc, "y")
    tri = wedges_open.join(ac, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long"), F.lit(0)
        ).alias("n_wedges"),
        F.coalesce((F.sum("d") / 2).cast("long"), F.lit(0)).alias("n_edges"),
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        qround(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ),
            6,
        ).alias("global_clustering"),
    )


def k_core(
    edges: DataFrame, k: int = 3, rounds: int | None = None
) -> DataFrame:
    """K-core peeling of an undirected edge list (``a, b`` with
    ``a < b``): repeatedly drop nodes with degree < ``k`` and recompute
    — the standard "dense cohesive subgraph" extraction (items that
    co-sell as a CLIQUE-ish cluster survive; pendant/chain structure
    peels away).

    ``rounds=None`` (the default) iterates to FIXPOINT with an
    early-exit count per round (the connected_components pattern): the
    result is the true k-core — every returned degree is >= k — on any
    graph, including pendant chains deeper than any fixed round count.
    Termination is guaranteed because each non-converged round strictly
    shrinks the edge frame. Passing ``rounds=N`` pins EXACTLY the
    N-round peel instead, which is what an engine-independent oracle
    can mirror as unrolled CTEs; on a graph that has not converged by
    round N the fixed-round output is a remnant, NOT a true k-core
    (degrees < k can remain) — that mode exists for oracle parity, and
    the early exit still fires when convergence lands sooner (a
    converged round is a no-op, so exiting early returns the identical
    frame the remaining unrolled rounds would).

    Per round: one degree aggregation + two semi-joins (both endpoint
    probes) — all keyed on node ids, nothing quadratic; plus one count
    of the already-materialized frame for the convergence check. The
    symmetrized base is localCheckpoint'd once (the module's
    lineage-truncation discipline); rounds then touch only the
    shrinking edge frame. Output: ``(v, degree)`` of the surviving
    subgraph — empty when nothing reaches core ``k``.
    """
    e = edges.select("a", "b")
    dirs = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst").localCheckpoint()
    alive = dirs
    n_alive = alive.count()
    r = 0
    while n_alive > 0 and (rounds is None or r < int(rounds)):
        r += 1
        deg = alive.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("_d")
        )
        keep = deg.filter(F.col("_d") >= int(k)).select("v")
        # each round references the previous one THREE times (degree agg
        # + both endpoint probes): left lazy, the plan fans out 3^rounds
        # — so every round is materialized (same discipline as
        # connected_components; the oracle mirrors it with MATERIALIZED
        # CTEs). The frame strictly shrinks, so pinning it is bounded.
        alive = (
            alive.join(keep.withColumnRenamed("v", "src"), "src", "semi")
            .join(keep.withColumnRenamed("v", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        n_next = alive.count()
        if n_next == n_alive:
            break  # fixpoint: every remaining degree >= k
        n_alive = n_next
    return (
        alive.groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def link_prediction(
    edges: DataFrame, top_k: int = 50
) -> DataFrame:
    """Common-neighbor link prediction over an undirected edge list
    (``a, b`` with ``a < b``): for every NON-adjacent node pair with at
    least one shared neighbor, the common-neighbor count and Jaccard
    coefficient ``common / (deg_x + deg_z - common)`` — the classic
    "parts that should co-sell but don't yet" / "entities that are
    probably the same" candidate generator (Liben-Nowell & Kleinberg
    2003).

    Shape: candidate pairs come from WEDGES (two-hop paths through a
    shared neighbor — one self-join of the symmetrized direction table
    on the middle node), so the pair space is wedge-bounded (sum of
    deg^2/2), never all-pairs; existing edges drop via one left-anti
    join; degrees attach from the once-aggregated degree table. All
    shuffles key on node ids. Top-k by ``(n_common desc, x, z)`` —
    deterministic. Output ``(x, z, n_common, jaccard)``.
    """
    e = edges.select("a", "b").localCheckpoint()
    dirs = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("v"), F.col("b").alias("w")),
                F.struct(F.col("b").alias("v"), F.col("a").alias("w")),
            )
        ).alias("_e")
    ).select("_e.v", "_e.w")
    wedges = (
        dirs.select(F.col("v"), F.col("w").alias("x"))
        .join(dirs.select(F.col("v"), F.col("w").alias("z")), "v")
        .filter(F.col("x") < F.col("z"))
        .groupBy("x", "z")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
        "left_anti",
    )
    deg = dirs.groupBy(F.col("v")).agg(F.count(F.lit(1)).alias("_d"))
    return (
        cand.join(deg.select(F.col("v").alias("x"), F.col("_d").alias("_dx")), "x")
        .join(deg.select(F.col("v").alias("z"), F.col("_d").alias("_dz")), "z")
        .select(
            "x",
            "z",
            "n_common",
            qround(
                F.col("n_common")
                / (F.col("_dx") + F.col("_dz") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("n_common").desc(), "x", "z")
        .limit(int(top_k))
    )


def hits(
    edges: DataFrame,
    iterations: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    list, fixed ``iterations`` power steps — pagerank's
    bipartite-friendly sibling: on a customer -> supplier graph, hub
    score ranks customers whose orders concentrate on well-connected
    suppliers, authority score ranks those suppliers. A fixed iteration
    count (not a convergence loop) keeps it oracle-checkable by CTE
    unrolling, the pagerank convention.

    Per iteration: authority ``a(j) = sum_{i->j} h(i)`` then hub
    ``h(i) = sum_{i->j} a(j)`` — each ONE edge join + ONE node-keyed
    aggregate. Frames stay SPARSE mid-loop (only nodes with out-edges
    carry hub, only nodes with in-edges carry auth — a missing row IS
    zero and zero contributes nothing), so there is no per-step
    densifying join; nodes with no edges in a direction are restored
    by a single left join at the END. Normalization also happens once
    at the end (L1): mid-loop normalizing would embed the running
    frame twice per half-step and double the unrolled plan each
    iteration; deferring keeps lineage LINEAR, at the stated cost that
    raw magnitudes grow like the dominant eigenvalue^k — f64 headroom
    (1e308) covers any realistic degree profile at 8-16 iterations.
    That bound is made EXPLICIT: ``iterations`` is capped at 32 (a
    dense 1e4-degree profile stays under ~1e128 at 32 steps; anything
    needing more precision than 32 power steps has converged to ulp
    level long before — raise would mean the caller wants a
    convergence loop, which this operator deliberately is not).
    The edge frame is eagerly localCheckpoint-ed once (the pagerank
    precedent); the node frame and the running h/a frames stay lazy —
    the loop's lineage is linear (see the loop comment), so the whole
    power iteration executes as ONE adaptive job at the sink.
    Output: ``(v, hub, auth)`` L1-normalized, 6dp, ordered
    by node; a node with no out-edges has hub 0, no in-edges, auth 0.
    """
    if not 1 <= int(iterations) <= 32:
        raise ValueError(
            f"iterations must be in [1, 32], got {iterations}: deferred "
            "L1 normalization grows raw magnitudes ~lambda^k; 32 steps is "
            "the documented f64-headroom bound"
        )
    e = (
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .distinct()
        .localCheckpoint()
    )
    # nodes is consumed exactly ONCE (the final dense join) and derives
    # from the checkpointed e — checkpointing it was a pure extra build
    # job (r12); left lazy it computes inside the sink job.
    nodes = (
        e.select(F.col("_s").alias("v"))
        .union(e.select(F.col("_d").alias("v")))
        .distinct()
    )
    h = e.select(F.col("_s").alias("v")).distinct().select(
        "v", F.lit(1.0).alias("hub")
    )
    a = None
    for i in range(int(iterations)):
        a = (
            e.join(h.withColumnRenamed("v", "_s"), "_s")
            .groupBy(F.col("_d").alias("v"))
            .agg(F.sum("hub").alias("auth"))
        )
        h = (
            e.join(a.withColumnRenamed("v", "_d"), "_d")
            .groupBy(F.col("_s").alias("v"))
            .agg(F.sum("auth").alias("hub"))
        )
        # NO mid-loop checkpoint (r12): the loop's lineage is LINEAR
        # (h_{k+1} references a_k once, a_k references h_{k-1} once), so
        # the plan grows linearly and the iterations<=32 cap bounds it —
        # truncation bought nothing. Worse, the old every-4th
        # eager=False checkpoint of BOTH h and a ran iterations 1-4
        # TWICE at build: each .rdd call is its own AQE query, so a4's
        # stages executed once inside h4's checkpoint DAG and again for
        # a4's own — and the a4 checkpoint was consumed by NOTHING
        # (iteration 5 needs only h4; dense needs the final a). Measured
        # 1.49x on the full query (interleaved A/B, min-of-3, 3 wins
        # out of 3 pairs).
    dense = (
        nodes.join(h, "v", "left")
        .join(a, "v", "left")
        .select(
            "v",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
    )
    tots = dense.agg(
        F.sum("hub").alias("_th"), F.sum("auth").alias("_ta")
    )
    return (
        dense.crossJoin(F.broadcast(tots))
        .select(
            "v",
            qround(
                F.when(F.col("_th") > 0, F.col("hub") / F.col("_th"))
                .otherwise(0.0),
                6,
            ).alias("hub"),
            qround(
                F.when(F.col("_ta") > 0, F.col("auth") / F.col("_ta"))
                .otherwise(0.0),
                6,
            ).alias("auth"),
        )
        .orderBy("v")
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    a_col: str = "a",
    b_col: str = "b",
    seed_col: str = "v",
) -> DataFrame:
    """Multi-source BFS over an undirected edge list: shortest hop
    distance from ANY seed, capped at ``max_depth`` — the influence-
    radius readout (recall campaigns, contamination spread, "how far is
    every part from the recalled brand in the co-purchase graph").
    Min-label propagation exactly like connected_components, but the
    label is depth instead of component id: ``d(v) <- min(d(v),
    min_nbr d(u) + 1)`` per iteration; after k fixed iterations the
    labels ARE the exact BFS depths <= k (monotone lattice), which is
    what keeps a traversal oracle-checkable by CTE unrolling
    (the pagerank convention — no driver-side convergence decision).

    Per iteration: one edge join + one node-keyed min aggregate (2
    node-keyed shuffles); the carried frame stays node-cardinality,
    lineage linear in depth with every-4 lazy truncation. The
    symmetrized edge frame is hash-partitioned + sorted by ``src`` once
    and cached (r11, guide §2.4 — the :func:`hits` discipline), so the
    per-depth join reads it with no Exchange/Sort on the edge side and
    only the node-cardinality depth frame moves per iteration; the
    partition count is scale-adaptive (`adaptive_partitions`). Output:
    ``(v, depth)`` for nodes reached within ``max_depth``, unreached
    nodes absent (stated), ordered by (depth, v).
    """
    from gordo_spark.functions.partitioning import adaptive_partitions

    # row-local symmetrize (one reference to the upstream edge subtree;
    # the union-of-two-selects form relied on exchange reuse — see
    # connected_components, r12)
    e0 = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                ),
                F.struct(
                    F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    # repartition BEFORE distinct (hits discipline): partitioning on
    # src is a subset of the (src, dst) clustering, so dedup runs
    # exchange-free on the landed layout — one shuffle total
    e = (
        e0.repartition(adaptive_partitions(e0), "src")
        .distinct()
        .sortWithinPartitions("src")
        .cache()
    )
    # materialize now so the cached hash layout is visible to the
    # loop's join planning (unmaterialized = Unknown partitioning, see
    # hits)
    e.count()
    d = (
        seeds.select(F.col(seed_col).alias("v"))
        .distinct()
        .select("v", F.lit(0).alias("depth"))
    )
    for i in range(int(max_depth)):
        nbr = (
            e.join(d.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg((F.min("depth") + 1).alias("_nd"))
        )
        d = (
            d.join(nbr, "v", "full")
            .select(
                "v",
                F.least(
                    F.coalesce(F.col("depth"), F.lit(int(max_depth) + 1)),
                    F.coalesce(F.col("_nd"), F.lit(int(max_depth) + 1)),
                ).alias("depth"),
            )
        )
        # the carried frame is referenced TWICE per depth (directly and
        # through nbr), so the unrolled plan doubles each iteration —
        # truncate every 2nd depth. EAGER: eager=False still executes
        # every upstream stage at build under AQE (see hits) while
        # leaving the final stage to recompute per consumer.
        if (i + 1) % 2 == 0 and (i + 1) < int(max_depth):
            d = d.localCheckpoint()
    # materialize the final depth frame so the cached edge layout can be
    # released NOW (r12, guide §5): without this the returned lineage
    # still referenced ``e`` and the cache leaked executor storage for
    # the life of the session (connected_components already unpersists)
    d = d.localCheckpoint()
    e.unpersist()
    return d.filter(F.col("depth") <= int(max_depth)).orderBy("depth", "v")
