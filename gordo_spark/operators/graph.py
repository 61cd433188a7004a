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

__all__ = ["co_occurrence_edges", "triangle_stats"]


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
    """
    e = edges.select("a", "b")
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
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ),
            6,
        ).alias("global_clustering"),
    )
