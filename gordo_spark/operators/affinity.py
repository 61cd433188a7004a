"""Within-group item-pair co-occurrence (market-basket affinity).

Not in the reference (gordo has no relational analytics beyond its
sensor frames) — this is the classic "parts bought together" query a
TPC-H-shaped warehouse runs, included to prove the engine's relational
breadth on a self-join shape (SURVEY.md §8).

Scale posture: ONE shuffle groups each basket into a sorted distinct
item array; pairs are then generated row-locally from the array (no
self-join, no second data-sized exchange), with fan-out bounded at
k(k-1)/2 per group by the per-basket item count k (TPC-H lineitem:
<= 7-ish lines per order) — the same bound that makes FP-growth's
candidate generation tractable. The pair key canonicalizes as (a < b)
via the sorted array. The item-marginal join is deliberately UNHINTED
(item cardinality is sf-proportional — ``part``), so AQE picks the
strategy; the only forced broadcast is the 1-row group-total scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround

__all__ = ["association_rules", "pair_counts"]


def pair_counts(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_both: int = 1,
) -> DataFrame:
    """Distinct item pairs co-occurring within a group, with lift.

    Output ``(item_a, item_b, n_both, lift)`` where
    ``lift = n_both * N_groups / (n_a * n_b)`` — >1 means the pair
    co-occurs more than independence predicts. ``n_a``/``n_b`` are
    group-frequencies of each item alone; duplicates of an item inside
    one group count once (the initial distinct projection).
    """
    # One shuffle groups each basket's distinct items into a sorted array
    # (collect_set dedupes in the aggregate; per-basket size is the bound
    # k); pair generation is then ROW-LOCAL array algebra — no self-join,
    # no second data-sized exchange. marg/tot re-derive the same 1-scan
    # lineage at different grains (3 scans total vs the self-join
    # formulation's 10).
    baskets = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("items"))
    )
    pair_expr = (
        "explode(flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), "
        "y -> struct(x AS item_a, y AS item_b)))))"
    )
    pairs = (
        baskets.select(F.expr(pair_expr).alias("p"))
        .groupBy(F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_both)
    )
    marg = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_groups"))
    return (
        pairs.join(
            marg.select(F.col("item").alias("item_a"), F.col("n_item").alias("_na")),
            "item_a",
        )
        .join(
            marg.select(F.col("item").alias("item_b"), F.col("n_item").alias("_nb")),
            "item_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "item_a",
            "item_b",
            "n_both",
            qround(
                F.col("n_both") * F.col("n_groups") / (F.col("_na") * F.col("_nb")), 6
            ).alias("lift"),
        )
    )


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_both: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Directed single-item association rules ``antecedent ->
    consequent`` with the classic Agrawal-Srikant measures: ``support =
    n_both / N``, ``confidence = n_both / n_antecedent``, ``lift =
    confidence / (n_consequent / N)``. Each unordered co-occurrence
    pair yields BOTH directions (confidence is asymmetric — diapers ->
    beer and beer -> diapers differ).

    Same scale shape as :func:`pair_counts` (one basket aggregation,
    row-local pair fan-out bounded by basket size, item-cardinality
    marginal join, 1-row total broadcast); the directed expansion is a
    row-local 2-way explode of the canonical pair table, not a second
    pass. ``min_both`` prunes the pair table BEFORE the marginal join —
    the support threshold is what bounds rule count at 100 TB.
    Output ``(antecedent, consequent, n_both, support, confidence,
    lift)``.
    """
    baskets = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("items"))
    )
    pair_expr = (
        "explode(flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), "
        "y -> struct(x AS item_a, y AS item_b)))))"
    )
    both = (
        baskets.select(F.expr(pair_expr).alias("p"))
        .groupBy(
            F.col("p.item_a").alias("item_a"),
            F.col("p.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= int(min_both))
    )
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                ),
            )
        ).alias("r"),
        "n_both",
    ).select("r.antecedent", "r.consequent", "n_both")
    marg = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_groups"))
    conf = F.col("n_both") / F.col("_na")
    return (
        directed.join(
            marg.select(
                F.col("item").alias("antecedent"), F.col("n_item").alias("_na")
            ),
            "antecedent",
        )
        .join(
            marg.select(
                F.col("item").alias("consequent"), F.col("n_item").alias("_nb")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(tot))
        .filter(conf >= float(min_confidence))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            qround(F.col("n_both") / F.col("n_groups"), 6).alias("support"),
            qround(conf, 6).alias("confidence"),
            qround(
                conf / (F.col("_nb") / F.col("n_groups")), 6
            ).alias("lift"),
        )
    )
