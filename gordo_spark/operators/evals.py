"""Model-evaluation analytics — the readout layer of a training-data
pipeline: once the corpus operators (dedup/quality/mixture) have built a
dataset and a model has been sampled against an eval suite, these
operators turn per-sample results into the numbers people ship.

All four are single-pass keyed aggregations over row-level results —
the table shapes are (task, sample) / (item, rater) / (winner, loser),
which at fleet scale are big in ROWS and bounded in KEYS, exactly the
map-side-combinable shape the rest of the engine uses. Exactness
follows the house discipline: integer sufficient statistics where the
math allows (Fleiss), unrolled fixed-iteration grid arithmetic where it
doesn't (Bradley-Terry, the kmeans/pagerank posture), and qround
outputs so every number is bit-identical on any engine.

No reference counterpart (extension tier): the reference's scoring
stops at per-machine CV metrics (gordo/builder/build_model.py scoring);
these are the corpus/eval-suite statistics that sit beside it in an
LLM data pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from gordo_spark.functions.rounding import qround

__all__ = [
    "pass_at_k",
    "majority_vote",
    "fleiss_kappa",
    "bradley_terry",
]


def pass_at_k(
    df: DataFrame,
    task_col: str = "task",
    passed_col: str = "passed",
    ks: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """Unbiased pass@k per task (Chen et al. 2021, the HumanEval
    estimator): with ``n`` samples of which ``c`` pass,
    ``pass@k = 1 - C(n-c, k) / C(n, k)`` — the probability a random
    size-k subset contains at least one pass. Computed in the
    numerically-stable product form ``1 - prod_{i=0..k-1}
    (n-c-i)/(n-i)`` (k literal, so the product unrolls into a fixed
    expression — same op sequence in any engine). Conventions: NULL
    when ``k > n`` (can't draw k samples), 0 when ``c = 0``, 1 when
    ``n - c < k`` (every subset hits a pass).

    One count/sum aggregation per task — map-side combinable, output
    |tasks| rows: ``(task, n, c, pass_at_{k}...)``.
    """
    agg = df.groupBy(F.col(task_col).alias("task")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(passed_col).cast("long")).alias("c"),
    )
    cols = [F.col("task"), F.col("n"), F.col("c")]
    for k in ks:
        k = int(k)
        prod = F.lit(1.0)
        for i in range(k):
            prod = prod * (
                (F.col("n") - F.col("c") - F.lit(i))
                / (F.col("n") - F.lit(i))
            )
        cols.append(
            F.when(F.col("n") < k, F.lit(None).cast("double"))
            .when(F.col("c") == 0, F.lit(0.0))
            .when(F.col("n") - F.col("c") < k, F.lit(1.0))
            .otherwise(qround(F.lit(1.0) - prod, 6))
            .alias(f"pass_at_{k}")
        )
    return agg.select(*cols).orderBy("task")


def majority_vote(
    df: DataFrame,
    task_col: str = "task",
    answer_col: str = "answer",
) -> DataFrame:
    """Self-consistency aggregation (Wang et al. 2023): per task, the
    modal answer over the samples, with the deterministic tie-break
    (highest count, then LOWEST answer — a total order, so the winner
    is partitioning-independent). Output: ``(task, n_samples,
    n_distinct, top_answer, top_votes, vote_share)``.

    Two keyed aggregations (task x answer counts, then per-task
    argmax via a rank window partitioned by task — group sizes are
    |distinct answers per task|, bounded by the sample count).
    """
    counts = df.groupBy(
        F.col(task_col).alias("task"), F.col(answer_col).alias("answer")
    ).agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("task").orderBy(
        F.col("votes").desc(), F.col("answer").asc()
    )
    per_task = counts.select(
        "task",
        "answer",
        "votes",
        F.row_number().over(w).alias("_rk"),
        F.sum("votes").over(Window.partitionBy("task")).alias("n_samples"),
        F.count(F.lit(1))
        .over(Window.partitionBy("task"))
        .alias("n_distinct"),
    )
    return (
        per_task.filter(F.col("_rk") == 1)
        .select(
            "task",
            "n_samples",
            "n_distinct",
            F.col("answer").alias("top_answer"),
            F.col("votes").alias("top_votes"),
            qround(F.col("votes") / F.col("n_samples"), 6).alias(
                "vote_share"
            ),
        )
        .orderBy("task")
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    category_col: str = "category",
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for
    MANY raters, the multi-annotator upgrade of
    :func:`quality_checks.cohens_kappa` and the QA readout for RLHF /
    labeling campaigns: do the annotators agree beyond what the
    category base rates force?

    Classic Fleiss assumes a CONSTANT rating count per item; here
    ``n_raters`` is the maximum per-item rating count and items rated
    fewer times are dropped (stated — the standard complete-case
    convention). Every statistic then reduces to INTEGER sufficient
    statistics: per item ``P_i * n(n-1) = sum_j n_ij^2 - n`` (an
    integer), so ``P-bar = sum_items(sum_j n_ij^2 - n) / (N n (n-1))``
    is one exact integer sum and one division; ``P_e = sum_j C_j^2 /
    (N n)^2`` from the integer category totals likewise. Order-free,
    bit-identical on any engine — no float accumulation anywhere
    before the final divisions.

    Output one row: ``(n_items, n_raters, n_categories, p_bar, p_e,
    kappa)``; kappa NULL when ``P_e = 1`` (all mass in one category —
    agreement undefined, not perfect).
    """
    # pin the panel once (r12, guide §5): ratings is panel-bounded
    # (items x raters), but it feeds the max-count probe, the
    # complete-case join, and the cell histogram — left lazy, each
    # consumer re-derived the caller's whole panel build (the 3-rater
    # contract's plan held 12 document scans,
    # plans/r12/eval_fleiss_kappa_before). The operator already runs an
    # eager .first() for n_raters, so the eager pin adds no extra sync.
    ratings = df.select(
        F.col(item_col).alias("_it"),
        F.col(rater_col).alias("_ra"),
        F.col(category_col).alias("_cat"),
    ).localCheckpoint()
    per_item_n = ratings.groupBy("_it").agg(F.count(F.lit(1)).alias("_n"))
    n_raters = per_item_n.agg(F.max("_n")).first()[0]
    if not n_raters or n_raters < 2:
        raise ValueError("fleiss_kappa needs items with >= 2 ratings")
    kept = ratings.join(
        F.broadcast(per_item_n.filter(F.col("_n") == n_raters)), "_it"
    )
    cell = kept.groupBy("_it", "_cat").agg(F.count(F.lit(1)).alias("_c"))
    items = cell.groupBy("_it").agg(
        (F.sum(F.col("_c") * F.col("_c")) - F.lit(n_raters)).alias("_num")
    )
    tot = items.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_num").alias("_s"),
    )
    cats = cell.groupBy("_cat").agg(F.sum("_c").alias("_cj"))
    cat_tot = cats.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("_cj") * F.col("_cj")).alias("_c2"),
    )
    n = int(n_raters)
    one = tot.crossJoin(F.broadcast(cat_tot))
    p_bar = F.col("_s") / (F.col("n_items") * F.lit(n * (n - 1)))
    p_e = F.col("_c2") / (
        (F.col("n_items") * F.lit(n)) * (F.col("n_items") * F.lit(n))
    )
    return one.select(
        "n_items",
        F.lit(n).alias("n_raters"),
        "n_categories",
        qround(p_bar, 6).alias("p_bar"),
        qround(p_e, 6).alias("p_e"),
        F.when(p_e == 1.0, F.lit(None).cast("double"))
        .otherwise(qround((p_bar - p_e) / (F.lit(1.0) - p_e), 6))
        .alias("kappa"),
    )


def bradley_terry(
    df: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 20,
) -> DataFrame:
    """Bradley-Terry strength ratings from pairwise outcomes — the
    model behind chat-arena leaderboards (and Elo's batch cousin):
    P(i beats j) = p_i / (p_i + p_j), fit by ``iters`` fixed
    minorization-maximization steps (Hunter 2004):
    ``p_i <- W_i / sum_j n_ij / (p_i + p_j)``, mean-normalized each
    step.

    Scale shape: the heavy part is ONE (winner, loser) count
    aggregation over the outcome rows (map-side combinable); the MM
    iteration runs driver-side on the |models|^2-bounded pair table
    (the kmeans-centroid posture) in the exact-grid discipline — each
    denominator term and each rating quantized to the 1e-9 grid,
    per-model term sums accumulated as INTEGERS (order-free), so the
    fit is bit-identical on any engine/partitioning and the DuckDB
    oracle unrolls the identical steps as CTEs (the HITS posture).
    Zero-win models rate 0 (stated; MM's fixed point), and a pair
    whose ratings are both 0 contributes no denominator term.

    Output: ``(model, wins, games, rating)`` ordered by rating desc,
    model asc; ratings mean-normalized (average 1.0 on the grid).
    """

    def q9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    pair_rows = (
        df.groupBy(
            F.col(winner_col).alias("_w"), F.col(loser_col).alias("_l")
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    wins: dict[str, int] = {}
    games: dict[tuple[str, str], int] = {}
    models: set[str] = set()
    for r in pair_rows:
        a, b, c = r["_w"], r["_l"], int(r["_n"])
        models.update((a, b))
        wins[a] = wins.get(a, 0) + c
        key = (a, b) if a <= b else (b, a)
        games[key] = games.get(key, 0) + c
    order = sorted(models)
    p = {m: 1.0 for m in order}
    for _ in range(int(iters)):
        raw = {}
        for i in order:
            den_int = 0
            for j in order:
                if i == j:
                    continue
                key = (i, j) if i <= j else (j, i)
                nij = games.get(key, 0)
                if nij == 0 or p[i] + p[j] == 0:
                    continue
                den_int += int(math.floor(nij / (p[i] + p[j]) * 1e9 + 0.5))
            den = den_int / 1e9
            w = wins.get(i, 0)
            raw[i] = q9(w / den) if den > 0 and w > 0 else 0.0
        mean_int = sum(int(math.floor(raw[i] * 1e9 + 0.5)) for i in order)
        mean = mean_int / (len(order) * 1e9)
        p = {
            i: q9(raw[i] / mean) if mean > 0 else raw[i] for i in order
        }
    spark = df.sparkSession
    out = [
        (
            m,
            wins.get(m, 0),
            sum(c for (a, b), c in games.items() if m in (a, b)),
            q9(p[m]),
        )
        for m in order
    ]
    return (
        spark.createDataFrame(
            out, "model string, wins long, games long, rating double"
        )
        .select("model", "wins", "games", qround("rating", 6).alias("rating"))
        .orderBy(F.col("rating").desc(), F.col("model").asc())
    )
