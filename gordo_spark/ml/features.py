"""Feature-engineering operators for model pipelines.

The reference's feature surface is sklearn transformers inside the model
config (gordo/machine/model/factories.py builds the pipelines); at corpus
scale the fit-time statistics must be one-pass aggregations, not
driver-side sklearn fits. These operators keep every fit a bounded
aggregate and every apply a row-local projection or broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    leave_one_out: bool = False,
) -> DataFrame:
    """Smoothed mean target encoding (Micci-Barreca 2001) — the
    categorical-feature workhorse for high-cardinality columns one-hot
    cannot touch: ``enc = (n * cat_mean + m * global_mean) / (n + m)``
    shrinks rare categories toward the prior (m = ``smoothing``
    pseudo-observations).

    ``leave_one_out=True`` excludes the row's OWN target from its
    category mean — ``(sum - y) / (n - 1)`` before smoothing — the
    leakage-free variant for encoding the TRAINING table itself
    (plain mode is for applying a fitted encoding to disjoint data).
    Singleton categories under LOO have no peers: their category term
    is empty, so the encoding collapses to the global mean (stated).

    Scale shape: one hash aggregation keyed on the category (map-side
    combined, category-cardinality output — high-cardinality is fine,
    the table stays far under corpus size), one 1-row global aggregate
    (hint-broadcast), and one UNHINTED category join back (the
    category table is corpus-derived — the tfidf_topk de-hinting rule;
    AQE broadcasts iff genuinely small). Encoding is rounded to 6
    (engine-portable). NULL targets are excluded from all means.
    """
    m = float(smoothing)
    y = F.col(target_col).cast("double")
    rows = df.filter(y.isNotNull())
    per_cat = rows.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(y).alias("_sum")
    )
    glob = rows.agg(F.avg(y).alias("_gmean"))
    j = rows.join(per_cat, cat_col).crossJoin(F.broadcast(glob))
    if leave_one_out:
        cat_mean = F.when(
            F.col("_n") > 1, (F.col("_sum") - y) / (F.col("_n") - 1)
        )
        n_eff = F.col("_n") - 1
    else:
        cat_mean = F.col("_sum") / F.col("_n")
        n_eff = F.col("_n")
    enc = F.coalesce(
        (n_eff * cat_mean + F.lit(m) * F.col("_gmean"))
        / (n_eff + F.lit(m)),
        F.col("_gmean"),  # LOO singleton: no peers, pure prior
    )
    return j.select(
        *[F.col(c) for c in df.columns],
        qround(enc, 6).alias("target_enc"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    precision: int = 3,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of probability
    scores via pool-adjacent-violators — the non-parametric companion
    to the Brier/ECE readouts: learns the best monotone map from score
    to empirical P(y=1) without binning assumptions.

    Scale shape (the auc_exact bounded-grid convention): scores round
    to a ``10^precision + 1``-point grid, ONE hash aggregation builds
    the per-grid-point (n, n_pos) table, that RESOLUTION-BOUNDED frame
    collects to the driver where PAV runs in O(grid) numpy (the
    sketch/codebook bounded-collect precedent — PAV is inherently
    sequential, and 1001 rows on the driver beats faking a sequential
    algorithm with 1001 Spark iterations), and the fitted step function
    returns as a DataFrame: ``(score_grid, n, n_pos, calibrated)``.
    Apply-side is a range join or interpolation against this bounded
    table. Iterative-fit contract class (pytest-pinned numpy parity,
    rows-only oracle — the sim_ivf_kmeans/bpe_merges convention).
    """
    import numpy as np

    p = int(precision)
    s = qround(F.col(score_col).cast("double"), p).alias("_s")
    y = F.col(label_col).cast("int")
    grid = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(s, y.alias("_y"))
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_y").alias("_pos"),
        )
        .orderBy("_s")
    )
    rows = grid.collect()  # bounded: <= 10^precision + 1 grid points
    if not rows:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "score_grid double, n long, n_pos long, calibrated double"
        )
    sc = np.array([r["_s"] for r in rows], dtype=float)
    n = np.array([r["_n"] for r in rows], dtype=float)
    pos = np.array([r["_pos"] for r in rows], dtype=float)
    # PAV: maintain a stack of blocks (weight, mean); merge while the
    # monotonicity constraint is violated
    blocks: list[list[float]] = []  # [weight, sum, start_idx]
    for i in range(len(sc)):
        blocks.append([n[i], pos[i], i])
        while (
            len(blocks) > 1
            and blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            w2, s2, i2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
    cal = np.empty(len(sc))
    starts = [int(b[2]) for b in blocks] + [len(sc)]
    for b, (w, tot, i0) in enumerate(blocks):
        cal[int(i0) : starts[b + 1]] = tot / w
    out = [
        (float(sc[i]), int(n[i]), int(pos[i]),
         float(np.floor(float(cal[i]) * 1e6 + 0.5) / 1e6))
        for i in range(len(sc))
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "score_grid double, n long, n_pos long, calibrated double"
    )
