"""Exact distributed ranking primitives.

``F.ntile(k).over(Window.partitionBy(lang))`` is the textbook way to
bucket documents per language — and a 100 TB scale-killer: a window
partition is ONE task, so each language's entire document set is sorted
on a single executor. ``distributed_ntile`` reproduces SQL ``ntile``
semantics bit-for-bit (the DuckDB oracle runs the real ``ntile()``)
while every window it uses is bounded by DATA cardinality, not corpus
cardinality:

1. histogram: groupBy(partition, value) count — map-side combined; rows
   are DISTINCT values per partition (scores rounded to 1e-6 give a
   hard ~1e7 ceiling regardless of corpus size);
2. cumulative counts + partition totals: windows over the HISTOGRAM,
   so the per-task row count is the distinct-value count;
3. tie ranks: row_number partitioned by (partition, value) — a window
   over one tie group, bounded by the duplicate count of a single
   value;
4. bucket from global rank r = before(value) + tie_rank with the SQL
   ntile size rule (first n mod k buckets get floor(n/k)+1 rows),
   computed row-locally.

This is the aggregate-to-histogram trick exact distributed medians use,
generalized to ntile with deterministic (value, id) tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from gordo_spark.functions.rounding import qround


def distributed_ntile(
    df: DataFrame,
    k: int,
    order_col: str,
    part_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
    out_col: str = "tile",
) -> DataFrame:
    """Append ``out_col`` = ``ntile(k) OVER (PARTITION BY part_cols
    ORDER BY order_col, id_col)`` — exact SQL semantics, no
    corpus-sized window partition anywhere (see module docstring).
    ``(part_cols, order_col, id_col)`` must uniquely identify rows for
    the tie-break to be deterministic."""
    pcols = list(part_cols)
    hist = df.groupBy(*pcols, order_col).agg(F.count(F.lit(1)).alias("_c"))
    wcum = Window.partitionBy(*pcols).orderBy(order_col)
    wtot = (
        Window.partitionBy(*pcols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    hist = hist.select(
        *pcols,
        order_col,
        (F.sum("_c").over(wcum) - F.col("_c")).alias("_before"),
        F.sum("_c").over(wtot).alias("_n"),
    )
    wtie = Window.partitionBy(*pcols, order_col).orderBy(id_col)
    joined = df.join(hist, pcols + [order_col])
    r = F.col("_before") + F.row_number().over(wtie)
    q = F.floor(F.col("_n") / k)
    m = F.col("_n") % k
    bucket = F.when(
        r <= m * (q + 1), F.ceil(r / (q + 1))
    ).otherwise(m + F.ceil((r - m * (q + 1)) / F.greatest(q, F.lit(1))))
    return joined.select(*df.columns, bucket.cast("int").alias(out_col))


def global_rank(
    df: DataFrame,
    order_col: str,
    id_col: str,
    part_cols: tuple[str, ...] = (),
    out_col: str = "rank",
) -> DataFrame:
    """Append the exact global ``row_number() OVER (PARTITION BY
    part_cols ORDER BY order_col, id_col)`` WITHOUT a corpus-sized
    window partition — the distributed_ntile machinery (histogram
    cumulative counts + tie-group row_numbers, module docstring) minus
    the bucket arithmetic: r = rows-before(value) + tie_rank. Every
    window is bounded by value cardinality or tie-group size, never by
    data volume — which makes EMPTY ``part_cols`` appropriate only for
    frames whose value cardinality is itself bounded (resampled
    calendar grids, vocab tables): for a corpus-sized CONTINUOUS
    column, distinct values ~ rows and the unpartitioned histogram
    window becomes the bottleneck — pass ``part_cols`` (or range-bucket
    upstream) there. ``(part_cols, order_col, id_col)`` must uniquely
    identify rows."""
    pcols = list(part_cols)
    hist = df.groupBy(*pcols, order_col).agg(F.count(F.lit(1)).alias("_c"))
    wcum = Window.partitionBy(*pcols).orderBy(order_col)
    hist = hist.select(
        *pcols,
        order_col,
        (F.sum("_c").over(wcum) - F.col("_c")).alias("_before"),
    )
    wtie = Window.partitionBy(*pcols, order_col).orderBy(id_col)
    joined = df.join(hist, pcols + [order_col])
    return joined.select(
        *df.columns,
        (F.col("_before") + F.row_number().over(wtie)).alias(out_col),
    )


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with
    quartile scores 1-4 per axis and a combined ``rfm`` code
    (``r*100 + f*10 + m`` — 444 = best on all three).

    Deliberately NOT the textbook global-ntile formulation: ntile needs
    a single-partition total sort of the customer table, which is
    sf-proportional. Instead the three quartile THRESHOLDS come from
    one exact-percentile aggregation (a 1-row frame, broadcast — the
    length_curriculum pattern) and every customer scores by three
    comparisons — pure hash-agg + row-local math at any scale. Recency
    uses the last-order epoch directly: days-since-last-order is a
    DECREASING transform of that epoch, so the epoch convention here
    (larger epoch = more recent = score 4) is equivalent to
    days-since scoring only after flipping the comparison direction —
    which is exactly what the ``>`` comparisons below encode, and it
    avoids needing a second "now" scalar. Monetary sums are rounded
    to 6dp BEFORE thresholding so score boundaries are reproducible
    across engines.
    """
    per = orders.groupBy(cust_col).agg(
        F.max(F.col(ts_col).cast("timestamp").cast("long")).alias("_rec"),
        F.count(F.lit(1)).alias("frequency"),
        qround(F.sum(amount_col), 6).alias("monetary"),
    )
    thr = per.agg(
        *[
            F.expr(f"percentile({c}, {p})").alias(f"{c}_q{int(p * 100)}")
            for c in ("_rec", "frequency", "monetary")
            for p in (0.25, 0.5, 0.75)
        ]
    )

    def _score(c: str):
        return (
            F.lit(1)
            + (F.col(c) > F.col(f"{c}_q25")).cast("int")
            + (F.col(c) > F.col(f"{c}_q50")).cast("int")
            + (F.col(c) > F.col(f"{c}_q75")).cast("int")
        )

    return (
        per.crossJoin(F.broadcast(thr))
        .select(
            cust_col,
            _score("_rec").alias("r_score"),
            _score("frequency").alias("f_score"),
            _score("monetary").alias("m_score"),
        )
        .withColumn(
            "rfm",
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
        )
    )


def lorenz_curve(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Concentration (Lorenz) curve over a value column: members tile
    into ``k`` exact ntile buckets by value DESCENDING (bucket 1 = the
    heaviest), and each bucket reports its share and the running
    cumulative share — the "top 5% of customers carry 43% of revenue"
    / "top sources carry most tokens" readout that sizes skew
    mitigation and curation budgets.

    Buckets come from exact PERCENTILE boundaries (one single-pass
    aggregate producing k-1 scalars, broadcast back) and a row-local
    boundary count — NOT from a per-member rank: exact global ntile
    needs a global ordering (the :func:`distributed_ntile` histogram
    trick degenerates when a continuous value column makes every
    histogram bin unique), while boundary bucketing is one aggregation
    plus codegen arithmetic at any scale. Ties and interpolated
    boundaries can make bucket populations slightly unequal —
    ``n_members`` reports the truth per bucket, and ``cum_member_frac``
    is computed from it, not assumed ``b/k``. The cumulative windows
    then run over the <= k-row bucket table. Output ``(bucket,
    n_members, bucket_value, cum_member_frac, cum_value_frac)``;
    bucket 1 = heaviest.
    """
    vals = df.select(
        F.col(id_col).alias("_id"), F.col(value_col).cast("double").alias("_v")
    )
    qs = ", ".join(str(i / k) for i in range(1, int(k)))
    bounds = vals.agg(
        F.expr(f"percentile(_v, array({qs}))").alias("_bs")
    )
    # descending bucket: k - (#boundaries strictly below the value);
    # ties at a boundary fall to the LIGHTER bucket (v == p_i is not >)
    bucket = F.lit(int(k)) - F.size(
        F.filter(F.col("_bs"), lambda p: F.col("_v") > p)
    )
    per = (
        vals.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("_v").alias("bucket_value"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "bucket",
        "n_members",
        qround("bucket_value", 2).alias("bucket_value"),
        qround(
            F.sum("n_members").over(w) / F.sum("n_members").over(wall), 6
        ).alias("cum_member_frac"),
        qround(
            F.sum("bucket_value").over(w) / F.sum("bucket_value").over(wall),
            6,
        ).alias("cum_value_frac"),
    ).orderBy("bucket")


def quantile_transform(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    out_col: str = "quantile",
) -> DataFrame:
    """Rank-normalize a feature onto a uniform [0, 1] grid via exact
    percentile BOUNDARIES (the :func:`lorenz_curve` machinery): each
    row's output is the fraction of the k boundaries strictly below
    its value, i.e. its corpus quantile at resolution 1/k — the
    monotone transform that makes heavy-tailed scores comparable and
    threshold rules portable across corpora (a "top 10% quality"
    rule survives any score-scale change).

    One single-pass percentile aggregate (k-1 scalars, broadcast) +
    row-local boundary counting — no per-row rank, no global sort, at
    any scale. Ties at a boundary fall to the lower quantile (v == p
    is not >). Boundaries are 6dp-ROUNDED before comparison (the
    trimmed_mean cut-point convention, stated): interpolated
    percentiles differ between engines at the ulp level, and at large
    n a raw-boundary comparison flips rows that sit exactly on a
    boundary (measured: 48/600k at sf0.1) — rounding pins the
    boundary identically everywhere. Appends ``out_col`` rounded to 6.
    """
    qs = ", ".join(str(i / k) for i in range(1, int(k)))
    bounds = df.agg(
        F.transform(
            F.expr(f"percentile({value_col}, array({qs}))"),
            lambda p: qround(p, 6),
        ).alias("_qt_bs")
    )
    q = F.size(
        F.filter(F.col("_qt_bs"), lambda p: F.col(value_col) > p)
    ) / F.lit(float(k))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, qround(q, 6))
        .drop("_qt_bs")
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.1,
) -> DataFrame:
    """Per-group alpha-trimmed mean — the robust location estimate
    between the mean (outlier-hostage) and the median (throws away
    80% of the information): drop values strictly below the trim-th
    and strictly above the (1-trim)-th EXACT percentile, average the
    rest. Boundary values equal to a cut point are KEPT (the inclusive
    convention — deterministic and engine-portable, no fractional-row
    interpolation of the trimmed set itself).

    Scale shape: one exact-percentile aggregate per group (Spark's
    ``percentile`` buffers per group, not per row) broadcast-joined
    back, then one filtered re-aggregation — two group-keyed hash aggs,
    no window, no sort. Cut points are 6dp-rounded before comparison
    (engine-portable boundaries, the length_curriculum convention).
    Output: ``(group, n, n_used, lo_cut, hi_cut, trimmed_mean)``.
    """
    t = float(trim)
    if not 0 <= t < 0.5:
        raise ValueError("trim must be in [0, 0.5)")
    v = F.col(value_col).cast("double")
    cuts = df.filter(v.isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        qround(F.expr(f"percentile({value_col}, {t})"), 6).alias("lo_cut"),
        qround(F.expr(f"percentile({value_col}, {1 - t})"), 6).alias(
            "hi_cut"
        ),
    )
    kept = (
        df.filter(v.isNotNull())
        .join(cuts, group_col)
        .filter(
            (qround(v, 6) >= F.col("lo_cut"))
            & (qround(v, 6) <= F.col("hi_cut"))
        )
    )
    return kept.groupBy(group_col, "n", "lo_cut", "hi_cut").agg(
        F.count(F.lit(1)).alias("n_used"),
        qround(F.avg(v), 6).alias("trimmed_mean"),
    ).select(group_col, "n", "n_used", "lo_cut", "hi_cut", "trimmed_mean")


def weighted_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Per-group WEIGHTED quantiles: the smallest value whose cumulative
    weight reaches ``q * W`` (lower weighted-quantile convention —
    deterministic, no interpolation between unequal-weight points).
    The question unweighted quantiles cannot answer: "the median
    document BY TOKENS is how long?" — a corpus median weighted by
    token count sits far above the per-document median when length is
    skewed (and token-weighted stats are what training-cost estimates
    need).

    Scale shape: one (group, value) hash aggregation collapses
    duplicates and pre-sums their weight (map-side combined), one
    group-PARTITIONED cumulative window over the collapsed value grid,
    one rank filter per quantile (all quantiles in one pass, the
    group_quantile_sketch fan-out). Values are 6dp-rounded before
    grouping (engine-portable grid). NULL values and NULL/non-positive
    weights are excluded (no rank information; stated). Output:
    ``(group, q, total_weight, estimate)``.
    """
    from pyspark.sql import Window

    v = qround(F.col(value_col).cast("double"), 6)
    w = F.col(weight_col).cast("double")
    rows = df.filter(v.isNotNull() & w.isNotNull() & (w > 0))
    hist = rows.groupBy(F.col(group_col).alias("_g"), v.alias("_v")).agg(
        F.sum(w).alias("_w")
    )
    wcum = Window.partitionBy("_g").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("_g")
    cum = hist.select(
        "_g",
        "_v",
        F.sum("_w").over(wcum).alias("_cw"),
        (F.sum("_w").over(wcum) - F.col("_w")).alias("_cw_prev"),
        F.sum("_w").over(wtot).alias("_W"),
    )
    fanned = cum.select(
        "_g",
        "_v",
        "_cw",
        "_cw_prev",
        "_W",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    # the covering value: first _v whose cumweight reaches q*W
    hit = fanned.filter(
        (F.col("_cw") >= F.col("q") * F.col("_W"))
        & (F.col("_cw_prev") < F.col("q") * F.col("_W"))
    )
    return hit.select(
        F.col("_g").alias(group_col),
        "q",
        qround(F.col("_W"), 6).alias("total_weight"),
        F.col("_v").alias("estimate"),
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    buckets: int = 32,
) -> DataFrame:
    """2-D skyline (Pareto frontier, minimize both): the rows no other
    row beats on BOTH dimensions — "cheapest AND smallest" product
    shortlists, "fastest AND cheapest" plan choices. A point survives
    iff no point has ``x <=`` and ``y <=`` with one strict; exact ties
    keep the smallest id (stated).

    Distributed shape (the classic two-phase skyline): stage 1 computes
    a LOCAL skyline inside each of ``buckets`` md5 buckets — any
    locally dominated point is globally dominated, so local filtering
    is lossless — via one bucket-partitioned ordered window (x asc,
    y asc, id; survive iff y < running-min(y) of prior rows). Stage 2
    repeats the same window globally over the local survivors, whose
    volume is sum of per-bucket frontier sizes (typically tiny;
    worst case — all points on one frontier — is the problem's own
    output size, stated). No corpus-sized global sort.

    Output: ``(id, x, y)`` frontier rows ordered by x.
    """
    from gordo_spark.operators.dedup import md5_long

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        F.col(id_col).alias("id"), x.alias("x"), y.alias("y")
    )

    def survivors(frame, part_cols):
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("x").asc(), F.col("y").asc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return frame.withColumn("_miny", F.min("y").over(w)).filter(
            F.col("_miny").isNull() | (F.col("y") < F.col("_miny"))
        ).drop("_miny")

    local = survivors(
        base.withColumn(
            "_b", F.pmod(md5_long(F.col("id").cast("string")), F.lit(int(buckets)))
        ),
        ["_b"],
    ).drop("_b")
    return survivors(local, []).orderBy("x", "y", "id")


def group_mode(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
) -> DataFrame:
    """Exact per-group MODE with a deterministic lowest-value tiebreak —
    the categorical central tendency GROUP BY families always need and
    engines only ship approximately (Spark has no mode agg before 3.4,
    and 3.4's breaks ties arbitrarily). Two stacked hash aggregations
    (value counts, then an argmax via ``max_by`` on a (count, value)
    struct with the value NEGATIVE-ORDERED for the tiebreak) — both
    map-side combinable, no windows. Output:
    ``(group..., mode, mode_n, n_distinct)``.
    """
    counts = df.filter(F.col(value_col).isNotNull()).groupBy(
        *group_cols, F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.groupBy(*group_cols)
        .agg(
            F.min_by(
                "_v", F.struct((-F.col("_n")).alias("a"), F.col("_v"))
            ).alias("mode"),
            F.max("_n").alias("mode_n"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .orderBy(*group_cols)
    )
