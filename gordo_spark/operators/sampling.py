"""Deterministic sampling & splitting for training-data pipelines.

Train/val/test assignment at 100 TB must be (a) reproducible across runs
and engines, (b) stable under re-partitioning, and (c) shuffle-free.
``df.randomSplit`` is none of these (seeded per-partition RNG changes
with partitioning). Hash-bucket assignment is all three: bucket =
md5(id) mod B is a pure projection — each row's split is a function of
its own id, so the operation adds NO shuffle, survives any repartition,
and reproduces bit-for-bit on any engine with md5() (the DuckDB oracles
run the same expression).

The md5 bucket is uniform within any stratum (language, source, ...), so
a global threshold already samples proportionally per stratum;
``stratified_sample`` additionally takes per-stratum fractions for
up/down-weighting (the "rebalance languages" step of corpus curation).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from gordo_spark.functions.rounding import qround

from gordo_spark.operators.dedup import md5_long


def hash_bucket(col: Column, buckets: int = 10_000) -> Column:
    """Uniform deterministic bucket in [0, buckets) from md5(id).
    md5_long is non-negative (first 8 md5 hex chars), so plain pmod."""
    return F.pmod(md5_long(col.cast("string")), F.lit(buckets))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
    buckets: int = 10_000,
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` label ('train'/'val'/...) by cumulative hash-bucket
    thresholds. Fractions must sum to <= 1; any remainder is 'holdout'."""
    fractions = dict(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(fractions.values())
    if total > 1 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(F.col(id_col), buckets)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cond = b < int(round(cum * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr.otherwise("holdout"))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction: float | Mapping[str, float],
    strata_col: str | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic sample: keep rows whose hash bucket falls under the
    fraction threshold — globally, or per stratum when ``fraction`` is a
    {stratum: fraction} mapping (strata absent from the map are dropped)."""
    b = hash_bucket(F.col(id_col), buckets)
    if isinstance(fraction, Mapping):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        expr = None
        for stratum, frac in fraction.items():
            cond = (F.col(strata_col) == stratum) & (b < int(round(frac * buckets)))
            expr = cond if expr is None else expr | cond
        return df.filter(expr)
    return df.filter(b < int(round(float(fraction) * buckets)))


def train_shuffle(
    df: DataFrame, id_col: str, num_partitions: int, salt: str = "epoch0"
) -> DataFrame:
    """Deterministic global "shuffle" for training export: order rows by
    md5(salt || id) and hash-partition them the same way. One exchange,
    reproducible for a given salt; vary ``salt`` per epoch to re-shuffle."""
    key = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("_shuffle_key", key)
        .repartition(num_partitions, F.col("_shuffle_key"))
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )


def with_global_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "global_id",
    partitions: int | None = None,
) -> DataFrame:
    """Assign contiguous 0-based global ids in ``order_col`` order — the
    DataFrame-native zipWithIndex a training-corpus export needs (example
    indices, shard manifests), WITHOUT a global single-partition sort.

    Scale shape: range-partition on the order column (ranges are
    non-overlapping and partition index follows range order), take a
    per-partition local row_number, then add each partition's prefix
    offset. The offsets frame has exactly one row per partition — its
    unpartitioned running-sum window is over a bounded, partition-count-
    sized frame, never the data. Net cost: ONE range shuffle of the data
    plus a broadcast of the tiny offset table.

    ``order_col`` must be unique per row (equal values that straddle a
    range boundary would get arbitrary relative order).
    """
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import Window

    rp = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(order_col)
    local = rp.withColumn("_lid", F.row_number().over(w_local) - 1)
    # one row per partition; the running sum runs over <= `parts` rows
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_lid")).cast("long"))
        .drop("_pid", "_lid", "_off")
    )


def stratified_take(
    df: DataFrame,
    strata_cols: Sequence[str],
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-N per-stratum deterministic sample — the eval-set
    construction primitive. Fraction-based sampling (``stratified_sample``)
    gives each stratum a binomially-varying count; evaluation sets want
    exactly ``min(n, |stratum|)`` rows per stratum, identical on every
    run, partitioning, and engine.

    Rows rank within their stratum by (md5(id), id) — a uniform,
    reproducible order — and the first ``n`` survive. One window
    PARTITIONED by the strata (parallel across strata, no global pass);
    at 100 TB the only skew bound is the largest stratum, and the rank
    early-outs after n rows per partition under the window's running
    row_number.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        md5_long(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(n))
        .drop("_rk")
    )


def mixture_weights(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.7,
    budget_frac: float = 0.6,
) -> DataFrame:
    """Temperature-scaled mixture plan over strata (sources, languages):
    stratum weight w_s = n_s^alpha / sum_t n_t^alpha — the alpha-scaling
    used to flatten source/language imbalance in multilingual and
    multi-corpus LLM training (alpha=1 keeps natural proportions,
    alpha=0 is uniform; 0.7 is the mBERT/XLM-R convention). The keep
    rate solves E[kept_s] = budget_frac * N * w_s, capped at 1 (a
    stratum cannot be sampled above its size; the cap spends the
    residual budget nowhere, keeping rates independent and
    deterministic).

    Returns (stratum, n_docs, weight, rate) — strata-cardinality rows,
    one tiny aggregation; legitimately broadcastable downstream.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("_n"),
        F.sum(F.pow("n_docs", F.lit(float(alpha)))).alias("_z"),
    )
    w = F.pow("n_docs", F.lit(float(alpha))) / F.col("_z")
    return counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        "n_docs",
        w.alias("weight"),
        F.least(
            F.lit(1.0), F.lit(float(budget_frac)) * F.col("_n") * w / F.col("n_docs")
        ).alias("rate"),
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.7,
    budget_frac: float = 0.6,
    buckets: int = 10_000,
    rates: DataFrame | None = None,
) -> DataFrame:
    """Deterministic temperature-mixture sample: keep a row iff its hash
    bucket falls under its stratum's ``mixture_weights`` rate. Pure
    row-local predicate after one broadcast join of the strata-sized
    rate table — no shuffle of the corpus, stable under repartitioning,
    engine-portable (md5 bucket; the DuckDB oracle runs the same
    expression)."""
    if rates is None:
        rates = mixture_weights(df, strata_col, alpha, budget_frac)
    b = hash_bucket(F.col(id_col), buckets)
    return (
        df.join(F.broadcast(rates.select(strata_col, "rate")), strata_col)
        .filter(b < F.floor(F.col("rate") * buckets).cast("int"))
        .drop("rate")
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Export-integrity manifest: one row per shard with row count, byte
    count, id range, and an ORDER-INSENSITIVE content checksum (sum of
    md5-derived 32-bit row hashes — commutative, so any read order or
    partitioning reproduces it; sums stay < 2^62 up to ~10^9 rows/shard).
    The manifest is what a 100 TB export job publishes next to the data:
    a consumer re-derives it with one aggregation and diffs — any
    dropped, duplicated, or corrupted row moves count or checksum.
    One map-side-combined groupBy on the shard key; nothing else moves.
    """
    from gordo_spark.operators.dedup import md5_long

    row_hash = md5_long(
        F.concat_ws("\x1f", F.col(id_col).cast("string"), F.col(text_col))
    )
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length(text_col)).alias("n_bytes"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
        F.sum(row_hash).alias("checksum"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows (per group):
    Efraimidis & Spirakis 2006 — give each row the key
    ``u^(1/w)`` (equivalently, minimize the exponential draw
    ``-ln(u)/w``) and keep the top ``k``; inclusion probabilities then
    match sequential weighted draws without replacement exactly.

    The uniform draw is DETERMINISTIC: ``u = (md5_long(id) + 1) / 2^32``
    — a pure projection of the row's own id (same engine-portable,
    repartition-stable construction as ``deterministic_split``), so the
    sample reproduces bit-for-bit on any engine with ``md5()`` and
    never needs a seeded RNG whose stream depends on partitioning.

    One top-k-per-group window over the bounded group key (or a global
    TakeOrdered-shaped cut when ungrouped). Rows with non-positive or
    null weights are excluded (E-S requires w > 0). Output: the sampled
    rows + ``sample_key`` (rounded 6dp) + ``sample_rank``.
    """
    u = (md5_long(F.col(id_col).cast("string")) + 1.0) / F.lit(4294967296.0)
    key = -F.log(u) / F.col(weight_col)
    gcols = list(group_by)
    d = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_key", key)
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols).orderBy(
        F.col("_key").asc(), F.col(id_col).asc()
    )
    return (
        d.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= int(k))
        .withColumn("sample_key", qround("_key", 6))
        .drop("_key")
    )


def mixture_budget(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Static token-budget allocation across sources for a training
    mixture (the planning step ahead of :func:`mixture_sample`): given
    target mixture ``weights`` (normalized over the strata present) and
    a total ``budget_tokens``, each stratum is allocated
    ``w_s * budget`` tokens; ``epochs = allocated / available`` says
    how many passes over that source the budget implies (> 1 flags
    oversampling/repetition — the DoReMi/Llama-style data-card
    number), and ``capped_rate`` is the per-document keep rate if
    repetition is NOT allowed (min(1, allocated/available)).

    One map-side-combinable aggregation to strata cardinality; the
    weight table rides as a literal map (caller-fixed plan constants,
    not data). Strata absent from ``weights`` get weight 0 — reported,
    not dropped (the psi_drift sentinel discipline: a source the plan
    forgot must surface, not vanish).
    """
    total_w = sum(weights.values())
    pairs = []
    for k, v in sorted(weights.items()):
        pairs.extend([F.lit(k), F.lit(float(v) / total_w)])
    wmap = F.create_map(*pairs) if pairs else F.create_map()
    counts = df.groupBy(strata_col).agg(
        F.sum(token_col).cast("long").alias("n_tokens")
    )
    w = F.coalesce(
        wmap[F.col(strata_col).cast("string")], F.lit(0.0)
    )
    alloc = w * F.lit(float(budget_tokens))
    return counts.select(
        strata_col,
        "n_tokens",
        qround(w, 6).alias("target_weight"),
        qround(alloc, 1).alias("allocated_tokens"),
        qround(alloc / F.col("n_tokens"), 6).alias("epochs"),
        qround(
            F.least(F.lit(1.0), alloc / F.col("n_tokens")), 6
        ).alias("capped_rate"),
    ).orderBy(strata_col)


def weighted_take(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wtake",
) -> DataFrame:
    """EXACT-N weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-ES scheme (2006): each row draws a
    deterministic uniform ``u`` from ``md5(salt || id)`` and the top-N
    rows by ``ln(u) / w`` win, which is distributionally identical to
    sequential draws with probability proportional to weight. The
    exact-count companion to :func:`weighted_sample` (rate-based,
    with-replacement semantics): "give me exactly 10k docs, quality-
    weighted" is a take, not a rate.

    Deterministic and engine-portable (md5 arithmetic, no RNG — M9);
    reproducible from ids alone, independent splits via ``salt``. Rows
    with NULL or non-positive weight are excluded (a zero-weight item
    has no probability mass; stated). One row-local key computation +
    one global top-N (TakeOrdered — no full sort); ties break by id.
    Output: the winning rows plus their ``_es_key``.
    """
    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # u over the FULL 32-bit hash domain: a mod-1e9 residue is NOT
    # uniform (residues below 2^32 mod 1e9 occur 5 times vs 4 — a ~25%
    # frequency bias that distorts the A-ES inclusion probabilities);
    # (h + 0.5) / 2^32 is exactly uniform over the md5_long range
    u = (h.cast("double") + 0.5) / 4_294_967_296.0
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("_es_key", qround(key, 12))
        .orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
        .limit(int(n))
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic EXACT-k uniform sample per group — "k examples from
    every source/language/shard" (eval-set construction, per-stratum
    spot checks). Each row ranks by ``md5(salt || id)`` WITHIN its group
    (id tiebreak) and the first k win: uniform within group, exactly
    ``min(k, |group|)`` rows out, reproducible from ids alone,
    independent re-draws via ``salt`` (M9 — no RNG).

    The groupwise companion to :func:`stratified_take` (rate-based) and
    :func:`weighted_take` (global weighted N). One group-partitioned
    row_number window — parallelism = number of groups, skew bounded by
    the largest group (salt upstream if one group dominates). Output:
    input columns + ``sample_rank``.
    """
    from pyspark.sql import Window

    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= int(k))
    )


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """NEYMAN optimal stratified allocation (Neyman 1934): to estimate a
    mean from ``total_n`` sampled rows, allocate stratum h
    ``n_h = total_n * N_h * s_h / sum_k N_k * s_k`` — proportional to
    size x standard deviation, the allocation that minimizes the
    estimator's variance (uniform and size-proportional allocation
    waste budget on low-variance strata). The planning step before
    :func:`stratified_take` draws the rows; emitting the design
    alongside the per-stratum stats keeps the sample auditable.

    One map-side-combinable moment aggregation per stratum, one 1-row
    total, |strata| rows out:
    ``(stratum, n_rows, stddev, alloc_frac, n_alloc)`` with n_alloc
    the floor of the real allocation (callers top up the remainder
    deterministically by allocation order).
    """
    st = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(strata_col).alias("stratum")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.stddev_samp(value_col).alias("_s"),
    )
    st = st.withColumn("_w", F.col("n_rows") * F.coalesce("_s", F.lit(0.0)))
    tot = st.agg(F.sum("_w").alias("_tw"))
    return (
        st.crossJoin(tot)
        .select(
            "stratum",
            "n_rows",
            qround(F.col("_s"), 6).alias("stddev"),
            qround(
                F.when(F.col("_tw") > 0, F.col("_w") / F.col("_tw")), 6
            ).alias("alloc_frac"),
            F.floor(
                F.when(
                    F.col("_tw") > 0,
                    F.lit(float(total_n)) * F.col("_w") / F.col("_tw"),
                )
            ).cast("long").alias("n_alloc"),
        )
        .orderBy("stratum")
    )
