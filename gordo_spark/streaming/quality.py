"""Ingest observability: windowed per-source corpus quality metrics.

The dashboard aggregation a streaming corpus-ingest publishes: for each
event-time window and source, document counts, mean heuristic quality,
and the Gopher rule-panel pass rate. A sudden pass-rate drop on one
source is the first sign of a crawler regression or a poisoned feed —
caught at the door instead of after a corpus rebuild.

All signals are row-local column expressions (``text.quality_expr``,
``text.gopher_rule_exprs``) so they run unchanged inside the stream;
the only state is the watermarked tumbling-window aggregate, bounded by
rate x watermark x |sources| — never corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround

from gordo_spark.operators.text import gopher_rule_exprs, quality_expr


def stream_source_quality(
    stream: DataFrame,
    ts_col: str = "ts",
    source_col: str = "source",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
    **gopher_kwargs,
) -> DataFrame:
    """(window, source) -> n_docs, mean_quality, gopher_pass_rate.
    Works identically on a batch frame (the stream==batch contract in
    tests/test_streaming.py)."""
    keep = gopher_rule_exprs(F.col(text_col), **gopher_kwargs)["keep"]
    enriched = stream.select(
        F.col(ts_col),
        F.col(source_col),
        quality_expr(F.col(text_col)).alias("_q"),
        keep.cast("int").alias("_keep"),
    )
    if enriched.isStreaming:
        enriched = enriched.withWatermark(ts_col, watermark)
    return enriched.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(source_col)
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        qround(F.avg("_q"), 6).alias("mean_quality"),
        qround(F.avg("_keep"), 6).alias("gopher_pass_rate"),
    )


def bloom_bits_py(
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bits: int = 1 << 20,
    k_hashes: int = 4,
) -> frozenset:
    """Collect the benchmark's Bloom bit set (hard-bounded at ``bits``
    entries — broadcast-legitimate by construction) for the streaming
    gate. Identical hashing to ``operators/dedup.decontaminate_bloom``."""
    from gordo_spark.operators.dedup import (
        MINHASH_P, _hash_params, exploded_shingles,
    )

    params = _hash_params(k_hashes, seed=777)
    pos = F.array_distinct(
        F.array(
            *[
                (F.lit(a) * F.col("sh") + F.lit(b)) % MINHASH_P % F.lit(bits)
                for a, b in params
            ]
        )
    )
    rows = (
        exploded_shingles(benchmark, id_col, text_col, shingle_n)
        .select(F.explode(pos).alias("bit"))
        .distinct()
        .collect()
    )
    return frozenset(int(r["bit"]) for r in rows)


def stream_bloom_gate(
    stream: DataFrame,
    bench_bits: frozenset,
    text_col: str = "text",
    shingle_n: int = 3,
    bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Decontamination at the door: append (n_grams, n_flagged,
    flagged_frac) to every streamed document — a fully ROW-LOCAL Bloom
    screen (the bit set rides the task closure like any broadcast model),
    so it runs unchanged on a stream or a batch frame and needs NO
    state. Matches ``decontaminate_bloom``'s numbers bit-for-bit
    (same shingles, same md5+LCG family, same all-distinct-positions
    membership rule) — the batch==stream contract in
    tests/test_streaming.py."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    params = _hash_params(k_hashes, seed=777)

    @pandas_udf("struct<n_grams: long, n_flagged: long>")
    def _screen(texts: pd.Series) -> pd.DataFrame:
        n_grams, n_flagged = [], []
        for text in texts:
            if text is None:
                # a null document must not kill the stream; the batch
                # path drops such rows pre-shingle, the gate marks them
                n_grams.append(0)
                n_flagged.append(0)
                continue
            words = text.split(" ")
            k = max(len(words) - shingle_n + 1, 1)
            shingles = [" ".join(words[i : i + shingle_n]) for i in range(k)]
            total = len(shingles)
            flagged = 0
            cache: dict[str, bool] = {}
            for s in shingles:
                hit = cache.get(s)
                if hit is None:
                    h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                    hit = all(
                        (a * h + b) % MINHASH_P % bits in bench_bits
                        for a, b in params
                    )
                    cache[s] = hit
                flagged += hit
            n_grams.append(total)
            n_flagged.append(flagged)
        return pd.DataFrame({"n_grams": n_grams, "n_flagged": n_flagged})

    screened = stream.withColumn("_s", _screen(F.col(text_col)))
    return screened.select(
        *stream.columns,
        F.col("_s.n_grams").alias("n_grams"),
        F.col("_s.n_flagged").alias("n_flagged"),
        qround(
            F.when(
                F.col("_s.n_grams") > 0,
                F.col("_s.n_flagged") / F.col("_s.n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("flagged_frac"),
    )


def stream_ab_counts(
    stream: DataFrame,
    unit_col: str = "user_id",
    success_col: str = "converted",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    salt: str = "exp1",
) -> DataFrame:
    """Live A/B experiment monitor: per event-time window and md5-assigned
    variant, event count, success count, and an approximate distinct-unit
    count — the leading indicator that a rollout is hurting conversions,
    hours before the batch :func:`~gordo_spark.operators.experiments.
    ab_zstat` verdict lands.

    Deliberately ONE stateful aggregation: the per-unit dedup collapse
    the exact z-test needs is the batch job's step (chaining stateful
    aggs multiplies streaming state and restricts output modes); the
    stream reports trend counts plus ``approx_count_distinct`` units
    (HLL — merge-commutative, so stream==batch holds bit-for-bit, pinned
    in tests). Assignment is the same row-local md5 bucket as the batch
    operator — the monitor and the verdict can never disagree on who is
    in which arm. State: windows x 2 variants, watermark-bounded.
    """
    from gordo_spark.operators.experiments import ab_assign

    assigned = ab_assign(
        stream.select(ts_col, unit_col, success_col), unit_col, 2, salt
    )
    if assigned.isStreaming:
        assigned = assigned.withWatermark(ts_col, watermark)
    return (
        assigned.groupBy(
            F.window(F.col(ts_col), window).alias("win"), F.col("variant")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(success_col).cast("int")).alias("n_success"),
            F.approx_count_distinct(unit_col).alias("approx_units"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "variant",
            "n_events",
            "n_success",
            "approx_units",
        )
    )


def psi_reference(
    df: DataFrame,
    tag_col: str = "tag",
    value_col: str = "value",
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Batch-side reference for :func:`stream_psi_monitor`: per tag,
    the bin bounds (min/max -> fixed-width, the psi_drift convention)
    and the reference proportion of each bin, pivoted WIDE (one row
    per tag: ``lo, hi, p0..p{bins-1}``) so the stream can attach it
    with a single broadcast join. Proportions are eps-floored exactly
    like ``tsa.psi_drift``.
    """
    bounds = df.groupBy(tag_col).agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / bins
    binned = df.join(bounds, tag_col).select(
        F.col(tag_col),
        F.when(
            width > 0,
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((F.col(value_col) - F.col("lo")) / width),
                ),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_bin"),
    )
    counts = binned.groupBy(tag_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum((F.col("_bin") == b).cast("long")).alias(f"_c{b}")
            for b in range(bins)
        ],
    )
    props = counts.select(
        tag_col,
        *[
            F.greatest(F.col(f"_c{b}") / F.col("_n"), F.lit(eps)).alias(f"p{b}")
            for b in range(bins)
        ],
    )
    return bounds.join(props, tag_col)


def stream_psi_monitor(
    stream: DataFrame,
    reference: DataFrame,
    tag_col: str = "tag",
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Live PSI drift monitor: per event-time window and tag, the
    Population Stability Index of the window's value distribution
    against a FROZEN batch reference (:func:`psi_reference`) — the
    streaming member of the drift family (psi/ks/chisq watch batch
    halves; this watches the live feed against last quarter's shape,
    raising the alarm within a window of the shift instead of at the
    next batch audit).

    Deliberately ONE stateful aggregation (the stream_ab_counts
    discipline): the tiny wide reference broadcasts onto the stream
    BEFORE aggregation (bin assignment is row-local against the
    attached lo/hi), the windowed agg folds the ``bins`` conditional
    counts + total in one pass, and the PSI sum over bins is a
    row-local expression over the aggregated row — no second stateful
    step, no post-agg stream join. State: windows x tags x (bins+1)
    longs, watermark-bounded. Output: ``(window_start, tag, n, psi)``;
    identical on a batch frame (stream==batch pinned in tests).
    """
    width = (F.col("hi") - F.col("lo")) / bins
    binned = stream.join(F.broadcast(reference), tag_col).select(
        F.col(ts_col),
        F.col(tag_col),
        *[F.col(f"p{b}") for b in range(bins)],
        F.when(
            width > 0,
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((F.col(value_col) - F.col("lo")) / width),
                ),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_bin"),
    )
    if binned.isStreaming:
        binned = binned.withWatermark(ts_col, watermark)
    agg = binned.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(tag_col)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("_bin") == b).cast("long")).alias(f"_c{b}")
            for b in range(bins)
        ],
        *[F.first(f"p{b}").alias(f"_p{b}") for b in range(bins)],
    )
    term = None
    for b in range(bins):
        q = F.greatest(F.col(f"_c{b}") / F.col("n"), F.lit(eps))
        p = F.col(f"_p{b}")
        t = (q - p) * F.log(q / p)
        term = t if term is None else term + t
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col(tag_col),
        "n",
        qround(term, 6).alias("psi"),
    )


def stream_w1_monitor(
    stream: DataFrame,
    reference: DataFrame,
    tag_col: str = "tag",
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Live Wasserstein-1 drift screen: per event-time window and tag,
    the BINNED W1 distance between the window's value distribution and
    the frozen :func:`psi_reference` — the magnitude-with-units sibling
    of :func:`stream_psi_monitor` (PSI is scale-free; W1 says "the
    distribution moved ~3 degrees"). Binned form: with both
    distributions histogrammed on the reference's fixed-width bins,
    ``W1 = sum_b |CDF_q(b) - CDF_p(b)| * bin_width`` — a row-local
    fold over the aggregated bin counts, so the state stays the PSI
    monitor's windows x tags x (bins+1) longs (batch ``tsa.
    wasserstein_drift`` is the exact sample form; the binned form is
    the standard streaming discretization, resolution = bin width).

    Same ONE-stateful-aggregation shape as the PSI monitor; reference
    proportions reuse the PSI reference verbatim (eps-floored — a
    screen ranks, the permutation readout infers). Output:
    ``(window_start, tag, n, w1)``; identical on a batch frame.
    """
    width = (F.col("hi") - F.col("lo")) / bins
    binned = stream.join(F.broadcast(reference), tag_col).select(
        F.col(ts_col),
        F.col(tag_col),
        F.col("lo"),
        F.col("hi"),
        *[F.col(f"p{b}") for b in range(bins)],
        F.when(
            width > 0,
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((F.col(value_col) - F.col("lo")) / width),
                ),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_bin"),
    )
    if binned.isStreaming:
        binned = binned.withWatermark(ts_col, watermark)
    agg = binned.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(tag_col)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("lo").alias("_lo"),
        F.first("hi").alias("_hi"),
        *[
            F.sum((F.col("_bin") == b).cast("long")).alias(f"_c{b}")
            for b in range(bins)
        ],
        *[F.first(f"p{b}").alias(f"_p{b}") for b in range(bins)],
    )
    bw = (F.col("_hi") - F.col("_lo")) / bins
    cq = F.lit(0.0)
    cp = F.lit(0.0)
    term = None
    # the last bin's |CDF gap| is ~0 by construction; summing b < bins-1
    # keeps the fold exact for true CDFs and harmless under eps-flooring
    for b in range(bins - 1):
        cq = cq + F.col(f"_c{b}") / F.col("n")
        cp = cp + F.col(f"_p{b}")
        t = F.abs(cq - cp) * bw
        term = t if term is None else term + t
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col(tag_col),
        "n",
        qround(term, 6).alias("w1"),
    )


def stream_perm_drift_monitor(
    stream: DataFrame,
    tag_col: str = "tag",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    n_perm: int = 39,
    salt: str = "sperm",
) -> DataFrame:
    """Streaming twin of ``tsa.perm_test_drift``: per event-time window
    and tag, a Monte-Carlo permutation p-value for the mean difference
    between the window's two HALVES — the distribution-free readout
    behind the PSI/W1 screens, live (the screens rank windows; this
    says which half-window shifts are statistically real BEFORE
    ``bh_fdr`` gates the fleet sweep on the collected rows).

    Streaming adaptation, both row-local so the whole test stays ONE
    watermarked stateful aggregation (no pre-pass, no stream-stream
    join):

    - the ref/cur split is the WINDOW MIDPOINT (tumbling windows have
      a known start: ``floor(epoch/w)*w``), where the batch op splits
      at the observed time-range midpoint;
    - relabelings are md5-Bernoulli(1/2) lanes keyed on the row id
      (valid under H0 exchangeability; the batch op conditions the
      Bernoulli rate on the observed split — that rate needs a
      pre-pass, so the streaming variant fixes p=1/2 and STATES it).

    Exactness discipline matches the batch op: 1e-6-quantized decimal
    sums, exceedance only from replicates with both arms non-empty,
    add-one p, NULL p/delta for a window entirely in one half (the
    degenerate-tag convention). State: windows x tags x (2*n_perm+4)
    numeric columns. Output: ``(window_start, tag, delta_obs, p_value,
    n_ref, n_cur)``; identical on a batch frame.
    """
    from gordo_spark.functions.rounding import qfloor
    from gordo_spark.functions.timeutil import (
        duration_to_seconds,
        epoch_seconds,
    )

    b_count = int(n_perm)
    n_groups = (b_count + 7) // 8
    secs = int(duration_to_seconds(window))
    ep = epoch_seconds(F.col(ts_col))
    in_cur = (ep - F.floor(ep / secs) * secs) >= (secs / 2.0)
    rows = stream.filter(F.col(value_col).isNotNull()).select(
        F.col(ts_col),
        F.col(tag_col),
        qfloor(F.col(value_col), 6).cast("decimal(38,0)").alias("_iv"),
        in_cur.alias("_cur"),
        *[
            F.md5(
                F.concat(
                    F.lit(f"{salt}g{g}:"), F.col(id_col).cast("string")
                )
            ).alias(f"_h{g}")
            for g in range(n_groups)
        ],
    )
    lanes = [
        f"(CAST(conv(substring(_h{b // 8}, {(b % 8) * 4 + 1}, 4), 16, 10)"
        f" AS BIGINT) < 32768) AS _i{b}"
        for b in range(b_count)
    ]
    rows = rows.selectExpr(ts_col, tag_col, "_iv", "_cur", *lanes)
    if rows.isStreaming:
        rows = rows.withWatermark(ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum("_iv").cast("double").alias("_s"),
        F.sum(F.when(F.col("_cur"), F.col("_iv"))).cast("double").alias("_sc"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("_nc"),
    ]
    for b in range(b_count):
        ib = F.col(f"_i{b}")
        aggs.append(
            F.sum(F.when(ib, F.col("_iv"))).cast("double").alias(f"_sb{b}")
        )
        aggs.append(F.sum(F.when(ib, 1).otherwise(0)).alias(f"_kb{b}"))
    one = rows.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(tag_col)
    ).agg(*aggs)
    d_obs = F.col("_sc") / F.col("_nc") - (
        (F.col("_s") - F.col("_sc")) / (F.col("_n") - F.col("_nc"))
    )
    exceed = None
    for b in range(b_count):
        db = F.col(f"_sb{b}") / F.col(f"_kb{b}") - (
            (F.col("_s") - F.col(f"_sb{b}"))
            / (F.col("_n") - F.col(f"_kb{b}"))
        )
        e = F.when(
            (F.col(f"_kb{b}") > 0)
            & (F.col(f"_kb{b}") < F.col("_n"))
            & (F.abs(db) >= F.abs(d_obs)),
            1,
        ).otherwise(0)
        exceed = e if exceed is None else exceed + e
    degenerate = (F.col("_nc") == 0) | (F.col("_nc") == F.col("_n"))
    return one.select(
        F.col("win.start").alias("window_start"),
        F.col(tag_col),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(qround(d_obs / F.lit(1e6), 6))
        .alias("delta_obs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            (F.lit(1) + exceed).cast("double") / F.lit(float(b_count + 1))
        )
        .alias("p_value"),
        (F.col("_n") - F.col("_nc")).alias("n_ref"),
        F.col("_nc").alias("n_cur"),
    )


def stream_sampled_ingest(
    stream: DataFrame,
    id_col: str,
    rate: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic rate-limited stream ingest: keep a row iff its
    md5 hash bucket falls under ``rate`` — the throttle for firehose
    sources where only a fixed fraction should reach the lake. Because
    the decision is a PURE FUNCTION of the row's id (the
    sampling.hash_bucket batch primitive applied unchanged to a
    streaming frame), it is (a) stateless — no dedup store, no
    watermark, nothing to checkpoint beyond the source offsets; (b)
    replay-stable — a reprocessed micro-batch keeps exactly the same
    rows, so at-least-once delivery upstream cannot double-sample; and
    (c) batch-consistent — the stream's kept set IS the batch
    ``stratified_sample`` of the same data (stream == batch pinned in
    tests). Appends ``sample_bucket`` for downstream audit."""
    from gordo_spark.operators.sampling import hash_bucket

    b = hash_bucket(F.col(id_col), buckets)
    return stream.withColumn("sample_bucket", b).filter(
        F.col("sample_bucket") < int(round(float(rate) * buckets))
    )
