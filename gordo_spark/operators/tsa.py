"""Time-series analytics over long ``(tag, ts, value)`` frames.

The reference's time-series pipeline stops at smoothing and anomaly
scoring (``gordo/machine/model/transformer_funcs/general.py``,
``gordo/machine/model/anomaly/diff.py``); the fleet diagnostics here —
autocorrelation, single change-point scan, seasonal profiling, and
population-stability drift — are the natural next queries an operator
runs on the same resampled frames, so they are first-class operators.

Scale posture: everything is window/aggregate algebra — no Python rows,
no driver-side collects. Per-tag ordered windows follow the same
bounded-series-key posture as the ``w*`` smoothing family (one sensor's
regularized history fits a partition; tags are the parallelism unit);
all other shuffles key on ``(tag)`` or ``(tag, bucket)`` which are
bounded, and the only broadcasts are 1-row scalar aggregates.
"""

from __future__ import annotations

import math

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from gordo_spark.functions.rounding import qfloor, qround

__all__ = [
    "acf",
    "adf_screen",
    "counter_rate",
    "cross_correlation",
    "grid_gaps",
    "ks_drift",
    "mean_shift_changepoint",
    "psi_drift",
    "rolling_corr",
    "chisq_drift",
    "seasonal_envelope",
    "seasonal_profile",
    "tag_mutual_info",
    "theil_sen",
    "time_weighted_avg",
    "trend",
]


def acf(
    df: DataFrame,
    lags: Sequence[int],
    resolution_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sample autocorrelation per tag at each requested lag.

    Pairwise-complete Pearson variant: ``corr(x_t, x_{t - k*res})``
    over the rows where both sides exist (the estimator DB engines
    agree on bit-for-bit, unlike the classical biased ACF which
    divides by the lag-0 variance). Output: ``(tag, lag, acf)``.

    Lag ``k`` is TIME-keyed, not row-positional: each lag column is a
    RANGE window frame pinned at exactly ``k * resolution_seconds``
    before the current row, so on a gappy grid a missing bucket yields
    a null partner (excluded by ``corr``) instead of silently pairing
    with whatever row happens to sit k positions back — the same
    time-keyed convention as :func:`cross_correlation`.

    One ordered window pass materializes ALL lag columns (the K RANGE
    frames share a single per-tag sort), one aggregation computes all
    K correlations map-side, and a ``stack()`` unpivots — so the cost
    is a single per-tag sort plus one exchange on the bounded tag key
    regardless of K.

    Precondition: one row per (tag, ts) — a resampled grid. Duplicate
    timestamps would make the pinned RANGE frame hold >1 row and
    ``last`` pick an unspecified one.
    """
    if not lags or any(k <= 0 for k in lags):
        raise ValueError("lags must be positive ints")
    res = int(resolution_seconds)
    out = df.withColumn("_t", F.col(ts_col).cast("timestamp").cast("long"))
    for k in lags:
        w = (
            Window.partitionBy(tag_col)
            .orderBy("_t")
            .rangeBetween(-k * res, -k * res)
        )
        out = out.withColumn(f"_lag{k}", F.last(value_col).over(w))
    aggs = [
        qround(F.corr(value_col, f"_lag{k}"), 6).alias(f"acf{k}") for k in lags
    ]
    wide = out.groupBy(tag_col).agg(*aggs)
    pairs = ", ".join(f"{k}, acf{k}" for k in lags)
    return wide.select(
        tag_col, F.expr(f"stack({len(lags)}, {pairs}) AS (lag, acf)")
    )


def mean_shift_changepoint(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    min_seg: int = 2,
) -> DataFrame:
    """Single best mean-shift split per tag (the first step of binary
    segmentation; CUSUM-style scan statistic).

    At each ordered position ``i`` of a tag's n-point series the split
    score is ``sqrt(i*(n-i)/n) * |mean(left) - mean(right)|`` — the
    two-sample z numerator, so a level shift anywhere in the series
    maximizes it at the true break. Returns one row per tag:
    ``(tag, split_ts, shift_score, mean_before, mean_after)`` where
    ``split_ts`` is the LAST point of the left segment (earliest ts on
    tied scores).

    Prefix sums via one cumulative window give every candidate split's
    two means without re-scanning (O(n) per tag, not O(n^2)); the
    argmax is one ``max(struct)`` aggregation — no join back, no
    second sort. Null values are dropped at entry so the positional
    index ``_i`` and the null-skipping ``count/sum`` aggregates stay
    consistent on raw (un-resampled) frames.
    """
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    wall = Window.partitionBy(tag_col)
    i = F.row_number().over(w)
    d = (
        df.withColumn("_i", i)
        .withColumn(
            "_cs", F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("_n", F.count(value_col).over(wall))
        .withColumn("_tot", F.sum(value_col).over(wall))
    )
    ci, cn = F.col("_i"), F.col("_n")
    m_left = F.col("_cs") / ci
    m_right = (F.col("_tot") - F.col("_cs")) / (cn - ci)
    score = F.sqrt(ci * (cn - ci) / cn) * F.abs(m_left - m_right)
    scored = d.filter((ci >= min_seg) & (ci <= cn - min_seg)).select(
        tag_col,
        F.col(ts_col).alias("_ts"),
        qround(score, 6).alias("_score"),
        qround(m_left, 6).alias("_ml"),
        qround(m_right, 6).alias("_mr"),
    )
    # max(struct) picks highest score, then EARLIEST ts (negated epoch).
    best = scored.groupBy(tag_col).agg(
        F.max(
            F.struct(
                F.col("_score").alias("s"),
                (-F.col("_ts").cast("timestamp").cast("long")).alias("negts"),
                F.col("_ml").alias("ml"),
                F.col("_mr").alias("mr"),
            )
        ).alias("b")
    )
    return best.select(
        tag_col,
        F.timestamp_seconds(-F.col("b.negts")).alias("split_ts"),
        F.col("b.s").alias("shift_score"),
        F.col("b.ml").alias("mean_before"),
        F.col("b.mr").alias("mean_after"),
    )


def seasonal_profile(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonal profile per tag.

    Output ``(tag, hod, n, hod_mean, seasonal_z)`` where ``seasonal_z``
    standardizes the bucket mean against the tag's overall mean/std —
    the quick "is this sensor diurnal?" readout an operator checks
    before trusting a fixed anomaly threshold.

    Two partial-aggregated groupBys on bounded keys (``(tag, hod)`` and
    ``(tag)``) plus one join on the bounded tag key; AQE broadcasts the
    per-tag stats side on its own.
    """
    # bucket means as exact scaled-integer sums (the mean_exact
    # discipline): a float avg over hundreds of grid cells flips the
    # 6dp boundary under engine summation order — observed at sf0.1
    iv = qfloor(F.col(value_col), 6).cast("decimal(38,0)")
    prof = df.groupBy(F.col(tag_col), F.hour(ts_col).alias("hod")).agg(
        F.count("*").alias("n"),
        (
            F.sum(iv).cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6))
        ).alias("_hm"),
    )
    overall = df.groupBy(tag_col).agg(
        (
            F.sum(iv).cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6))
        ).alias("_tm"),
        F.stddev_samp(value_col).alias("_tsd"),
    )
    return prof.join(overall, tag_col).select(
        tag_col,
        "hod",
        "n",
        qround("_hm", 6).alias("hod_mean"),
        qround(
            F.when(F.col("_tsd") > 0, (F.col("_hm") - F.col("_tm")) / F.col("_tsd")),
            6,
        ).alias("seasonal_z"),
    )


def psi_drift(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per tag between the first and second
    half of the observed time range.

    The reference half is ``ts < midpoint(min_ts, max_ts)``; its
    per-tag min/max define ``bins`` fixed-width buckets (current-half
    values outside the reference range clamp into the edge buckets —
    exactly the drift signal PSI exists to catch). Per-bucket
    proportions are floored at ``eps`` before the log ratio, the
    standard PSI convention for empty buckets (so the proportions can
    sum to slightly more than 1; documented, deterministic).
    A tag with NO reference-half rows (it appears only in the current
    half — the most extreme drift possible) is kept via a left join:
    all its rows collapse into bucket 0, its reference proportion
    floors to ``eps``, and it emits ``n_ref = 0`` with the maximal
    single-bucket PSI ``(1 - eps) * ln(1/eps)`` (~13.8 at the default
    eps) — an explicit max-drift sentinel rather than a silently
    missing row.
    Output: ``(tag, psi, n_ref, n_cur)``. Rule of thumb: psi < 0.1
    stable, 0.1-0.25 moderate drift, > 0.25 action.

    Plan: one 1-row scalar aggregate (broadcast — genuinely bounded),
    one per-tag min/max aggregate joined back on the bounded tag key,
    then a single ``(tag, bin)`` count and a per-tag sum. No ordered
    windows at all, so this scales as pure hash aggregation.
    """
    span = df.agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    ).select(
        (
            (
                F.col("_t0").cast("timestamp").cast("long")
                + F.col("_t1").cast("timestamp").cast("long")
            )
            / 2
        ).alias("_mid")
    )
    d = df.crossJoin(F.broadcast(span)).withColumn(
        "_is_ref", F.col(ts_col).cast("timestamp").cast("long") < F.col("_mid")
    )
    ref = (
        d.filter("_is_ref")
        .groupBy(tag_col)
        .agg(F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"))
    )
    width = (F.col("_hi") - F.col("_lo")) / bins
    binned = d.join(ref, tag_col, "left").withColumn(
        "_bin",
        F.when(width > 0,
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((F.col(value_col) - F.col("_lo")) / width),
                ),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    cnt = binned.groupBy(tag_col, "_bin").agg(
        F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).alias("_nr"),
        F.sum(F.when(~F.col("_is_ref"), 1).otherwise(0)).alias("_nc"),
    )
    # Per-tag totals ride the bins-sized aggregate via a window instead of
    # a groupBy+join-back — a join would re-derive cnt's whole lineage a
    # second time (the scan-multiplication trap), a window on the already-
    # aggregated frame costs one tiny sort.
    wtag = Window.partitionBy(tag_col)
    cnt = cnt.withColumn("_totr", F.sum("_nr").over(wtag)).withColumn(
        "_totc", F.sum("_nc").over(wtag)
    )
    # 0/0 (a half with no rows at all for the tag) is pinned to 0 before
    # the eps floor so engines that differ on div-by-zero agree.
    p = F.greatest(
        F.when(F.col("_totr") > 0, F.col("_nr") / F.col("_totr")).otherwise(0.0),
        F.lit(eps),
    )
    q = F.greatest(
        F.when(F.col("_totc") > 0, F.col("_nc") / F.col("_totc")).otherwise(0.0),
        F.lit(eps),
    )
    term = cnt.select(
        tag_col,
        F.col("_totr").alias("n_ref"),
        F.col("_totc").alias("n_cur"),
        ((q - p) * F.log(q / p)).alias("_term"),
    )
    return term.groupBy(tag_col, "n_ref", "n_cur").agg(
        qround(F.sum("_term"), 6).alias("psi")
    ).select(tag_col, "psi", "n_ref", "n_cur")


def _half_split(df: DataFrame, ts_col: str) -> DataFrame:
    """Attach ``_is_ref`` = first-half-of-time-range flag (the psi_drift
    midpoint convention, shared by every two-window drift screen)."""
    span = df.agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    ).select(
        (
            (
                F.col("_t0").cast("timestamp").cast("long")
                + F.col("_t1").cast("timestamp").cast("long")
            )
            / 2
        ).alias("_mid")
    )
    return df.crossJoin(F.broadcast(span)).withColumn(
        "_is_ref",
        F.col(ts_col).cast("timestamp").cast("long") < F.col("_mid"),
    )


def wasserstein_drift(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """EXACT 1-D Wasserstein-1 (earth-mover) distance per tag between
    the first and second half of the time range — the drift statistic
    with UNITS (average value-movement needed to turn one distribution
    into the other), where PSI/KS are unitless screens: W1 answers "by
    how much did the sensor move", robust to binning (no bin knob at
    all) and sensitive to shifts KS underweights in the tails.

    W1 = integral |F_ref(x) - F_cur(x)| dx, computed exactly on the
    merged support: values quantize to the 1e-6 grid (so both engines
    group identical keys), one (tag, value) count aggregate, one
    per-tag cumulative window gives both CDFs at every support point,
    and the trapezoid-free step integral sums |dF| * (next_v - v).
    Exactness: counts and cumsums are integers; each step term is one
    deterministic double product quantized to 1e-12 and summed as exact
    decimals (the mean_exact discipline) — bit-identical on any engine
    or partitioning. A tag with an empty half reports the full mass
    distance to the other half's CDF (the 0-CDF convention below).

    Plan: one hash aggregate on (tag, grid-value) then ONE per-tag
    ordered window over the bounded support — scales as the distinct-
    value count per tag, not the row count. Output:
    ``(tag, w1, n_ref, n_cur)`` with w1 at 6dp.
    """
    d = _half_split(df, ts_col).filter(F.col(value_col).isNotNull())
    gv = qround(F.col(value_col), 6)
    cnt = d.groupBy(tag_col, gv.alias("_v")).agg(
        F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).alias("_nr"),
        F.sum(F.when(~F.col("_is_ref"), 1).otherwise(0)).alias("_nc"),
    )
    wtag = Window.partitionBy(tag_col)
    worder = wtag.orderBy("_v")
    cum = (
        cnt.withColumn("_totr", F.sum("_nr").over(wtag))
        .withColumn("_totc", F.sum("_nc").over(wtag))
        .withColumn("_cr", F.sum("_nr").over(worder))
        .withColumn("_cc", F.sum("_nc").over(worder))
        .withColumn("_nv", F.lead("_v").over(worder))
    )
    fr = F.when(F.col("_totr") > 0, F.col("_cr") / F.col("_totr")).otherwise(
        F.lit(0.0)
    )
    fc = F.when(F.col("_totc") > 0, F.col("_cc") / F.col("_totc")).otherwise(
        F.lit(0.0)
    )
    term = F.when(
        F.col("_nv").isNotNull(),
        F.abs(fr - fc) * (F.col("_nv") - F.col("_v")),
    ).otherwise(F.lit(0.0))
    return (
        cum.select(
            tag_col,
            F.col("_totr").alias("n_ref"),
            F.col("_totc").alias("n_cur"),
            qfloor(term, 12).cast("decimal(38,0)").alias("_ti"),
        )
        .groupBy(tag_col, "n_ref", "n_cur")
        .agg(
            (
                qround(F.sum("_ti").cast("double") / F.lit(1e12), 6)
            ).alias("w1")
        )
        .select(tag_col, "w1", "n_ref", "n_cur")
        .orderBy(tag_col)
    )


def perm_test_drift(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    n_perm: int = 39,
    salt: str = "perm",
) -> DataFrame:
    """Monte-Carlo permutation p-value per tag for the half-mean
    difference — DISTRIBUTION-FREE inference on the drift the W1/PSI
    screens only rank: under exchangeability, relabeling rows between
    the halves should produce mean-differences at least as large as the
    observed one about p of the time. Labels are unconditional
    md5-Bernoulli(n_cur/n) relabelings (the random-split Monte-Carlo
    variant of the permutation test — group sizes vary binomially
    around the observed split; stated), so every replicate is a PURE
    FUNCTION of the row id: no RNG, bit-reproducible anywhere, and the
    whole test is ONE aggregation pass of 2*n_perm+4 sums per tag (the
    bootstrap_ci_mean shape — n_perm 16-bit md5 lanes, weights
    materialized once per row in the projection).

    Exactness: values quantize to 1e-6-scaled exact-decimal sums before
    any mean (the mean_exact discipline); each replicate's
    mean-difference and the observed one are then deterministic doubles
    and the p-value is the exact rational
    ``(1 + #{|d_b| >= |d_obs|}) / (n_perm + 1)`` (add-one: Phipson &
    Smyth 2010). Replicates that land all rows in one arm contribute no
    exceedance (stated; probability ~2^-n per tag). Degenerate OBSERVED
    statistic: a tag whose rows all fall in one half of the time range
    (e.g. a sensor commissioned mid-range) has no mean-difference to
    test — ``delta_obs`` and ``p_value`` are both NULL rather than the
    add-one minimum (which would be a guaranteed false rejection once
    fed into :func:`bh_fdr`). Output:
    ``(tag, delta_obs, p_value, n_ref, n_cur)``.
    """
    b_count = int(n_perm)
    n_groups = (b_count + 7) // 8
    d = _half_split(df, ts_col).filter(F.col(value_col).isNotNull())
    sizes = (
        d.groupBy(tag_col)
        .agg(
            F.sum(F.when(F.col("_is_ref"), 0).otherwise(1)).alias("_ncur"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            tag_col, (F.col("_ncur") / F.col("_n")).alias("_pcur")
        )
    )
    # Per-(partition, tag) exact partial sums via one vectorized numpy
    # pass (the bootstrap_ci_mean r11 restructure, per-tag variant): the
    # previous form materialized n_perm lane-indicator columns plus an
    # 82-field decimal hash aggregate and a 39-branch exceedance Column
    # tree — seconds of plan build + interpreted decimal eval. Here each
    # Arrow batch computes the SAME md5-lane uniforms (hashlib md5 ==
    # Spark md5; big-endian 16-bit digest lanes == the 4-hex substrings;
    # (lane + 0.5)/65536 and the < _pcur compare are the identical IEEE
    # ops) and folds exact int64 quantized values into per-tag Python-int
    # partials (arbitrary precision — the mean_exact discipline), emitted
    # as decimal(38,0) so the cross-partition combine stays exact at any
    # scale. The statistic tail then casts each exact sum to double
    # FIRST and applies the same double-op sequence as before, so every
    # d_obs / d_b / p_value is bit-identical.
    base = d.join(F.broadcast(sizes), tag_col).select(
        F.col(tag_col).alias("_tag"),
        qfloor(F.col(value_col), 6).alias("_iv"),
        F.col("_is_ref").alias("_ref"),
        F.col("_pcur"),
        F.col(id_col).cast("string").alias("_id"),
    )
    tag_type = d.schema[tag_col].dataType.simpleString()
    prefixes = [f"{salt}g{g}:".encode() for g in range(n_groups)]

    def _partials(batches):
        from decimal import Decimal
        from hashlib import md5

        acc: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for tag, grp in pdf.groupby("_tag", sort=False):
                m = len(grp)
                ids = [v.encode() for v in grp["_id"]]
                iv = grp["_iv"].to_numpy(dtype=np.float64).astype(np.int64)
                ref = grp["_ref"].to_numpy(dtype=bool)
                pcur = grp["_pcur"].to_numpy(dtype=np.float64)
                U = np.empty((m, 8 * n_groups))
                for g, pre in enumerate(prefixes):
                    dig = b"".join(md5(pre + i).digest() for i in ids)
                    lanes = np.frombuffer(dig, dtype=">u2").reshape(m, 8)
                    U[:, 8 * g : 8 * g + 8] = (
                        lanes.astype(np.float64) + 0.5
                    ) / 65536.0
                W = U[:, :b_count] < pcur[:, None]
                a = acc.setdefault(
                    tag, [0, 0, 0, 0, [0] * b_count, [0] * b_count]
                )
                a[0] += m
                a[1] += int(iv.sum())
                cur = ~ref
                a[2] += int(iv[cur].sum())
                a[3] += int(cur.sum())
                sb = (W * iv[:, None]).sum(axis=0)
                kb = W.sum(axis=0)
                a[4] = [p + int(q) for p, q in zip(a[4], sb)]
                a[5] = [p + int(q) for p, q in zip(a[5], kb)]
        if acc:
            yield pd.DataFrame(
                {
                    "_tag": list(acc),
                    "_pn": [a[0] for a in acc.values()],
                    "_ps": [Decimal(a[1]) for a in acc.values()],
                    "_psc": [Decimal(a[2]) for a in acc.values()],
                    "_pnc": [a[3] for a in acc.values()],
                    "_psb": [
                        [Decimal(v) for v in a[4]] for a in acc.values()
                    ],
                    "_pkb": [a[5] for a in acc.values()],
                }
            )

    parts = base.mapInPandas(
        _partials,
        schema=(
            f"_tag {tag_type}, _pn long, _ps decimal(38,0), "
            "_psc decimal(38,0), _pnc long, "
            "_psb array<decimal(38,0)>, _pkb array<long>"
        ),
    )
    dec_zeros = F.array_repeat(F.lit(0).cast("decimal(38,0)"), b_count)
    long_zeros = F.array_repeat(F.lit(0).cast("long"), b_count)

    def _vsum(c: str, zeros) -> Column:
        return F.aggregate(
            F.collect_list(c),
            zeros,
            lambda acc, v: F.zip_with(acc, v, lambda p, q: p + q),
        )

    one = parts.groupBy("_tag").agg(
        F.sum("_pn").alias("_n"),
        F.sum("_ps").cast("double").alias("_s"),
        F.sum("_psc").cast("double").alias("_sc"),
        F.sum("_pnc").alias("_nc"),
        _vsum("_psb", dec_zeros).alias("_sbv"),
        _vsum("_pkb", long_zeros).alias("_kbv"),
    )
    d_obs = F.col("_sc") / F.col("_nc") - (
        (F.col("_s") - F.col("_sc")) / (F.col("_n") - F.col("_nc"))
    )
    # exceedance count over the replicate arrays — the same per-replicate
    # double arithmetic as the previous unrolled Column tree (each exact
    # decimal sum casts to double, then identical op order)
    sbd = F.transform(F.col("_sbv"), lambda v: v.cast("double"))
    n_exceed = F.aggregate(
        F.zip_with(
            sbd,
            F.col("_kbv"),
            lambda s, k: F.when(
                (k > 0)
                & (k < F.col("_n"))
                & (
                    F.abs(
                        s / k - ((F.col("_s") - s) / (F.col("_n") - k))
                    )
                    >= F.abs(d_obs)
                ),
                1,
            ).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    degenerate = (F.col("_nc") == 0) | (F.col("_nc") == F.col("_n"))
    return one.select(
        F.col("_tag").alias(tag_col),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(qround(d_obs / F.lit(1e6), 6))
        .alias("delta_obs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            (F.lit(1) + n_exceed).cast("double")
            / F.lit(float(b_count + 1))
        )
        .alias("p_value"),
        (F.col("_n") - F.col("_nc")).alias("n_ref"),
        F.col("_nc").alias("n_cur"),
    ).orderBy(tag_col)


def bh_fdr(
    pvals: DataFrame,
    key_col: str = "tag",
    p_col: str = "p_value",
    q: float = 0.10,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a family of
    p-values — the multiple-testing gate a fleet-wide drift sweep needs
    (at 1,000 machines x dozens of tags, alpha=0.05 per test fires ~50
    false alarms per sweep; BH bounds the EXPECTED FALSE-DISCOVERY
    RATE at q, and is less conservative than the Holm FWER bound
    already shipped for A/B families). Step-up rule: sort p ascending,
    reject hypotheses 1..k where k = max{i : p_i <= q*i/m}, ties by
    key for a total order. Pure rank arithmetic over the (bounded)
    hypothesis family — one window sort, no approximation, exact on
    any engine. Output: ``(key, p_value, rank, bh_threshold,
    rejected)`` ordered by rank.
    """
    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    m = F.count(F.lit(1)).over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = pvals.select(
        F.col(key_col),
        F.col(p_col),
        F.row_number().over(w).alias("rank"),
        (F.lit(float(q)) * F.row_number().over(w) / m).alias(
            "bh_threshold"
        ),
    )
    passing = F.when(
        F.col(p_col) <= F.col("bh_threshold"), F.col("rank")
    ).otherwise(F.lit(0))
    k = F.max(passing).over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return ranked.select(
        key_col,
        p_col,
        "rank",
        qround("bh_threshold", 6).alias("bh_threshold"),
        (F.col("rank") <= k).alias("rejected"),
    ).orderBy("rank")


def ks_drift(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_c: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift screen per tag between the
    first and second half of the observed time range (same split
    convention as :func:`psi_drift`): ``KS = max_x |ECDF_ref(x) -
    ECDF_cur(x)|`` — the binning-free drift statistic that catches
    shape changes PSI's 10 fixed buckets smear out. ``drift`` applies
    the large-sample rejection bound ``c(alpha) * sqrt((n1+n2)/n1/n2)``
    with ``c = 1.358`` (alpha = 0.05).

    Plan: one ``(tag, value)`` count aggregation (map-side combinable —
    ties collapse BEFORE any sort), then the ECDF gap via cumulative
    sums over a per-tag ordered window on the DISTINCT values. The
    window sorts per-tag distinct-value cardinality, not raw rows —
    the exact-KS cost. At 100 TB, either quantize values first (the
    aggregation then bounds the sort) or accept the binned PSI screen;
    exact KS on unbounded-cardinality doubles is inherently a sort.
    Tags with an empty half emit ``ks = null, drift = null`` rather
    than vanishing (the psi_drift sentinel lesson). Output:
    ``(tag, ks, n_ref, n_cur, drift)``.
    """
    span = df.agg(F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")).select(
        (
            (
                F.col("_t0").cast("timestamp").cast("long")
                + F.col("_t1").cast("timestamp").cast("long")
            )
            / 2
        ).alias("_mid")
    )
    d = df.crossJoin(F.broadcast(span)).withColumn(
        "_is_ref", F.col(ts_col).cast("timestamp").cast("long") < F.col("_mid")
    )
    cnt = (
        d.filter(F.col(value_col).isNotNull())
        .groupBy(tag_col, F.col(value_col).alias("_v"))
        .agg(
            F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).alias("_nr"),
            F.sum(F.when(~F.col("_is_ref"), 1).otherwise(0)).alias("_nc"),
        )
    )
    wtag = Window.partitionBy(tag_col)
    wcum = (
        Window.partitionBy(tag_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cnt = (
        cnt.withColumn("_totr", F.sum("_nr").over(wtag))
        .withColumn("_totc", F.sum("_nc").over(wtag))
        .withColumn("_cumr", F.sum("_nr").over(wcum))
        .withColumn("_cumc", F.sum("_nc").over(wcum))
    )
    gap = F.abs(
        F.col("_cumr") / F.col("_totr") - F.col("_cumc") / F.col("_totc")
    )
    out = cnt.groupBy(
        tag_col,
        F.col("_totr").alias("n_ref"),
        F.col("_totc").alias("n_cur"),
    ).agg(
        qround(
            F.max(F.when((F.col("_totr") > 0) & (F.col("_totc") > 0), gap)), 6
        ).alias("ks")
    )
    bound = F.lit(float(alpha_c)) * F.sqrt(
        (F.col("n_ref") + F.col("n_cur"))
        / (F.col("n_ref").cast("double") * F.col("n_cur"))
    )
    return out.select(
        tag_col,
        "ks",
        "n_ref",
        "n_cur",
        F.when(F.col("ks").isNotNull(), F.col("ks") > bound).alias("drift"),
    )


def tag_mutual_info(
    df: DataFrame,
    tag_a: str,
    tag_b: str,
    bins: int = 8,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Mutual information between two tags' aligned series over
    ``bins`` equal-width bins each: ``MI = sum p(x,y) ln(p(x,y) /
    (p(x) p(y)))`` in nats — the nonlinear-coupling readout that
    catches dependencies Pearson correlation (:func:`rolling_corr`,
    ``tag_correlations``) misses entirely (a quadratic or hysteresis
    relation can have corr ~ 0 and high MI).

    Binning is FIXED-WIDTH from each tag's own min/max (the psi_drift
    convention) — deterministic on any engine, unlike ntile whose
    tie-ordering is engine-dependent. Alignment is the conditional-agg
    pivot onto the shared grid (one bounded groupBy); bounds are a
    1-row broadcast; the joint histogram is one ``(bin_a, bin_b)``
    count (<= bins² rows) and the marginals ride it as window sums
    over that bounded frame rather than join-backs (the psi_drift
    scan-multiplication lesson). Output one row:
    ``(mi, n_pairs, n_cells)``.
    """
    a = F.avg(F.when(F.col(tag_col) == tag_a, F.col(value_col)))
    b = F.avg(F.when(F.col(tag_col) == tag_b, F.col(value_col)))
    wide = (
        df.filter(F.col(tag_col).isin(tag_a, tag_b))
        .groupBy(ts_col)
        .agg(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    )
    bounds = wide.agg(
        F.min("_a").alias("_la"),
        F.max("_a").alias("_ha"),
        F.min("_b").alias("_lb"),
        F.max("_b").alias("_hb"),
    )
    k = int(bins)

    def _bin(v, lo, hi):
        w = (F.col(hi) - F.col(lo)) / k
        return F.when(
            w > 0,
            F.least(
                F.lit(k - 1),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((F.col(v) - F.col(lo)) / w),
                ),
            ),
        ).otherwise(F.lit(0).cast("long"))

    binned = wide.crossJoin(F.broadcast(bounds)).select(
        _bin("_a", "_la", "_ha").alias("_ba"),
        _bin("_b", "_lb", "_hb").alias("_bb"),
    )
    cnt = binned.groupBy("_ba", "_bb").agg(F.count(F.lit(1)).alias("_n"))
    wall = Window.partitionBy()
    wa = Window.partitionBy("_ba")
    wb = Window.partitionBy("_bb")
    cnt = (
        cnt.withColumn("_tot", F.sum("_n").over(wall))
        .withColumn("_na", F.sum("_n").over(wa))
        .withColumn("_nb", F.sum("_n").over(wb))
    )
    pxy = F.col("_n") / F.col("_tot")
    term = pxy * F.log(
        pxy / ((F.col("_na") / F.col("_tot")) * (F.col("_nb") / F.col("_tot")))
    )
    return cnt.agg(
        qround(F.sum(term), 6).alias("mi"),
        F.max("_tot").alias("n_pairs"),
        F.count(F.lit(1)).alias("n_cells"),
    )


def grid_gaps(
    df: DataFrame,
    resolution_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
) -> DataFrame:
    """Sensor-outage detection: contiguous missing-bucket runs per tag
    in a resampled grid (which materializes only OBSERVED buckets, so a
    gap is any step between consecutive rows larger than the grid
    resolution). Output ``(tag, gap_start, gap_end, n_missing)`` — the
    first/last missing bucket and how many buckets the outage spans.

    One per-tag lag window (bounded series-key posture) and a row-local
    filter; no joins, no second exchange. The reference's
    ``n_samples_threshold`` gate (gordo builder) rejects a WHOLE series
    for sparsity; this localizes WHERE the data went missing.

    ``n_missing`` uses pure integer floor-division on epoch seconds
    (``step div res - 1``), never a double divide + cast — so off-grid
    timestamps (e.g. a step of 2.5 buckets) floor identically in every
    engine instead of depending on truncation-vs-round-half-even.
    """
    res = int(resolution_seconds)
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    t_long = F.col(ts_col).cast("timestamp").cast("long")
    p_long = prev.cast("timestamp").cast("long")
    d = df.select(
        F.col(tag_col),
        F.col(ts_col),
        prev.alias("_prev"),
        (t_long - p_long).alias("_step"),
    ).withColumn(
        "n_missing", F.expr(f"(_step div {res}) - 1").cast("long")
    )
    return d.filter(F.col("n_missing") > 0).select(
        tag_col,
        F.timestamp_seconds(
            F.col("_prev").cast("timestamp").cast("long") + res
        ).alias("gap_start"),
        F.timestamp_seconds(
            F.col(ts_col).cast("timestamp").cast("long") - res
        ).alias("gap_end"),
        "n_missing",
    )


def cross_correlation(
    df: DataFrame,
    lags: Sequence[int],
    resolution_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Lead-lag cross-correlation between every tag pair at each lag:
    ``corr(x_a(t), x_b(t + k*resolution))`` — positive peak at k>0 means
    tag_a LEADS tag_b by k buckets, the process-engineering question
    behind cause/effect screening on a sensor fleet.

    Deliberately NOT a global-window formulation (a wide pivoted frame
    with lead() needs a single-partition sort): the long frame joins to
    a lag-exploded copy of itself ON THE TIME KEY — one shuffle
    partitioned by ts, which scales out with the grid — then ONE
    aggregation on the (tag_a, tag_b, lag) key, bounded by
    #tags^2 * #lags. Pairs are canonicalized (tag_a < tag_b); negative
    lags cover the other direction.
    """
    res = int(resolution_seconds)
    lag_arr = F.array(*[F.lit(int(k)) for k in lags])
    left = df.select(
        F.col(tag_col).alias("tag_a"),
        F.col(ts_col).cast("timestamp").cast("long").alias("_t"),
        F.col(value_col).alias("_va"),
    )
    right = df.select(
        F.col(tag_col).alias("tag_b"),
        F.col(ts_col).cast("timestamp").cast("long").alias("_tb"),
        F.col(value_col).alias("_vb"),
    ).withColumn("lag", F.explode(lag_arr))
    # b's sample at (t + k*res) pairs with a's sample at t
    right = right.withColumn("_t", F.col("_tb") - F.col("lag") * res)
    joined = left.join(right, "_t").filter(F.col("tag_a") < F.col("tag_b"))
    return joined.groupBy("tag_a", "tag_b", "lag").agg(
        qround(F.corr("_va", "_vb"), 6).alias("xcorr"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def time_weighted_avg(
    df: DataFrame,
    bucket_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per tag per bucket — the irregular-sampling
    analogue of plain ``avg`` (TimescaleDB's ``time_weight('Linear')``,
    InfluxDB's ``integral``/elapsed): each consecutive-sample segment
    contributes trapezoid area ``(v + v_prev)/2 * dt`` so a sensor that
    reports rarely while steady is not out-voted by one that chatters.

    Segment attribution is WITHIN-bucket: only segments whose both
    endpoints fall in the same bucket integrate (cross-boundary segments
    are dropped rather than split — deterministic and one-pass; buckets
    with no intra-bucket segment, e.g. a single sample, fall back to the
    plain mean of their samples). Output
    ``(tag, bucket_ts, twa, n_samples)``.

    One per-tag ordered window (bounded series key) computes every
    segment; one ``(tag, bucket)`` hash aggregation closes it — no
    joins, no second exchange, partial-aggregable at any scale.
    """
    b = int(bucket_seconds)
    t = F.col(ts_col).cast("timestamp").cast("long")
    d = df.select(
        F.col(tag_col), F.col(value_col), t.alias("_t")
    ).withColumn("_bkt", F.expr(f"_t div {b}"))
    wseg = Window.partitionBy(tag_col).orderBy("_t", value_col)
    d = (
        d.withColumn("_pt", F.lag("_t").over(wseg))
        .withColumn("_pv", F.lag(value_col).over(wseg))
        .withColumn(
            "_same", F.expr(f"_pt is not null and (_pt div {b}) = _bkt")
        )
    )
    dt = F.when(F.col("_same"), F.col("_t") - F.col("_pt")).otherwise(F.lit(0))
    area = F.when(
        F.col("_same"),
        (F.col(value_col) + F.col("_pv")) / 2.0 * (F.col("_t") - F.col("_pt")),
    ).otherwise(F.lit(0.0))
    agg = d.groupBy(tag_col, "_bkt").agg(
        F.sum(dt).alias("_dt"),
        F.sum(area).alias("_area"),
        F.avg(value_col).alias("_mean"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    return agg.select(
        tag_col,
        F.timestamp_seconds(F.col("_bkt") * b).alias("bucket_ts"),
        qround(
            F.when(F.col("_dt") > 0, F.col("_area") / F.col("_dt")).otherwise(
                F.col("_mean")
            ),
            6,
        ).alias("twa"),
        "n_samples",
    )


def counter_rate(
    df: DataFrame,
    bucket_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Monotonic-counter increase/rate per tag per bucket with reset
    handling (Prometheus ``increase()``/``rate()`` semantics): each
    consecutive-sample delta contributes ``v - v_prev`` when the counter
    advanced and ``v`` after a reset (the counter restarted from ~0, so
    the post-reset reading IS the increase since the reset). The first
    sample of each bucket contributes nothing — deltas never straddle
    buckets because the lag window partitions on ``(tag, bucket)``.

    Output ``(tag, bucket_ts, increase, rate_per_sec, n_resets)``.
    One ordered window on ``(tag, bucket)`` — a FINER key than the
    per-tag series windows elsewhere in this module, so even a single
    unbounded counter splits across executors bucket-by-bucket — plus
    one hash aggregation on the same key: no joins, no skew pile-up.
    """
    b = int(bucket_seconds)
    t = F.col(ts_col).cast("timestamp").cast("long")
    d = df.select(
        F.col(tag_col), F.col(value_col), t.alias("_t")
    ).withColumn("_bkt", F.expr(f"_t div {b}"))
    w = Window.partitionBy(tag_col, "_bkt").orderBy("_t", value_col)
    d = d.withColumn("_pv", F.lag(value_col).over(w))
    inc = F.when(F.col("_pv").isNull(), F.lit(0.0)).when(
        F.col(value_col) >= F.col("_pv"), F.col(value_col) - F.col("_pv")
    ).otherwise(F.col(value_col))
    reset = (
        F.col("_pv").isNotNull() & (F.col(value_col) < F.col("_pv"))
    ).cast("long")
    agg = d.groupBy(tag_col, "_bkt").agg(
        qround(F.sum(inc), 6).alias("increase"),
        F.sum(reset).alias("n_resets"),
    )
    return agg.select(
        tag_col,
        F.timestamp_seconds(F.col("_bkt") * b).alias("bucket_ts"),
        "increase",
        qround(F.col("increase") / b, 6).alias("rate_per_sec"),
        "n_resets",
    )


def trend(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-tag linear trend: OLS slope of value against time-in-hours,
    plus intercept, R^2 and sample count — the "is this sensor drifting
    and how fast" fleet screen that precedes any changepoint hunt.

    Output ``(tag, slope_per_hour, intercept, r2, n)``; slope units are
    value-per-hour (epoch seconds / 3600, so the number is readable).

    Pure ``regr_*`` aggregates — single hash aggregation on the bounded
    tag key, map-side combinable, no window, no sort, no join; the same
    one-pass sufficient-statistics shape as ``tag_correlations``.
    """
    x = F.col(ts_col).cast("timestamp").cast("long") / F.lit(3600.0)
    return df.groupBy(tag_col).agg(
        qround(F.regr_slope(F.col(value_col), x), 6).alias("slope_per_hour"),
        qround(F.regr_intercept(F.col(value_col), x), 6).alias("intercept"),
        qround(F.regr_r2(F.col(value_col), x), 6).alias("r2"),
        F.count(value_col).alias("n"),
    )


def rolling_corr(
    df: DataFrame,
    tag_a: str,
    tag_b: str,
    window_seconds: int = 168 * 3600,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Rolling Pearson correlation between TWO tags over a trailing
    ``window_seconds`` TIME frame — the time-varying coupling readout
    ("when did these two sensors decouple?") that a single whole-range
    ``corr`` (see ``tag_correlations``) averages away.

    The frame is a RANGE over epoch seconds, not N trailing rows: on a
    grid with gaps a row-positional frame silently stretches past the
    labeled duration (the acf lesson — time-keyed everywhere in this
    module). The two series align by conditional aggregation onto the
    shared grid (one bounded groupBy on the bucket timestamp — the J3
    pivot shape), then ``corr`` runs as a windowed aggregate over the
    trailing time frame. The aligned frame is ONE series on the
    calendar grid (#buckets in range, never raw-event-proportional), so
    the unpartitioned ordered window is the same bounded single-series
    posture as the ``m6``/``j7`` family. Rows with fewer than 2
    complete pairs in frame emit null. Output:
    ``(ts, corr_ab, n_pairs)``.
    """
    a = F.avg(F.when(F.col(tag_col) == tag_a, F.col(value_col)))
    b = F.avg(F.when(F.col(tag_col) == tag_b, F.col(value_col)))
    wide = (
        df.filter(F.col(tag_col).isin(tag_a, tag_b))
        .groupBy(ts_col)
        .agg(a.alias("_a"), b.alias("_b"))
        .withColumn("_t", F.col(ts_col).cast("timestamp").cast("long"))
    )
    w = (
        Window.orderBy("_t")
        .rangeBetween(-(int(window_seconds) - 1), 0)
    )
    pair_ok = F.when(
        F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1
    ).otherwise(0)
    return wide.select(
        F.col(ts_col),
        qround(F.corr("_a", "_b").over(w), 6).alias("corr_ab"),
        F.sum(pair_ok).over(w).alias("n_pairs"),
    )


def adf_screen(
    df: DataFrame,
    resolution_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    critical: float = -2.86,
) -> DataFrame:
    """Stationarity screen per tag: the Dickey-Fuller (lag-0, with
    constant) regression ``Δv_t = α + γ·v_{t-1} + ε`` — ``γ`` near 0
    (t-stat above the critical value) means a unit root / random-walk
    series, strongly negative means mean-reverting. The go/no-go check
    before trusting level-based anomaly thresholds on a drifting
    sensor. ``critical = -2.86`` is the 5% DF constant-only asymptotic
    value.

    ``v_{t-1}`` is TIME-keyed — a RANGE frame pinned exactly one
    ``resolution_seconds`` back, the module convention — so a grid gap
    yields no (Δv, v_prev) pair instead of silently differencing
    across the gap (a gap-spanning "Δv" is a multi-step change and
    would bias γ toward stationarity).

    Everything is sufficient-statistics algebra: one per-tag window
    builds ``(Δv, v_{t-1})`` pairs, then ONE hash aggregation computes
    ``γ = regr_slope``, and the slope's t-stat from the same regr_*
    family — ``SE² = (SSE/(n-2))/Sxx`` with ``SSE = Syy - γ²·Sxx`` —
    no second pass, no residual materialization. Output:
    ``(tag, gamma, t_stat, n, stationary)``.
    """
    res = int(resolution_seconds)
    df = df.withColumn("_t", F.col(ts_col).cast("timestamp").cast("long"))
    w = Window.partitionBy(tag_col).orderBy("_t").rangeBetween(-res, -res)
    prev = F.last(value_col).over(w)
    d = df.select(
        F.col(tag_col),
        (F.col(value_col) - prev).alias("_dv"),
        prev.alias("_x"),
    ).filter(F.col("_x").isNotNull())
    agg = d.groupBy(tag_col).agg(
        F.regr_slope("_dv", "_x").alias("_g"),
        F.regr_sxx("_dv", "_x").alias("_sxx"),
        F.regr_syy("_dv", "_x").alias("_syy"),
        F.regr_count("_dv", "_x").alias("n"),
    )
    sse = F.col("_syy") - F.col("_g") * F.col("_g") * F.col("_sxx")
    se = F.sqrt(
        F.greatest(sse, F.lit(0.0)) / (F.col("n") - 2) / F.col("_sxx")
    )
    t = F.when(se > 0, F.col("_g") / se)
    return agg.select(
        tag_col,
        qround("_g", 6).alias("gamma"),
        qround(t, 6).alias("t_stat"),
        "n",
        (t < F.lit(float(critical))).alias("stationary"),
    )


def theil_sen(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Theil-Sen robust trend per tag: the MEDIAN of all pairwise slopes
    ``(v_j - v_i) / (t_j - t_i)`` — up to ~29% outliers cannot move it,
    where one stuck-sensor spike drags an OLS slope (:func:`trend`)
    arbitrarily. The robust/L2 slope pair is the standard drift
    cross-check before acting on a trend alarm.

    Pair generation is by construction quadratic in the PER-TAG point
    count, which is why this expects the resampled grid (#buckets in
    range, e.g. 720 for a month of hours → ~260k pairs per tag), never
    raw events; the o(n log n) literature trick is deliberately skipped
    in favor of the exact estimator on a bounded grid. The pairs run as
    a vectorized numpy outer difference on the sanctioned per-series
    Arrow path (one group per tag — the LTTB/holt pattern; a same-tag
    self-JOIN materializes every pair as a shuffle row and measured
    4.0 s vs 0.9 s for identical output at sf0.1, same host). Pairs with equal
    timestamps are excluded, matching the strict ``t_i < t_j`` join
    semantics; the median (numpy, linear-interpolation == Spark
    ``percentile(0.5)`` == DuckDB ``median``) returns RAW and is
    rounded by Spark's ``round`` so the engine-rounding convention
    stays identical to every other contract. Output:
    ``(tag, sen_slope_per_hour, n_pairs)``; slope is per hour (epoch
    seconds / 3600) to match :func:`trend`.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    t = F.col(ts_col).cast("timestamp").cast("long") / F.lit(3600.0)
    pts = df.select(
        F.col(tag_col),
        t.alias("_t"),
        F.col(value_col).alias("_v"),
    ).filter(F.col("_v").isNotNull())
    tag_field = [f for f in pts.schema.fields if f.name == tag_col][0]
    schema = StructType(
        [
            tag_field,
            StructField("_sen", DoubleType()),
            StructField("n_pairs", LongType()),
        ]
    )

    def _sen(pdf):
        import pandas as pd

        tvals = pdf["_t"].to_numpy(dtype=float)
        v = pdf["_v"].to_numpy(dtype=float)
        dt = np.subtract.outer(tvals, tvals)
        mask = dt > 0
        slopes = (np.subtract.outer(v, v)[mask] / dt[mask])
        sen = float(np.median(slopes)) if slopes.size else None
        return pd.DataFrame(
            {
                tag_col: [pdf[tag_col].iloc[0]],
                "_sen": [sen],
                "n_pairs": [int(slopes.size)],
            }
        )

    out = pts.groupBy(tag_col).applyInPandas(_sen, schema=schema)
    return out.select(
        tag_col,
        qround("_sen", 6).alias("sen_slope_per_hour"),
        "n_pairs",
    )


def seasonal_envelope(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day quantile envelope per tag: exact p10/p50/p90 of the
    value per ``(tag, hour)`` bucket — the robust companion to
    :func:`seasonal_profile`'s mean/z (one stuck-high day drags a mean
    profile; the median envelope holds), and the table a dashboard
    shades behind the live trace ("is now inside the usual band for
    3am?").

    One hash aggregation on the bounded ``(tag, hod)`` key; exact
    ``percentile`` buffers per-group values — bounded here by
    rows-per-(tag,hour-slot), with ``approx_percentile`` as the
    documented swap for unbounded groups (the group_quantiles
    convention). Output: ``(tag, hod, n, p10, p50, p90)``.
    """
    pct = F.percentile(value_col, F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9)))
    return df.groupBy(F.col(tag_col), F.hour(ts_col).alias("hod")).agg(
        F.count(value_col).alias("n"),
        qround(F.get(pct, 0), 6).alias("p10"),
        qround(F.get(pct, 1), 6).alias("p50"),
        qround(F.get(pct, 2), 6).alias("p90"),
    )


def chisq_drift(
    df: DataFrame,
    cat_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Categorical drift between the first and second half of the
    observed range (same midpoint convention as :func:`psi_drift` /
    :func:`ks_drift`): Pearson chi-square over the category x half
    contingency table — the member of the drift family for columns
    where PSI's numeric bins and KS's ordering don't exist (event
    types, sources, labels). Output one row: ``(chi2, dof, n_ref,
    n_cur, n_categories)`` — compare chi2 against the chi-square
    critical value at ``dof`` for the drift verdict (the critical
    lookup is a table, deliberately left to the caller; unlike KS
    there is no scale-free bound).

    Plan: one 1-row midpoint scalar (broadcast), ONE ``(category,
    half)`` count aggregation, window marginals over the bounded
    category frame (the psi_drift join-back avoidance), one summary
    row. Everything map-side combinable.
    """
    span = df.agg(F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")).select(
        (
            (
                F.col("_t0").cast("timestamp").cast("long")
                + F.col("_t1").cast("timestamp").cast("long")
            )
            / 2
        ).alias("_mid")
    )
    d = df.crossJoin(F.broadcast(span)).select(
        F.col(cat_col).alias("_c"),
        (F.col(ts_col).cast("timestamp").cast("long") < F.col("_mid")).alias(
            "_is_ref"
        ),
    )
    cnt = d.groupBy("_c").agg(
        F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).alias("_nr"),
        F.sum(F.when(~F.col("_is_ref"), 1).otherwise(0)).alias("_nc"),
    )
    wall = Window.partitionBy()
    cnt = (
        cnt.withColumn("_totr", F.sum("_nr").over(wall))
        .withColumn("_totc", F.sum("_nc").over(wall))
    )
    tot = F.col("_totr") + F.col("_totc")
    row_tot = F.col("_nr") + F.col("_nc")
    e_r = row_tot * F.col("_totr") / tot
    e_c = row_tot * F.col("_totc") / tot
    term = F.when(e_r > 0, (F.col("_nr") - e_r) * (F.col("_nr") - e_r) / e_r).otherwise(0.0) + F.when(
        e_c > 0, (F.col("_nc") - e_c) * (F.col("_nc") - e_c) / e_c
    ).otherwise(0.0)
    return cnt.agg(
        qround(F.sum(term), 6).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.max("_totr").alias("n_ref"),
        F.max("_totc").alias("n_cur"),
        F.count(F.lit(1)).alias("n_categories"),
    )


def control_rules(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Western-Electric control-chart rules per series — the classic
    SPC screen a bare |z| > 3 monitor misses: sustained small shifts
    and drifts trip the RUN rules long before any single point crosses
    3 sigma. Center line and sigma are the series' own mean / population
    std (the Shewhart convention; feed a reference window's frame to
    pin train-time stats).

    Rules (each a boolean column):
    - ``r1_beyond_3s``  — this point beyond 3 sigma;
    - ``r2_2of3_2s``    — 2 of the last 3 points beyond 2 sigma on the
      SAME side (both counts on one side — the textbook reading);
    - ``r3_4of5_1s``    — 4 of the last 5 beyond 1 sigma, same side;
    - ``r4_8_run``      — 8 consecutive points on one side of center.

    Scale shape: one tag-keyed aggregate for (mean, sigma), one
    tag-partitioned ordered window for the run counts (bounded lookback
    frames: 3/5/8 rows) — the w9_rolling_zscore discipline; constant
    state per row, no collect. Degenerate series (sigma = 0) report
    NULL z and all-false rules (stated). Output: ``(tag, ts, value, z,
    r1..r4, any_signal)`` with z rounded to 6.
    """
    v = F.col(value_col).cast("double")
    # mean/sigma rounded to 6dp before the z (the w9_rolling_zscore
    # engine-portability convention): the rule thresholds compare z, so
    # every input to it must already be bit-identical across engines
    stats = df.groupBy(tag_col).agg(
        qround(F.avg(v), 6).alias("_mu"),
        qround(F.stddev_pop(v), 6).alias("_sd"),
    )
    d = df.join(stats, tag_col).select(
        F.col(tag_col),
        F.col(ts_col),
        v.alias(value_col),
        F.when(F.col("_sd") > 0, (v - F.col("_mu")) / F.col("_sd")).alias(
            "_z"
        ),
    )
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    # all rule comparisons run on the 6dp-ROUNDED z: thresholds (1/2/3
    # sigma) sit exactly where engines can disagree by an ulp, and a
    # flipped boolean is a hash mismatch — rounding first makes every
    # rule decision engine-portable (the tfidf_topk trick, applied to
    # predicates instead of ranks)
    z = qround(F.col("_z"), 6)
    up2 = (z > 2).cast("int")
    dn2 = (z < -2).cast("int")
    up1 = (z > 1).cast("int")
    dn1 = (z < -1).cast("int")
    upc = (z > 0).cast("int")
    dnc = (z < 0).cast("int")
    w3 = w.rowsBetween(-2, 0)
    w5 = w.rowsBetween(-4, 0)
    w8 = w.rowsBetween(-7, 0)
    has_sd = z.isNotNull()
    r1 = has_sd & (F.abs(z) > 3)
    r2 = has_sd & (
        (F.sum(up2).over(w3) >= 2) | (F.sum(dn2).over(w3) >= 2)
    ) & (F.count(z).over(w3) >= 3)
    r3 = has_sd & (
        (F.sum(up1).over(w5) >= 4) | (F.sum(dn1).over(w5) >= 4)
    ) & (F.count(z).over(w5) >= 5)
    r4 = has_sd & (
        (F.sum(upc).over(w8) >= 8) | (F.sum(dnc).over(w8) >= 8)
    ) & (F.count(z).over(w8) >= 8)
    return d.select(
        tag_col,
        ts_col,
        value_col,
        z.alias("z"),
        F.coalesce(r1, F.lit(False)).alias("r1_beyond_3s"),
        F.coalesce(r2, F.lit(False)).alias("r2_2of3_2s"),
        F.coalesce(r3, F.lit(False)).alias("r3_4of5_1s"),
        F.coalesce(r4, F.lit(False)).alias("r4_8_run"),
        F.coalesce(r1 | r2 | r3 | r4, F.lit(False)).alias("any_signal"),
    )


def periodogram(
    df: DataFrame,
    periods_seconds: list[int],
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-tag Schuster periodogram at a CANDIDATE period list — the
    "which cycle does this sensor actually follow" screen that acf
    (lag correlation) and seasonal_profile (assumed period) bracket but
    don't answer: power at period p is ``(S_c^2 + S_s^2) / n`` with
    ``S_c = sum (v - mean) cos(2*pi*t/p)`` and ``S_s`` the sine sum,
    i.e. the squared magnitude of the DFT bin at frequency 1/p of the
    demeaned series. A bounded candidate list (hours/day/week — the
    physically plausible cycles) replaces the full FFT: at 100 TB a
    full spectrum per tag is |grid| output rows, while candidates keep
    output at |tags| x |periods|.

    Plan: one tag-partitioned window (demean), one row-local expansion
    over the |periods|-bounded literal array (explode of a constant
    list, stated), one (tag, period)-keyed aggregation — map-side
    combinable, no corpus-sized windows, no joins. Works straight off
    a resampled-or-raw long frame. Output: ``(tag, period_s, n,
    power)`` ordered by (tag, period_s).
    """
    from pyspark.sql import Window

    if not periods_seconds:
        raise ValueError("periodogram needs a non-empty period list")
    wtag = Window.partitionBy(tag_col)
    two_pi = 6.283185307179586
    demeaned = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).cast("double").alias("_t"),
        (F.col(value_col) - F.avg(value_col).over(wtag)).alias("_d"),
    )
    per = demeaned.select(
        "tag",
        "_t",
        "_d",
        F.explode(
            F.array(*[F.lit(int(p)) for p in periods_seconds])
        ).alias("period_s"),
    )
    # phase from t MOD p (integer-exact in both engines): keeps the
    # trig argument inside [0, 2*pi) so the cos/sin evaluations are
    # well-conditioned and engine-agnostic (cos of a ~1e9 raw epoch
    # differs across libm argument reductions at the ulp level)
    theta = (
        F.lit(two_pi)
        * F.pmod(F.col("_t"), F.col("period_s").cast("double"))
        / F.col("period_s")
    )
    return (
        per.groupBy("tag", "period_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_d") * F.cos(theta)).alias("_sc"),
            F.sum(F.col("_d") * F.sin(theta)).alias("_ss"),
        )
        .select(
            "tag",
            "period_s",
            "n",
            qround(
                (F.col("_sc") * F.col("_sc") + F.col("_ss") * F.col("_ss"))
                / F.col("n"),
                6,
            ).alias("power"),
        )
        .orderBy("tag", "period_s")
    )


def stl_decompose(
    df: DataFrame,
    period_buckets: int = 24,
    half_window: int = 12,
    bucket_seconds: int = 3600,
    precision: int = 6,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Additive trend/seasonal/residual decomposition per tag over a
    resampled grid — the one-shot readout combining what w18_trend and
    w14_seasonal each show alone, in the classical-decomposition shape
    (the moving-average STL ancestor; deterministic, no loess
    iterations, which is what keeps it oracle-checkable):

    - ``trend`` = time-RANGE mean of the series within ±``half_window``
      buckets (a RANGE frame pinned in seconds, the acf convention, so
      grid GAPS shrink the window's population instead of dragging in
      far-away rows);
    - ``seasonal`` = per-(tag, phase) mean of the detrended series,
      phase = bucket index mod ``period_buckets`` (hour-of-day on the
      hourly/daily default);
    - ``resid`` = value - trend - seasonal.

    Engine-exact arithmetic (stated): values are rounded to
    ``precision`` decimals and every ORDER-DEPENDENT sum (the sliding
    trend window, the per-phase seasonal mean) runs over
    10^precision-SCALED INTEGERS, so the accumulations are exact and
    the only floats are divisions of identical integers — a float
    window sum drifts at the ulp level between engines and flips 6dp
    roundings (measured: 5/3385 rows at sf0.01 before this).

    Plan: one tag-partitioned RANGE window (trend), one (tag, phase)
    aggregate joined back (|tags| x period rows, broadcast-sized), all
    keyed on the calendar grid — nothing corpus-cardinality. Output:
    ``(tag, ts, value, trend, seasonal, resid)``.
    """
    from pyspark.sql import Window

    from gordo_spark.functions.timeutil import epoch_seconds

    scale = float(10 ** int(precision))
    span = int(half_window) * int(bucket_seconds)
    t = epoch_seconds(F.col(ts_col))
    v6 = qround(F.col(value_col).cast("double"), int(precision))
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).alias("ts"),
        t.alias("_t"),
        v6.alias("value"),
        qround(v6 * scale, 0).cast("long").alias("_iv"),
    )
    wt = (
        Window.partitionBy("tag")
        .orderBy("_t")
        .rangeBetween(-span, span)
    )
    trended = base.select(
        "tag",
        "ts",
        "_t",
        "value",
        (
            F.sum("_iv").over(wt).cast("double")
            / F.count("_iv").over(wt)
            / F.lit(scale)
        ).alias("trend"),
    )
    phase = F.pmod(
        F.floor(F.col("_t") / F.lit(int(bucket_seconds))),
        F.lit(int(period_buckets)),
    ).alias("_ph")
    detr = trended.select(
        "tag", "ts", "value", "trend", phase,
        # detrended on the precision grid -> scaled-int seasonal sums
        qround(
            qround(F.col("value") - F.col("trend"), int(precision))
            * scale,
            0,
        ).cast("long").alias("_di"),
    )
    seas = detr.groupBy("tag", "_ph").agg(
        (
            F.sum("_di").cast("double")
            / F.count("_di")
            / F.lit(scale)
        ).alias("seasonal")
    )
    return (
        detr.join(F.broadcast(seas), ["tag", "_ph"])
        .select(
            "tag",
            "ts",
            "value",
            qround("trend", 6).alias("trend"),
            qround("seasonal", 6).alias("seasonal"),
            qround(
                F.col("value") - F.col("trend") - F.col("seasonal"), 6
            ).alias("resid"),
        )
        .orderBy("tag", "ts")
    )


def matrix_profile(
    df: DataFrame,
    m: int = 8,
    exclusion: int | None = None,
    precision: int = 3,
    horizon: int | None = None,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Raw-distance matrix profile per tag over a resampled grid
    (Yeh et al. 2016, the self-join variant without z-normalization —
    stated): for every length-``m`` subsequence, the Euclidean distance
    to its nearest non-trivial neighbor in the SAME series. Low profile
    = repeated motif; high profile = discord (the strongest
    unsupervised anomaly primitive the window family lacks — hampel and
    zscore flag POINT outliers; the profile flags anomalous SHAPES).

    Exact-integer discipline (the stl_decompose lesson): values round
    to ``precision`` decimals and scale to integers, so the pairwise
    squared distances are exact LONG sums (zip_with + aggregate,
    row-local, order-deterministic) and the min is engine-exact; the
    one float is the final sqrt of an identical integer. Trivial
    matches are excluded inside ``|i - j| < exclusion`` (default m).

    Scale shape: the self-join is per-tag positions x positions —
    QUADRATIC in the GRID length, which is CALENDAR-bounded (hours in
    range), never event-volume-bounded; the resample collapses volume
    first (at 10x events the grid — and this cost — is unchanged). For
    multi-year grids pass ``horizon``: the pair join is banded on
    ``exclusion <= |i - j| <= horizon``, making cost LINEAR in the grid
    (positions x horizon) at the standard semantic change "nearest
    neighbor WITHIN horizon" (Yeh et al.'s banded/anytime variants);
    with ``horizon >= grid length`` the banded profile equals the full
    profile (pytest-pinned). Positions with NO admissible neighbor
    (series shorter than m + exclusion, or an over-tight horizon) are
    emitted with NULL ``mp_dist``/``nn_idx`` rather than dropped, so a
    short series reads as "no evidence", not "no anomaly". Output:
    ``(tag, idx, ts, mp_dist, nn_idx)`` ordered by (tag, idx).
    """
    from pyspark.sql import Window

    mm = int(m)
    if mm < 2:
        raise ValueError("m must be >= 2")
    excl = int(exclusion) if exclusion is not None else mm
    if horizon is not None and int(horizon) < excl:
        raise ValueError(
            f"horizon ({horizon}) must be >= exclusion ({excl}); "
            "a tighter band admits no neighbor at all"
        )
    scale = float(10 ** int(precision))
    wseq = Window.partitionBy(tag_col).orderBy(ts_col)
    wwin = (
        Window.partitionBy(tag_col)
        .orderBy(ts_col)
        .rowsBetween(0, mm - 1)
    )
    iv = qround(
        qround(F.col(value_col).cast("double"), int(precision)) * scale, 0
    ).cast("long")
    # r11 (guide §5): THREE consumers (both self-join arms + the
    # ts_back spine) re-derived the upstream resample + the two-window
    # subtree per consumer. The subsequence table is GRID-bounded
    # (|tags| x calendar positions, never event-volume) — pin it once.
    seq = df.filter(F.col(value_col).isNotNull()).select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).alias("ts"),
        F.row_number().over(wseq).alias("idx"),
        F.collect_list(iv).over(wwin).alias("_w"),
        F.count(F.lit(1)).over(
            Window.partitionBy(tag_col)
        ).alias("_n"),
    ).filter(F.col("idx") <= F.col("_n") - mm + 1).localCheckpoint()
    a = seq.select("tag", "ts", F.col("idx"), F.col("_w").alias("_wa"))
    b = seq.select(
        "tag", F.col("idx").alias("jdx"), F.col("_w").alias("_wb")
    )
    d2 = F.aggregate(
        F.zip_with(
            "_wa", "_wb", lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    gap = F.abs(F.col("idx") - F.col("jdx"))
    adm = gap >= excl
    if horizon is not None:
        adm = adm & (gap <= int(horizon))
    pairs = (
        a.join(b, "tag")
        .filter(adm)
        .select("tag", "ts", "idx", "jdx", d2.alias("_d2"))
    )
    best = (
        pairs.groupBy("tag", "idx")
        .agg(
            F.min("_d2").alias("_mind2"),
            F.min_by("jdx", F.struct(F.col("_d2"), F.col("jdx"))).alias(
                "nn_idx"
            ),
        )
    )
    ts_back = seq.select("tag", "idx", "ts")
    # left join so a position with no admissible pair surfaces as NULL
    # (no evidence) instead of silently vanishing from the profile
    return (
        ts_back.join(best, ["tag", "idx"], "left")
        .select(
            "tag",
            "idx",
            "ts",
            qround(F.sqrt(F.col("_mind2")) / F.lit(scale), 6).alias(
                "mp_dist"
            ),
            "nn_idx",
        )
        .orderBy("tag", "idx")
    )


def consensus_anomaly(
    df: DataFrame,
    zscore_window: int = 24,
    zscore_threshold: float = 2.0,
    hampel_k: int = 5,
    hampel_sigmas: float = 3.0,
    cusum_slack: float = 0.5,
    cusum_h: float = 5.0,
    min_votes: int = 2,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Detector-consensus anomaly screen: three INDEPENDENT detectors —
    rolling z-score (point spikes vs a trailing gaussian), Hampel
    (point spikes vs a robust rolling median, survives the spike
    dragging the mean), CUSUM (slow drift neither point detector sees)
    — vote per (tag, ts); ``consensus`` requires ``min_votes``. The
    alert-fatigue answer: each detector alone has a known blind spot
    and a known false-positive mode, and the intersection is what an
    operator can act on (same motivation as the reference's
    smooth-* columns — gordo/machine/model/anomaly/diff.py:340-458 —
    but cross-DETECTOR instead of cross-time).

    Composition discipline (the curation_verdict lesson): the input
    series is localCheckpoint-ed ONCE and feeds all three detectors —
    three window passes over one cached frame, two (tag, ts)-keyed
    joins to land the votes, no re-derivation of the upstream
    resample. Requires unique (tag, ts) (the cusum_drift contract).
    Output: flagged rows only (votes >= 1, stated — the all-clear rows
    are the corpus): ``(tag, ts, value, z_flag, hampel_flag,
    cusum_flag, votes, consensus)``.
    """
    from gordo_spark.operators.smoothing import (
        cusum_drift,
        hampel,
        rolling_zscore,
    )

    base = (
        df.select(
            F.col(tag_col).alias("tag"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
        )
        .filter(F.col("value").isNotNull())
        .localCheckpoint()
    )
    z = rolling_zscore(
        base, "value", window=zscore_window, threshold=zscore_threshold
    ).select("tag", "ts", F.col("is_outlier").alias("z_flag"))
    h = hampel(base, k=hampel_k, n_sigmas=hampel_sigmas).select(
        "tag", "ts", F.col("is_outlier").cast("int").alias("hampel_flag")
    )
    c = cusum_drift(
        base, slack_k=cusum_slack, threshold_h=cusum_h
    ).select("tag", "ts", "value", F.col("alarm").cast("int").alias("cusum_flag"))
    votes = (
        c.join(z, ["tag", "ts"])
        .join(h, ["tag", "ts"])
        .select(
            "tag",
            "ts",
            "value",
            "z_flag",
            "hampel_flag",
            "cusum_flag",
            (
                F.col("z_flag") + F.col("hampel_flag") + F.col("cusum_flag")
            ).alias("votes"),
        )
    )
    return (
        votes.filter(F.col("votes") >= 1)
        .withColumn("consensus", F.col("votes") >= int(min_votes))
        .orderBy("tag", "ts")
    )


def stl_strength(
    df: DataFrame,
    period_buckets: int = 24,
    half_window: int = 12,
    bucket_seconds: int = 3600,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trend/seasonal STRENGTH per tag (Hyndman & Athanasopoulos,
    fpp3 feature set) over the :func:`stl_decompose` components:
    ``F_trend = max(0, 1 - Var(R)/Var(value - seasonal))`` and
    ``F_seasonal = max(0, 1 - Var(R)/Var(value - trend))`` — the
    one-number-per-series screens that rank a THOUSAND-tag fleet by
    "which sensors actually cycle" (acf/periodogram answer where;
    this ranks how much), and the feature pair fleet triage sorts on.

    One pass over the decomposition output: a single per-tag aggregate
    of three population variances. Output: ``(tag, n, var_resid,
    f_trend, f_seasonal)``, NULL strengths when the denominators
    degenerate (constant series, stated).
    """
    d = stl_decompose(
        df,
        period_buckets=period_buckets,
        half_window=half_window,
        bucket_seconds=bucket_seconds,
        tag_col=tag_col,
        ts_col=ts_col,
        value_col=value_col,
    )
    deseason = F.col("value") - F.col("seasonal")
    detrend = F.col("value") - F.col("trend")
    agg = d.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.var_pop("resid").alias("_vr"),
        F.var_pop(deseason).alias("_vds"),
        F.var_pop(detrend).alias("_vdt"),
    )
    return agg.select(
        "tag",
        "n",
        qround(F.col("_vr"), 6).alias("var_resid"),
        qround(
            F.when(
                F.col("_vds") > 0,
                F.greatest(F.lit(0.0), 1.0 - F.col("_vr") / F.col("_vds")),
            ),
            6,
        ).alias("f_trend"),
        qround(
            F.when(
                F.col("_vdt") > 0,
                F.greatest(F.lit(0.0), 1.0 - F.col("_vr") / F.col("_vdt")),
            ),
            6,
        ).alias("f_seasonal"),
    ).orderBy("tag")


def spectral_entropy(
    df: DataFrame,
    periods_seconds: list[int],
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Normalized spectral entropy over the candidate-period
    periodogram: ``H = -sum p_i ln p_i / ln(m)`` with ``p_i`` the
    tag's normalized power at candidate period i — 0 = one clean
    cycle owns the series, 1 = power spread flat across candidates
    (noise). The fleet-triage companion to :func:`stl_strength`: that
    ranks HOW MUCH a series cycles, this ranks how CONCENTRATED the
    cycling is. Rides :func:`periodogram`'s rounded output (stated:
    entropy of the 6dp powers, so both engines fold identical
    numbers); one |tags| x |periods| aggregate on top.
    """
    m = len(periods_seconds)
    if m < 2:
        raise ValueError("spectral_entropy needs >= 2 candidate periods")
    pg = periodogram(
        df,
        periods_seconds,
        tag_col=tag_col,
        ts_col=ts_col,
        value_col=value_col,
    )
    tot = Window.partitionBy("tag")
    p = F.col("power") / F.sum("power").over(tot)
    terms = pg.select(
        "tag",
        F.sum("power").over(tot).alias("_tp"),
        F.when(p > 0, -p * F.log(p)).otherwise(0.0).alias("_h"),
    )
    return (
        terms.groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("n_periods"),
            qround(F.max("_tp"), 6).alias("total_power"),
            qround(
                F.when(
                    F.max("_tp") > 0,
                    F.sum("_h") / F.lit(float(math.log(m))),
                ),
                6,
            ).alias("entropy"),
        )
        .orderBy("tag")
    )


def flatline_runs(
    df: DataFrame,
    min_len: int = 6,
    precision: int = 6,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """STUCK-SENSOR detection: maximal runs of consecutive grid buckets
    whose value is CONSTANT at ``precision`` decimals — the dead-sensor
    signature every fleet operator triages first (a transmitter that
    freezes keeps repeating its last word; hampel/zscore see nothing
    because a constant has zero dispersion, and the reference's
    row_filter can only drop it if someone already knows the stuck
    value). Reference context: gordo's filter_periods drops whole
    windows; this localizes WHICH sensor flatlined and for how long.

    Semantics: values quantize to the ``precision`` grid (the engine's
    qround — real plateaus at sensor resolution count; float jitter
    below it does not), runs form per tag via the standard
    change-flag -> running-sum group id, and runs with
    ``run_len >= min_len`` are emitted as
    ``(tag, run_start, run_end, run_len, value)``, ordered.

    Scale shape: two window passes over ONE tag-keyed shuffle (lag +
    running sum, then a (tag, run) aggregate) — the sessionize plan
    exactly; output bounded by #runs, never rows. No UDFs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("tag").orderBy("ts")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).alias("ts"),
        qround(F.col(value_col), int(precision)).alias("_q"),
    )
    q = F.col("_q")
    # two projections: a window-over-window (running sum of a lag
    # expression) is not one Spark projection — same shuffle either way
    flagged_rows = base.withColumn(
        "_chg",
        F.when(
            F.lag(q).over(w).isNull() | (q != F.lag(q).over(w)), 1
        ).otherwise(0),
    )
    runs = flagged_rows.withColumn(
        "_run",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy("tag", "_run")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("run_len"),
            F.first("_q").alias("value"),
        )
        .filter(F.col("run_len") >= int(min_len))
        .select("tag", "run_start", "run_end", "run_len", "value")
        .orderBy("tag", "run_start")
    )


def hurst_exponent(
    df: DataFrame,
    scales: "list[int] | None" = None,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hurst exponent per tag via the AGGREGATED-VARIANCE method
    (Beran 1994; Taqqu, Teverovsky & Willinger 1995): for block sizes
    ``k`` in ``scales``, the variance of k-block means of a
    long-range-dependent series decays like ``k^(2H-2)``; an OLS fit of
    ``log var_k`` on ``log k`` gives slope ``beta`` and
    ``H = 1 + beta/2``. H ~ 0.5 = memoryless, H -> 1 = trending /
    persistent (a sensor that wanders), H < 0.5 = mean-reverting — the
    one-number "does this series trend or revert" triage that acf/adf
    only answer lag-by-lag.

    Everything is sufficient statistics: block means are
    (tag, block)-keyed aggregates over row-number blocks, each
    variance one more aggregate, the OLS slope a closed form over
    <= |scales| points — three shuffles total, no windows wider than
    the series key, no UDFs, no collect. Output:
    ``(tag, n, hurst, slope, r2)`` with the fit diagnostics.
    """
    from pyspark.sql import Window

    ks = [int(k) for k in (scales or [1, 2, 4, 8, 16])]
    if len(ks) < 2 or any(k < 1 for k in ks):
        raise ValueError("scales needs >= 2 positive block sizes")
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(tag_col).alias("tag"),
            F.col(value_col).cast("double").alias("v"),
            (F.row_number().over(w) - 1).alias("_i"),
        )
        .localCheckpoint()  # one scan feeds every scale
    )
    parts = []
    for k in ks:
        bm = base.groupBy(
            "tag", F.floor(F.col("_i") / k).alias("_b")
        ).agg(
            F.count(F.lit(1)).alias("_n"), F.avg("v").alias("_m")
        ).filter(F.col("_n") == k)  # complete blocks only (stated)
        parts.append(
            bm.groupBy("tag").agg(
                F.lit(k).alias("k"),
                F.var_pop("_m").alias("var_k"),
                F.count(F.lit(1)).alias("n_blocks"),
            )
        )
    pts = parts[0]
    for p in parts[1:]:
        pts = pts.unionByName(p)
    pts = pts.filter((F.col("var_k") > 0) & (F.col("n_blocks") >= 2)).select(
        "tag",
        F.log(F.col("k").cast("double")).alias("_x"),
        F.log("var_k").alias("_y"),
    )
    fit = pts.groupBy("tag").agg(
        F.count(F.lit(1)).alias("_np"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    beta = (F.col("_np") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        F.col("_np") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    r2num = F.col("_np") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    r2den = (
        (F.col("_np") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * (F.col("_np") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    )
    n_tot = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(tag_col).alias("tag")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        fit.join(n_tot, "tag")
        .filter(F.col("_np") >= 2)
        .select(
            "tag",
            "n",
            qround(F.lit(1.0) + beta / 2, 6).alias("hurst"),
            qround(beta, 6).alias("slope"),
            qround(
                F.when(r2den > 0, r2num * r2num / r2den), 6
            ).alias("r2"),
        )
        .orderBy("tag")
    )


def granger_lag1(
    wide: DataFrame,
    pairs: "list[tuple[str, str]]",
    ts_col: str = "ts",
    resolution: str = "1H",
    critical: float = 3.86,
) -> DataFrame:
    """Pairwise lag-1 Granger-causality screen on an aligned wide grid
    (Granger 1969): does yesterday's ``x`` improve the prediction of
    ``y`` beyond yesterday's ``y``? Restricted model
    ``y_t = a + b y_{t-1}`` vs unrestricted ``+ c x_{t-1}``; the F
    statistic ``(SSE_r - SSE_u) / (SSE_u / (n - 3))`` with 1 numerator
    df. F > ``critical`` (3.86 ~ alpha=0.05 at large n) flags a LEAD
    relationship — which sensor moves first, the fleet-topology
    question cross-correlation (tag_crosscorr) answers only by raw
    lag-scan without a significance frame.

    Both OLS fits are CLOSED FORMS over one pass of sufficient stats
    (the 2-regressor normal equations solved by 2x2 determinant
    algebra — no matrix library, no iteration). The lag is an
    EQUI-JOIN on the grid timestamp (row at ``ts`` joins the row at
    ``ts - resolution``), NOT a global window — a keyless ordered
    window would serialize the whole grid through one partition; the
    join shuffles on the timestamp key like any other. One join + one
    keyless aggregate per pair, a plan linear in |pairs|. Output:
    ``(x, y, n, f_stat, granger)`` ordered by (x, y).
    """
    from gordo_spark.functions.timeutil import offset_alias_to_seconds

    secs = int(offset_alias_to_seconds(resolution))
    # r11 (guide §5): every pair references `wide` twice (current +
    # lagged side), so |pairs| x 2 consumers re-derived the whole
    # upstream resample+pivot per consumer (12 scans for 6 pairs) and
    # the unrolled plan carried 12 copies of that subtree through
    # analysis. The aligned grid is |hours| x |tags| bounded, so pin it
    # once; each pair is then one bounded self-join + one scalar agg.
    wide = wide.localCheckpoint()
    out = None
    for x, y in pairs:
        cur = wide.select(
            F.col(ts_col).alias("_ts"),
            F.col(f"`{y}`").cast("double").alias("_y"),
        )
        prev = wide.select(
            (
                F.col(ts_col).cast("timestamp").cast("long") + secs
            ).cast("timestamp").alias("_ts"),
            F.col(f"`{y}`").cast("double").alias("_yl"),
            F.col(f"`{x}`").cast("double").alias("_xl"),
        )
        d = cur.join(prev, "_ts").dropna()
        s = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("sy"),
            F.sum("_yl").alias("sa"),
            F.sum("_xl").alias("sb"),
            F.sum(F.col("_y") * F.col("_y")).alias("syy"),
            F.sum(F.col("_yl") * F.col("_yl")).alias("saa"),
            F.sum(F.col("_xl") * F.col("_xl")).alias("sbb"),
            F.sum(F.col("_y") * F.col("_yl")).alias("sya"),
            F.sum(F.col("_y") * F.col("_xl")).alias("syb"),
            F.sum(F.col("_yl") * F.col("_xl")).alias("sab"),
        )
        n = F.col("n").cast("double")
        # centered moments
        cya = F.col("sya") - F.col("sy") * F.col("sa") / n
        cyb = F.col("syb") - F.col("sy") * F.col("sb") / n
        caa = F.col("saa") - F.col("sa") * F.col("sa") / n
        cbb = F.col("sbb") - F.col("sb") * F.col("sb") / n
        cab = F.col("sab") - F.col("sa") * F.col("sb") / n
        cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
        sse_r = cyy - F.when(caa > 0, cya * cya / caa).otherwise(F.lit(0.0))
        det = caa * cbb - cab * cab
        b1 = (cya * cbb - cyb * cab) / det
        b2 = (cyb * caa - cya * cab) / det
        sse_u = cyy - (b1 * cya + b2 * cyb)
        f = F.when(
            (det > 0) & (sse_u > 0) & (F.col("n") > 3),
            (sse_r - sse_u) / (sse_u / (n - 3)),
        )
        row = s.select(
            F.lit(x).alias("x"),
            F.lit(y).alias("y"),
            F.col("n"),
            qround(f, 6).alias("f_stat"),
            F.coalesce(f > F.lit(float(critical)), F.lit(False)).alias(
                "granger"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("x", "y")


def pacf(
    df: DataFrame,
    max_lag: int = 4,
    resolution_seconds: int = 3600,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Partial autocorrelation per tag for lags 1..``max_lag`` (<= 4)
    via the Durbin-Levinson recursion UNROLLED into closed-form column
    algebra — the AR-order readout that completes :func:`acf` for
    ARIMA-style triage (ACF tails off + PACF cuts at p => AR(p); the
    pair is the fleet modeler's first diagnostic).

    Uses the classical biased ACF ``r_k = S_k / S_0`` (lag-k
    demeaned cross sums over the lag-0 sum of squares — the textbook
    normalization Durbin-Levinson assumes; the pairwise-complete
    variant in :func:`acf` is the right CORRELATION but the wrong
    RECURSION input). Lags are TIME-keyed range frames like acf, so
    grid gaps contribute nothing instead of mispairing.

    One per-tag ordered window pass builds all lag columns, ONE
    aggregation computes every S_k, and the recursion is pure row
    algebra on the |tags|-row frame — no iteration, no collect.
    Output: ``(tag, lag, pacf)`` ordered.
    """
    if not 1 <= int(max_lag) <= 4:
        raise ValueError("pacf unrolls Durbin-Levinson to max_lag in 1..4")
    res = int(resolution_seconds)
    mean = df.groupBy(F.col(tag_col).alias("tag")).agg(
        F.avg(value_col).alias("_mu")
    )
    out = (
        df.select(
            F.col(tag_col).alias("tag"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .join(mean, "tag")
        .withColumn("_t", F.col("ts").cast("timestamp").cast("long"))
        .withColumn("_d", F.col("_v") - F.col("_mu"))
    )
    for k in range(1, int(max_lag) + 1):
        w = (
            Window.partitionBy("tag")
            .orderBy("_t")
            .rangeBetween(-k * res, -k * res)
        )
        out = out.withColumn(f"_dl{k}", F.last("_d").over(w))
    aggs = [F.sum(F.col("_d") * F.col("_d")).alias("s0")] + [
        F.sum(F.col("_d") * F.col(f"_dl{k}")).alias(f"s{k}")
        for k in range(1, int(max_lag) + 1)
    ]
    wide = out.groupBy("tag").agg(*aggs)
    r = {
        k: F.col(f"s{k}") / F.col("s0") for k in range(1, int(max_lag) + 1)
    }
    phi = {(1, 1): r[1]}
    for k in range(2, int(max_lag) + 1):
        num = r[k]
        den = F.lit(1.0)
        for j in range(1, k):
            num = num - phi[(k - 1, j)] * r[k - j]
            den = den - phi[(k - 1, j)] * r[j]
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    cols = ", ".join(
        f"{k}, pacf{k}" for k in range(1, int(max_lag) + 1)
    )
    named = wide.select(
        "tag",
        *[
            qround(phi[(k, k)], 6).alias(f"pacf{k}")
            for k in range(1, int(max_lag) + 1)
        ],
    )
    return named.select(
        "tag", F.expr(f"stack({int(max_lag)}, {cols}) AS (lag, pacf)")
    ).orderBy("tag", "lag")


def gap_mtbf(
    df: DataFrame,
    resolution_seconds: int = 3600,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sensor UPTIME report per tag: from the regular grid between each
    tag's first and last observation, find the MISSING-bucket runs
    (outages) and report ``n_gaps``, ``down_buckets``,
    ``longest_gap_s``, ``availability`` (present/expected),
    ``mtbf_s`` (mean seconds between outage STARTS — infinite-run
    convention: NULL when < 2 outages) and ``mttr_s`` (mean outage
    length). The MISSING twin of :func:`flatline_runs` (a sensor can
    fail loud — gaps — or fail quiet — flatlines; ops needs both).

    Grid expectation is integer arithmetic on epoch buckets (expected
    = (last - first)/res + 1), outage runs come from one ordered
    window pass over the PRESENT rows only (a gap is a lag-delta > 1
    bucket — no grid materialization, no spans join), so cost is one
    tag-keyed sort over observed rows; output is |tags| rows.
    """
    res = int(resolution_seconds)
    w = Window.partitionBy("tag").orderBy("_b")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(tag_col).alias("tag"),
            F.floor(
                F.col(ts_col).cast("timestamp").cast("double") / res
            ).cast("long").alias("_b"),
        )
        .distinct()
    )
    lagged = base.withColumn("_prev", F.lag("_b").over(w))
    gaps = lagged.filter(
        F.col("_prev").isNotNull() & (F.col("_b") - F.col("_prev") > 1)
    ).select(
        "tag",
        ((F.col("_prev") + 1) * res).alias("_gap_start_s"),
        (F.col("_b") - F.col("_prev") - 1).alias("_len"),
    )
    g = gaps.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("_len").alias("down_buckets"),
        (F.max("_len") * res).alias("longest_gap_s"),
        F.when(
            F.count(F.lit(1)) >= 2,
            (F.max("_gap_start_s") - F.min("_gap_start_s"))
            / (F.count(F.lit(1)) - 1),
        ).alias("mtbf_s"),
        (F.sum("_len") * res / F.count(F.lit(1))).alias("mttr_s"),
    )
    span = base.groupBy("tag").agg(
        F.min("_b").alias("_b0"),
        F.max("_b").alias("_b1"),
        F.count(F.lit(1)).alias("_present"),
    )
    return (
        span.join(g, "tag", "left")
        .select(
            "tag",
            (F.col("_b1") - F.col("_b0") + 1).alias("expected_buckets"),
            F.col("_present").alias("present_buckets"),
            F.coalesce("n_gaps", F.lit(0)).alias("n_gaps"),
            F.coalesce("down_buckets", F.lit(0)).alias("down_buckets"),
            F.coalesce("longest_gap_s", F.lit(0)).alias("longest_gap_s"),
            qround(
                F.col("_present")
                / (F.col("_b1") - F.col("_b0") + 1).cast("double"),
                6,
            ).alias("availability"),
            qround(F.col("mtbf_s"), 6).alias("mtbf_s"),
            qround(F.col("mttr_s"), 6).alias("mttr_s"),
        )
        .orderBy("tag")
    )


def kpss_level(
    df: DataFrame,
    bandwidth: int = 8,
    resolution_seconds: int = 3600,
    critical: float = 0.463,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """KPSS level-stationarity test per tag (Kwiatkowski, Phillips,
    Schmidt & Shin 1992) — the COMPLEMENT of w23_adf: ADF's null is a
    unit root (rejecting says "stationary"), KPSS's null is
    stationarity (rejecting says "unit root/trend"), and the standard
    protocol reads them as a PAIR (both agreeing is evidence; both
    rejecting flags misspecification). Statistic
    ``sum_t S_t^2 / (n^2 * s2_lrv)`` with partial sums ``S_t`` of the
    demeaned series and the Bartlett long-run variance
    ``s2 = (g0 + 2 * sum_j (1 - j/(l+1)) g_j) / n`` at FIXED bandwidth
    ``l`` (stated — a data-driven l would vary the lag-column count
    per tag, which a static plan cannot do; l=8 is the classic
    4*(n/100)^0.25 at n ~ a few thousand).

    One cumulative window + ``bandwidth`` time-keyed range-frame lag
    columns (all sharing the per-tag sort) + one aggregation. Output:
    ``(tag, n, kpss, level_stationary)`` with the 5% critical 0.463.
    """
    res = int(resolution_seconds)
    l = int(bandwidth)
    mean = df.groupBy(F.col(tag_col).alias("tag")).agg(
        F.avg(value_col).alias("_mu")
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(tag_col).alias("tag"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .join(mean, "tag")
        .withColumn("_t", F.col("ts").cast("timestamp").cast("long"))
        .withColumn("_e", F.col("_v") - F.col("_mu"))
    )
    wcum = Window.partitionBy("tag").orderBy("_t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = d.withColumn("_S", F.sum("_e").over(wcum))
    for j in range(1, l + 1):
        w = (
            Window.partitionBy("tag")
            .orderBy("_t")
            .rangeBetween(-j * res, -j * res)
        )
        d = d.withColumn(f"_el{j}", F.last("_e").over(w))
    agg = d.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_S") * F.col("_S")).alias("_eta"),
        F.sum(F.col("_e") * F.col("_e")).alias("_g0"),
        *[
            F.sum(F.col("_e") * F.col(f"_el{j}")).alias(f"_g{j}")
            for j in range(1, l + 1)
        ],
    )
    s2 = F.col("_g0")
    for j in range(1, l + 1):
        s2 = s2 + F.lit(2.0 * (1.0 - j / (l + 1.0))) * F.coalesce(
            F.col(f"_g{j}"), F.lit(0.0)
        )
    nn = F.col("n").cast("double")
    s2 = s2 / nn
    stat = F.when(s2 > 0, F.col("_eta") / (nn * nn * s2))
    return agg.select(
        "tag",
        "n",
        qround(stat, 6).alias("kpss"),
        F.coalesce(stat <= F.lit(float(critical)), F.lit(False)).alias(
            "level_stationary"
        ),
    ).orderBy("tag")


def hac_mean_ci(
    df: DataFrame,
    bandwidth: int = 8,
    resolution_seconds: int = 3600,
    z: float = 1.96,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Autocorrelation-honest mean CI per tag (Newey & West 1987 HAC):
    the naive ``sd/sqrt(n)`` SE assumes independent samples, but a
    resampled sensor series is strongly autocorrelated — the naive CI
    can be several times too narrow and every "mean shifted!" alarm
    built on it over-fires. Long-run variance via the Bartlett kernel
    (the w36_kpss machinery: ``g0 + 2*sum_j (1 - j/(l+1)) g_j`` over
    demeaned lag products, fixed bandwidth ``l``), SE =
    ``sqrt(lrv / n)``, plus the EFFECTIVE SAMPLE SIZE
    ``n_eff = n * g0 / lrv`` — the "how many independent points is
    this series actually worth" number that sizes any downstream test.

    Same plan as kpss_level: one mean join, ``bandwidth`` shared-sort
    lag frames, one aggregation. Output per tag:
    ``(tag, n, mean, se_naive, se_hac, n_eff, ci_lo, ci_hi)``.
    """
    res = int(resolution_seconds)
    l = int(bandwidth)
    mean = df.groupBy(F.col(tag_col).alias("tag")).agg(
        F.avg(value_col).alias("_mu")
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(tag_col).alias("tag"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .join(mean, "tag")
        .withColumn("_t", F.col("ts").cast("timestamp").cast("long"))
        .withColumn("_e", F.col("_v") - F.col("_mu"))
    )
    for j in range(1, l + 1):
        w = (
            Window.partitionBy("tag")
            .orderBy("_t")
            .rangeBetween(-j * res, -j * res)
        )
        d = d.withColumn(f"_el{j}", F.last("_e").over(w))
    agg = d.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("_mu").alias("_m"),
        F.sum(F.col("_e") * F.col("_e")).alias("_g0"),
        *[
            F.sum(F.col("_e") * F.col(f"_el{j}")).alias(f"_g{j}")
            for j in range(1, l + 1)
        ],
    )
    lrv = F.col("_g0")
    for j in range(1, l + 1):
        lrv = lrv + F.lit(2.0 * (1.0 - j / (l + 1.0))) * F.coalesce(
            F.col(f"_g{j}"), F.lit(0.0)
        )
    nn = F.col("n").cast("double")
    lrv = lrv / nn  # long-run variance estimate
    se_naive = F.sqrt((F.col("_g0") / nn) / nn)
    se_hac = F.when(lrv > 0, F.sqrt(lrv / nn))
    n_eff = F.when(lrv > 0, nn * (F.col("_g0") / nn) / lrv)
    zl = F.lit(float(z))
    return agg.select(
        "tag",
        "n",
        qround(F.col("_m"), 6).alias("mean"),
        qround(se_naive, 6).alias("se_naive"),
        qround(se_hac, 6).alias("se_hac"),
        qround(n_eff, 6).alias("n_eff"),
        qround(F.col("_m") - zl * se_hac, 6).alias("ci_lo"),
        qround(F.col("_m") + zl * se_hac, 6).alias("ci_hi"),
    ).orderBy("tag")


def sensor_health(
    df: DataFrame,
    resolution_seconds: int = 3600,
    flatline_min: int = 6,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The FLEET-TRIAGE composition: every per-series health signal this
    module ships, joined into ONE row per tag — availability and
    longest outage (:func:`gap_mtbf`), longest constant run
    (:func:`flatline_runs` at min_len 1), trending-vs-reverting
    (:func:`hurst_exponent`), level stationarity (:func:`kpss_level`)
    — plus a composed ``healthy`` verdict (available, not stuck, not
    wandering off). The one table an operator reads before opening any
    individual chart; the curation_verdict pattern applied to sensors.

    Each branch is the contract-tested operator verbatim; the
    composition is |tags|-row joins on the bounded tag key.

    r11 (guide §5): the four branches each re-derived the upstream
    (typically a resample of the raw event stream) independently —
    four full scans for one input. The input is pinned ONCE
    (|tags| x |buckets| bounded after resampling) and feeds every
    branch.
    """
    df = df.select(
        F.col(tag_col), F.col(ts_col), F.col(value_col)
    ).localCheckpoint()
    gaps = gap_mtbf(
        df, resolution_seconds, tag_col=tag_col, ts_col=ts_col,
        value_col=value_col,
    ).select(
        "tag", "availability", "longest_gap_s", "n_gaps",
        "expected_buckets",
    )
    runs = (
        flatline_runs(
            df, min_len=1, precision=6, tag_col=tag_col, ts_col=ts_col,
            value_col=value_col,
        )
        .groupBy("tag")
        .agg(F.max("run_len").alias("longest_flatline"))
    )
    hu = hurst_exponent(
        df, tag_col=tag_col, ts_col=ts_col, value_col=value_col
    ).select("tag", "hurst")
    kp = kpss_level(
        df, resolution_seconds=resolution_seconds, tag_col=tag_col,
        ts_col=ts_col, value_col=value_col,
    ).select("tag", "kpss", "level_stationary")
    out = (
        gaps.join(runs, "tag", "left")
        .join(hu, "tag", "left")
        .join(kp, "tag", "left")
    )
    healthy = (
        (F.col("availability") >= 0.9)
        & (F.coalesce(F.col("longest_flatline"), F.lit(0)) < flatline_min)
        & F.coalesce(F.col("level_stationary"), F.lit(False))
    )
    return out.select(
        "tag",
        "expected_buckets",
        "availability",
        "longest_gap_s",
        "n_gaps",
        F.coalesce("longest_flatline", F.lit(0)).alias("longest_flatline"),
        "hurst",
        "kpss",
        "level_stationary",
        healthy.alias("healthy"),
    ).orderBy("tag")
