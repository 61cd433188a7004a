"""Visualization-grade downsampling over long ``(tag, ts, value)`` frames.

The reference resamples only by plain aggregates (mean/min/max/count —
gordo-core's ``aggregation_methods``, see SURVEY §2 J1); the two shapes
here are what a dashboard in front of the same sensor fleet actually
draws: OHLC candles (open/high/low/close per bucket) and
largest-triangle-three-buckets point selection (Steinarsson 2013), the
standard "keep the visually important points" reduction.

Scale posture: OHLC is one hash aggregation on the bounded
``(tag, bucket)`` key — map-side combinable, no window, no join. LTTB
is per-tag window algebra plus one bucket-keyed aggregate and one
bucket-keyed join — the per-tag ordered window follows the same
bounded-series-key posture as the ``w*`` smoothing family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from gordo_spark.functions.rounding import qround

__all__ = ["lttb", "resample_ohlc", "sax"]


def resample_ohlc(
    df: DataFrame,
    bucket_seconds: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """OHLC (open/high/low/close) downsample per tag per bucket — the
    candlestick reduction every ts store ships (InfluxQL ``FIRST/LAST/
    MIN/MAX``, TimescaleDB ``candlestick_agg``).

    Open/close are the values at the min/max timestamp in the bucket;
    a timestamp tie resolves to the SMALLER value (lexicographic
    ``min(struct(ts, value))`` — deterministic in every engine, unlike
    ``min_by`` tie-breaks). Output
    ``(tag, bucket_ts, open, high, low, close, n)``.

    Single hash aggregation on the bounded ``(tag, bucket)`` key: no
    window, no sort, no join — partial aggregation does the heavy
    lifting map-side at any scale.
    """
    b = int(bucket_seconds)
    t = F.col(ts_col).cast("timestamp").cast("long")
    d = df.select(
        F.col(tag_col), F.col(value_col), t.alias("_t")
    ).withColumn("_bkt", F.expr(f"_t div {b}"))
    agg = d.groupBy(tag_col, "_bkt").agg(
        F.min(F.struct(F.col("_t"), F.col(value_col).alias("v"))).alias("_o"),
        F.max(F.col(value_col)).alias("high"),
        F.min(F.col(value_col)).alias("low"),
        F.max(F.struct(F.col("_t"), F.col(value_col).alias("v"))).alias("_c"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        tag_col,
        F.timestamp_seconds(F.col("_bkt") * b).alias("bucket_ts"),
        F.col("_o.v").alias("open"),
        "high",
        "low",
        F.col("_c.v").alias("close"),
        "n",
    )


def lttb(
    df: DataFrame,
    n_buckets: int,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    per tag, PARALLEL-ANCHOR variant: classical LTTB anchors each
    bucket's triangle on the point SELECTED from the previous bucket —
    an inherently sequential scan. Here both anchors are bucket
    AVERAGES (previous bucket's mean point on the left, next bucket's
    on the right, exactly the right anchor classical LTTB already
    uses), which removes the sequential dependency so every bucket
    scores independently — the standard trick for distributed LTTB.

    Bucketing matches the original: the first and last points are
    always kept as their own buckets 0 and ``n_buckets - 1``; the
    interior points split into ``n_buckets - 2`` equal-count buckets by
    integer arithmetic (engine-portable, no float boundaries). Within a
    bucket the selected point maximizes the triangle area
    ``|(xl - xr)(y - yl) - (xl - x)(yr - yl)|`` (anchors rounded to 6dp
    first so the argmax is reproducible across engines); ties take the
    earliest timestamp. A tag with ``<= n_buckets`` points passes
    through unreduced. Output ``(tag, ts, value, bucket)``.

    Plan shape: one per-tag ordered window ranks points (bounded series
    key), one ``(tag, bucket)`` aggregate builds anchor means, a lag/
    lead window over the tiny per-bucket frame attaches neighbor
    anchors, one join back on the bounded ``(tag, bucket)`` key, and a
    ``max(struct)`` argmax — no N^2 anything, no driver collect.
    """
    nb = int(n_buckets)
    if nb < 3:
        raise ValueError("n_buckets must be >= 3")
    t = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    wall = Window.partitionBy(tag_col)
    d = (
        df.select(F.col(tag_col), F.col(ts_col), F.col(value_col), t.alias("_t"))
        .withColumn("_i", F.row_number().over(w) - 1)
        .withColumn("_cnt", F.count(F.lit(1)).over(wall))
    )
    # Integer bucket assignment; pass-through tags keep bucket = _i.
    d = d.withColumn(
        "bucket",
        F.when(F.col("_cnt") <= nb, F.col("_i"))
        .when(F.col("_i") == 0, F.lit(0))
        .when(F.col("_i") == F.col("_cnt") - 1, F.lit(nb - 1))
        .otherwise(
            F.lit(1)
            + F.expr(f"((_i - 1) * {nb - 2}) div (_cnt - 2)")
        ),
    )
    keep_all = d.filter(F.col("_cnt") <= nb).select(
        tag_col, ts_col, value_col, F.col("bucket").cast("long").alias("bucket")
    )
    mid = d.filter(F.col("_cnt") > nb)
    anchors = mid.groupBy(tag_col, "bucket").agg(
        qround(F.avg("_t"), 6).alias("_ax"),
        qround(F.avg(value_col), 6).alias("_ay"),
    )
    wb = Window.partitionBy(tag_col).orderBy("bucket")
    anchors = (
        anchors.withColumn("_xl", F.lag("_ax").over(wb))
        .withColumn("_yl", F.lag("_ay").over(wb))
        .withColumn("_xr", F.lead("_ax").over(wb))
        .withColumn("_yr", F.lead("_ay").over(wb))
        .drop("_ax", "_ay")
    )
    scored = mid.join(anchors, [tag_col, "bucket"]).withColumn(
        "_area",
        qround(
            F.abs(
                (F.col("_xl") - F.col("_xr")) * (F.col(value_col) - F.col("_yl"))
                - (F.col("_xl") - F.col("_t")) * (F.col("_yr") - F.col("_yl"))
            ),
            6,
        ),
    )
    # Edge buckets (no left/right anchor) hold exactly one point; give
    # them a null area so max(struct) still selects that single row.
    best = scored.groupBy(tag_col, "bucket").agg(
        F.max(
            F.struct(
                F.coalesce(F.col("_area"), F.lit(0.0)).alias("a"),
                (-F.col("_t")).alias("negt"),
                F.col(value_col).alias("v"),
            )
        ).alias("b")
    )
    picked = best.select(
        tag_col,
        F.timestamp_seconds(-F.col("b.negt")).alias(ts_col),
        F.col("b.v").alias(value_col),
        F.col("bucket").cast("long").alias("bucket"),
    )
    return picked.unionByName(keep_all)


# Gaussian breakpoints for SAX alphabets 3-6 (Lin et al. 2003, table 3).
_SAX_BREAKPOINTS = {
    3: (-0.43, 0.43),
    4: (-0.6745, 0.0, 0.6745),
    5: (-0.84, -0.25, 0.25, 0.84),
    6: (-0.97, -0.43, 0.0, 0.43, 0.97),
}


def sax(
    df: DataFrame,
    word_len: int = 16,
    alphabet: int = 4,
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """SAX symbolization (Symbolic Aggregate approXimation, Lin et al.
    2003): z-normalize each tag's series, reduce it to ``word_len``
    equal-count PAA segments, and bin each segment mean into an
    ``alphabet``-letter symbol via the standard Gaussian breakpoints —
    the shape signature behind whole-series clustering / motif lookup
    ("which sensors traced the same curve this week?").

    Output one row per tag: ``(tag, sax_word, n_points)``; a word like
    ``'aabdd...'`` reads left-to-right in time, 'a' lowest band.

    Segment assignment is INTEGER arithmetic (``(i * word_len) div
    n``, same engine-portable bucketing as :func:`lttb`); segment
    means round to 6dp before binning so the letter boundaries are
    reproducible. Plan: one per-tag ordered window ranks points, the
    per-tag mean/std ride the SAME partition key as window aggregates
    (no join), one ``(tag, segment)`` hash agg, and one ordered
    ``collect_list`` -> ``array_join`` per tag — everything keys on
    the bounded tag/segment space.
    """
    wl = int(word_len)
    if alphabet not in _SAX_BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(_SAX_BREAKPOINTS)}")
    bps = _SAX_BREAKPOINTS[alphabet]
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    wall = Window.partitionBy(tag_col)
    d = (
        df.select(F.col(tag_col), F.col(ts_col), F.col(value_col))
        .withColumn("_i", F.row_number().over(w) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_mu", F.avg(value_col).over(wall))
        .withColumn("_sd", F.stddev_samp(value_col).over(wall))
    )
    z = F.when(F.col("_sd") > 0, (F.col(value_col) - F.col("_mu")) / F.col("_sd")).otherwise(
        F.lit(0.0)
    )
    d = d.withColumn("_z", z).withColumn(
        "_seg", F.expr(f"(_i * {wl}) div _n")
    )
    seg = d.groupBy(tag_col, "_seg", "_n").agg(
        qround(F.avg("_z"), 6).alias("_pm")
    )
    letter = F.lit(chr(ord("a") + len(bps)))
    for j in range(len(bps) - 1, -1, -1):
        letter = F.when(F.col("_pm") <= bps[j], F.lit(chr(ord("a") + j))).otherwise(
            letter
        )
    seg = seg.withColumn("_letter", letter)
    return (
        seg.groupBy(tag_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_seg"), F.col("_letter")))
                    ),
                    lambda s: s["_letter"],
                ),
                "",
            ).alias("sax_word"),
            F.max("_n").alias("n_points"),
        )
    )
