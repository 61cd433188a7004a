"""Range (interval) join and sessionization — event-time operators.

``interval_join`` matches points to intervals WITHOUT the nested-loop
cross product a naive ``ts BETWEEN start AND end`` join plans: both sides
are binned onto a fixed time grid (intervals explode to every bin they
overlap, points to their single bin), the join is an EQUI join on
(keys..., bin), and the exact predicate refines the survivors. Each
(point, interval) pair meets in exactly one bin (the point's), so no
dedup pass is needed. Bin width trades explode volume against bucket
sizes — set it near the median interval length.

``sessionize`` assigns session ids per key from an inactivity gap: a
window lag finds gap-starts, a running sum turns them into ids. Two
window passes over one shuffle on the key — the standard scalable shape
(batch analogue of Structured Streaming's ``session_window``).
"""

from __future__ import annotations

import math

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from gordo_spark.functions.rounding import qround

from gordo_spark.functions.timeutil import epoch_seconds


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: Sequence[str] = (),
    bin_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Attach interval attributes to every point with
    ``start <= point_ts < end`` (and equal ``on`` keys, if given)."""
    keys = list(on)
    b = F.lit(int(bin_seconds))
    ivl = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(start_col) / b),
                F.floor(epoch_seconds(end_col) / b),
            )
        ),
    )
    pts = points.withColumn("_bin", F.floor(epoch_seconds(point_ts) / b))
    cond = (
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    out = pts.join(ivl, on=keys + ["_bin"], how="inner").filter(cond).drop("_bin")
    if how == "inner":
        return out
    raise ValueError(f"interval_join supports how='inner', got {how!r}")


def sessionize(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
    session_col: str = "session_id",
) -> DataFrame:
    """Add a per-key ``session_id`` (0-based) that increments whenever the
    gap since the key's previous event exceeds ``gap_seconds``."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        F.when(prev.isNull(), 0)
        .when(
            epoch_seconds(ts_col) - epoch_seconds(prev) > gap_seconds, 1
        )
        .otherwise(0)
    )
    running = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn(
        session_col, F.sum(is_new).over(running).cast("long")
    )


def session_stats(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
) -> DataFrame:
    """Per-session aggregates: event count and duration seconds."""
    keys = list(key_cols)
    s = sessionize(events, keys, ts_col, gap_seconds)
    return s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            epoch_seconds(F.max(F.col(ts_col)))
            - epoch_seconds(F.min(F.col(ts_col)))
        ).alias("duration_s"),
    )


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel analysis: for each step i, the number of users who
    performed ``steps[0] -> ... -> steps[i]`` IN ORDER — each step
    matched at its EARLIEST time strictly after the user's previous
    step's match (the standard product-analytics funnel; greedy
    first-match is optimal for reachability: matching any later
    occurrence can only shrink the remaining window). Output one row per
    step: (step, event_type, n_users, conversion), conversion relative
    to step 1. With ``max_gap_seconds`` each step must additionally land
    within that many seconds of the previous step's first match —
    FIRST-TOUCH semantics (see _chain_cond; greedy is no longer
    reachability-optimal under a gap constraint, and first-touch is the
    stated, deterministic convention).

    Scale shape — ONE job, no caching: funnel-type events (the ``isin``
    predicate pushes to the source) shuffle once on the user key into a
    per-user event list, then the k-step cascade is k row-local column
    expressions (step-i time = ``array_min`` of step-i events after the
    step-i−1 time; a missing step yields NULL, and NULL comparisons
    propagate so later steps stay NULL — exactly the greedy chain). A
    final keyless aggregate counts reached users per step and explodes
    to k rows. The per-user list holds only that user's FUNNEL-TYPE
    events (two fields each), bounded by individual activity — the same
    per-entity bound every funnel engine assumes; it is not
    corpus-proportional. The round-4 formulation instead ran k
    persist/count/unpersist jobs (one serialized job per step) — correct
    but k× the job overhead and k−1 extra scans.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("ty")
        ).alias("_e"),
    )
    # factories, not inline lambdas with default args: PySpark derives a
    # HOF lambda's arity from its Python signature, so captured values
    # must close over scope rather than ride as extra parameters
    def _first_cond(s):
        return lambda x: x["ty"] == s

    def _chain_cond(s, prev):
        # optional time-constrained funnel ("purchase within 2h of the
        # click"): step i must land within max_gap_seconds of step i-1's
        # FIRST match. These are deliberately FIRST-TOUCH semantics
        # (each window anchors at the earliest previous-step match, the
        # Amplitude-style convention): with a gap constraint, greedy
        # first-match is NOT reachability-optimal (a later click could
        # have rescued an otherwise-expired purchase window) — callers
        # wanting constrained reachability need per-user DP, stated.
        # Epoch arithmetic: engine-portable, no interval types.
        if max_gap_seconds is None:
            return lambda x: (x["ty"] == s) & (x["ts"] > prev)
        return lambda x: (
            (x["ty"] == s)
            & (x["ts"] > prev)
            & (
                epoch_seconds(x["ts"])
                <= epoch_seconds(prev) + float(max_gap_seconds)
            )
        )

    cur = ev.groupBy("_u").agg(F.collect_list("_e").alias("_evs"))
    for i, s in enumerate(steps, start=1):
        if i == 1:
            cond = _first_cond(s)
        else:
            cond = _chain_cond(s, F.col(f"_t{i - 1}"))
        cur = cur.withColumn(
            f"_t{i}",
            F.array_min(
                F.transform(F.filter(F.col("_evs"), cond), lambda x: x["ts"])
            ),
        )
    row = cur.agg(
        *[
            F.count(F.col(f"_t{i}")).alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stepped = row.select(
        F.col("_n1").alias("_base"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step"),
                        F.lit(s).alias("event_type"),
                        F.col(f"_n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps, start=1)
                ]
            )
        ).alias("_s"),
    )
    return stepped.select(
        "_s.step",
        "_s.event_type",
        "_s.n_users",
        qround(
            F.col("_s.n_users") / F.nullif(F.col("_base"), F.lit(0)), 6
        ).alias("conversion"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week
    (their cohort); for every (cohort_week, week_offset) the number of
    cohort users active that week and the retention ratio vs the cohort
    size — the curve behind every retention dashboard.

    Scale shape: one distinct over (user, week) — the only corpus-sized
    shuffle, map-side combined; the cohort assignment is a user-keyed
    min + join (unique keys); the cohort-size join back is keyed by
    calendar week, a GENUINELY bounded dimension (weeks since epoch), so
    its broadcast is safe at any corpus size.
    """
    # week kept as TIMESTAMP (midnight Monday): engine-portable through
    # Arrow/pandas, unlike DATE which pandas round-trips as object
    wk = F.date_trunc("week", F.col(ts_col))
    user_weeks = events.select(
        F.col(user_col).alias("_u"), wk.alias("week")
    ).distinct()
    cohorts = user_weeks.groupBy("_u").agg(F.min("week").alias("cohort_week"))
    active = (
        user_weeks.join(cohorts, "_u")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    sizes = active.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("_size")
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        qround(F.col("n_users") / F.col("_size"), 6).alias("retention"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    for each ordered pair of consecutive events of one user, count
    ``(prev_type, event_type)`` and normalize per source state — the
    behavioral-analytics companion of :func:`funnel_steps` (which checks
    ONE prescribed path; this measures ALL observed paths).

    One user-keyed window shuffle (lag over ``ts, order_col`` — the tie
    key makes the sequence deterministic under same-timestamp events),
    then one aggregation on the (prev, curr) pair whose cardinality is
    bounded by #event-types squared — the output is a model-sized
    matrix regardless of corpus size, and the per-source normalizer
    rides the same result via a window over the tiny aggregate (no
    second scan). Scale: the only data-sized exchange is the per-user
    lag, identical to sessionize's.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        qround(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    )


def concurrency_curve(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
    bucket_seconds: int = 3_600,
) -> DataFrame:
    """Peak-load curve: how many sessions are ACTIVE in each time bucket
    — the capacity-planning aggregate behind "peak concurrent users".
    Sessions come from :func:`sessionize` (gap rule), each session's
    [first event, last event] span explodes to the buckets it overlaps,
    and one map-side-combined count per bucket is the curve.

    Scale: the sweep-line formulation (running sum of +1/-1 deltas)
    needs a GLOBAL time-ordered window — a single-partition scan at any
    scale — so this is deliberately the bin-explode shape instead: the
    fan-out per session is bounded by session duration / bucket (the
    gap rule bounds sessions), and the only shuffles are the session
    window's key exchange and the bucket-keyed count. Output is
    (bucket_ts, n_active) with n_active = sessions overlapping the
    bucket.
    """
    keys = list(key_cols)
    s = sessionize(events, keys, ts_col, gap_seconds)
    spans = s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("_s0"), F.max(ts_col).alias("_s1")
    )
    b = F.lit(int(bucket_seconds))
    b0 = F.floor(epoch_seconds("_s0") / b)
    b1 = F.floor(epoch_seconds("_s1") / b)
    return (
        spans.select(F.explode(F.sequence(b0, b1)).alias("_bucket"))
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.timestamp_seconds(F.col("_bucket") * b).alias("bucket_ts"),
            "n_active",
        )
    )


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    depth: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Most-travelled event-type k-grams across per-user streams — the
    depth-k generalization of :func:`event_transitions` (depth=2): for
    every window of ``depth`` consecutive events of one user, count the
    joined ``path`` string. Output ``(path, n)``.

    One user-keyed window shuffle (lead over ``ts, order_col`` — the
    tie key makes same-timestamp sequences deterministic) materializes
    all depth-1 lookaheads in a single pass, then one map-side-combined
    count on the path key, whose cardinality is bounded by
    #event-types^depth — model-sized output regardless of corpus size.
    """
    if depth < 2:
        raise ValueError("depth must be >= 2")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, depth)
    ]
    d = events.select(
        F.concat_ws(sep, *steps).alias("path"), steps[-1].alias("_last")
    )
    return (
        d.filter(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch marketing attribution: every
    ``conversion_type`` event is credited to the FIRST and to the LAST
    preceding ``touch_types`` event of the same user (the two classic
    single-touch models). Conversions with no preceding touch credit
    ``'none'``. Output one row per touch channel (plus ``'none'``):
    ``(touch, n_first_touch, n_last_touch)``.

    One user-keyed shuffle and ONE scan: both credits come from a
    single ordered window pass (``first/last(touch, ignoreNulls)`` over
    the strictly preceding frame, totally ordered by ``(ts, event_id)``
    so same-ts rows break ties identically in any engine); each
    conversion then explodes to its two (model, channel) credit rows so
    a SINGLE bounded hash aggregation produces both columns — a
    per-model aggregate pair would re-derive the window lineage twice
    (the scan-multiplication trap).
    """
    t = F.col(ts_col).cast("timestamp").cast("long")
    touch = F.when(
        F.col(type_col).isin(*[str(x) for x in touch_types]), F.col(type_col)
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(t.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = events.select(
        F.col(user_col),
        F.col(type_col),
        F.first(touch, ignorenulls=True).over(w).alias("_ft"),
        F.last(touch, ignorenulls=True).over(w).alias("_lt"),
    ).filter(F.col(type_col) == conversion_type)
    credits = d.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first").alias("m"),
                    F.coalesce("_ft", F.lit("none")).alias("touch"),
                ),
                F.struct(
                    F.lit("last").alias("m"),
                    F.coalesce("_lt", F.lit("none")).alias("touch"),
                ),
            )
        ).alias("p")
    )
    return credits.groupBy(F.col("p.touch").alias("touch")).agg(
        F.sum(F.when(F.col("p.m") == "first", 1).otherwise(0)).alias(
            "n_first_touch"
        ),
        F.sum(F.when(F.col("p.m") == "last", 1).otherwise(0)).alias(
            "n_last_touch"
        ),
    )


def conversion_lag(
    events: DataFrame,
    from_type: str,
    to_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: for each user, the lag from their
    FIRST ``from_type`` event to their first ``to_type`` event at or
    after it; one summary row of exact percentiles
    ``(n_converted, n_started, p25_s, p50_s, p75_s, p90_s, mean_s)``.

    One user-keyed hash aggregation computes both firsts with
    conditional ``min``s (the "first purchase after first signup" is a
    second conditional aggregation over the same key — still one
    shuffle via two chained aggs on the SAME key, which AQE plans
    without a second exchange), then a 1-row exact-percentile
    aggregate. No windows, no joins.
    """
    t = F.col(ts_col).cast("timestamp").cast("long")
    per = events.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == from_type, t)).alias("_t0"),
    )
    after = (
        events.select(F.col(user_col), F.col(type_col), t.alias("_t"))
        .join(per, user_col)
        .filter(
            (F.col(type_col) == to_type)
            & F.col("_t0").isNotNull()
            & (F.col("_t") >= F.col("_t0"))
        )
        .groupBy(user_col, "_t0")
        .agg(F.min("_t").alias("_t1"))
    )
    lags = after.select((F.col("_t1") - F.col("_t0")).alias("_lag"))
    # n_started derives from the per-user aggregate already built — a
    # third scan of the event stream would be the scan-multiplication
    # trap for a single scalar
    started = per.agg(F.count("_t0").alias("n_started"))
    summary = lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile(_lag, 0.25)").alias("p25_s"),
        F.expr("percentile(_lag, 0.5)").alias("p50_s"),
        F.expr("percentile(_lag, 0.75)").alias("p75_s"),
        F.expr("percentile(_lag, 0.9)").alias("p90_s"),
        qround(F.avg("_lag"), 6).alias("mean_s"),
    )
    return summary.crossJoin(F.broadcast(started)).select(
        "n_converted",
        "n_started",
        qround("p25_s", 6).alias("p25_s"),
        qround("p50_s", 6).alias("p50_s"),
        qround("p75_s", 6).alias("p75_s"),
        qround("p90_s", 6).alias("p90_s"),
        "mean_s",
    )


def markov_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    iterations: int = 10,
) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2014) —
    the multi-touch model that credits each channel by how much the
    conversion probability DROPS when the channel is removed from the
    journey graph, instead of first/last-touch's winner-take-all.

    Journey model (stated, deterministic): per user, the ordered
    ``touch_types`` events STRICTLY BEFORE the first conversion (or all
    touches for non-converters), as a path ``start -> t1 -> ... -> tk
    -> conv|null``; converters with zero touches contribute
    ``start -> conv``. Transition probabilities are row-normalized
    counts; ``conv``/``null`` absorb (self-loop 1). The absorption
    probability is evaluated by a FIXED ``iterations``-step power walk
    from ``start`` — fixed, not run-to-convergence, so the identical
    arithmetic unrolls as CTEs on any engine (the pagerank/k_core
    discipline). Removing channel ``c`` redirects every transition
    INTO ``c`` to ``null``.

    Scale shape: one user-keyed window pass builds transitions (the
    same single-scan shape as :func:`attribution`); the probability
    table is (channels+3)^2-BOUNDED by construction, so it collects to
    the driver (the centroid/codebook bounded-collect precedent) and
    the |channels|+1 fixed-step walks run as numpy matrix algebra —
    running them as Spark joins would schedule ~(channels+1) x
    iterations jobs over a <= 64-row frame, pure scheduler overhead
    (measured 17.9 -> ~2 s on the sf0.01 contract). Output one row per
    channel: ``(channel, p_base, p_without, removal_effect,
    attribution)`` where attribution normalizes the effects to sum
    to 1.
    """
    spark = events.sparkSession
    touches = [str(x) for x in touch_types]
    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_cts"))
    )
    t = (
        events.filter(F.col(type_col).isin(*touches))
        .join(conv, user_col, "left")
        .filter(F.col("_cts").isNull() | (F.col(ts_col) < F.col("_cts")))
        .select(user_col, ts_col, id_col, F.col(type_col).alias("_cur"))
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    wdesc = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    seq = t.select(
        F.col(user_col),
        "_cur",
        F.lag("_cur").over(w).alias("_prev"),
        F.row_number().over(wdesc).alias("_rn"),
    )
    steps = seq.select(
        F.coalesce("_prev", F.lit("start")).alias("src"),
        F.col("_cur").alias("dst"),
    )
    ends = (
        seq.filter(F.col("_rn") == 1)
        .join(conv.select(user_col, F.lit(True).alias("_cv")), user_col, "left")
        .select(
            F.col("_cur").alias("src"),
            F.when(F.col("_cv"), F.lit("conv")).otherwise("null").alias("dst"),
        )
    )
    no_touch = (
        conv.join(t.select(user_col).distinct(), user_col, "left_anti")
        .select(F.lit("start").alias("src"), F.lit("conv").alias("dst"))
    )
    cnt = (
        steps.unionByName(ends)
        .unionByName(no_touch)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = cnt.groupBy("src").agg(F.sum("_n").alias("_t"))
    prob_rows = (
        cnt.join(tot, "src")
        .select("src", "dst", (F.col("_n") / F.col("_t")).alias("pr"))
        .collect()
    )  # bounded: at most (|channels| + 3)^2 rows by construction
    import numpy as np

    states = sorted(
        {r["src"] for r in prob_rows}
        | {r["dst"] for r in prob_rows}
        | {"start", "conv", "null"}
    )
    idx = {s: i for i, s in enumerate(states)}
    n_s = len(states)

    def walk(redirect: str | None) -> float:
        P = np.zeros((n_s, n_s))
        P[idx["conv"], idx["conv"]] = 1.0
        P[idx["null"], idx["null"]] = 1.0
        for r in prob_rows:
            dst = r["dst"]
            if redirect is not None and dst == redirect:
                dst = "null"
            P[idx[r["src"]], idx[dst]] += r["pr"]
        v = np.zeros(n_s)
        v[idx["start"]] = 1.0
        for _ in range(int(iterations)):
            v = v @ P
        return float(v[idx["conv"]])

    p_base = walk(None)
    if p_base == 0.0:
        # degenerate input: no journey converts within the fixed walk
        # (no conversions at all, or every converting path longer than
        # `iterations` steps) — removal effects are undefined, so emit
        # NULL effect/attribution rows (the total_eff == 0 convention)
        # instead of a driver-side ZeroDivisionError
        rows = [(c, 0.0, None, None, None) for c in sorted(touches)]
        return spark.createDataFrame(
            rows,
            "channel string, p_base double, p_without double, "
            "removal_effect double, attribution double",
        )
    p_without = {c: walk(c) for c in touches}
    effects = {c: 1.0 - p_without[c] / p_base for c in touches}
    total_eff = sum(effects.values())
    # floor-quantizer (functions/rounding.qround mirror): builtin round()
    # is half-even and would diverge from the SQL oracle at .5e-6 ties
    _q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    rows = [
        (
            c,
            _q6(p_base),
            _q6(p_without[c]),
            _q6(effects[c]),
            _q6(effects[c] / total_eff) if total_eff else None,
        )
        for c in sorted(touches)
    ]
    return spark.createDataFrame(
        rows,
        "channel string, p_base double, p_without double, "
        "removal_effect double, attribution double",
    )


def burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_events: int = 5,
) -> DataFrame:
    """Per-actor inter-arrival burstiness — the temporal bot/automation
    screen (Goh & Barabasi 2008): ``B = (sigma - mu) / (sigma + mu)``
    over the actor's inter-event gaps. Human activity is bursty
    (B > 0: long silences, dense flurries); schedulers and scripts are
    periodic (B -> -1: near-constant gaps); Poisson traffic sits near
    0. The metric the volume-based screens (ingest_health, key skew)
    cannot see: a bot with HUMAN volume still has machine timing.

    One user-partitioned lag window (bounded by per-actor event count)
    computes gaps; one map-side-combinable aggregation computes the
    per-actor moments. Actors with fewer than ``min_events`` events
    are excluded (a 2-gap sigma is noise, stated). Output per actor:
    ``(user, n_events, mean_gap_s, cv, burstiness)`` rounded to 6;
    sigma uses the population convention (engine-portable).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gaps = (
        events.select(
            F.col(user_col),
            (
                epoch_seconds(F.col(ts_col))
                - F.lag(epoch_seconds(F.col(ts_col))).over(w)
            ).alias("_gap"),
        )
        .filter(F.col("_gap").isNotNull())
    )
    per = gaps.groupBy(user_col).agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.avg("_gap").alias("_mu"),
        F.coalesce(F.stddev_pop("_gap"), F.lit(0.0)).alias("_sd"),
    )
    mu, sd = F.col("_mu"), F.col("_sd")
    return (
        per.filter(F.col("n_events") >= int(min_events))
        .select(
            user_col,
            "n_events",
            qround(mu, 6).alias("mean_gap_s"),
            qround(F.when(mu > 0, sd / mu), 6).alias("cv"),
            qround(
                F.when((sd + mu) > 0, (sd - mu) / (sd + mu)), 6
            ).alias("burstiness"),
        )
    )


def merge_intervals(
    intervals: DataFrame,
    key_cols: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key (gaps-and-islands)
    — the alert-fatigue reducer for anomaly interval streams: the W7
    anomaly frames emit one ``[start, end)`` row per flagged bucket, and
    a sustained incident should page ONCE, not per bucket. Two intervals
    merge iff the later one starts at or before the running maximum end
    of everything earlier (touching counts: ``[0,2)+[2,4) -> [0,4)``).

    Classic two-window shape on one key-partitioned shuffle (the
    sessionize discipline): a running max of ``end`` over earlier rows
    detects island starts, a running sum of the start flags numbers the
    islands, one aggregation emits ``(key..., island, start, end,
    n_merged)``. No self-joins, no collect.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    islands = intervals.select(
        *keys,
        F.col(start_col),
        F.col(end_col),
        F.sum(is_new).over(wrun).alias("island"),
    )
    return islands.groupBy(*keys, "island").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).alias("n_merged"),
    )


def position_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped) attribution — the multi-touch model
    between :func:`attribution`'s single-touch extremes and
    markov_attribution's model-based one: every conversion splits its
    credit 40% first touch / 40% last touch / 20% shared equally by
    the middles (1 touch -> 100%, 2 touches -> 50/50, 0 -> 'none',
    all stated — the standard U-shape conventions).

    One user-keyed ordered window collects each conversion's preceding
    touch LIST (frame order = (ts, id), engine-total), the list
    explodes to per-(conversion, touch) credit rows — the credit space
    itself, nothing quadratic beyond it — and credits are QUANTIZED to
    1e-9 before summing (stated): per-channel sums then run over exact
    integers, so the 6dp readout cannot be flipped by summation order
    (the mann_whitney doubled-rank discipline). Output per channel:
    ``(touch, credit, n_touched)`` with credit totals = conversions.
    """
    t = F.col(ts_col).cast("timestamp").cast("long")
    touch = F.when(
        F.col(type_col).isin(*[str(x) for x in touch_types]), F.col(type_col)
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(t.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = events.select(
        F.col(type_col),
        F.collect_list(touch).over(w).alias("_touches"),
    ).filter(F.col(type_col) == conversion_type)
    n = F.size("_touches")
    padded = conv.select(
        F.when(n == 0, F.array(F.lit("none")))
        .otherwise(F.col("_touches"))
        .alias("_touches"),
        n.alias("_n"),
    )
    ex = padded.select(
        "_n", F.posexplode("_touches").alias("_pos", "touch")
    )
    credit = (
        F.when(F.col("_n") <= 1, F.lit(1.0))  # 0 -> 'none', 1 -> solo
        .when(
            (F.col("_pos") == 0) | (F.col("_pos") == F.col("_n") - 1),
            F.when(F.col("_n") == 2, F.lit(0.5)).otherwise(F.lit(0.4)),
        )
        .otherwise(0.2 / (F.col("_n") - 2))
    )
    ci = qround(credit * 1e9, 0).cast("long")
    return (
        ex.groupBy("touch")
        .agg(
            qround(F.sum(ci) / F.lit(1e9), 6).alias("credit"),
            F.count(F.lit(1)).alias("n_touched"),
        )
        .orderBy("touch")
    )


def stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU/WAU/MAU engagement curve: for every active day, the distinct
    users active that day / in the trailing 7 days / in the trailing
    28 days, plus the DAU/MAU stickiness ratio — the standard
    product-health readout events_retention's cohort matrix does not
    give. Windows TRUNCATE at history start (stated — the first week's
    WAU is a partial window, as every dashboard actually computes it).

    Shape: activity collapses to distinct (user, day) FIRST (the only
    corpus-sized aggregation), then each activity day EXPLODES into the
    <= 28 calendar dates it supports (``sequence(d, d+27)``) and lands
    on the spine via an EQUI-join — compute is strictly |activity| x 28.
    (A ``spine.d - 27 <= _d <= spine.d`` predicate instead would plan as
    BroadcastNestedLoopJoin: every activity row compared against EVERY
    spine day, |activity| x |all active days| — thousands of predicate
    evaluations per row over multi-year history.) One spine-keyed
    aggregate then counts conditional distincts for all three horizons
    at once. Output per day: ``(d, dau, wau, mau, stickiness)``.
    """
    act = (
        events.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.col(ts_col)).alias("_d"),
        )
        .filter(F.col("_u").isNotNull() & F.col("_d").isNotNull())
        .distinct()
    )
    spine = act.select(F.col("_d").alias("d")).distinct()
    # explode each activity day into the <= 28 spine dates it supports,
    # then equi-join; the spine side is CALENDAR-bounded so the hint is
    # genuinely safe, and the hash join replaces the nested-loop scan
    ex = act.select(
        "_u",
        "_d",
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), 27))
        ).alias("d"),
    )
    joined = ex.join(F.broadcast(spine), "d")
    diff = F.datediff(F.col("d"), F.col("_d"))
    out = joined.groupBy("d").agg(
        F.countDistinct(F.when(diff < 1, F.col("_u"))).alias("dau"),
        F.countDistinct(F.when(diff < 7, F.col("_u"))).alias("wau"),
        F.countDistinct(F.col("_u")).alias("mau"),
    )
    return out.select(
        # date -> timestamp for transport-stable typing (dates round-trip
        # as objects through Arrow/pandas; timestamps stay datetime64)
        F.col("d").cast("timestamp").alias("d"),
        "dau",
        "wau",
        "mau",
        qround(
            F.when(F.col("mau") > 0, F.col("dau") / F.col("mau")), 6
        ).alias("stickiness"),
    ).orderBy("d")
