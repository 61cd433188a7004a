"""Declarative data-quality constraints over a DataFrame (deequ-style).

A 100 TB pipeline gates every ingest/export on a constraint suite: null
checks, ranges, accepted value sets, key uniqueness, referential
integrity. This module evaluates a suite and returns ONE summary row per
check — (check, n_rows, n_violations, passed) — never row-level dumps
(at scale the violation LIST is itself a dataset; counts gate, samples
debug).

Scale shape: every row-local predicate (not_null / in_range / in_set)
folds into a SINGLE aggregation pass over one scan — adding a check
adds a counter, not a job. ``unique`` adds one map-side-combined
groupBy on its key; ``foreign_key`` adds one left-anti join per
referenced table (broadcast when the reference is a dim). Beyond the
reference surface (gordo validates configs, not data) — this is the
engine-generality extension family.

Check specs (dicts, YAML-friendly):

    {"check": "not_null",    "col": "l_shipdate"}
    {"check": "in_range",    "col": "l_quantity", "min": 1, "max": 50}
    {"check": "in_set",      "col": "l_returnflag", "values": ["A","N","R"]}
    {"check": "unique",      "cols": ["l_orderkey", "l_linenumber"]}
    {"check": "foreign_key", "col": "l_orderkey", "ref": orders_df,
     "ref_col": "o_orderkey"}
    {"check": "expression",  "name": "disc<=price",
     "expr": "l_discount <= l_extendedprice"}

NULL semantics (a deliberate DEVIATION from deequ, which separates
completeness from range/set compliance — here a suite is a GATE, and a
gate that passes NULL values through an in_range check has not checked
them):

    check        NULL in checked col counts as...
    -----------  ------------------------------------------------------
    not_null     violation (that is the check)
    in_range     VIOLATION — a NULL is not known to be in range; add an
                 explicit not_null check only if you want the two
                 failure modes counted separately (deequ-style)
    in_set       VIOLATION — same rationale as in_range
    expression   violation whenever the expression is not TRUE —
                 explicitly ``NOT coalesce(expr, FALSE)``, so a
                 NULL-valued predicate (three-valued logic over nullable
                 inputs) counts as a violation rather than silently
                 dropping out of the sum
    unique       NULL keys group together: >1 NULL-keyed rows = dupes
                 (SQL GROUP BY treats NULLs as one group)
    foreign_key  NULL fk is SKIPPED (not an orphan) — referential
                 integrity is about wrong references, not missing ones;
                 pair with not_null for mandatory references
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from gordo_spark.functions.rounding import qround


def _q(c: str):
    return F.col(f"`{c}`")


def check_constraints(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate a constraint suite; one summary row per check, in suite
    order (``check_id`` preserves it through any shuffle)."""
    if not checks:
        raise ValueError("check_constraints needs at least one check")
    spark = df.sparkSession
    row_local: list[tuple[int, str, "F.Column"]] = []
    extra_frames: list[DataFrame] = []

    for i, spec in enumerate(checks):
        kind = spec["check"]
        if kind == "not_null":
            name = f"not_null({spec['col']})"
            row_local.append((i, name, _q(spec["col"]).isNull()))
        elif kind == "in_range":
            c = _q(spec["col"])
            name = f"in_range({spec['col']},{spec['min']},{spec['max']})"
            bad = c.isNull() | (c < F.lit(spec["min"])) | (c > F.lit(spec["max"]))
            row_local.append((i, name, bad))
        elif kind == "in_set":
            c = _q(spec["col"])
            name = f"in_set({spec['col']})"
            row_local.append((i, name, c.isNull() | ~c.isin(list(spec["values"]))))
        elif kind == "expression":
            name = spec.get("name", spec["expr"])
            # violation = NOT coalesce(expr, FALSE): a NULL-valued
            # predicate counts as a violation (gate posture; see module
            # docstring) instead of silently dropping out of the sum
            row_local.append(
                (i, name, ~F.coalesce(F.expr(spec["expr"]), F.lit(False)))
            )
        elif kind == "unique":
            cols = list(spec["cols"])
            name = f"unique({','.join(cols)})"
            dup_rows = (
                df.groupBy(*[_q(c) for c in cols])
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n_violations"))
                .select(
                    F.lit(i).alias("check_id"),
                    F.lit(name).alias("check"),
                    F.col("n_violations").cast("long"),
                )
            )
            extra_frames.append(dup_rows)
        elif kind == "foreign_key":
            name = f"foreign_key({spec['col']}->{spec['ref_col']})"
            ref = spec["ref"].select(_q(spec["ref_col"]).alias(spec["col"])).distinct()
            orphans = (
                df.select(_q(spec["col"]).alias(spec["col"]))
                .filter(_q(spec["col"]).isNotNull())
                .join(ref, spec["col"], "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(
                    F.lit(i).alias("check_id"),
                    F.lit(name).alias("check"),
                    F.col("n_violations").cast("long"),
                )
            )
            extra_frames.append(orphans)
        else:
            raise ValueError(f"unknown check kind {kind!r}")

    frames = []
    if row_local:
        # ALL row-local checks in ONE aggregation over one scan
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(bad.cast("long")).alias(f"_v{i}") for i, _, bad in row_local
        ]
        row = df.agg(*aggs)
        stacked = row.selectExpr(
            "_total",
            "stack({n}, {pairs}) AS (check_id, n_violations)".format(
                n=len(row_local),
                pairs=", ".join(f"{i}, coalesce(_v{i}, 0)" for i, _, _ in row_local),
            ),
        )
        names = spark.createDataFrame(
            [(i, name) for i, name, _ in row_local], "check_id int, check string"
        )
        frames.append(
            stacked.join(F.broadcast(names), "check_id").select(
                "check_id", "check", F.col("n_violations").cast("long")
            )
        )
    frames.extend(extra_frames)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "check_id",
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_id")


def reconcile_totals(
    parent: DataFrame,
    child: DataFrame,
    key: str,
    parent_amount: str,
    child_amount,
    rel_tol: float = 1e-6,
) -> DataFrame:
    """Cross-table aggregate reconciliation — the audit
    :func:`check_constraints` cannot express (its checks are row-local
    or single-table): per parent key, the STORED total vs the total
    recomputed from child rows, classified into matched / mismatched /
    orphan buckets. The first query a warehouse migration runs
    ("does the fact table still sum to the ledger?").

    ``child_amount`` is a Column expression evaluated per child row
    (e.g. ``extendedprice * (1 - discount) * (1 + tax)``). A parent is
    ``matched`` when ``|stored - recomputed| <= rel_tol * |stored|``.
    Parents with no child rows and child groups with no parent are
    counted separately (both directions of referential drift), never
    silently dropped — the psi_drift sentinel discipline applied to
    reconciliation.

    Plan: one map-side-combinable child aggregation on the key, one
    full-outer equi-join against the parent projection, one global
    aggregate — no windows, no skew beyond the key itself. Output one
    row: ``(n_parents, n_matched, n_mismatched, n_childless_parents,
    n_orphan_child_groups, max_rel_err)``.
    """
    child_sums = child.groupBy(F.col(key)).agg(
        F.sum(child_amount).alias("_recomputed")
    )
    p = parent.select(F.col(key), F.col(parent_amount).alias("_stored"))
    j = p.join(child_sums, key, "full")
    has_both = F.col("_stored").isNotNull() & F.col("_recomputed").isNotNull()
    diff = F.abs(F.col("_stored") - F.col("_recomputed"))
    # division-free form: |s - r| <= tol * |s| classifies a zero stored
    # total as matched iff recomputed is also (exactly) zero, where the
    # ratio form's 0/0 -> NULL would silently drop the parent from BOTH
    # buckets (Spark division is non-ANSI; buckets must sum to n_parents)
    matched = has_both & (diff <= F.lit(float(rel_tol)) * F.abs("_stored"))
    # max_rel_err is reported over parents with a nonzero stored total
    # (plus exact zero-zero matches as 0.0); a zero-stored mismatch has
    # no finite relative error — it is counted in n_mismatched instead
    rel_err = F.when(F.abs("_stored") > 0, diff / F.abs("_stored")).when(
        has_both & (diff == 0), F.lit(0.0)
    )
    return j.agg(
        F.sum(F.col("_stored").isNotNull().cast("long")).alias("n_parents"),
        F.sum(matched.cast("long")).alias("n_matched"),
        F.sum((has_both & ~matched).cast("long")).alias("n_mismatched"),
        F.sum(
            (F.col("_stored").isNotNull() & F.col("_recomputed").isNull())
            .cast("long")
        ).alias("n_childless_parents"),
        F.sum(
            (F.col("_stored").isNull() & F.col("_recomputed").isNotNull())
            .cast("long")
        ).alias("n_orphan_child_groups"),
        qround(F.max(F.when(has_both, rel_err)), 6).alias("max_rel_err"),
    )


def rowlocal_violation_flags(checks: list[dict]) -> dict[str, "F.Column"]:
    """The row-local subset (not_null / in_range / in_set / expression)
    as named boolean violation columns — reusable on batch or stream."""
    flags: dict[str, F.Column] = {}
    for spec in checks:
        kind = spec["check"]
        if kind == "not_null":
            flags[f"not_null({spec['col']})"] = _q(spec["col"]).isNull()
        elif kind == "in_range":
            c = _q(spec["col"])
            flags[f"in_range({spec['col']},{spec['min']},{spec['max']})"] = (
                c.isNull() | (c < F.lit(spec["min"])) | (c > F.lit(spec["max"]))
            )
        elif kind == "in_set":
            c = _q(spec["col"])
            flags[f"in_set({spec['col']})"] = c.isNull() | ~c.isin(
                list(spec["values"])
            )
        elif kind == "expression":
            flags[spec.get("name", spec["expr"])] = ~F.expr(spec["expr"])
        else:
            raise ValueError(
                f"check kind {kind!r} is not row-local (stream gate takes "
                "not_null/in_range/in_set/expression only)"
            )
    return flags


def stream_constraint_counts(
    stream: DataFrame,
    checks: list[dict],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window violation counts for the row-local constraint subset —
    the ingest-quality dashboard feed: a sudden violation spike on one
    window is a producer regression caught at the door. One watermarked
    windowed aggregation; state = open windows x |checks| counters.
    Works identically on a batch frame (stream==batch contract in
    tests/test_streaming.py)."""
    flags = rowlocal_violation_flags(checks)
    frame = stream
    if frame.isStreaming:
        frame = frame.withWatermark(ts_col, watermark)
    return (
        frame.groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(bad.cast("long")).alias(name)
                for name, bad in flags.items()
            ],
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_rows",
            *[_q(name) for name in flags],
        )
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every row
    must share its quasi-identifier tuple with at least ``k-1`` others,
    or it is re-identifiable by joining those columns against an
    external dataset (Sweeney 2002). The release gate that belongs
    beside ``pii_scrub`` (column-level redaction) and ``forget_keys``
    (row-level erasure): scrubbing direct identifiers is not enough
    when the quasi-identifier combination is unique.

    NULL quasi-values group together (SQL GROUP BY semantics — a NULL
    zip code is itself a distinguishing value, stated rather than
    hidden). One map-side-combinable aggregation on the quasi tuple +
    one bounded summary aggregate. Output one row: ``(n_rows,
    n_groups, min_group_size, n_violating_groups, n_rows_at_risk,
    anonymous)`` — ``anonymous`` iff every group reaches ``k``.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity needs non-empty quasi_cols")
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    viol = F.col("_n") < int(k)
    return g.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_n").alias("min_group_size"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("_n")).otherwise(0)).alias("n_rows_at_risk"),
    ).select(
        "n_rows",
        "n_groups",
        "min_group_size",
        "n_violating_groups",
        "n_rows_at_risk",
        (F.col("n_violating_groups") == 0).alias("anonymous"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two boolean judgments over the same rows —
    chance-corrected agreement (Cohen 1960), the standard QA readout
    for "do two curation filters / annotators / model versions agree
    beyond what their base rates force?". Raw agreement is inflated
    when both judges say 'keep' 95% of the time; kappa subtracts that.

    ``kappa = (p_o - p_e) / (1 - p_e)`` with ``p_o`` the observed
    agreement rate and ``p_e = p_a1*p_b1 + p_a0*p_b0`` the chance rate
    from the marginals. One map-side-combinable aggregation, one row
    out: ``(n, p_o, p_e, kappa)``; kappa is NULL when ``p_e = 1``
    (both judges constant — agreement is undefined, not perfect).
    Rows where either judgment is NULL are excluded from all terms.
    """
    a = F.col(col_a).cast("int")
    b = F.col(col_b).cast("int")
    both = F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    one = df.agg(
        F.sum(both.cast("long")).alias("n"),
        F.sum(F.when(both & (a == b), 1).otherwise(0)).alias("_agree"),
        F.sum(F.when(both, a)).alias("_a1"),
        F.sum(F.when(both, b)).alias("_b1"),
    )
    n = F.col("n").cast("double")
    po = F.col("_agree") / n
    pa1, pb1 = F.col("_a1") / n, F.col("_b1") / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    return one.select(
        "n",
        qround(po, 6).alias("p_o"),
        qround(pe, 6).alias("p_e"),
        qround(
            F.when(pe < 1.0, (po - pe) / (1.0 - pe)), 6
        ).alias("kappa"),
    )


def ingest_health(
    df: DataFrame,
    ts_col: str,
    trailing_days: int = 7,
    low_factor: float = 0.5,
) -> DataFrame:
    """Per-day ingest-volume health over an event-time column — the
    freshness/completeness audit a pipeline runs on every landed
    partition: row count per calendar day (MISSING days materialize as
    0-count rows via a calendar spine, never silently absent), the
    trailing ``trailing_days`` median, and a status verdict
    (``missing`` / ``low`` when count < ``low_factor`` * median /
    ``warmup`` while no trailing history exists / ``ok``).

    Shape: one map-side-combinable day aggregation of the corpus, a
    1-row min/max bounds scalar, a row-local ``sequence()`` calendar
    spine left-joined to the counts, and the trailing median as a
    window over the CALENDAR grid (days in range — bounded by the time
    span, never event volume). Output ``(day, n_rows, trailing_median,
    ratio, status)``.
    """
    days = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    bounds = days.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
    )
    grid = spine.join(days, "day", "left").select(
        "day", F.coalesce("n_rows", F.lit(0)).alias("n_rows")
    )
    w = Window.orderBy("day").rowsBetween(-int(trailing_days), -1)
    med = F.expr("percentile(n_rows, 0.5)").over(w)
    ratio = F.when(med > 0, F.col("n_rows") / med)
    return (
        grid.withColumn("trailing_median", qround(med, 1))
        .select(
            "day",
            "n_rows",
            "trailing_median",
            qround(ratio, 6).alias("ratio"),
            F.when(F.col("n_rows") == 0, F.lit("missing"))
            .when(F.col("trailing_median").isNull(), F.lit("warmup"))
            .when(
                F.col("n_rows")
                < F.lit(float(low_factor)) * F.col("trailing_median"),
                F.lit("low"),
            )
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
        .orderBy("day")
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — the companion :func:`k_anonymity` cannot
    replace (Machanavajjhala et al. 2007): a quasi-identifier group can
    be large (k-anonymous) yet hold ONE sensitive value, so joining the
    quasi columns still discloses the attribute (homogeneity attack).
    Every group must carry at least ``l`` DISTINCT sensitive values.

    One aggregation on the quasi tuple with ``count_distinct`` of the
    sensitive column (NULL sensitive values do not count toward
    diversity — an absent attribute discloses nothing and protects
    nothing), one bounded summary. Output one row: ``(n_rows, n_groups,
    min_distinct_sensitive, n_violating_groups, n_rows_at_risk,
    diverse)``.
    """
    if not quasi_cols:
        raise ValueError("l_diversity needs non-empty quasi_cols")
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(F.col(sensitive_col)).alias("_d"),
    )
    viol = F.col("_d") < int(l)
    return g.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_d").alias("min_distinct_sensitive"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("_n")).otherwise(0)).alias("n_rows_at_risk"),
    ).select(
        "n_rows",
        "n_groups",
        "min_distinct_sensitive",
        "n_violating_groups",
        "n_rows_at_risk",
        (F.col("n_violating_groups") == 0).alias("diverse"),
    )


def k_generalize(
    df: DataFrame,
    col: str,
    k: int = 5,
    ladder: tuple[float, ...] = (1, 2, 5, 10, 25, 50, 100, 250, 1000),
) -> DataFrame:
    """Numeric quasi-identifier GENERALIZATION — the enforcement step
    after :func:`k_anonymity`'s audit: bucket ``col`` at the NARROWEST
    width from a deterministic ladder such that every bucket holds at
    least ``k`` rows (coarser than needed destroys utility; finer
    leaks). Classic single-attribute global recoding (Sweeney's
    generalization hierarchies with a numeric ladder).

    Every ladder width's bucket histogram is built in ONE exploded
    pass (each row fans out to |ladder| (width, bucket) entries — the
    key_skew_audit shape), the per-width min group sizes collect (a
    |ladder|-row bounded frame), the first qualifying width is chosen
    on the driver, and the generalization applies row-locally. If no
    ladder width reaches ``k`` the widest is used — ``achieved_k``
    reports the truth either way, never silently. NULLs form their own
    group (the k_anonymity convention). Output: input rows plus
    ``(bucket_lo, bucket_width)``; bucket_lo = floor(v / w) * w, NULL
    for NULL values.
    """
    widths = sorted(float(w) for w in ladder)
    v = F.col(col).cast("double")
    entries = F.array(
        *[
            F.struct(
                F.lit(w).alias("_w"),
                F.floor(v / F.lit(w)).alias("_b"),
            )
            for w in widths
        ]
    )
    hist = (
        df.select(F.explode(entries).alias("_e"))
        .select("_e._w", "_e._b")
        .groupBy("_w", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    mins = {
        r["_w"]: r["_m"]
        for r in hist.groupBy("_w").agg(F.min("_c").alias("_m")).collect()
    }
    chosen = next((w for w in widths if mins.get(w, 0) >= int(k)), widths[-1])
    achieved = int(mins.get(chosen, 0))
    return df.select(
        "*",
        (F.floor(v / F.lit(chosen)) * F.lit(chosen)).alias("bucket_lo"),
        F.lit(chosen).alias("bucket_width"),
        F.lit(achieved).alias("achieved_k"),
    )


def quarantine_split(
    df: DataFrame,
    rules: list[tuple[str, "F.Column"]],
    id_col: str = "event_id",
) -> DataFrame:
    """Rule-based ingest routing — the dead-letter pattern: each rule is
    ``(reason, violation_condition)``; rows violating ANY rule get
    ``status='quarantine'`` with the comma-joined (rule-order) reason
    list, clean rows get ``status='ok'``. The honest alternative to
    silently dropping bad rows at ingest: the quarantine side keeps its
    WHY, so upstream producers get actionable counts per reason and
    nothing disappears unaccounted (row count in == row count out,
    asserted by the contract oracle).

    Purely row-local (one projection, no shuffle, no UDF) — the flags
    compile to one CASE chain inside whole-stage codegen; reasons are a
    string (not an array) so any engine hashes them identically.
    """
    if not rules:
        raise ValueError("quarantine_split needs at least one rule")
    reasons = F.concat_ws(
        ",",
        *[F.when(cond, F.lit(name)) for name, cond in rules],
    )
    return df.select(
        "*",
        F.when(reasons == "", F.lit("ok"))
        .otherwise(F.lit("quarantine"))
        .alias("status"),
        F.when(reasons != "", reasons).alias("reasons"),
    )


def schema_drift(
    old: DataFrame,
    new: DataFrame,
    numeric_cols: list[str],
    rel_tol: float = 0.10,
    null_tol: float = 0.05,
) -> DataFrame:
    """Snapshot-over-snapshot profile drift — the pipeline tripwire that
    catches upstream schema/semantic changes BEFORE they poison a
    training run: per numeric column, compare null rate, mean, min and
    max between two corpus snapshots and emit a verdict. Columns
    missing from either side report ``verdict='missing'`` (the actual
    schema break); ``mean_drift`` when |Δmean| > rel_tol * max(|old
    mean|, eps); ``null_drift`` when the null-rate gap exceeds
    null_tol; else ``stable``.

    One melt-explode pass per snapshot (the data_profile shape): every
    column's (n, nulls, mean, min, max) rides a single hash aggregation
    keyed on the column NAME — |columns| output rows, never a per-column
    scan. Output: ``(column, null_rate_old, null_rate_new, mean_old,
    mean_new, rel_mean_delta, verdict)`` rounded to 6.
    """
    eps = 1e-12

    def prof(d: DataFrame) -> DataFrame:
        entries = d.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("double").alias("_v"),
                        )
                        for c in numeric_cols
                        if c in d.columns
                    ]
                )
            ).alias("_e")
        ).select("_e.column", "_e._v")
        return entries.groupBy("column").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_v").isNull().cast("int")).alias("_nulls"),
            F.avg("_v").alias("_mean"),
        )
    o, n = prof(old).alias("o"), prof(new).alias("n")
    j = o.join(n, "column", "full_outer")
    nr_o = F.col("o._nulls") / F.col("o._n")
    nr_n = F.col("n._nulls") / F.col("n._n")
    # 6dp-rounded BEFORE the threshold comparisons (engine-portable
    # verdicts — an ulp of avg() disagreement at the tolerance boundary
    # would flip a verdict string and the hash with it)
    rel = qround(
        F.abs(F.col("n._mean") - F.col("o._mean"))
        / F.greatest(F.abs(F.col("o._mean")), F.lit(eps)),
        6,
    )
    verdict = (
        F.when(
            F.col("o._n").isNull() | F.col("n._n").isNull(), F.lit("missing")
        )
        .when(rel > float(rel_tol), F.lit("mean_drift"))
        .when(qround(F.abs(nr_n - nr_o), 6) > float(null_tol), F.lit("null_drift"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "column",
        qround(nr_o, 6).alias("null_rate_old"),
        qround(nr_n, 6).alias("null_rate_new"),
        qround(F.col("o._mean"), 6).alias("mean_old"),
        qround(F.col("n._mean"), 6).alias("mean_new"),
        F.when(
            F.col("o._n").isNotNull() & F.col("n._n").isNotNull(), rel
        ).alias("rel_mean_delta"),
        verdict.alias("verdict"),
    )


def json_conformance(
    df: DataFrame,
    json_col: str,
    required_keys: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """Semi-structured payload conformance rates — the ingest-contract
    monitor for JSON columns: per group (or globally), what fraction of
    payloads parse at all, and what fraction carries each required key
    non-null. The per-key columns localize WHICH field an upstream
    producer dropped (a single "valid JSON" rate cannot).

    Row-local JVM-side extraction (``get_json_object`` — no Python, no
    parse-into-driver) feeding one hash aggregation: the
    events_json_extract discipline, turned into a contract monitor.
    Output: ``(group?, n, parse_rate, has_<key> rate...)`` rounded to 6.
    """
    c = F.col(json_col)
    parse_ok = F.get_json_object(c, "$").isNotNull().cast("int")
    keys = {
        k: F.get_json_object(c, f"$.{k}").isNotNull().cast("int")
        for k in required_keys
    }
    aggs = [
        F.count(F.lit(1)).alias("n"),
        qround(F.avg(parse_ok), 6).alias("parse_rate"),
        *[
            qround(F.avg(expr), 6).alias(f"has_{k}")
            for k, expr in keys.items()
        ],
    ]
    if group_col:
        return df.groupBy(group_col).agg(*aggs)
    return df.agg(*aggs)


def dp_group_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp1",
    keep_true: bool = True,
) -> DataFrame:
    """Differentially-private group counts via DETERMINISTIC Laplace
    noise — the release-side companion to the k_anonymity/l_diversity
    audits: per group, ``released = max(0, round(count + Lap(1/eps)))``
    where the Laplace draw inverts the CDF at a uniform derived from
    ``md5(salt || group_key)`` (the bootstrap_ci_mean trick applied to
    noise): ``Lap(b) = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|)``.
    Count queries have sensitivity 1, so scale b = 1/epsilon gives
    eps-DP for one release under the usual assumptions — with the
    STATED caveat that a hash-seeded draw is pseudo-random, not random:
    this is the reproducible-pipeline trade (same release every run, no
    RNG state to persist), acceptable when the salt is secret, NOT a
    substitute for audited DP tooling.

    One map-side-combinable aggregation + row-local noise codegen —
    output cardinality is the group count, never the corpus.
    ``keep_true=True`` (default) keeps the exact count beside the noisy
    one for validation harnesses; release mode drops it. Output per
    group: ``(*group_cols, [n,] noise, released)``.
    """
    from gordo_spark.operators.dedup import md5_long

    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    u = (md5_long(F.concat(F.lit(salt), key)) + 0.5) / F.lit(4294967296.0)
    b = F.lit(1.0 / float(epsilon))
    noise = (
        -b
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    out_cols = [*group_cols]
    if keep_true:
        out_cols.append("n")
    return g.select(
        *out_cols,
        qround(noise, 6).alias("noise"),
        F.greatest(
            F.lit(0).cast("long"),
            qround(F.col("n") + noise, 0).cast("long"),
        ).alias("released"),
    )


def t_closeness(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit for an ORDERED sensitive attribute — the
    third rung of the anonymity ladder (k_anonymity bounds group size,
    l_diversity bounds distinct sensitive values, t-closeness bounds
    how far a group's sensitive DISTRIBUTION drifts from the
    table-wide one, which is what actually leaks when a group is
    skewed). Distance is the standard ordered-attribute EMD
    (Li et al. 2007): with the m distinct sensitive values as the
    ground grid, ``EMD = sum_i |cum_q(i) - cum_p(i)| / (m - 1)``.

    ONE corpus scan: the (qi, value) histogram; the global grid (m
    rows) and the per-group sizes are both re-aggregations of it, so
    the big table is read once. Densification is groups x grid via a
    BROADCAST of the m-row grid (output is groups*m rows, never
    corpus-sized), and every window is either m-bounded (grid
    cumulative) or partitioned by group over the m grid rows. Output
    per group: ``(*qi_cols, n, emd, violating)``, ordered by qi.
    """
    v = F.col(sensitive_col)
    gv = (
        df.filter(v.isNotNull())
        .groupBy(*[F.col(c) for c in qi_cols], v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wall = Window.partitionBy()
    grid = (
        gv.groupBy("_v")
        .agg(F.sum("_c").alias("_gc"))
        .select(
            "_v",
            (F.col("_gc") / F.sum("_gc").over(wall)).alias("_p"),
            F.count(F.lit(1)).over(wall).alias("_m"),
        )
    )
    gsz = gv.groupBy(*qi_cols).agg(F.sum("_c").alias("n"))
    dense = (
        gsz.join(F.broadcast(grid), how="cross")
        .join(gv, [*qi_cols, "_v"], "left")
        .select(
            *qi_cols,
            "n",
            "_v",
            "_p",
            "_m",
            (F.coalesce(F.col("_c"), F.lit(0)) / F.col("n")).alias("_q"),
        )
    )
    wg = (
        Window.partitionBy(*qi_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    emd = (
        dense.select(
            *qi_cols,
            "n",
            "_m",
            F.abs(
                F.sum("_q").over(wg) - F.sum("_p").over(wg)
            ).alias("_d"),
        )
        .groupBy(*qi_cols, "n")
        .agg(
            qround(F.sum("_d") / (F.max("_m") - 1.0), 6).alias("emd")
        )
    )
    return emd.select(
        *qi_cols,
        "n",
        "emd",
        (F.col("emd") > F.lit(float(t))).alias("violating"),
    ).orderBy(*qi_cols)


def erasure_audit(
    tables: "dict[str, tuple[DataFrame, str]]",
    deleted_keys: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """RIGHT-TO-ERASURE compliance audit (GDPR art. 17 operationalized):
    given the tombstone list of deleted subject keys, count — per table
    — the rows that STILL reference a deleted subject. A clean deletion
    pipeline reports 0 everywhere; any survivor count localizes the
    table whose purge job missed (the cross-table twin of
    ``null_patterns``' broken-joiner forensics). ``tables`` maps
    table name -> (frame, its subject-key column).

    Scale shape: per table, ONE broadcast left join against the
    DISTINCT tombstone frame (deletion batches are bounded by
    construction; an unbounded tombstone list is itself the incident —
    and distinct keys match each row at most once, so ``count(_k)``
    is exactly the referencing-row count) + a single aggregate; the
    per-table aggregates union LAZILY, so the whole audit is ONE job
    at the sink instead of two eager driver-blocking counts per table
    (2|tables| scans + 2|tables| jobs before). The tombstone distinct
    is pinned once (localCheckpoint, bounded) rather than re-derived
    under every table's broadcast. Output:
    ``(table, n_rows, n_referencing_deleted, share)`` ordered by table.
    """
    keys = (
        deleted_keys.select(F.col(key_col).alias("_k"))
        .distinct()
        .localCheckpoint()
    )
    out = None
    for name in sorted(tables):
        df, col = tables[name]
        row = (
            df.select(F.col(col).alias("_c"))
            .join(F.broadcast(keys), F.col("_c") == F.col("_k"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("_k").alias("n_referencing_deleted"),
            )
            .select(
                F.lit(name).alias("table"),
                "n_rows",
                "n_referencing_deleted",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "table",
        "n_rows",
        "n_referencing_deleted",
        qround(
            F.when(
                F.col("n_rows") > 0,
                F.col("n_referencing_deleted") / F.col("n_rows"),
            ),
            6,
        ).alias("share"),
    ).orderBy("table")


def temporal_leakage(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    split_col: str,
    train_label: str = "train",
    test_label: str = "test",
) -> DataFrame:
    """TEMPORAL train/test LEAKAGE audit: for time-series ML the test
    set must be strictly AFTER the train set per entity — a random
    (md5) split of sequential data lets the model interpolate between
    train points that sandwich every test point, inflating every
    offline metric (the classic forecasting-eval bug; Bergmeir &
    Benitez 2012). Per entity: train/test counts, the train max and
    test min timestamps, and ``leaked = min_test <= max_train``.

    One hash aggregation keyed on the entity (conditional min/max —
    map-side combinable), output entity-bounded. Feed ``leaked``'s
    share to the release gate: the fix is a time-based split
    (deterministic_split on a DATE bucket, not the row id).
    """
    is_tr = F.col(split_col) == train_label
    is_te = F.col(split_col) == test_label
    t = F.col(ts_col).cast("timestamp")
    return (
        df.groupBy(F.col(entity_col).alias("entity"))
        .agg(
            F.sum(is_tr.cast("int")).alias("n_train"),
            F.sum(is_te.cast("int")).alias("n_test"),
            F.max(F.when(is_tr, t)).alias("max_train_ts"),
            F.min(F.when(is_te, t)).alias("min_test_ts"),
        )
        .withColumn(
            "leaked",
            F.coalesce(
                F.col("min_test_ts") <= F.col("max_train_ts"), F.lit(False)
            ),
        )
        .orderBy("entity")
    )


def pruning_report(
    df: DataFrame,
    shard_col: str,
    value_col: str,
    lo: float,
    hi: float,
) -> DataFrame:
    """ZONE-MAP pruning simulator: per shard, the min/max of
    ``value_col`` and whether a ``[lo, hi]`` range predicate could SKIP
    the whole shard (max < lo or min > hi) — the measurement that says
    whether a layout (zorder_keys, date partitioning) actually prunes
    for the queries you run, BEFORE you pay to rewrite 100 TB. Parquet
    row-group and Delta/Iceberg file skipping read exactly these
    per-unit min/max zones; a layout whose skip share is ~0 for your
    hot predicates is shuffle money wasted.

    One map-side-combinable aggregation on the shard key; |shards|
    rows out: ``(shard, n_rows, vmin, vmax, skippable)`` ordered.
    """
    v = F.col(value_col).cast("double")
    z = df.groupBy(F.col(shard_col).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )
    return z.select(
        "shard",
        "n_rows",
        qround(F.col("vmin"), 6).alias("vmin"),
        qround(F.col("vmax"), 6).alias("vmax"),
        (
            (F.col("vmax") < F.lit(float(lo)))
            | (F.col("vmin") > F.lit(float(hi)))
        ).alias("skippable"),
    ).orderBy("shard")
