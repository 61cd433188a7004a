"""Property-based parity: random series, pandas as the oracle.

The reference repo has no property tests (SURVEY.md §5 "Not used"); we add
them where semantics are subtle — bucket boundaries and bounded gap-fill —
since fixed-seed unit tests only pin one shape. Examples are kept small and
few: every example pays a Spark job.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from gordo_spark.operators import interpolate, regularize_grid, resample_aggregate

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def sparse_series(draw):
    """Irregular (ts, value) series with gaps and duplicate timestamps."""
    n = draw(st.integers(min_value=3, max_value=60))
    offsets = draw(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=n, max_size=n)
    )
    values = draw(
        st.lists(
            # subnormals excluded: pandas and Spark disagree on denormal
            # interpolation arithmetic (~1e-313) — float noise, not semantics
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_subnormal=False,
            ),
            min_size=n,
            max_size=n,
        )
    )
    base = pd.Timestamp("2024-03-01 00:00:00")
    ts = [base + pd.Timedelta(seconds=o) for o in offsets]
    return pd.DataFrame({"tag": "t0", "ts": ts, "value": values})


@given(pdf=sparse_series(), res_min=st.sampled_from([1, 5, 10, 60]))
@settings(**SETTINGS)
def test_resample_matches_pandas(spark, pdf, res_min):
    got = (
        resample_aggregate(spark.createDataFrame(pdf), f"{res_min}T", "mean")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    exp = (
        pdf.set_index("ts")["value"]
        .resample(f"{res_min}min")
        .mean()
        .dropna()
        .rename_axis("ts")
        .reset_index()
    )
    assert len(got) == len(exp)
    # rtol 1e-7: Spark's partial aggregation and pandas' pairwise sum add
    # in different orders; hypothesis finds ~1e-9-relative mean deviations.
    # atol covers catastrophic cancellation (e.g. mean of {-1e6, 999999,
    # 0.99999} ~ -3e-6): ulp-order summation noise is ABSOLUTE in the
    # addend magnitude, so a near-zero mean of large inputs legitimately
    # differs by ~1e-11 between engines while rtol alone would reject it.
    atol = 1e-9 * max(1.0, float(np.abs(pdf["value"]).max()))
    np.testing.assert_allclose(got["value"], exp["value"], rtol=1e-7, atol=atol)
    assert (got["ts"].values == exp["ts"].values).all()


@given(
    pdf=sparse_series(),
    limit=st.sampled_from([1, 3, 10]),
    method=st.sampled_from(["ffill", "linear_interpolation"]),
)
@settings(**SETTINGS)
def test_interpolate_matches_pandas(spark, pdf, limit, method):
    res = (
        resample_aggregate(spark.createDataFrame(pdf), "1T", "mean")
        .toPandas()
        .sort_values("ts")
    )
    sdf = spark.createDataFrame(res)
    reg = regularize_grid(sdf, "1T")
    got = (
        interpolate(reg, "1T", method, f"{limit}T")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    full = res.set_index("ts")["value"].resample("1min").mean()
    if method == "ffill":
        # pandas ffill(limit=n) == ours: filled iff prev anchor <= n back
        exp = full.ffill(limit=limit)
    else:
        # ours is all-or-nothing per gap (gordo-core interpolation_limit
        # semantics): a gap longer than `limit` stays entirely missing —
        # pandas' limit= fills the first n NaNs of longer gaps instead, so
        # interpolate unbounded then re-mask the long gaps
        isna = full.isna()
        run = (isna != isna.shift()).cumsum()
        gap_len = isna.groupby(run).transform("sum")
        interp = full.interpolate(method="index", limit_area="inside")
        exp = interp.mask(isna & (gap_len > limit))
    exp = exp.rename_axis("ts").reset_index()
    assert len(got) == len(exp)
    mask = exp["value"].notna()
    assert (got["value"].notna() == mask).all()
    # atol model: linear interpolation crossing zero (e.g. -1.9 -> 1.9)
    # suffers catastrophic cancellation — pandas lands on exactly 0.0,
    # Spark on ~1 ulp of the INPUT magnitude (2.2e-16 for O(1) anchors).
    # A pure-relative check is meaningless when the expected value is ~0,
    # so scale the absolute floor by the data magnitude: cancellation
    # noise is bounded by eps * max(|anchors|), not by the result's size.
    scale = max(1.0, float(np.abs(exp.loc[mask, "value"]).max())) if mask.any() else 1.0
    np.testing.assert_allclose(
        got.loc[mask, "value"],
        exp.loc[mask, "value"],
        rtol=1e-9,
        atol=1e-12 * scale,
    )


@st.composite
def asof_pair(draw):
    """Left/right frames over a couple of keys with clustered timestamps
    (duplicates and ties across sides included on purpose)."""
    base = pd.Timestamp("2024-03-01 00:00:00")

    def frame(val_name):
        n = draw(st.integers(min_value=1, max_value=25))
        keys = draw(
            st.lists(st.sampled_from(["k1", "k2"]), min_size=n, max_size=n)
        )
        offs = draw(
            st.lists(st.integers(min_value=0, max_value=600), min_size=n, max_size=n)
        )
        vals = draw(
            st.lists(
                st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=n,
                max_size=n,
            )
        )
        return pd.DataFrame(
            {
                "k": keys,
                "ts": [base + pd.Timedelta(seconds=o) for o in offs],
                val_name: vals,
            }
        )

    left = frame("lval")
    right = frame("rval")
    # dedupe right (k, ts) - ties among right rows are tie-broken
    # arbitrarily by both engines, so pin one survivor deterministically
    right = right.sort_values(["k", "ts", "rval"]).drop_duplicates(
        ["k", "ts"], keep="last"
    )
    return left, right


@given(pair=asof_pair())
@settings(**SETTINGS)
def test_asof_join_matches_pandas_property(spark, pair):
    from gordo_spark.operators.asof import asof_join

    left, right = pair
    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), on=["k"]
        )
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",
        )
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["rval_right"].to_numpy(dtype=float),
        exp["rval"].to_numpy(dtype=float),
        rtol=0,
        atol=0,
    )


@st.composite
def random_corpus(draw):
    """Small random documents: token sequences over a tiny alphabet so
    repetition/sharing happens often."""
    n = draw(st.integers(min_value=2, max_value=12))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=1, max_value=12))
        toks = draw(
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=k,
                max_size=k,
            )
        )
        docs.append((i, " ".join(toks)))
    return pd.DataFrame(docs, columns=["doc_id", "text"])


@given(pdf=random_corpus())
@settings(**SETTINGS)
def test_hot_split_join_equals_plain_join(spark, pdf):
    """The adaptive hot/tail split must be result-identical to the plain
    shuffle join on ANY corpus, whatever the probe decides."""
    from gordo_spark.operators.dedup import repeated_ngram_stats

    df = spark.createDataFrame(pdf)
    plain = {
        r["doc_id"]: (r["n_grams"], r["n_repeated"], r["repeated_frac"])
        for r in repeated_ngram_stats(df, n=2, hot_k=0).collect()
    }
    split = {
        r["doc_id"]: (r["n_grams"], r["n_repeated"], r["repeated_frac"])
        for r in repeated_ngram_stats(
            df, n=2, hot_k=8, hot_min=2, probe_fraction=1.0
        ).collect()
    }
    assert split == plain


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=3,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_winsorize_matches_numpy_percentiles(spark, values):
    """Winsorize == numpy: same linear-interpolation percentile formula
    (np.percentile / quantile_cont / Spark percentile), values clamped to
    the 6dp-rounded bounds, untouched rows bit-identical. (Idempotence
    does NOT hold for percentile winsorization — percentiles of clipped
    data can move strictly inward — so the property is oracle parity.)"""
    from gordo_spark.operators.filters import winsorize

    docs = pd.DataFrame(
        {
            "tag": "t0",
            "ts": pd.date_range("2024-01-01", periods=len(values), freq="1h"),
            "value": values,
        }
    )
    out = (
        winsorize(spark.createDataFrame(docs), lower=0.1, upper=0.9)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    lo = round(float(np.percentile(values, 10)), 6)
    hi = round(float(np.percentile(values, 90)), 6)
    exp = np.round(np.clip(values, lo, hi), 6)
    np.testing.assert_allclose(out["value"], exp, rtol=0, atol=1e-9)
    exp_clipped = [(1 if (v < lo or v > hi) else 0) for v in values]
    assert out["was_clipped"].tolist() == exp_clipped


@given(pdf=random_corpus())
@settings(**SETTINGS)
def test_token_entropy_bounds(spark, pdf):
    """0 <= H <= ln(n_tokens), with H == 0 iff the doc repeats one token."""
    import math

    from gordo_spark.operators.text import token_entropy

    rows = token_entropy(spark.createDataFrame(pdf)).collect()
    assert len(rows) == len(pdf)
    for r in rows:
        # entropy is rounded to 6dp by the operator, so the upper bound
        # needs a half-quantum slack (ln(5)=1.6094379... rounds UP to
        # 1.609438, legitimately above the unrounded bound)
        assert -1e-9 <= r["entropy"] <= math.log(r["n_tokens"]) + 5e-7
        uniq = len(set(pdf.loc[pdf.doc_id == r["doc_id"], "text"].iloc[0].split()))
        if uniq == 1:
            assert r["entropy"] == 0.0
        if r["entropy"] == 0.0:
            assert uniq == 1


@st.composite
def tiled_frame(draw):
    """Random (group, value) rows with heavy ties to stress ntile edges."""
    n = draw(st.integers(min_value=1, max_value=80))
    groups = draw(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n)
    )
    # tiny value domain -> many ties, including whole-partition ties
    vals = draw(
        st.lists(st.integers(min_value=0, max_value=4), min_size=n, max_size=n)
    )
    return pd.DataFrame(
        {"doc_id": range(n), "g": groups, "v": [float(x) for x in vals]}
    )


@given(pdf=tiled_frame(), k=st.sampled_from([2, 3, 5]))
@settings(**SETTINGS)
def test_distributed_ntile_property(spark, pdf, k):
    """distributed_ntile == native ntile() for any data, any k — including
    partitions smaller than k and all-tied partitions."""
    from gordo_spark.operators.ranking import distributed_ntile

    df = spark.createDataFrame(pdf).repartition(4)
    got = {
        r["doc_id"]: r["tile"]
        for r in distributed_ntile(df, k, "v", ("g",), "doc_id").collect()
    }
    df.createOrReplaceTempView("ntile_prop")
    exp = {
        r["doc_id"]: r["tile"]
        for r in spark.sql(
            f"SELECT doc_id, ntile({k}) OVER (PARTITION BY g ORDER BY v, doc_id) AS tile FROM ntile_prop"
        ).collect()
    }
    assert got == exp


@st.composite
def para_docs(draw):
    """Documents assembled from a small paragraph vocabulary (guaranteed
    cross-document repeats)."""
    n = draw(st.integers(min_value=1, max_value=12))
    vocab = ["p one", "p two", "p three", "p four"]
    docs = [
        draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=5))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": range(n), "paras": docs})


@given(pdf=para_docs())
@settings(**SETTINGS)
def test_paragraph_dedup_idempotent_and_complete(spark, pdf):
    """After one pass every paragraph value survives exactly once
    corpus-wide; a second pass removes nothing (idempotence)."""
    from pyspark.sql import functions as F

    from gordo_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(pdf)
    out = paragraph_dedup(df, F.col("paras"), out_col="text")
    got = out.toPandas()
    # completeness: each distinct paragraph appears exactly once across docs
    all_paras = [p for row in got["text"] for p in row.split(" p ")]
    kept_total = int(got["n_kept"].sum())
    distinct_input = len({p for row in pdf["paras"] for p in row})
    assert kept_total == distinct_input
    # idempotence: re-running on the survivors changes nothing
    again = paragraph_dedup(
        out.select("doc_id", F.split("text", "#NEVER#").alias("paras")),
        F.col("paras"),
        out_col="text",
    ).toPandas()
    assert sorted(again["doc_id"]) == sorted(got["doc_id"])
    assert (again["n_kept"] == again["n_paras"]).all()


@given(
    major=st.integers(min_value=0, max_value=99999),
    minor=st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
    patch=st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
    suffix=st.sampled_from(["", "rc1", "a2", "+build.7", ".post1"]),
)
@settings(max_examples=60, deadline=None)
def test_version_tag_roundtrip_property(major, minor, patch, suffix):
    """parse(tag.tag()) == tag for every well-formed release (suffix and
    patch require a minor; grammar constraints enforced in the builder)."""
    from gordo_spark.functions.version import ReleaseTag, parse_version

    if minor is None:
        patch, suffix = None, ""
    if patch is None and suffix.startswith("."):
        # "1.2.post1" parses patch-first ("post1" is not digits -> suffix
        # ".post1" only when no patch slot matched); skip the ambiguous case
        suffix = ""
    tag = ReleaseTag(major, minor, patch, suffix)
    assert parse_version(tag.tag()) == tag


@given(text=st.text(max_size=300), budget=st.integers(min_value=0, max_value=310))
@settings(max_examples=80, deadline=None)
def test_clip_text_invariants(text, budget):
    from gordo_spark.exceptions_reporter import clip_text

    out = clip_text(text, budget)
    assert len(out) <= max(budget, len(text) if len(text) <= budget else 0)
    if len(text) <= budget:
        assert out == text
    else:
        assert out == "" or (out.endswith("...") and len(out) <= budget)


@given(
    lines=st.lists(st.text(min_size=1, max_size=40).map(lambda s: s + "\n"), max_size=12),
    budget=st.integers(min_value=0, max_value=500),
)
@settings(max_examples=60, deadline=None)
def test_clip_tail_lines_invariants(lines, budget):
    """Whole trailing lines only, budget respected, tail preserved."""
    from gordo_spark.exceptions_reporter import clip_tail_lines

    out = clip_tail_lines(list(lines), budget)
    total = sum(len(ln) for ln in lines)
    if total <= budget:
        assert out == lines
    else:
        assert out[0] == "...\n"
        assert sum(len(ln) for ln in out) <= budget + len("...\n")
        # what survives is exactly a SUFFIX of the input
        assert out[1:] == lines[len(lines) - (len(out) - 1):]


def test_count_min_sketch_mergeable(spark):
    """sketch(A ++ B) == cellwise sum of sketch(A) and sketch(B) — the
    property that lets partition/shard sketches merge by addition."""
    import pandas as pd

    from gordo_spark.operators.sketches import count_min_sketch

    a = spark.createDataFrame(pd.DataFrame({"w": ["x", "y", "x", "z"] * 10}))
    b = spark.createDataFrame(pd.DataFrame({"w": ["y", "q", "q"] * 7}))
    sa = count_min_sketch(a, "w", width=32, depth=3).toPandas()
    sb = count_min_sketch(b, "w", width=32, depth=3).toPandas()
    su = count_min_sketch(a.unionAll(b), "w", width=32, depth=3).toPandas()
    merged = (
        pd.concat([sa, sb])
        .groupby(["row", "bucket"], as_index=False)["n"].sum()
        .sort_values(["row", "bucket"]).reset_index(drop=True)
    )
    assert merged.equals(su.sort_values(["row", "bucket"]).reset_index(drop=True))


@st.composite
def corpus_with_planted_run(draw):
    """Docs of unique filler tokens plus one shared run planted into two
    of them at random offsets — the span detector must find exactly it."""
    run_len = draw(st.integers(min_value=12, max_value=24))
    off_a = draw(st.integers(min_value=0, max_value=6))
    off_b = draw(st.integers(min_value=0, max_value=6))
    tail_a = draw(st.integers(min_value=1, max_value=5))
    tail_b = draw(st.integers(min_value=1, max_value=5))
    run = [f"r{i}" for i in range(run_len)]
    doc_a = [f"a{i}" for i in range(off_a)] + run + [f"x{i}" for i in range(tail_a)]
    doc_b = [f"b{i}" for i in range(off_b)] + run + [f"y{i}" for i in range(tail_b)]
    noise = [f"n{i} " * 9 for i in range(draw(st.integers(0, 3)))]
    return (off_a, off_b, run_len, " ".join(doc_a), " ".join(doc_b), noise)


@given(case=corpus_with_planted_run())
@settings(**SETTINGS)
def test_duplicate_spans_property_finds_planted_run(spark, case):
    from gordo_spark.operators.dedup import duplicate_spans

    off_a, off_b, run_len, a, b, noise = case
    rows = [(1, a), (2, b)] + [(10 + i, t) for i, t in enumerate(noise)]
    out = duplicate_spans(
        spark.createDataFrame(rows, "doc_id long, text string"),
        k=8,
        min_len=12,
        max_df=16,
    ).collect()
    # exactly one span, exactly the planted run
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (off_a, off_b, run_len)


@st.composite
def cdc_case(draw):
    """Random snapshot + change log with colliding keys/timestamps."""
    keys = draw(st.lists(st.integers(0, 9), min_size=0, max_size=6, unique=True))
    n_ch = draw(st.integers(min_value=0, max_value=20))
    changes = [
        (
            draw(st.integers(0, 9)),                        # key
            draw(st.integers(0, 5)),                        # ts (collisions!)
            draw(st.sampled_from(["I", "U", "D"])),         # op
            draw(st.integers(-100, 100)),                   # value (tiebreak)
        )
        for _ in range(n_ch)
    ]
    return keys, changes


@given(case=cdc_case())
@settings(**SETTINGS)
def test_cdc_apply_matches_python_latest_wins(spark, case):
    """cdc_apply == a dict simulation picking max (ts, value, op) per key:
    deletes drop, inserts/updates take the winning row's value, untouched
    snapshot keys survive."""
    import datetime as dt

    from gordo_spark.sources.lake import cdc_apply

    keys, changes = case
    T0 = dt.datetime(2024, 1, 1)
    snap = spark.createDataFrame(
        [(k, float(k * 10)) for k in keys] or [(None, None)], "k int, v double"
    ).filter("k IS NOT NULL")
    ch_rows = [
        (k, T0 + dt.timedelta(hours=ts), op, float(val))
        for (k, ts, op, val) in changes
    ]
    ch = spark.createDataFrame(
        ch_rows or [(None, None, None, None)],
        "k int, ts timestamp, op string, v double",
    ).filter("k IS NOT NULL")
    got = {
        r["k"]: (r["v"], r["action"])
        for r in cdc_apply(snap, ch, ["k"], tiebreak_cols=["v"]).collect()
    }

    # pure-python reference: winner = max (ts, v, op) per key
    latest = {}
    for k, ts, op, val in changes:
        cand = (ts, float(val), op)
        if k not in latest or cand > latest[k]:
            latest[k] = cand
    expect = {}
    for k in keys:
        if k in latest:
            ts, val, op = latest[k]
            if op == "D":
                continue
            expect[k] = (val, "updated")
        else:
            expect[k] = (float(k * 10), "kept")
    for k, (ts, val, op) in latest.items():
        if k not in keys and op != "D":
            expect[k] = (val, "inserted")
    assert got == expect


@st.composite
def censored_subjects(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    durs = draw(st.lists(st.integers(min_value=0, max_value=12), min_size=n, max_size=n))
    obs = draw(st.lists(st.booleans(), min_size=n, max_size=n))
    return list(zip(durs, obs))


@given(subjects=censored_subjects())
@settings(**SETTINGS)
def test_km_curve_matches_pure_python(spark, subjects):
    """Kaplan-Meier against an independent pure-python product-limit
    computation on arbitrary censored data (ties, censor-only times,
    total-failure tails included by construction)."""
    from gordo_spark.operators.survival import km_curve

    df = spark.createDataFrame(subjects, "duration int, observed boolean")
    got = {r["t"]: r for r in km_curve(df).collect()}
    # pure-python KM
    times = sorted({d for d, o in subjects if o})
    surv, exp = 1.0, {}
    for t in times:
        n_risk = sum(1 for d, _ in subjects if d >= t)
        d_t = sum(1 for d, o in subjects if d == t and o)
        c_t = sum(1 for d, o in subjects if d == t and not o)
        surv *= 1.0 - d_t / n_risk
        exp[t] = (n_risk, d_t, c_t, surv)
    assert set(got) == set(exp)
    for t, (n_risk, d_t, c_t, s) in exp.items():
        r = got[t]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (n_risk, d_t, c_t)
        assert r["survival"] == pytest.approx(round(s, 6), abs=2e-6)


@st.composite
def interval_fixture(draw):
    np_ = draw(st.integers(min_value=1, max_value=20))
    ni = draw(st.integers(min_value=1, max_value=10))
    pts = [
        (draw(st.integers(min_value=1, max_value=3)),
         draw(st.integers(min_value=0, max_value=500_000)))
        for _ in range(np_)
    ]
    ivs = []
    for _ in range(ni):
        k = draw(st.integers(min_value=1, max_value=3))
        s = draw(st.integers(min_value=0, max_value=500_000))
        ln = draw(st.integers(min_value=0, max_value=200_000))
        ivs.append((k, s, s + ln))
    return pts, ivs


@given(fx=interval_fixture(), bucket=st.sampled_from([3600, 86_400]))
@settings(**SETTINGS)
def test_interval_join_bucketed_equals_plain(spark, fx, bucket):
    """The bucketed range-join path returns exactly the plain
    equi+range result on arbitrary overlapping/straddling/degenerate
    intervals and any bucket width."""
    import datetime as dt

    from gordo_spark.operators.asof import interval_join

    pts, ivs = fx
    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s)) for k, s in pts],
        "k int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (k, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=e))
            for k, s, e in ivs
        ],
        "k int, start timestamp, end timestamp",
    )
    cols = ["k", "ts", "start", "end"]
    plain = (
        interval_join(points, intervals, ["k"])
        .toPandas()[cols].sort_values(cols).reset_index(drop=True)
    )
    bucketed = (
        interval_join(points, intervals, ["k"], bucket_seconds=bucket)
        .toPandas()[cols].sort_values(cols).reset_index(drop=True)
    )
    assert plain.equals(bucketed)


@st.composite
def tiny_corpus(draw):
    """Random docs over a tiny alphabet so shingle overlap is common —
    the adversarial regime for a prefix filter (everything similar)."""
    n = draw(st.integers(min_value=2, max_value=10))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=3, max_value=15))
        words = draw(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=k,
                max_size=k,
            )
        )
        docs.append((i, " ".join(words)))
    return docs


@given(docs=tiny_corpus(), t=st.sampled_from([0.5, 0.8, 1.0]))
@settings(**SETTINGS)
def test_jaccard_join_exact_recall_property(spark, docs, t):
    """Prefix filtering NEVER misses: against python brute force over
    random tiny-alphabet corpora (maximal shingle collisions), the join
    returns exactly the pairs with shingle-Jaccard >= t at every
    threshold — including t=1.0 (exact duplicates only)."""
    from gordo_spark.operators.dedup import jaccard_threshold_join

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["union_size"])
        for r in jaccard_threshold_join(df, threshold=t).collect()
    }

    def shingles(s):
        w = s.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}

    exp = {}
    sh = {i: shingles(s) for i, s in docs}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= t:
                exp[(a, b)] = (inter, union)
    assert got == exp
