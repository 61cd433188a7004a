"""Rounds 5-8 additions (second half): time-series statistics waves, lake ops, curation and eval-suite contracts."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from contracts.base import (
    _events_long,
    _r6,
    qround,
    read_table,
    resample_aggregate,
)
from contracts.core_timeseries import (
    _O_WIDE_1H,
    _wide_1h,
)
from contracts.training_data import (
    O_LANG_ID_NGRAM,
    _O_DOCS_DUPS,
    _docs_with_dups,
)
from contracts.rounds5to8_a import (
    _kappa_sql,
)



O_COHENS_KAPPA = _kappa_sql()


def q_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation plan (operators/sampling.mixture_budget):
    given target mixture weights over sources and a total budget,
    per-source allocated tokens, implied epochs (> 1 flags
    repetition), and the no-repeat capped rate. One strata-sized
    aggregation; weights ride as plan literals."""
    from gordo_spark.operators.sampling import mixture_budget

    docs = read_table(spark, sf_dir, "documents")
    weights = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(18)}
    return mixture_budget(docs, "source", "n_chars", weights, 100_000)


def _mixture_budget_sql() -> str:
    weights = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(18)}
    total = sum(weights.values())
    cases = " ".join(
        f"WHEN '{k}' THEN {v / total!r}" for k, v in sorted(weights.items())
    )
    return f"""
WITH c AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
w AS (
  SELECT *, coalesce(CASE source {cases} END, 0.0) AS tw FROM c
)
SELECT source, n_tokens,
       floor((tw) * 1000000.0 + 0.5) / 1000000.0 AS target_weight,
       floor((tw * 100000) * 10.0 + 0.5) / 10.0 AS allocated_tokens,
       floor((tw * 100000 / n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS epochs,
       floor((least(1.0, tw * 100000 / n_tokens)) * 1000000.0 + 0.5) / 1000000.0 AS capped_rate
FROM w ORDER BY source
"""


O_MIXTURE_BUDGET = _mixture_budget_sql()


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (operators/asof.interval_join, bucketed
    scale path): view events landing inside each user's purchase
    window [first purchase, last purchase]. The interval side explodes
    into day buckets and the join runs on the (user, bucket) composite
    equi-key before the exact range filter — per-key comparison space
    is time-adjacent rows only, never points x intervals."""
    from gordo_spark.operators.asof import interval_join

    ev = read_table(spark, sf_dir, "events")
    windows = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
        .filter(F.col("start") < F.col("end"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    return interval_join(
        views, windows, ["user_id"], bucket_seconds=86_400
    ).select("user_id", "event_id", "ts", "start", "end")


O_INTERVAL_JOIN = """
WITH win AS (
  SELECT user_id, min(ts) AS s, max(ts) AS e
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1 HAVING min(ts) < max(ts)
)
SELECT v.user_id, v.event_id, v.ts, w.s AS start, w.e AS "end"
FROM events v JOIN win w ON v.user_id = w.user_id
WHERE v.event_type = 'view' AND v.ts >= w.s AND v.ts <= w.e
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease proxy (operators/text.readability):
    vowel-run syllable counting, terminal-punctuation sentences —
    row-local regexp algebra beside the Gopher rules."""
    from gordo_spark.operators.text import readability

    return readability(read_table(spark, sf_dir, "documents"))


O_READABILITY = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
         AS n_sentences,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         AS n_syllables,
       floor((206.835
             - 1.015 * len(string_split(text, ' '))
               / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                      AS DOUBLE)
             - 84.6 * len(regexp_extract_all(lower(text), '[aeiouy]+'))
               / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS flesch
FROM documents
"""


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the co-purchase graph
    (operators/graph.link_prediction): wedge-bounded candidate pairs
    (one self-join of the symmetrized directions on the middle node),
    existing edges dropped by anti-join, Jaccard from the degree
    table. Top 50 by (n_common desc, x, z)."""
    from gordo_spark.operators.graph import co_occurrence_edges, link_prediction

    li = read_table(spark, sf_dir, "lineitem")
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return link_prediction(edges, top_k=50)


O_LINK_PREDICTION = """
WITH e0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (
  SELECT a.p AS a, b.p AS b, count(*) AS n
  FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
),
e AS (SELECT a, b FROM cnt WHERE n >= 2),
dirs AS (SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e),
wedge AS (
  SELECT d1.w AS x, d2.w AS z, count(*) AS n_common
  FROM dirs d1 JOIN dirs d2 ON d1.v = d2.v AND d1.w < d2.w
  GROUP BY 1, 2
),
cand AS (
  SELECT w.* FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = w.x AND e.b = w.z)
),
deg AS (SELECT v, count(*) AS d FROM dirs GROUP BY 1)
SELECT c.x, c.z, c.n_common,
       floor((c.n_common / CAST(dx.d + dz.d - c.n_common AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS jaccard
FROM cand c JOIN deg dx ON dx.v = c.x JOIN deg dz ON dz.v = c.z
ORDER BY c.n_common DESC, c.x, c.z
LIMIT 50
"""


def q_ingest_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day ingest-volume audit over events
    (operators/quality_checks.ingest_health): calendar-spine day
    counts (missing days surface as 0-rows), trailing-7-day median,
    missing/low/warmup/ok verdicts. The trailing window runs over the
    calendar grid — bounded by the time span, never event volume."""
    from gordo_spark.operators.quality_checks import ingest_health

    out = ingest_health(read_table(spark, sf_dir, "events"), "ts")
    # date -> timestamp for the cross-engine compare (pandas renders
    # Spark dates as objects, DuckDB dates as datetime64)
    return out.withColumn("day", F.col("day").cast("timestamp"))


O_INGEST_HEALTH = """
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows
  FROM events GROUP BY 1
),
spine AS (
  SELECT CAST(unnest(generate_series(min(day), max(day),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM days
),
grid AS (
  SELECT s.day, coalesce(d.n_rows, 0) AS n_rows
  FROM spine s LEFT JOIN days d ON s.day = d.day
),
med AS (
  SELECT day, n_rows,
         quantile_cont(n_rows, 0.5) OVER (
           ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
         ) AS m
  FROM grid
)
SELECT CAST(day AS TIMESTAMP) AS day, CAST(n_rows AS BIGINT) AS n_rows,
       floor((m) * 10.0 + 0.5) / 10.0 AS trailing_median,
       CASE WHEN m > 0 THEN floor((n_rows / m) * 1000000.0 + 0.5) / 1000000.0 END AS ratio,
       CASE WHEN n_rows = 0 THEN 'missing'
            WHEN floor((m) * 10.0 + 0.5) / 10.0 IS NULL THEN 'warmup'
            WHEN n_rows < 0.5 * floor((m) * 10.0 + 0.5) / 10.0 THEN 'low'
            ELSE 'ok' END AS status
FROM med ORDER BY day
"""


def q_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration curve (operators/ranking.lorenz_curve):
    customers bucket by total order value DESCENDING via exact
    percentile boundaries (one single-pass aggregate + row-local
    boundary count — no customer-cardinality sort anywhere),
    cumulative member/value shares per bucket. The 'top 5% of
    customers carry X% of revenue' readout."""
    from gordo_spark.operators.ranking import lorenz_curve

    o = read_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    return lorenz_curve(rev, "revenue", "o_custkey", k=20)


O_REVENUE_PARETO = f"""
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS v FROM orders GROUP BY 1
),
bs AS (
  SELECT [{", ".join(f"quantile_cont(v, {i / 20})" for i in range(1, 20))}]
    AS b
  FROM rev
),
tiled AS (
  SELECT v, 20 - len(list_filter(bs.b, p -> v > p)) AS bucket
  FROM rev, bs
),
per AS (
  SELECT bucket, count(*) AS n_members, sum(v) AS bv
  FROM tiled GROUP BY bucket
)
SELECT bucket, CAST(n_members AS BIGINT) AS n_members,
       floor((bv) * 100.0 + 0.5) / 100.0 AS bucket_value,
       floor((sum(n_members) OVER (ORDER BY bucket)
             / CAST(sum(n_members) OVER () AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS cum_member_frac,
       floor((sum(bv) OVER (ORDER BY bucket) / sum(bv) OVER ()) * 1000000.0 + 0.5) / 1000000.0
         AS cum_value_frac
FROM per ORDER BY bucket
"""


def q_emb_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (operators/similarity.
    truncation_energy): retained L2-norm fraction at prefix dims
    8/16/32, summarized corpus-wide (mean + p10). Row-local slice +
    fold lambdas; one dims-sized aggregation."""
    from gordo_spark.operators.similarity import truncation_energy

    return truncation_energy(
        read_table(spark, sf_dir, "embeddings"), dims=(8, 16, 32)
    )


O_EMB_TRUNCATION = """
WITH r AS (
  SELECT d.dim,
         sqrt(list_sum(list_transform(embedding[1:d.dim],
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
              / list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ratio
  FROM embeddings
  CROSS JOIN (SELECT unnest([8, 16, 32]) AS dim) d
  WHERE list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
)
SELECT CAST(dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n_vectors,
       floor((avg(ratio)) * 1000000.0 + 0.5) / 1000000.0 AS mean_retained,
       floor((quantile_cont(ratio, 0.1)) * 1000000.0 + 0.5) / 1000000.0 AS p10_retained
FROM r GROUP BY dim ORDER BY dim
"""


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional postings index
    (operators/text.build_postings + phrase_search): per-term posting
    lists equi-join on (id, pos - offset) — adjacency IS the join key;
    the corpus text is never rescanned at query time."""
    from gordo_spark.operators.text import build_postings, phrase_search

    docs = read_table(spark, sf_dir, "documents")
    return phrase_search(build_postings(docs), "table hash")


O_PHRASE_SEARCH = """
WITH p AS (
  SELECT doc_id, i - 1 AS pos, ws[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(generate_series(1, len(ws))) AS s(i)
  WHERE ws[i] <> ''
)
SELECT p0.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p0.pos) AS INT) AS first_pos
FROM p p0 JOIN p p1
  ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.term = 'hash'
WHERE p0.term = 'table'
GROUP BY 1
"""


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution
    (operators/ranges.markov_attribution): journey transition
    probabilities from one user-keyed window pass, absorption via a
    FIXED 10-step power walk (unrolled identically as oracle CTEs —
    the pagerank discipline), each channel's credit = normalized drop
    in conversion probability when transitions into it redirect to
    null."""
    from gordo_spark.operators.ranges import markov_attribution

    ev = read_table(spark, sf_dir, "events")
    return markov_attribution(
        ev, "purchase", ["click", "view", "signup"], iterations=10
    )


def _markov_sql(channels=("click", "view", "signup"), iterations: int = 10) -> str:
    chs = ", ".join(f"'{c}'" for c in channels)

    def walk(prefix: str, ptable: str) -> str:
        cte = [f"{prefix}0 AS (SELECT 'start' AS s, 1.0 AS m)"]
        for i in range(1, iterations + 1):
            cte.append(
                f"{prefix}{i} AS (SELECT p.dst AS s, sum(v.m * p.pr) AS m "
                f"FROM {prefix}{i - 1} v JOIN {ptable} p ON p.src = v.s "
                "GROUP BY 1)"
            )
        return ",\n".join(cte)

    removals = []
    for c in channels:
        removals.append(
            f"p_{c} AS (SELECT src, CASE WHEN dst = '{c}' THEN 'null' "
            "ELSE dst END AS dst, sum(pr) AS pr FROM p GROUP BY 1, 2)"
        )
        removals.append(walk(f"w_{c}_", f"p_{c}"))
    res_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, (SELECT m FROM w_{c}_{iterations} "
        "WHERE s = 'conv') AS pw"
        for c in channels
    )
    return f"""
WITH conv AS (
  SELECT user_id, min(ts) AS cts FROM events
  WHERE event_type = 'purchase' GROUP BY 1
),
t AS (
  SELECT e.user_id, e.ts, e.event_id, e.event_type
  FROM events e LEFT JOIN conv c ON e.user_id = c.user_id
  WHERE e.event_type IN ({chs}) AND (c.cts IS NULL OR e.ts < c.cts)
),
seq AS (
  SELECT user_id, event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM t
),
alltrans AS (
  SELECT coalesce(prev, 'start') AS src, cur AS dst FROM seq
  UNION ALL
  SELECT s.cur,
         CASE WHEN c.user_id IS NOT NULL THEN 'conv' ELSE 'null' END
  FROM seq s LEFT JOIN conv c ON s.user_id = c.user_id WHERE s.rn = 1
  UNION ALL
  SELECT 'start', 'conv' FROM conv c
  WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.user_id = c.user_id)
),
cnt AS (SELECT src, dst, count(*) AS n FROM alltrans GROUP BY 1, 2),
p AS (
  SELECT src, dst,
         n / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS pr
  FROM cnt
  UNION ALL SELECT 'conv', 'conv', 1.0
  UNION ALL SELECT 'null', 'null', 1.0
),
{walk("b_", "p")},
{",".join(removals)},
res AS ({res_rows}),
base AS (SELECT m AS pb FROM b_{iterations} WHERE s = 'conv'),
eff AS (SELECT channel, pb, pw, 1 - pw / pb AS e FROM res, base)
SELECT channel, floor((pb) * 1000000.0 + 0.5) / 1000000.0 AS p_base, floor((pw) * 1000000.0 + 0.5) / 1000000.0 AS p_without,
       floor((e) * 1000000.0 + 0.5) / 1000000.0 AS removal_effect,
       floor((e / sum(e) OVER ()) * 1000000.0 + 0.5) / 1000000.0 AS attribution
FROM eff ORDER BY channel
"""


O_MARKOV_ATTRIBUTION = _markov_sql()


def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window top-N heavy values
    (streaming/sketches.stream_windowed_counts + topn_from_counts,
    batch semantics — the streaming job emits the identical counts at
    window close, stream==batch in tests): daily tumbling windows,
    top-3 event types, deterministic (n desc, value) tie-break."""
    from gordo_spark.streaming.sketches import (
        stream_windowed_counts,
        topn_from_counts,
    )

    ev = read_table(spark, sf_dir, "events")
    counts = stream_windowed_counts(ev, "event_type", window="1 day")
    return topn_from_counts(counts, n=3)


O_WINDOW_TOPN = """
WITH c AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS ws, event_type AS value,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT ws, value, n,
         row_number() OVER (PARTITION BY ws ORDER BY n DESC, value) AS rank
  FROM c
)
SELECT CAST(ws AS TIMESTAMP) AS window_start,
       CAST(ws + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
       value, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
"""


def q_m10_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 — L2-regularized fit (ml/models.RidgeModel): the same
    one-aggregation sufficient-statistics pass as M1's OLS, solving
    (X'X + alpha R) beta = X'y with the intercept unpenalized; oracle
    is the closed-form single-feature ridge over the identical
    aligned frame."""
    from gordo_spark.ml.models import RidgeModel

    wide = _wide_1h(spark, sf_dir)
    m = RidgeModel(["click"], ["purchase"], alpha=10.0).fit(
        wide.select("ts", "click"), wide.select("ts", "purchase")
    )
    return spark.createDataFrame(
        [(round(float(m.coef_[1, 0]), 6), round(float(m.coef_[0, 0]), 6))],
        "slope double, intercept double",
    )


O_M10_RIDGE = f"""
WITH wide AS ({_O_WIDE_1H}),
s AS (
  SELECT count(*)::DOUBLE AS n, sum(click) AS sx,
         sum(click * click) AS sxx, sum(purchase) AS sy,
         sum(click * purchase) AS sxy
  FROM wide
)
SELECT floor(((n * sxy - sx * sy) / (n * (sxx + 10.0) - sx * sx)) * 1000000.0 + 0.5) / 1000000.0
         AS slope,
       floor(((sy - ((n * sxy - sx * sy) / (n * (sxx + 10.0) - sx * sx))
              * sx) / n) * 1000000.0 + 0.5) / 1000000.0 AS intercept
FROM s
"""


def q_w26_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W26 — Holt-Winters additive triple-exponential smoothing per tag
    (operators/smoothing.holt_winters): level+trend+seasonal with a
    24-hour season on the hourly grid — the forecast a daily-cycling
    series needs (holt's residual would flag every morning). Recursive,
    so it runs the applyInPandas-per-series path like w3/w11; the
    oracle states the identical recursion as a recursive CTE carrying
    the 24-slot seasonal vector as a list. Warmup rows (the first
    season, which only seeds the state) are excluded on both engines;
    input rounded to 6dp on both so avg() summation ulps cannot
    compound through the feedback loop."""
    from gordo_spark.operators.smoothing import holt_winters

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    out = holt_winters(
        res, period=24, alpha=0.2, beta=0.1, gamma=0.3, machine_col="tag"
    )
    # warmup rows come back NULL (pandas NaN -> Arrow null), and Spark's
    # isnan(NULL) is false — test both
    return _r6(
        out.filter(
            F.col("level").isNotNull() & ~F.isnan("level")
        ).select(
            "tag", "ts", "value", "level", "trend", "seasonal", "forecast"
        ),
        "level",
        "trend",
        "seasonal",
        "forecast",
    )


def _holt_winters_sql(m: int = 24, a: float = 0.2, b: float = 0.1, g: float = 0.3) -> str:
    # the recursive step needs l_new/s_old several times; SQL has no
    # let-binding, so the expressions repeat verbatim (the w11 pattern)
    l_new = f"{a} * (s2.value - r.s[1]) + {1 - a} * (r.l + r.b)"
    b_new = f"{b} * (({l_new}) - r.l) + {1 - b} * r.b"
    s_new = f"{g} * (s2.value - ({l_new})) + {1 - g} * r.s[1]"
    return f"""
WITH RECURSIVE res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT tag, ts, value,
         row_number() OVER (PARTITION BY tag ORDER BY ts) AS rn
  FROM res
),
init AS (
  SELECT tag, avg(value) AS l0,
         list(value - l0 ORDER BY rn) AS s0
  FROM (SELECT tag, value, rn,
               avg(value) OVER (PARTITION BY tag) AS l0
        FROM seq WHERE rn <= {m})
  GROUP BY tag, l0
),
rec AS (
  SELECT tag, CAST({m} AS BIGINT) AS rn,
         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS DOUBLE) AS value,
         l0 AS l, CAST(0 AS DOUBLE) AS b, s0 AS s,
         CAST(NULL AS DOUBLE) AS sea, CAST(NULL AS DOUBLE) AS fc
  FROM init
  UNION ALL
  SELECT r.tag, s2.rn, s2.ts, s2.value,
         {l_new},
         {b_new},
         list_append(r.s[2:], {s_new}),
         {s_new},
         ({l_new}) + ({b_new}) + r.s[2]
  FROM rec r JOIN seq s2 ON s2.tag = r.tag AND s2.rn = r.rn + 1
)
SELECT tag, ts, value, floor((l) * 1000000.0 + 0.5) / 1000000.0 AS level, floor((b) * 1000000.0 + 0.5) / 1000000.0 AS trend,
       floor((sea) * 1000000.0 + 0.5) / 1000000.0 AS seasonal, floor((fc) * 1000000.0 + 0.5) / 1000000.0 AS forecast
FROM rec WHERE rn > {m}
"""


O_W26_HOLT_WINTERS = _holt_winters_sql()


def q_group_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state per-group quantile sketch
    (operators/sketches.group_quantile_sketch): 256 fixed-width bins
    from a 1-row global min/max, per-group histograms map-side
    combined, interpolated readout at the rank — the scale path
    group_quantiles' docstring promises, deterministic on any engine
    (the HLL-det design point applied to quantiles)."""
    from gordo_spark.operators.sketches import group_quantile_sketch

    ev = read_table(spark, sf_dir, "events")
    return group_quantile_sketch(
        ev, "event_type", "value", qs=(0.5, 0.9, 0.99), bins=256
    )


O_GROUP_QUANTILES_SKETCH = """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT event_type AS g, lo, hi,
         CASE WHEN hi > lo THEN least(255,
           CAST(floor((value - lo) / (hi - lo) * 256) AS INT))
         ELSE 0 END AS bin,
         count(*) AS c
  FROM events, b GROUP BY 1, 2, 3, 4
),
hist AS (
  SELECT g, lo, hi, bin, c,
         sum(c) OVER (PARTITION BY g ORDER BY bin) - c AS cum_prev,
         sum(c) OVER (PARTITION BY g) AS n
  FROM binned
),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
SELECT g AS event_type, CAST(n AS BIGINT) AS n, q,
       floor((lo + (hi - lo) / 256
             * (bin + (ceil(q * n) - cum_prev) / CAST(c AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0
         AS estimate
FROM hist, qs
WHERE cum_prev < ceil(q * n) AND cum_prev + c >= ceil(q * n)
ORDER BY event_type, q
"""


def q_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the composite quality score predicting the
    Gopher verdict (operators/experiments.auc_exact): rank-sum
    identity with tie correction over the 3dp-rounded score grid —
    does the cheap score separate what the rule panel keeps?"""
    from gordo_spark.operators.experiments import auc_exact
    from gordo_spark.operators.text import gopher_rule_exprs, quality_expr

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        quality_expr(F.col("text")).alias("score"),
        gopher_rule_exprs(F.col("text"))["keep"].alias("label"),
    )
    return auc_exact(scored, "score", "label", precision=3)


def _auc_sql() -> str:
    from gordo_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id,
         len(ws)::DOUBLE AS n_words,
         length(replace(text, ' ', ''))::DOUBLE / len(ws) AS mean_wl,
         ((len(string_split(text, '#')) - 1)
          + (len(string_split(text, '...')) - 1))::DOUBLE AS n_sym,
         len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
           / len(ws) AS alpha_frac,
         len(list_filter(ws, x -> list_contains([{sw}], x))) AS n_sw,
         length(text)::DOUBLE AS n_chars,
         (length(text)
          - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
           AS n_punct,
         len(list_distinct(ws))::DOUBLE AS n_uniq
  FROM w
),
j AS (
  SELECT floor(((least(n_words / 50.0, 1.0)
          + greatest(1.0 - (n_punct / n_chars) * 5.0, 0.0)
          + n_uniq / n_words
          + least((n_sw / n_words) * 5.0, 1.0)) / 4.0) * 1000.0 + 0.5) / 1000.0 AS s,
         (n_words >= 50 AND n_words <= 100000)
           AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
           AND (n_sym / n_words <= 0.1)
           AND (alpha_frac >= 0.8)
           AND (n_sw >= 2) AS y
  FROM m
),
hist AS (
  SELECT s, sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS q
  FROM j WHERE s IS NOT NULL AND y IS NOT NULL GROUP BY s
),
cum AS (
  SELECT s, p, q, sum(q) OVER (ORDER BY s) - q AS negs_below FROM hist
)
SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(q) AS BIGINT) AS n_neg,
       floor((CASE WHEN sum(p) > 0 AND sum(q) > 0 THEN
         sum(p * (negs_below + q / 2.0)) / (sum(p)::DOUBLE * sum(q))
       END) * 1000000.0 + 0.5) / 1000000.0 AS auc
FROM cum
"""


O_AUC_QUALITY = _auc_sql()


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (operators/quality_checks.l_diversity):
    k-anonymity's companion — a large quasi group holding ONE market
    segment still discloses the segment to a quasi-join (homogeneity
    attack). One quasi-tuple aggregation with count_distinct of the
    sensitive column + one bounded summary."""
    from gordo_spark.operators.quality_checks import l_diversity

    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_k"),
        "c_mktsegment",
    )
    return l_diversity(cust, ["c_nationkey", "bal_k"], "c_mktsegment", l=3)


O_L_DIVERSITY = """
WITH g AS (
  SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
         count(*) AS n, count(DISTINCT c_mktsegment) AS d
  FROM customer GROUP BY 1, 2
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(d) AS BIGINT) AS min_distinct_sensitive,
       CAST(sum(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       sum(CASE WHEN d < 3 THEN 1 ELSE 0 END) = 0 AS diverse
FROM g
"""


def q_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing (operators/experiments.ab_power): per-arm
    sample size to detect a 5% relative lift on the observed per-user
    purchase rate at 5%/80% — the planning aggregate that runs before
    ab_test. One per-unit collapse + one 1-row readout."""
    from gordo_spark.operators.experiments import ab_power

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("event_type") == "purchase").alias("converted")
    )
    return ab_power(ev, "user_id", "converted", mde_rel=0.05)


O_AB_POWER = """
WITH per AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
  FROM events GROUP BY 1
),
one AS (SELECT count(*) AS n_units, avg(s) AS p FROM per)
SELECT CAST(n_units AS BIGINT) AS n_units,
       floor((p) * 1000000.0 + 0.5) / 1000000.0 AS baseline_rate,
       floor((p * 0.05) * 1000000.0 + 0.5) / 1000000.0 AS mde_abs,
       CAST(CASE WHEN p > 0 AND p < 1 THEN
         ceil(2.0 * (1.96 + 0.8416) * (1.96 + 0.8416) * p * (1 - p)
              / (p * 0.05 * p * 0.05))
       END AS BIGINT) AS n_per_arm,
       CAST(CASE WHEN p > 0 AND p < 1 THEN
         ceil(2.0 * ceil(2.0 * (1.96 + 0.8416) * (1.96 + 0.8416)
                         * p * (1 - p) / (p * 0.05 * p * 0.05))
              / n_units)
       END AS BIGINT) AS runs_needed
FROM one
"""


def q_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the quality-score Brier score
    (operators/experiments.brier_decomposition): reliability /
    resolution / uncertainty over 10 fixed-width probability bins —
    the one-row companion to score_calibration's bucket curve."""
    from gordo_spark.operators.experiments import brier_decomposition
    from gordo_spark.operators.text import gopher_rule_exprs, quality_expr

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        quality_expr(F.col("text")).alias("score"),
        gopher_rule_exprs(F.col("text"))["keep"].alias("label"),
    )
    return brier_decomposition(scored, "score", "label", bins=10)


def _brier_sql() -> str:
    from gordo_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id,
         len(ws)::DOUBLE AS n_words,
         length(replace(text, ' ', ''))::DOUBLE / len(ws) AS mean_wl,
         ((len(string_split(text, '#')) - 1)
          + (len(string_split(text, '...')) - 1))::DOUBLE AS n_sym,
         len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
           / len(ws) AS alpha_frac,
         len(list_filter(ws, x -> list_contains([{sw}], x))) AS n_sw,
         length(text)::DOUBLE AS n_chars,
         (length(text)
          - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
           AS n_punct,
         len(list_distinct(ws))::DOUBLE AS n_uniq
  FROM w
),
j AS (
  SELECT (least(n_words / 50.0, 1.0)
          + greatest(1.0 - (n_punct / n_chars) * 5.0, 0.0)
          + n_uniq / n_words
          + least((n_sw / n_words) * 5.0, 1.0)) / 4.0 AS s,
         CASE WHEN (n_words >= 50 AND n_words <= 100000)
           AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
           AND (n_sym / n_words <= 0.1)
           AND (alpha_frac >= 0.8)
           AND (n_sw >= 2) THEN 1 ELSE 0 END AS y
  FROM m
),
binned AS (
  SELECT least(9, CAST(floor(s * 10) AS INT)) AS bin,
         count(*) AS n, avg(s) AS sbar, avg(CAST(y AS DOUBLE)) AS ybar,
         sum((s - y) * (s - y)) AS se
  FROM j GROUP BY 1
),
base AS (SELECT sum(ybar * n) / sum(n) AS b FROM binned)
SELECT CAST(sum(n) AS BIGINT) AS n,
       floor((sum(se) / sum(n)) * 1000000.0 + 0.5) / 1000000.0 AS brier,
       floor((sum(n * (sbar - ybar) * (sbar - ybar)) / sum(n)) * 1000000.0 + 0.5) / 1000000.0
         AS reliability,
       floor((sum(n * (ybar - base.b) * (ybar - base.b)) / sum(n)) * 1000000.0 + 0.5) / 1000000.0
         AS resolution,
       floor((max(base.b) * (1 - max(base.b))) * 1000000.0 + 0.5) / 1000000.0 AS uncertainty,
       floor((sum(n * abs(sbar - ybar)) / sum(n)) * 1000000.0 + 0.5) / 1000000.0 AS ece
FROM binned, base
"""


O_BRIER_CALIBRATION = _brier_sql()


def q_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine doc pairs (operators/text.
    sparse_cosine_pairs): inverted-index partial dot products with a
    max_df prune as the scale bound — the lexical near-template
    detector beside MinHash (unweighted sets) and semdedup
    (embeddings). Top 50 by (cosine desc, a, b)."""
    from gordo_spark.operators.text import sparse_cosine_pairs

    docs = read_table(spark, sf_dir, "documents")
    return sparse_cosine_pairs(
        docs, max_df=400, min_cosine=0.2, top_k=50
    )


O_SPARSE_COSINE = """
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
exf AS (SELECT doc_id, term FROM ex WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM exf GROUP BY 1, 2),
df_t AS (SELECT term, count(DISTINCT doc_id) AS n_docs FROM exf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
w AS (
  SELECT tf.doc_id AS id, tf.term,
         tf.tf * ln(n.n / CAST(d.n_docs AS DOUBLE)) AS w
  FROM tf JOIN df_t d ON tf.term = d.term, n
  WHERE d.n_docs <= 400
),
nrm AS (SELECT id, sqrt(sum(w * w)) AS nm FROM w GROUP BY 1),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, floor((dot / (na.nm * nb.nm)) * 1000000.0 + 0.5) / 1000000.0 AS cosine
FROM dots JOIN nrm na ON na.id = id_a JOIN nrm nb ON nb.id = id_b
WHERE floor((dot / (na.nm * nb.nm)) * 1000000.0 + 0.5) / 1000000.0 >= 0.2
ORDER BY cosine DESC, id_a, id_b
LIMIT 50
"""


def q_o12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12 — full CUBE over (returnflag, linestatus) with grouping_id:
    every subtotal combination in ONE pass (grouping sets expand
    before the partial aggregation — a single shuffle, not 4 jobs);
    grouping_id disambiguates genuine NULL keys from subtotal rows."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qround(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


O_O12_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout (operators/experiments.ab_cuped):
    per-user post-period value adjusted by the pre-period covariate
    (theta = cov/var fit pooled), md5-assigned arms, z on the adjusted
    means plus the variance_reduction CUPED buys. One per-unit
    collapse + 1-row fit broadcast + 2-row variant aggregate."""
    from gordo_spark.operators.experiments import ab_cuped

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return ab_cuped(ev, "user_id", "ts", "value", salt="exp1")


O_AB_CUPED = """
WITH mid AS (
  SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS m FROM events
),
per AS (
  SELECT user_id,
         sum(CASE WHEN epoch(ts) < m THEN value ELSE 0 END) AS pre,
         sum(CASE WHEN epoch(ts) >= m THEN value ELSE 0 END) AS post
  FROM events, mid GROUP BY 1
),
asg AS (
  SELECT *,
         ('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant
  FROM per
),
fit AS (
  SELECT covar_pop(pre, post) AS cv, var_pop(pre) AS vp, avg(pre) AS mp
  FROM asg
),
adj AS (
  SELECT variant, post,
         CASE WHEN vp > 0 THEN cv / vp ELSE 0 END AS th,
         post - (CASE WHEN vp > 0 THEN cv / vp ELSE 0 END) * (pre - mp) AS a
  FROM asg, fit
),
v AS (
  SELECT variant, count(*) AS n, avg(a) AS m, var_pop(a) AS va,
         var_pop(post) AS vr, max(th) AS th
  FROM adj GROUP BY 1
),
one AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN variant = 0 THEN n END), 0) AS BIGINT) AS n_a,
    CAST(coalesce(sum(CASE WHEN variant = 1 THEN n END), 0) AS BIGINT) AS n_b,
    max(CASE WHEN variant = 0 THEN m END) AS ma,
    max(CASE WHEN variant = 1 THEN m END) AS mb,
    max(CASE WHEN variant = 0 THEN va END) AS vva,
    max(CASE WHEN variant = 1 THEN va END) AS vvb,
    sum(va * n) / sum(n) AS vadj,
    sum(vr * n) / sum(n) AS vraw,
    max(th) AS th
  FROM v
),
st AS (
  SELECT *,
         CASE WHEN n_a > 0 AND n_b > 0 AND vva >= 0 AND vvb >= 0
              THEN sqrt(vva / n_a + vvb / n_b) END AS se
  FROM one
)
SELECT n_a, n_b, floor((ma) * 1000000.0 + 0.5) / 1000000.0 AS mean_adj_a, floor((mb) * 1000000.0 + 0.5) / 1000000.0 AS mean_adj_b,
       floor((th) * 1000000.0 + 0.5) / 1000000.0 AS theta,
       CASE WHEN vraw > 0 THEN floor((1.0 - vadj / vraw) * 1000000.0 + 0.5) / 1000000.0 END
         AS variance_reduction,
       floor((CASE WHEN se > 0 THEN (mb - ma) / se END) * 1000000.0 + 0.5) / 1000000.0 AS z,
       COALESCE(abs(CASE WHEN se > 0 THEN (mb - ma) / se END) > 1.96, FALSE)
         AS significant
FROM st
"""


def q_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mining between the even- and odd-id embedding
    halves (operators/similarity.bitext_margin): ratio margin
    cos(best) / mean(top-4) — the hubness-robust pairing criterion
    raw cosine thresholds lack; margins >= 1.02 survive."""
    from gordo_spark.operators.similarity import bitext_margin

    embs = read_table(spark, sf_dir, "embeddings")
    a = embs.filter(F.col("vec_id") % 2 == 0)
    b = embs.filter(F.col("vec_id") % 2 == 1)
    return bitext_margin(b, a, k=4, min_margin=1.02)


O_BITEXT_MARGIN = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 2 = 0
),
v AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv
  FROM embeddings WHERE vec_id % 2 = 1
),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, nv)
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(nv, nv))) AS sim
  FROM q, v
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
),
denom AS (
  SELECT query_id, avg(sim) AS av FROM ranked WHERE rank <= 4 GROUP BY 1
)
SELECT r.query_id, r.neighbor_id, floor((r.sim) * 1000000.0 + 0.5) / 1000000.0 AS cosine,
       floor((r.sim / d.av) * 1000000.0 + 0.5) / 1000000.0 AS margin
FROM ranked r JOIN denom d ON d.query_id = r.query_id
WHERE r.rank = 1 AND floor((r.sim / d.av) * 1000000.0 + 0.5) / 1000000.0 >= 1.02
ORDER BY r.query_id
"""


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the md5 arms
    (operators/experiments.diff_in_diff): per-unit post-minus-pre
    deltas at the midpoint split, arm-mean difference with
    unit-clustered SE — nets out both arm baselines and the shared
    time trend. One per-unit collapse + one 2-row arm aggregate."""
    from gordo_spark.operators.experiments import diff_in_diff

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return diff_in_diff(ev, "user_id", "ts", "value", salt="exp1")


O_DIFF_IN_DIFF = """
WITH mid AS (
  SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS m FROM events
),
per AS (
  SELECT user_id,
         sum(CASE WHEN epoch(ts) >= m THEN value ELSE 0 END)
           - sum(CASE WHEN epoch(ts) < m THEN value ELSE 0 END) AS d
  FROM events, mid GROUP BY 1
),
asg AS (
  SELECT *,
         ('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant
  FROM per
),
v AS (
  SELECT variant, count(*) AS n, avg(d) AS m, var_pop(d) AS vv
  FROM asg GROUP BY 1
),
one AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN variant = 0 THEN n END), 0) AS BIGINT) AS n_a,
    CAST(coalesce(sum(CASE WHEN variant = 1 THEN n END), 0) AS BIGINT) AS n_b,
    max(CASE WHEN variant = 0 THEN m END) AS da,
    max(CASE WHEN variant = 1 THEN m END) AS db,
    max(CASE WHEN variant = 0 THEN vv END) AS va,
    max(CASE WHEN variant = 1 THEN vv END) AS vb
  FROM v
),
st AS (
  SELECT *,
         CASE WHEN n_a > 0 AND n_b > 0
              THEN sqrt(va / n_a + vb / n_b) END AS se
  FROM one
)
SELECT n_a, n_b, floor((da) * 1000000.0 + 0.5) / 1000000.0 AS delta_a, floor((db) * 1000000.0 + 0.5) / 1000000.0 AS delta_b,
       floor((db - da) * 1000000.0 + 0.5) / 1000000.0 AS did, floor((se) * 1000000.0 + 0.5) / 1000000.0 AS se,
       floor((CASE WHEN se > 0 THEN (db - da) / se END) * 1000000.0 + 0.5) / 1000000.0 AS z,
       COALESCE(abs(CASE WHEN se > 0 THEN (db - da) / se END) > 1.96, FALSE)
         AS significant
FROM st
"""


def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over orders columns
    (operators/profile.fd_discovery): o_orderkey -> o_custkey holds
    (orderkey is the key), the reverse and the priority pairs violate
    — the profiling primitive behind key inference and redundant-
    column pruning. One exploded pass builds every ordered pair's
    per-LHS distinct counts (the key_skew_audit shape)."""
    from gordo_spark.operators.profile import fd_discovery

    o = read_table(spark, sf_dir, "orders")
    return fd_discovery(o, ["o_orderkey", "o_custkey", "o_orderpriority"])


O_FD_DISCOVERY = """
WITH ex AS (
  SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
         CAST(o_orderkey AS VARCHAR) AS av, CAST(o_custkey AS VARCHAR) AS bv
  FROM orders
  UNION ALL SELECT 'o_orderkey', 'o_orderpriority',
         CAST(o_orderkey AS VARCHAR), o_orderpriority FROM orders
  UNION ALL SELECT 'o_custkey', 'o_orderkey',
         CAST(o_custkey AS VARCHAR), CAST(o_orderkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_custkey', 'o_orderpriority',
         CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
  UNION ALL SELECT 'o_orderpriority', 'o_orderkey',
         o_orderpriority, CAST(o_orderkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderpriority', 'o_custkey',
         o_orderpriority, CAST(o_custkey AS VARCHAR) FROM orders
),
per AS (
  SELECT lhs, rhs, av, count(DISTINCT bv) AS d FROM ex GROUP BY 1, 2, 3
)
SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS n_lhs_values,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       CAST(sum(d - 1) AS BIGINT) AS excess_rhs,
       sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM per GROUP BY lhs, rhs ORDER BY lhs, rhs
"""


def q_weighted_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N weighted take (operators/sampling.weighted_take):
    Efraimidis-Spirakis A-ES keys ln(u)/w from md5-deterministic
    uniforms, top-25 documents by n_chars weight — probability
    proportional to weight, WITHOUT replacement, reproducible from
    ids alone."""
    from gordo_spark.operators.sampling import weighted_take

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    return weighted_take(docs, "doc_id", "n_chars", n=25)


O_WEIGHTED_TAKE = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         floor((ln((('0x' || substr(md5('wtake' || CAST(doc_id AS VARCHAR)), 1, 8))
                 ::BIGINT + 0.5) / 4294967296.0)
           / CAST(n_chars AS DOUBLE)) * 1000000000000.0 + 0.5) / 1000000000000.0 AS _es_key
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, n_chars, _es_key
FROM keyed ORDER BY _es_key DESC, doc_id LIMIT 25
"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (operators/text.langid_confusion
    over char_ngram_lang_id predictions): per (label, pred) cell
    counts and per-class recall — the eval that closes the loop on
    the profile-based ID model."""
    from gordo_spark.operators.text import (
        char_ngram_lang_id,
        char_ngram_lang_profiles,
        langid_confusion,
    )

    docs = read_table(spark, sf_dir, "documents")
    profiles = char_ngram_lang_profiles(docs, top_k=200, sample_mod=4)
    preds = char_ngram_lang_id(docs, profiles)
    joined = docs.select("doc_id", "lang").join(preds, "doc_id")
    return langid_confusion(joined, "lang", "lang_pred")


O_LANGID_CONFUSION = f"""
WITH preds AS (
{O_LANG_ID_NGRAM}
),
cells AS (
  SELECT d.lang AS label, p.lang_pred AS pred, count(*) AS n
  FROM documents d JOIN preds p USING (doc_id) GROUP BY 1, 2
)
SELECT label, pred, CAST(n AS BIGINT) AS n,
       floor((n / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS recall_contrib,
       label = pred AS correct
FROM cells ORDER BY label, pred
"""


def q_sql_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc SQL entry path (sources/catalog.register_tables): the
    same lake tables the operators read, queried through spark.sql —
    a pricing-summary join written as plain SQL, planned by the same
    Catalyst pipeline (pushdown/pruning/AQE) as the DataFrame API.
    Proves the second front door gives identical answers."""
    from gordo_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_mktsegment,
               o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(floor(SUM(o_totalprice) * 100.0 + 0.5) AS DOUBLE) / 100.0
                 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        GROUP BY c_mktsegment, o_orderpriority
        ORDER BY c_mktsegment, o_orderpriority
        """
    )


O_SQL_ADHOC = """
SELECT c_mktsegment, o_orderpriority,
       count(*) AS n_orders,
       floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1994-01-01'
GROUP BY c_mktsegment, o_orderpriority
ORDER BY c_mktsegment, o_orderpriority
"""


def q_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-threshold Jaccard similarity join via prefix filtering
    (operators/dedup.jaccard_threshold_join) over the dup corpus:
    guaranteed-recall exact companion to MinHash-LSH — candidates come
    from rare-first prefix posting lists, verified by array_intersect.
    Oracle is the all-pairs brute force (feasible at oracle scale;
    the prefix filter is the point at corpus scale)."""
    from gordo_spark.operators.dedup import jaccard_threshold_join

    return jaccard_threshold_join(
        _docs_with_dups(spark, sf_dir), threshold=0.9
    )


O_JACCARD_JOIN = f"""
WITH docs AS ({_O_DOCS_DUPS}),
t AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2),
                                ' ')
         )) AS toks
  FROM docs
),
tt AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.toks, b.toks)) AS inter,
         len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
           AS union_size
  FROM tt a JOIN tt b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(inter AS INT) AS inter,
       CAST(union_size AS INT) AS union_size,
       floor((inter / CAST(union_size AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM pairs WHERE inter / CAST(union_size AS DOUBLE) >= 0.9
"""


def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment join (operators/dedup.containment_join)
    over documents plus planted EXCERPTS (first 20 words of every 5th
    doc): |A∩B|/|A| >= 0.9 finds the excerpt->original pairs symmetric
    Jaccard misses. Asymmetric prefix filter: only the contained side
    prunes to its rare-first prefix; the container side indexes all
    tokens (recall requirement)."""
    from gordo_spark.operators.dedup import containment_join

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    excerpts = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 20)).alias(
            "text"
        ),
    )
    return containment_join(docs.unionByName(excerpts), threshold=0.9)


O_CONTAINMENT_JOIN = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
  FROM documents WHERE doc_id % 5 = 0
),
t AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2),
                                ' ')
         )) AS toks
  FROM corpus
),
tt AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
pairs AS (
  SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
         len(list_intersect(a.toks, b.toks)) AS inter,
         len(a.toks) AS sa
  FROM tt a JOIN tt b ON a.doc_id <> b.doc_id
)
SELECT id_contained, id_container, CAST(inter AS INT) AS inter,
       CAST(sa AS INT) AS size_contained,
       floor((inter / CAST(sa AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS containment
FROM pairs WHERE inter / CAST(sa AS DOUBLE) >= 0.9
"""


def q_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-normalization (operators/ranking.quantile_transform): every
    event value mapped to its corpus quantile at 1/100 resolution via
    exact percentile boundaries — one aggregate + row-local boundary
    count, no per-row rank, no global sort."""
    from gordo_spark.operators.ranking import quantile_transform

    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    return quantile_transform(ev, "value", k=100)


O_QUANTILE_TRANSFORM = f"""
WITH bs AS (
  SELECT [{", ".join(f"floor((quantile_cont(value, {i / 100})) * 1000000.0 + 0.5) / 1000000.0" for i in range(1, 100))}]
    AS b
  FROM events
)
SELECT event_id, value,
       floor((len(list_filter(bs.b, p -> value > p)) / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS quantile
FROM events, bs
"""


def q_k_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier generalization
    (operators/quality_checks.k_generalize): customer balances bucket
    at the NARROWEST ladder width where every bucket holds >= 25 rows
    — the enforcement step after k_anonymity's audit. One exploded
    pass builds every candidate width's histogram; the |ladder|-row
    min table collects; the chosen width applies row-locally."""
    from gordo_spark.operators.quality_checks import k_generalize

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    return k_generalize(cust, "c_acctbal", k=25)


O_K_GENERALIZE = """
WITH lad AS (
  SELECT unnest([1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 1000.0])
    AS w
),
h AS (
  SELECT w, floor(c_acctbal / w) AS b, count(*) AS c
  FROM customer, lad GROUP BY 1, 2
),
m AS (SELECT w, min(c) AS mc FROM h GROUP BY 1),
ch AS (
  SELECT coalesce(min(w) FILTER (WHERE mc >= 25), (SELECT max(w) FROM m))
    AS cw
  FROM m
),
ach AS (SELECT mc FROM m, ch WHERE m.w = ch.cw)
SELECT c_custkey, c_acctbal,
       floor(c_acctbal / ch.cw) * ch.cw AS bucket_lo,
       ch.cw AS bucket_width,
       CAST(ach.mc AS INT) AS achieved_k
FROM customer, ch, ach
"""


def q_er_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (operators/linkage.blocked_pairs ->
    operators/dedup.connected_components): fuzzy-match candidate pairs
    collapse into entity clusters, entity id = min member — the full
    dedup-by-identity pipeline (blocking bounds the pair space, label
    propagation with truncated lineage merges transitive matches)."""
    from gordo_spark.operators.dedup import connected_components
    from gordo_spark.operators.linkage import blocked_pairs

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    pairs = blocked_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"],
        max_dist=1,
    )
    return connected_components(pairs.select("id_a", "id_b"))


O_ER_ENTITIES = """
WITH RECURSIVE cand AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
    AND levenshtein(a.c_name, b.c_name) <= 1
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION
  SELECT id_b AS src, id_a AS dst FROM cand
),
cc(id, label) AS (
  SELECT src AS id, src AS label FROM edges
  UNION
  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src
)
SELECT id, min(label) AS component FROM cc GROUP BY id
"""


def q_sliced_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language AUC of the quality score predicting the Gopher
    verdict (operators/experiments.sliced_auc): the slice-finder
    readout — a healthy global AUC can hide a slice where the score is
    useless; per-slice rank-sum AUC over the 3dp score grid."""
    from gordo_spark.operators.experiments import sliced_auc
    from gordo_spark.operators.text import gopher_rule_exprs, quality_expr

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        quality_expr(F.col("text")).alias("score"),
        gopher_rule_exprs(F.col("text"))["keep"].alias("label"),
    )
    return sliced_auc(scored, "score", "label", "lang", precision=3)


def _sliced_auc_sql() -> str:
    from gordo_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH w AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(ws)::DOUBLE AS n_words,
         length(replace(text, ' ', ''))::DOUBLE / len(ws) AS mean_wl,
         ((len(string_split(text, '#')) - 1)
          + (len(string_split(text, '...')) - 1))::DOUBLE AS n_sym,
         len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
           / len(ws) AS alpha_frac,
         len(list_filter(ws, x -> list_contains([{sw}], x))) AS n_sw,
         length(text)::DOUBLE AS n_chars,
         (length(text)
          - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
           AS n_punct,
         len(list_distinct(ws))::DOUBLE AS n_uniq
  FROM w
),
j AS (
  SELECT lang,
         floor(((least(n_words / 50.0, 1.0)
          + greatest(1.0 - (n_punct / n_chars) * 5.0, 0.0)
          + n_uniq / n_words
          + least((n_sw / n_words) * 5.0, 1.0)) / 4.0) * 1000.0 + 0.5) / 1000.0 AS s,
         (n_words >= 50 AND n_words <= 100000)
           AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
           AND (n_sym / n_words <= 0.1)
           AND (alpha_frac >= 0.8)
           AND (n_sw >= 2) AS y
  FROM m
),
hist AS (
  SELECT lang, s, sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS q
  FROM j WHERE s IS NOT NULL AND y IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT lang, p, q,
         sum(q) OVER (PARTITION BY lang ORDER BY s) - q AS nb
  FROM hist
)
SELECT lang, CAST(sum(p) AS BIGINT) AS n_pos,
       CAST(sum(q) AS BIGINT) AS n_neg,
       floor((CASE WHEN sum(p) > 0 AND sum(q) > 0 THEN
         sum(p * (nb + q / 2.0)) / (sum(p)::DOUBLE * sum(q))
       END) * 1000000.0 + 0.5) / 1000000.0 AS auc
FROM cum GROUP BY lang ORDER BY lang
"""


O_SLICED_AUC = _sliced_auc_sql()


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival burstiness (operators/ranges.burstiness):
    B = (sigma - mu)/(sigma + mu) over event gaps — the temporal
    bot/automation screen volume metrics can't see (machine timing at
    human volume). One user-partitioned lag window + one hash agg."""
    from gordo_spark.operators.ranges import burstiness

    ev = read_table(spark, sf_dir, "events")
    return burstiness(ev, "user_id", "ts", "event_id", min_events=5)


O_BURSTINESS = """
WITH g AS (
  SELECT user_id,
         epoch(ts) - lag(epoch(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap
  FROM events
),
per AS (
  SELECT user_id, count(*) + 1 AS n_events,
         avg(gap) AS mu, coalesce(stddev_pop(gap), 0.0) AS sd
  FROM g WHERE gap IS NOT NULL GROUP BY 1
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       floor((mu) * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_s,
       CASE WHEN mu > 0 THEN floor((sd / mu) * 1000000.0 + 0.5) / 1000000.0 END AS cv,
       CASE WHEN sd + mu > 0 THEN floor(((sd - mu) / (sd + mu)) * 1000000.0 + 0.5) / 1000000.0 END
         AS burstiness
FROM per WHERE n_events >= 5
"""


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate (operators/experiments.srm_check):
    chi-square of the md5-assigned variant counts against 50/50 over
    distinct event users at alpha = 0.001 — the validity check that
    must pass BEFORE ab_test/ab_cuped readouts mean anything. Uses the
    equal-expected identity chi2 = k*sum(n^2)/N - N: one distinct
    collapse + one 2-row aggregate."""
    from gordo_spark.operators.experiments import srm_check

    ev = read_table(spark, sf_dir, "events").select("user_id")
    return srm_check(ev, "user_id", n_variants=2, salt="exp1")


O_SRM_CHECK = """
WITH u AS (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
),
a AS (
  SELECT (('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))
            ::BIGINT % 2) AS variant
  FROM u
),
per AS (SELECT variant, count(*) AS n FROM a GROUP BY 1)
SELECT CAST(sum(n) AS BIGINT) AS n_units,
       2 AS n_variants,
       CAST(min(n) AS BIGINT) AS min_count,
       CAST(max(n) AS BIGINT) AS max_count,
       floor((2.0 * sum(n * n) / sum(n) - sum(n)) * 1000000.0 + 0.5) / 1000000.0 AS chi2,
       (2.0 * sum(n * n) / sum(n) - sum(n)) > 10.828 AS srm
FROM per
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test (operators/experiments.mann_whitney): per-user
    total event value (heavy-tailed spend) compared between the
    md5-assigned A/B halves — the nonparametric readout beside
    ab_zstat's proportion test. Values on the 2dp grid; rank sums in
    exact LONG arithmetic (doubled ranks), so z is bit-stable."""
    from gordo_spark.operators.experiments import ab_assign, mann_whitney

    ev = read_table(spark, sf_dir, "events").select("user_id", "value")
    per = ev.groupBy("user_id").agg(F.sum("value").alias("spend"))
    return mann_whitney(
        ab_assign(per, "user_id", n_variants=2, salt="exp1"),
        "variant",
        "spend",
        precision=2,
    )


O_MANN_WHITNEY = """
WITH per AS (
  SELECT user_id, floor((sum(value)) * 100.0 + 0.5) / 100.0 AS v FROM events GROUP BY 1
),
a AS (
  SELECT v,
         (('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))
            ::BIGINT % 2) AS g
  FROM per WHERE v IS NOT NULL
),
h AS (
  SELECT v, count(*) AS t, CAST(sum(g) AS BIGINT) AS t1
  FROM a GROUP BY 1
),
r AS (
  SELECT t, t1,
         2 * sum(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - t + 1 AS rbar2
  FROM h
),
s AS (
  SELECT CAST(sum(t) - sum(t1) AS BIGINT) AS n0,
         CAST(sum(t1) AS BIGINT) AS n1,
         CAST(sum(t1 * rbar2) AS BIGINT) AS r2,
         CAST(sum(t * t * t - t) AS BIGINT) AS ties
  FROM r
)
SELECT n0, n1,
       floor(((r2 - n1 * (n1 + 1)) / 2.0) * 1000000.0 + 0.5) / 1000000.0 AS u1,
       floor((CASE WHEN n0 > 0 AND n1 > 0 AND
         (n0 * n1 / 12.0 * ((n0 + n1 + 1)
            - ties / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1)))) > 0
       THEN ((r2 - n1 * (n1 + 1)) / 2.0 - n0 * n1 / 2.0)
            / sqrt(n0 * n1 / 12.0 * ((n0 + n1 + 1)
                - ties / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1))))
       END) * 1000000.0 + 0.5) / 1000000.0 AS z,
       coalesce(CASE WHEN n0 > 0 AND n1 > 0 AND
         (n0 * n1 / 12.0 * ((n0 + n1 + 1)
            - ties / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1)))) > 0
       THEN abs(((r2 - n1 * (n1 + 1)) / 2.0 - n0 * n1 / 2.0)
            / sqrt(n0 * n1 / 12.0 * ((n0 + n1 + 1)
                - ties / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1)))))
            > 1.96
       END, FALSE) AS significant
FROM s
"""


def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the exact-cosine retriever (operators/experiments.
    mrr_at_k): same ranked/relevance inputs as ndcg_at_k (label match
    over cosine_topk), collapsed to the first-hit summary — n_queries,
    hit rate, mean reciprocal rank (0 for missed queries, stated)."""
    from gordo_spark.operators.experiments import mrr_at_k
    from gordo_spark.operators.similarity import cosine_topk

    embs = read_table(spark, sf_dir, "embeddings")
    ranked = cosine_topk(embs, embs.filter(F.col("vec_id") < 5), k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    qlab = embs.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
    )
    dlab = embs.select(
        F.col("vec_id").alias("doc_id"), F.col("label").alias("_dl")
    )
    rel = (
        ranked.join(qlab, "query_id")
        .join(dlab, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("_ql") == F.col("_dl")).cast("int").alias("rel"),
        )
    )
    return mrr_at_k(ranked, rel, k=10)


O_MRR = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS doc_id, q.ql, e.label AS dl,
         list_dot_product(qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))) AS sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, doc_id, ql, dl,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= 10
),
per AS (
  SELECT query_id,
         min(CASE WHEN ql = dl THEN rank END) AS first
  FROM ranked GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN first IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       floor((avg(CASE WHEN first IS NOT NULL THEN 1.0 ELSE 0.0 END)) * 1000000.0 + 0.5) / 1000000.0
         AS hit_rate,
       floor((avg(coalesce(1.0 / first, 0.0))) * 1000000.0 + 0.5) / 1000000.0 AS mrr
FROM per
"""


def q_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift deciles (operators/experiments.qini_curve):
    lift_curve's pseudo-score and high-value label, with a SECOND
    independent md5 assignment (customer-level treatment) — per-decile
    treated-minus-control response and cumulative incremental
    conversions. The causal targeting readout beside lift_curve's
    observational one."""
    from gordo_spark.operators.dedup import md5_long
    from gordo_spark.operators.experiments import qini_curve

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.pmod(F.col("o_orderkey") * 37, F.lit(1000)) / 1000.0).alias("p"),
        F.pmod(
            md5_long(F.concat(F.lit("t1"), F.col("o_custkey").cast("string"))),
            F.lit(2),
        ).cast("int").alias("treated"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("y"),
    )
    return qini_curve(
        orders, "p", "treated", "y", n_buckets=10, id_col="o_orderkey"
    )


O_QINI_CURVE = """
WITH r AS (
  SELECT o_orderkey,
         floor((((o_orderkey * 37) % 1000) / 1000.0) * 1000.0 + 0.5) / 1000.0 AS p,
         (('0x' || substr(md5('t1' || CAST(o_custkey AS VARCHAR)), 1, 8))
            ::BIGINT % 2) AS t,
         CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS y
  FROM orders
),
binned AS (
  SELECT ntile(10) OVER (ORDER BY p DESC, o_orderkey) AS bucket, t, y
  FROM r
),
agg AS (
  SELECT bucket,
         CAST(sum(t) AS BIGINT) AS n_t,
         CAST(sum(1 - t) AS BIGINT) AS n_c,
         CAST(sum(t * y) AS BIGINT) AS pos_t,
         CAST(sum((1 - t) * y) AS BIGINT) AS pos_c
  FROM binned GROUP BY 1
)
SELECT bucket, n_t, n_c, pos_t, pos_c,
       floor((CASE WHEN n_t > 0 AND n_c > 0
             THEN pos_t / CAST(n_t AS DOUBLE)
                  - pos_c / CAST(n_c AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0 AS uplift,
       floor((CASE WHEN sum(n_c) OVER w > 0
             THEN sum(pos_t) OVER w
                  - sum(pos_c) OVER w
                    * (sum(n_t) OVER w / CAST(sum(n_c) OVER w AS DOUBLE))
             END) * 1000000.0 + 0.5) / 1000000.0 AS cum_qini
FROM agg
WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY bucket
"""


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-released group counts (operators/quality_checks.
    dp_group_counts): per (lang, source) document counts plus
    deterministic Laplace(1/eps) noise from md5-derived uniforms (the
    bootstrap_ci trick applied to privacy noise), eps = 0.5 — the
    release side of the k_anonymity/l_diversity audit family."""
    from gordo_spark.operators.quality_checks import dp_group_counts

    docs = read_table(spark, sf_dir, "documents").select("lang", "source")
    return dp_group_counts(
        docs, ["lang", "source"], epsilon=0.5, salt="dp1"
    ).orderBy("lang", "source")


O_DP_COUNTS = """
WITH g AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
),
k AS (
  SELECT lang, source, n,
         (('0x' || substr(md5('dp1' ||
             concat_ws('|', CAST(lang AS VARCHAR),
                            CAST(source AS VARCHAR))), 1, 8))
            ::BIGINT + 0.5) / 4294967296.0 AS u
  FROM g
),
noised AS (
  SELECT lang, source, n,
         -2.0 * (CASE WHEN u > 0.5 THEN 1.0
                      WHEN u < 0.5 THEN -1.0 ELSE 0.0 END)
              * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
  FROM k
)
SELECT lang, source, CAST(n AS BIGINT) AS n,
       floor((noise) * 1000000.0 + 0.5) / 1000000.0 AS noise,
       GREATEST(CAST(0 AS BIGINT),
                CAST(floor((n + noise) * 1.0 + 0.5) / 1.0 AS BIGINT)) AS released
FROM noised ORDER BY lang, source
"""


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/quality_checks.t_closeness): per
    (mktsegment, nationkey) group, ordered-EMD between the group's
    account-balance-bucket distribution and the table-wide one —
    the third anonymity rung after k_anonymity and l_diversity.
    One (qi, value) histogram scan; grid broadcast densification."""
    from gordo_spark.operators.quality_checks import t_closeness

    cust = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_k"),
    )
    return t_closeness(
        cust, ["c_mktsegment", "c_nationkey"], "bal_k", t=0.15
    )


O_T_CLOSENESS = """
WITH base AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
),
gv AS (
  SELECT c_mktsegment, c_nationkey, v, count(*) AS c
  FROM base GROUP BY 1, 2, 3
),
grid AS (SELECT v, sum(c) AS gc FROM gv GROUP BY 1),
grid2 AS (
  SELECT v, gc / (SELECT sum(gc) FROM grid) AS p,
         (SELECT count(*) FROM grid) AS m
  FROM grid
),
gsz AS (
  SELECT c_mktsegment, c_nationkey, sum(c) AS n FROM gv GROUP BY 1, 2
),
dense AS (
  SELECT gsz.c_mktsegment, gsz.c_nationkey, gsz.n, g.v, g.p, g.m,
         coalesce(gv.c, 0) / CAST(gsz.n AS DOUBLE) AS q
  FROM gsz CROSS JOIN grid2 g
  LEFT JOIN gv ON gv.c_mktsegment = gsz.c_mktsegment
              AND gv.c_nationkey = gsz.c_nationkey AND gv.v = g.v
),
cum AS (
  SELECT c_mktsegment, c_nationkey, n, m,
         abs(sum(q) OVER w - sum(p) OVER w) AS d
  FROM dense
  WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
emd AS (
  SELECT c_mktsegment, c_nationkey, n,
         floor((sum(d) / (max(m) - 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS emd
  FROM cum GROUP BY 1, 2, 3
)
SELECT c_mktsegment, c_nationkey, CAST(n AS BIGINT) AS n, emd,
       emd > 0.15 AS violating
FROM emd ORDER BY c_mktsegment, c_nationkey
"""


def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W27 — Schuster periodogram at candidate periods 6h/24h/7d over
    the hourly grid (operators/tsa.periodogram): demeaned DFT-bin
    power answering WHICH cycle a tag follows, where acf answers
    whether a GIVEN lag correlates. Phase from t mod p keeps the trig
    engine-agnostic; one window + one (tag, period) aggregate."""
    from gordo_spark.operators.tsa import periodogram

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return periodogram(res, [21600, 86400, 604800])


O_PERIODOGRAM = """
WITH res AS (
  SELECT event_type AS tag,
         floor(epoch(ts) / 3600) * 3600 AS t,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
dm AS (
  SELECT tag, t,
         value - avg(value) OVER (PARTITION BY tag) AS d
  FROM res
),
per AS (
  SELECT tag, t, d, p.period_s
  FROM dm CROSS JOIN (VALUES (21600), (86400), (604800)) AS p(period_s)
),
agg AS (
  SELECT tag, period_s, count(*) AS n,
         sum(d * cos(2 * pi() * (CAST(t AS BIGINT) % period_s)
                     / period_s)) AS sc,
         sum(d * sin(2 * pi() * (CAST(t AS BIGINT) % period_s)
                     / period_s)) AS ss
  FROM per GROUP BY 1, 2
)
SELECT tag, period_s, CAST(n AS BIGINT) AS n,
       floor(((sc * sc + ss * ss) / n) * 1000000.0 + 0.5) / 1000000.0 AS power
FROM agg ORDER BY tag, period_s
"""


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (operators/graph.hits): 8 fixed power
    steps over the DIRECTED customer -> supplier order graph (ids
    prefixed to keep the bipartition disjoint) — hub ranks customers
    concentrating on well-connected suppliers, authority ranks those
    suppliers. L1-normalized once at the end (linear lineage); the
    DuckDB oracle unrolls the identical 16 half-steps as CTEs."""
    from gordo_spark.operators.graph import hits

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
    )
    return hits(edges, iterations=8)


def _hits_sql(iterations: int = 8) -> str:
    head = """
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS s,
                  's' || CAST(l_suppkey AS VARCHAR) AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
nodes AS (SELECT s AS v FROM e UNION SELECT d FROM e),
h0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS hub FROM nodes)"""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f""",
a{k} AS (
  SELECT n.v, coalesce(x.r, 0.0) AS auth
  FROM nodes n LEFT JOIN (
    SELECT e.d AS v, sum(h.hub) AS r
    FROM e JOIN h{k - 1} h ON h.v = e.s GROUP BY e.d
  ) x ON x.v = n.v
),
h{k} AS (
  SELECT n.v, coalesce(x.r, 0.0) AS hub
  FROM nodes n LEFT JOIN (
    SELECT e.s AS v, sum(a.auth) AS r
    FROM e JOIN a{k} a ON a.v = e.d GROUP BY e.s
  ) x ON x.v = n.v
)""")
    tail = f""",
hb AS (
  SELECT h.v, h.hub, a.auth
  FROM h{iterations} h JOIN a{iterations} a ON a.v = h.v
),
tot AS (SELECT sum(hub) AS th, sum(auth) AS ta FROM hb)
SELECT v,
       floor((CASE WHEN th > 0 THEN hub / th ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS hub,
       floor((CASE WHEN ta > 0 THEN auth / ta ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS auth
FROM hb, tot ORDER BY v
"""
    return head + "".join(steps) + tail


O_HITS = _hits_sql()


def q_w28_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W28 — local-level Kalman filter per tag over the hourly grid
    (operators/smoothing.kalman_level): adaptive-gain level + per-point
    posterior variance, q=0.01/r=1 — the uncertainty-carrying upgrade
    of w3_ewma (the EWMA alpha IS this filter's converged gain). One
    applyInPandas group per tag (the holt posture); the oracle carries
    (x, P) through the identical recursive CTE."""
    from gordo_spark.operators.smoothing import kalman_level

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    return kalman_level(res, "value", q=0.01, r=1.0, machine_col="tag")


O_W28_KALMAN = """
WITH RECURSIVE res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT tag, ts, value,
         row_number() OVER (PARTITION BY tag ORDER BY ts) AS rn
  FROM res
),
rec AS (
  SELECT tag, ts, rn, value,
         value AS x, CAST(1.0 AS DOUBLE) AS p, CAST(1.0 AS DOUBLE) AS k
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.tag, s.ts, s.rn, s.value,
         r.x + ((r.p + 0.01) / (r.p + 0.01 + 1.0)) * (s.value - r.x),
         (1.0 - (r.p + 0.01) / (r.p + 0.01 + 1.0)) * (r.p + 0.01),
         (r.p + 0.01) / (r.p + 0.01 + 1.0)
  FROM rec r JOIN seq s ON s.tag = r.tag AND s.rn = r.rn + 1
)
SELECT tag, ts, value,
       floor((x) * 1000000.0 + 0.5) / 1000000.0 AS level, floor((k) * 1000000.0 + 0.5) / 1000000.0 AS gain, floor((p) * 1000000.0 + 0.5) / 1000000.0 AS p
FROM rec
"""


def q_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence (operators/experiments.tost_equivalence):
    is per-user spend the SAME across the md5 A/B halves to within
    ±5 currency units? The readout a non-significant ab_zstat cannot
    give. One sufficient-stats aggregation."""
    from gordo_spark.operators.experiments import ab_assign, tost_equivalence

    ev = read_table(spark, sf_dir, "events").select("user_id", "value")
    per = ev.groupBy("user_id").agg(F.sum("value").alias("spend"))
    return tost_equivalence(
        ab_assign(per, "user_id", n_variants=2, salt="exp1"),
        "variant",
        "spend",
        margin=5.0,
    )


O_TOST = """
WITH per AS (
  SELECT user_id, sum(value) AS v FROM events GROUP BY 1
),
a AS (
  SELECT v,
         (('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))
            ::BIGINT % 2) AS g
  FROM per WHERE v IS NOT NULL
),
s AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         sum(CASE WHEN g = 0 THEN v ELSE 0.0 END) AS s0,
         sum(CASE WHEN g = 1 THEN v ELSE 0.0 END) AS s1,
         sum(CASE WHEN g = 0 THEN v * v ELSE 0.0 END) AS q0,
         sum(CASE WHEN g = 1 THEN v * v ELSE 0.0 END) AS q1
  FROM a
),
d AS (
  SELECT n0, n1,
         s1 / n1 - s0 / n0 AS diff,
         sqrt((q0 / n0 - (s0 / n0) * (s0 / n0)) / n0
              + (q1 / n1 - (s1 / n1) * (s1 / n1)) / n1) AS se
  FROM s
)
SELECT n0, n1,
       floor((CASE WHEN n0 > 0 AND n1 > 0 THEN diff END) * 1000000.0 + 0.5) / 1000000.0 AS diff,
       floor((CASE WHEN n0 > 0 AND n1 > 0 AND se > 0 THEN se END) * 1000000.0 + 0.5) / 1000000.0 AS se,
       floor((CASE WHEN n0 > 0 AND n1 > 0 AND se > 0
             THEN (diff + 5.0) / se END) * 1000000.0 + 0.5) / 1000000.0 AS z_lower,
       floor((CASE WHEN n0 > 0 AND n1 > 0 AND se > 0
             THEN (5.0 - diff) / se END) * 1000000.0 + 0.5) / 1000000.0 AS z_upper,
       coalesce(CASE WHEN n0 > 0 AND n1 > 0 AND se > 0
             THEN (diff + 5.0) / se > 1.6449
                  AND (5.0 - diff) / se > 1.6449 END,
             FALSE) AS equivalent
FROM d
"""


def q_llr_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning LLR collocations (operators/text.llr_bigrams): top-20
    bigrams by 2x2 contingency log-likelihood ratio, min_count 5 —
    the volume-honest upgrade of pmi_cooccur (PMI maximizes on rare
    pairs; LLR weighs evidence). Same one-scan persisted-count plan."""
    from gordo_spark.operators.text import llr_bigrams

    return llr_bigrams(
        read_table(spark, sf_dir, "documents"), min_count=5, topk=20
    )


O_LLR_BIGRAMS = """
WITH t AS (
  SELECT string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
pos AS (SELECT w, unnest(range(1, len(w))) AS i FROM t),
bi AS (SELECT w[i] AS w1, w[i + 1] AS w2 FROM pos),
c AS (SELECT w1, w2, count(*) AS n FROM bi GROUP BY 1, 2),
tot AS (SELECT sum(n) AS nn FROM c),
l AS (SELECT w1, sum(n) AS c1 FROM c GROUP BY w1),
r AS (SELECT w2, sum(n) AS c2 FROM c GROUP BY w2),
k AS (
  SELECT c.w1, c.w2, c.n,
         CAST(c.n AS DOUBLE) AS k11,
         CAST(l.c1 - c.n AS DOUBLE) AS k12,
         CAST(r.c2 - c.n AS DOUBLE) AS k21,
         CAST(tot.nn - l.c1 - r.c2 + c.n AS DOUBLE) AS k22,
         CAST(l.c1 AS DOUBLE) AS r1,
         CAST(tot.nn - l.c1 AS DOUBLE) AS r2,
         CAST(r.c2 AS DOUBLE) AS cc1,
         CAST(tot.nn - r.c2 AS DOUBLE) AS cc2,
         CAST(tot.nn AS DOUBLE) AS nn
  FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
  WHERE c.n >= 5
)
SELECT w1, w2, n,
       floor((2.0 * (
         (CASE WHEN k11 > 0 THEN k11 * ln(k11 * nn / (r1 * cc1)) ELSE 0.0 END)
         + (CASE WHEN k12 > 0 THEN k12 * ln(k12 * nn / (r1 * cc2)) ELSE 0.0 END)
         + (CASE WHEN k21 > 0 THEN k21 * ln(k21 * nn / (r2 * cc1)) ELSE 0.0 END)
         + (CASE WHEN k22 > 0 THEN k22 * ln(k22 * nn / (r2 * cc2)) ELSE 0.0 END)
       )) * 1000000.0 + 0.5) / 1000000.0 AS llr
FROM k
ORDER BY llr DESC, w1, w2
LIMIT 20
"""


def q_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square term selection (operators/text.chi2_terms): top-10
    terms most associated with each language by document-frequency
    2x2 chi-square (min_df 5) — the supervised vocabulary screen
    before nb_classify. Exact-integer numerators; per-class top-k
    window over the pruned vocab."""
    from gordo_spark.operators.text import chi2_terms

    return chi2_terms(
        read_table(spark, sf_dir, "documents"),
        label_col="lang",
        min_df=5,
        topk=10,
    )


O_CHI2_TERMS = """
WITH base AS (
  SELECT lang, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
),
tc AS (SELECT lang, w, count(*) AS a FROM base GROUP BY 1, 2),
nclass AS (SELECT lang, count(*) AS ny FROM documents GROUP BY 1),
nall AS (SELECT sum(ny) AS n FROM nclass),
termtot AS (SELECT w, sum(a) AS dfw FROM tc GROUP BY 1),
j AS (
  SELECT tc.lang, tc.w, tc.a, termtot.dfw, nclass.ny, nall.n
  FROM tc JOIN nclass USING (lang) JOIN termtot USING (w) CROSS JOIN nall
  WHERE termtot.dfw >= 5
),
scored AS (
  SELECT lang, w, a AS df_in, dfw - a AS df_out,
         floor((CAST(n AS DOUBLE)
           * CAST(a * (n - dfw - ny + a) - (dfw - a) * (ny - a) AS DOUBLE)
           * CAST(a * (n - dfw - ny + a) - (dfw - a) * (ny - a) AS DOUBLE)
           / (CAST(dfw AS DOUBLE) * CAST(n - dfw AS DOUBLE)
              * CAST(ny AS DOUBLE) * CAST(n - ny AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS chi2
  FROM j
)
SELECT lang AS label, w AS term, CAST(df_in AS BIGINT) AS df_in,
       CAST(df_out AS BIGINT) AS df_out, chi2,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY chi2 DESC, w) AS rank
  FROM scored
)
WHERE rank <= 10
ORDER BY label, rank
"""


def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes self-classification
    (operators/text.nb_classify): Laplace-1 token models per language,
    every doc scored against every class, confusion counts + per-class
    recall — the bag-of-words cross-check on langid_confusion's
    char-ngram model."""
    from gordo_spark.operators.text import nb_classify

    return nb_classify(read_table(spark, sf_dir, "documents"), alpha=1.0)


O_NB_CLASSIFY = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
),
cw AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY 1, 2),
vocab AS (SELECT count(DISTINCT w) AS v FROM cw),
toty AS (SELECT lang, sum(c) AS tot FROM cw GROUP BY 1),
classes AS (SELECT lang, count(*) AS ny FROM documents GROUP BY 1),
prior AS (
  SELECT lang AS cls, ln(ny / CAST((SELECT sum(ny) FROM classes) AS DOUBLE))
           AS lp
  FROM classes
),
tokmarg AS (SELECT DISTINCT w FROM cw),
lk AS (
  SELECT t.cls, m.w,
         ln((coalesce(cw.c, 0) + 1.0) / (t.tot + 1.0 * vocab.v)) AS ll
  FROM tokmarg m
  CROSS JOIN (SELECT lang AS cls, tot FROM toty) t
  CROSS JOIN vocab
  LEFT JOIN cw ON cw.lang = t.cls AND cw.w = m.w
),
scored AS (
  SELECT toks.doc_id, toks.lang AS true_lang, lk.cls,
         floor((sum(lk.ll) + any_value(prior.lp)) * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM toks
  JOIN lk ON lk.w = toks.w
  JOIN prior ON prior.cls = lk.cls
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, true_lang, cls AS pred_lang
  FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cls) AS rk
    FROM scored
  ) WHERE rk = 1
),
conf AS (
  SELECT true_lang AS label, pred_lang AS pred, count(*) AS n
  FROM pred GROUP BY 1, 2
)
SELECT label, pred, CAST(n AS BIGINT) AS n,
       floor((CASE WHEN label = pred
             THEN n / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE)
             END) * 1000000.0 + 0.5) / 1000000.0 AS recall
FROM conf ORDER BY label, pred
"""


def q_w29_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W29 — classical additive decomposition per tag over the hourly
    grid (operators/tsa.stl_decompose): ±12h RANGE-mean trend,
    hour-of-day seasonal means of the detrended series, residual —
    w18_trend + w14_seasonal fused into the one-shot readout."""
    from gordo_spark.operators.tsa import stl_decompose

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    return stl_decompose(
        res, period_buckets=24, half_window=12, bucket_seconds=3600
    )


O_W29_STL = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(epoch(ts)/3600)*3600 AS t,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2, 3
),
iv AS (
  SELECT *, CAST(floor((value * 1000000.0) * 1.0 + 0.5) / 1.0 AS BIGINT) AS ivv FROM res
),
tr AS (
  SELECT tag, ts, t, value,
         CAST(sum(ivv) OVER w AS DOUBLE) / count(ivv) OVER w
           / 1000000.0 AS trend
  FROM iv
  WINDOW w AS (PARTITION BY tag ORDER BY t
               RANGE BETWEEN 43200 PRECEDING AND 43200 FOLLOWING)
),
ph AS (
  SELECT *, CAST(floor(t / 3600) AS BIGINT) % 24 AS phv,
         CAST(floor((floor((value - trend) * 1000000.0 + 0.5) / 1000000.0 * 1000000.0) * 1.0 + 0.5) / 1.0 AS BIGINT)
           AS di
  FROM tr
),
se AS (
  SELECT tag, phv,
         CAST(sum(di) AS DOUBLE) / count(di) / 1000000.0 AS seasonal
  FROM ph GROUP BY 1, 2
)
SELECT ph.tag, ph.ts, ph.value AS value,
       floor((ph.trend) * 1000000.0 + 0.5) / 1000000.0 AS trend,
       floor((se.seasonal) * 1000000.0 + 0.5) / 1000000.0 AS seasonal,
       floor((ph.value - ph.trend - se.seasonal) * 1000000.0 + 0.5) / 1000000.0 AS resid
FROM ph JOIN se ON se.tag = ph.tag AND se.phv = ph.phv
ORDER BY ph.tag, ph.ts
"""


def q_pr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1@10 (operators/experiments.pr_at_k): the
    cut-depth readout beside mrr_at_k and ndcg_at_k — corpus-side
    relevant totals from the label histogram (n_same_label - 1), top-k
    hits from the exact-cosine retriever."""
    from gordo_spark.operators.experiments import pr_at_k
    from gordo_spark.operators.similarity import cosine_topk

    embs = read_table(spark, sf_dir, "embeddings")
    ranked = cosine_topk(embs, embs.filter(F.col("vec_id") < 5), k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    qlab = embs.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
    )
    dlab = embs.select(
        F.col("vec_id").alias("doc_id"), F.col("label").alias("_dl")
    )
    rel = (
        ranked.join(qlab, "query_id")
        .join(dlab, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("_ql") == F.col("_dl")).cast("int").alias("rel"),
        )
    )
    labcnt = embs.groupBy("label").agg(F.count(F.lit(1)).alias("_nl"))
    totals = qlab.join(F.broadcast(labcnt), qlab._ql == labcnt.label).select(
        "query_id", (F.col("_nl") - 1).alias("n_rel")
    )
    return pr_at_k(ranked, rel, totals, k=10)


O_PR_AT_K = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS doc_id, q.ql, e.label AS dl,
         list_dot_product(qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))) AS sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, doc_id, ql, dl,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= 10
),
hits AS (
  SELECT query_id,
         CAST(sum(CASE WHEN ql = dl THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel_at_k
  FROM ranked GROUP BY 1
),
labcnt AS (SELECT label, count(*) AS nl FROM embeddings GROUP BY 1),
totals AS (
  SELECT e.vec_id AS query_id, CAST(labcnt.nl - 1 AS BIGINT) AS n_rel_total
  FROM embeddings e JOIN labcnt ON labcnt.label = e.label
  WHERE e.vec_id < 5
)
SELECT h.query_id, h.n_rel_at_k,
       coalesce(t.n_rel_total, 0) AS n_rel_total,
       floor((h.n_rel_at_k / 10.0) * 1000000.0 + 0.5) / 1000000.0 AS precision,
       floor((CASE WHEN t.n_rel_total > 0
             THEN h.n_rel_at_k / CAST(t.n_rel_total AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0
         AS recall,
       floor((CASE WHEN t.n_rel_total > 0
              AND (h.n_rel_at_k / 10.0
                   + h.n_rel_at_k / CAST(t.n_rel_total AS DOUBLE)) > 0
             THEN 2.0 * (h.n_rel_at_k / 10.0)
                  * (h.n_rel_at_k / CAST(t.n_rel_total AS DOUBLE))
                  / (h.n_rel_at_k / 10.0
                     + h.n_rel_at_k / CAST(t.n_rel_total AS DOUBLE))
             END) * 1000000.0 + 0.5) / 1000000.0 AS f1
FROM hits h LEFT JOIN totals t USING (query_id)
ORDER BY query_id
"""


def q_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (operators/graph.bfs_depths): hop distance from
    the Brand#13 parts through the co-purchase graph (same support-2
    edges as pagerank/triangles), capped at 6 — the recall-radius
    readout. Min-label propagation; oracle unrolls the identical 6
    min-steps as CTEs."""
    from gordo_spark.operators.graph import bfs_depths, co_occurrence_edges

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    nodes = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .distinct()
    )
    seeds = nodes.join(
        part.filter(F.col("p_brand") == "Brand#13").select(
            F.col("p_partkey").alias("v")
        ),
        "v",
    )
    return bfs_depths(edges, seeds, max_depth=6)


def _bfs_sql(max_depth: int = 6) -> str:
    head = """
WITH e0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (
  SELECT a.p AS a, b.p AS b, count(*) AS n
  FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
),
e AS (SELECT a, b FROM cnt WHERE n >= 2),
ed AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
nodes AS (SELECT DISTINCT src AS v FROM ed),
d0 AS (
  SELECT n.v, 0 AS depth
  FROM nodes n JOIN part ON part.p_partkey = n.v
  WHERE part.p_brand = 'Brand#13'
)"""
    steps = []
    for k in range(1, max_depth + 1):
        steps.append(f""",
d{k} AS (
  SELECT v, min(depth) AS depth FROM (
    SELECT v, depth FROM d{k - 1}
    UNION ALL
    SELECT ed.dst AS v, d.depth + 1 AS depth
    FROM d{k - 1} d JOIN ed ON ed.src = d.v
  ) GROUP BY v
)""")
    tail = f"""
SELECT v, CAST(depth AS INTEGER) AS depth
FROM d{max_depth} WHERE depth <= {max_depth}
ORDER BY depth, v
"""
    return head + "".join(steps) + tail


O_BFS_DEPTHS = _bfs_sql()


def q_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W30 — raw-distance matrix profile (operators/tsa.matrix_profile)
    for the click/purchase hourly series, m=8: per-position nearest
    non-trivial-neighbor distance — motifs score low, discords (shape
    anomalies) high. Quadratic in the CALENDAR grid only (stated);
    exact-integer distances on the 3dp value grid."""
    from gordo_spark.operators.tsa import matrix_profile

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.filter(F.col("tag").isin("click", "purchase"))
    return matrix_profile(res, m=8, precision=3)


O_MATRIX_PROFILE = """
WITH res AS (
  SELECT event_type AS tag,
         floor(epoch(ts)/3600)*3600 AS t,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         CAST(floor((floor((floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0) * 1000.0 + 0.5) / 1000.0 * 1000.0) * 1.0 + 0.5) / 1.0 AS BIGINT) AS ivv
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2, 3
),
seq AS (
  SELECT tag, ts,
         row_number() OVER (PARTITION BY tag ORDER BY t) AS idx,
         list(ivv) OVER (PARTITION BY tag ORDER BY t
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w,
         count(*) OVER (PARTITION BY tag) AS n
  FROM res
),
valid AS (SELECT tag, ts, idx, w FROM seq WHERE idx <= n - 7),
pairs AS (
  SELECT a.tag, a.ts, a.idx, b.idx AS jdx,
         list_sum(list_transform(range(1, 9),
           j -> (a.w[j] - b.w[j]) * (a.w[j] - b.w[j]))) AS d2
  FROM valid a JOIN valid b ON a.tag = b.tag
  WHERE abs(a.idx - b.idx) >= 8
),
best AS (
  SELECT tag, ts, idx, jdx AS nn_idx, d2,
         row_number() OVER (PARTITION BY tag, idx
                            ORDER BY d2, jdx) AS rk
  FROM pairs
)
SELECT tag, CAST(idx AS INTEGER) AS idx, ts,
       floor((sqrt(d2) / 1000.0) * 1000000.0 + 0.5) / 1000000.0 AS mp_dist,
       CAST(nn_idx AS INTEGER) AS nn_idx
FROM best WHERE rk = 1
ORDER BY tag, idx
"""


def q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrases (operators/text.rake_keyphrases): top-20
    stopword-bounded phrases by degree/frequency word scores over the
    document corpus — the multiword extension of llr_bigrams. Islands
    via pos - row_number; phrase scores fold in sorted word order
    (engine-exact)."""
    from gordo_spark.operators.text import rake_keyphrases

    return rake_keyphrases(
        read_table(spark, sf_dir, "documents"),
        min_count=3,
        topk=20,
        max_phrase_len=4,
    )


O_RAKE = """
WITH t0 AS (
  SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
toks AS (SELECT doc_id, i - 1 AS pos, w[i] AS tok FROM t0),
nonstop AS (
  SELECT doc_id, pos, tok FROM toks
  WHERE tok <> '' AND tok NOT IN
    ('the','a','of','and','to','in','is','on','for','with',
     'as','by','at','an','be','this','that','from','or','are')
),
isl AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS grp
  FROM nonstop
),
runs AS (
  SELECT doc_id, grp, list(tok ORDER BY pos) AS words
  FROM isl GROUP BY 1, 2
),
phrases AS (
  SELECT array_to_string(words, ' ') AS phrase, words
  FROM runs WHERE len(words) BETWEEN 1 AND 4
),
wstats AS (
  SELECT w, CAST(sum(l) AS DOUBLE) / count(*) AS ws
  FROM (
    SELECT unnest(words) AS w, len(words) AS l FROM phrases
  ) GROUP BY w
),
pcounts AS (
  SELECT phrase, words, count(*) AS n FROM phrases GROUP BY 1, 2
),
pw AS (
  SELECT phrase, len(words) AS n_words, n,
         unnest(list_distinct(words)) AS w
  FROM pcounts
),
scored AS (
  SELECT phrase, n_words, n,
         floor((list_sum(list(ws ORDER BY w))) * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM pw JOIN wstats USING (w)
  GROUP BY 1, 2, 3
)
SELECT phrase, CAST(n_words AS INTEGER) AS n_words,
       CAST(n AS BIGINT) AS n, score
FROM scored WHERE n >= 3
ORDER BY score DESC, phrase
LIMIT 20
"""


def q_consensus_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector-consensus anomaly screen (operators/tsa.
    consensus_anomaly): rolling z-score + Hampel + CUSUM vote per
    hourly grid cell; consensus at >= 2 votes — the alert-fatigue
    reducer (each detector's false-positive mode is vetoed by the
    other two). One checkpointed resample feeds all three detectors
    (the curation_verdict scan discipline)."""
    from gordo_spark.operators.tsa import consensus_anomaly

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    return consensus_anomaly(res)


O_CONSENSUS_ANOMALY = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
zs AS (
  SELECT tag, ts, value,
         count(value) OVER w AS n,
         floor((avg(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS m,
         floor((stddev_samp(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS s
  FROM res
  WINDOW w AS (PARTITION BY tag ORDER BY ts
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
),
zf AS (
  SELECT tag, ts,
         CASE WHEN n >= 24 AND s > 0
              AND abs(floor(((value - m) / s) * 1000000.0 + 0.5) / 1000000.0) > 2 THEN 1 ELSE 0 END
           AS z_flag
  FROM zs
),
h1 AS (
  SELECT tag, ts, value,
         list_sort(list(value) OVER (PARTITION BY tag ORDER BY ts
           ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS ls
  FROM res
),
h2 AS (
  SELECT tag, ts, value, ls,
         (ls[CAST(floor((len(ls) - 1) / 2.0) AS INT) + 1]
          + ls[CAST(floor(len(ls) / 2.0) AS INT) + 1]) / 2.0 AS med
  FROM h1
),
h3 AS (
  SELECT tag, ts, value, med,
         list_sort(list_transform(ls, x -> abs(x - med))) AS dv
  FROM h2
),
hf AS (
  SELECT tag, ts,
         CASE WHEN abs(value - med) > 3.0 * 1.4826
              * ((dv[CAST(floor((len(dv) - 1) / 2.0) AS INT) + 1]
                  + dv[CAST(floor(len(dv) / 2.0) AS INT) + 1]) / 2.0)
              THEN 1 ELSE 0 END AS hampel_flag
  FROM h3
),
st AS (SELECT tag, avg(value) AS mu, stddev_pop(value) AS sd
       FROM res GROUP BY 1),
cd AS (
  SELECT r.tag, r.ts, r.value,
         SUM((r.value - st.mu) / st.sd - 0.5)
           OVER (PARTITION BY r.tag ORDER BY r.ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM res r JOIN st USING (tag)
),
cf AS (
  SELECT tag, ts, value,
         CASE WHEN floor((S - LEAST(0.0, MIN(S)
                OVER (PARTITION BY tag ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) * 1000000.0 + 0.5) / 1000000.0
              > 5.0 THEN 1 ELSE 0 END AS cusum_flag
  FROM cd
),
votes AS (
  SELECT cf.tag, cf.ts, cf.value, zf.z_flag, hf.hampel_flag,
         cf.cusum_flag,
         zf.z_flag + hf.hampel_flag + cf.cusum_flag AS votes
  FROM cf JOIN zf ON zf.tag = cf.tag AND zf.ts = cf.ts
  JOIN hf ON hf.tag = cf.tag AND hf.ts = cf.ts
)
SELECT tag, ts, value, z_flag, hampel_flag, cusum_flag,
       CAST(votes AS INTEGER) AS votes, votes >= 2 AS consensus
FROM votes WHERE votes >= 1
ORDER BY tag, ts
"""


def q_join_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join probe (operators/profile.join_size_profile): exact
    output size, fanout, and hot-key share of lineitem x orders WITHOUT
    running the join — two count-table aggregates + one small join. The
    question to ask before any fact-fact join at 100 TB."""
    from gordo_spark.operators.profile import join_size_profile

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey")
    return join_size_profile(li, "l_orderkey", orders, "o_orderkey")


O_JOIN_PROFILE = """
WITH ca AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS ca
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
),
cb AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, count(*) AS cb
  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1
),
prof AS (SELECT ca.k, ca.ca * cb.cb AS rows_ FROM ca JOIN cb USING (k)),
ta AS (SELECT CAST(sum(ca) AS BIGINT) AS n_left,
              CAST(count(*) AS BIGINT) AS keys_left FROM ca),
tb AS (SELECT CAST(sum(cb) AS BIGINT) AS n_right,
              CAST(count(*) AS BIGINT) AS keys_right FROM cb),
ag AS (
  SELECT CAST(count(*) AS BIGINT) AS keys_common,
         CAST(coalesce(sum(rows_), 0) AS BIGINT) AS join_rows,
         CAST(max(rows_) AS BIGINT) AS max_key_rows
  FROM prof
),
hot AS (SELECT k AS hot_key FROM prof ORDER BY rows_ DESC, k LIMIT 1)
SELECT n_left, n_right, keys_left, keys_right, keys_common, join_rows,
       floor((CASE WHEN n_left > 0 AND n_right > 0
             THEN join_rows / CAST(GREATEST(n_left, n_right) AS DOUBLE)
             END) * 1000000.0 + 0.5) / 1000000.0 AS fanout,
       max_key_rows, hot_key,
       floor((CASE WHEN join_rows > 0
             THEN max_key_rows / CAST(join_rows AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0
         AS hot_share
FROM ag, ta, tb, hot
"""


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (operators/ranking.skyline_2d): the parts no
    other part beats on BOTH retail price and size — the
    cheapest-and-smallest shortlist. Two-phase distributed skyline
    (lossless md5-bucket local filter, then the global pass over the
    tiny survivor set)."""
    from gordo_spark.operators.ranking import skyline_2d

    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(part, "p_retailprice", "p_size", "p_partkey")


O_SKYLINE = """
WITH base AS (
  SELECT p_partkey AS id, CAST(p_retailprice AS DOUBLE) AS x,
         CAST(p_size AS DOUBLE) AS y
  FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
),
s AS (
  SELECT id, x, y,
         min(y) OVER (ORDER BY x, y, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS miny
  FROM base
)
SELECT id, x, y FROM s WHERE miny IS NULL OR y < miny
ORDER BY x, y, id
"""


def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution (operators/ranges.
    position_attribution): purchases split 40/20/40 across the
    preceding click/view/signup journey — the model between
    first/last-touch and markov_attribution. Credits quantized to 1e-9
    so channel sums are exact-integer (summation-order-proof)."""
    from gordo_spark.operators.ranges import position_attribution

    ev = read_table(spark, sf_dir, "events")
    return position_attribution(ev, "purchase", ["click", "view", "signup"])


O_POSITION_ATTRIBUTION = """
WITH w AS (
  SELECT event_type,
         coalesce(list_filter(
           list(CASE WHEN event_type IN ('click', 'view', 'signup')
                     THEN event_type END)
             OVER (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           x -> x IS NOT NULL), []) AS touches
  FROM events
),
conv AS (
  SELECT CASE WHEN len(touches) = 0 THEN ['none'] ELSE touches END
           AS touches,
         len(touches) AS n
  FROM w WHERE event_type = 'purchase'
),
ex AS (
  SELECT n, unnest(touches) AS touch,
         unnest(range(1, len(touches) + 1)) AS i
  FROM conv
),
cr AS (
  SELECT touch,
         CAST(floor(((CASE
           WHEN n <= 1 THEN 1.0
           WHEN i = 1 OR i = n THEN (CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END)
           ELSE 0.2 / (n - 2)
         END) * 1000000000.0) * 1.0 + 0.5) / 1.0 AS BIGINT) AS ci
  FROM ex
)
SELECT touch, floor((sum(ci) / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0 AS credit,
       CAST(count(*) AS BIGINT) AS n_touched
FROM cr GROUP BY touch ORDER BY touch
"""


def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU stickiness curve (operators/ranges.stickiness):
    per active day, trailing 1/7/28-day distinct users and the DAU/MAU
    ratio — one distinct (user, day) collapse, one |activity| x 28
    range join, one spine aggregate. Windows truncate at history
    start (stated)."""
    from gordo_spark.operators.ranges import stickiness

    ev = read_table(spark, sf_dir, "events")
    return stickiness(ev)


O_STICKINESS = """
WITH act AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d0
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
spine AS (SELECT DISTINCT d0 AS d FROM act),
j AS (
  SELECT s.d, a.u, date_diff('day', a.d0, s.d) AS dd
  FROM spine s JOIN act a
    ON a.d0 <= s.d AND a.d0 >= s.d - INTERVAL 27 DAY
)
SELECT CAST(d AS TIMESTAMP) AS d,
       CAST(count(DISTINCT CASE WHEN dd < 1 THEN u END) AS BIGINT) AS dau,
       CAST(count(DISTINCT CASE WHEN dd < 7 THEN u END) AS BIGINT) AS wau,
       CAST(count(DISTINCT u) AS BIGINT) AS mau,
       floor((CASE WHEN count(DISTINCT u) > 0
             THEN count(DISTINCT CASE WHEN dd < 1 THEN u END)
                  / CAST(count(DISTINCT u) AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0
         AS stickiness
FROM j GROUP BY d ORDER BY d
"""


def q_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W31 — trend/seasonal strength per tag (operators/tsa.
    stl_strength over the w29 decomposition): Hyndman fpp3 features
    ranking which sensors actually trend/cycle — the fleet-triage
    one-number companion to the full decomposition."""
    from gordo_spark.operators.tsa import stl_strength

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    return stl_strength(
        res, period_buckets=24, half_window=12, bucket_seconds=3600
    )


O_STL_STRENGTH = """
WITH res AS (
  SELECT event_type AS tag,
         floor(epoch(ts)/3600)*3600 AS t,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
iv AS (
  SELECT *, CAST(floor((value * 1000000.0) * 1.0 + 0.5) / 1.0 AS BIGINT) AS ivv FROM res
),
tr AS (
  SELECT tag, t, value,
         CAST(sum(ivv) OVER w AS DOUBLE) / count(ivv) OVER w
           / 1000000.0 AS trend
  FROM iv
  WINDOW w AS (PARTITION BY tag ORDER BY t
               RANGE BETWEEN 43200 PRECEDING AND 43200 FOLLOWING)
),
ph AS (
  SELECT *, CAST(floor(t / 3600) AS BIGINT) % 24 AS phv,
         CAST(floor((floor((value - trend) * 1000000.0 + 0.5) / 1000000.0 * 1000000.0) * 1.0 + 0.5) / 1.0 AS BIGINT)
           AS di
  FROM tr
),
se AS (
  SELECT tag, phv,
         CAST(sum(di) AS DOUBLE) / count(di) / 1000000.0 AS seasonal
  FROM ph GROUP BY 1, 2
),
comp AS (
  SELECT ph.tag,
         ph.value,
         floor((ph.trend) * 1000000.0 + 0.5) / 1000000.0 AS trend,
         floor((se.seasonal) * 1000000.0 + 0.5) / 1000000.0 AS seasonal,
         floor((ph.value - ph.trend - se.seasonal) * 1000000.0 + 0.5) / 1000000.0 AS resid
  FROM ph JOIN se ON se.tag = ph.tag AND se.phv = ph.phv
),
agg AS (
  SELECT tag, count(*) AS n,
         var_pop(resid) AS vr,
         var_pop(value - seasonal) AS vds,
         var_pop(value - trend) AS vdt
  FROM comp GROUP BY tag
)
SELECT tag, CAST(n AS BIGINT) AS n,
       floor((vr) * 1000000.0 + 0.5) / 1000000.0 AS var_resid,
       floor((CASE WHEN vds > 0
             THEN GREATEST(0.0, 1.0 - vr / vds) END) * 1000000.0 + 0.5) / 1000000.0 AS f_trend,
       floor((CASE WHEN vdt > 0
             THEN GREATEST(0.0, 1.0 - vr / vdt) END) * 1000000.0 + 0.5) / 1000000.0 AS f_seasonal
FROM agg ORDER BY tag
"""


def q_ewm_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W32 — EW mean/variance bands per tag (operators/smoothing.
    ewm_volatility, RiskMetrics lam=0.94): adaptive control bands that
    re-level after regime shifts where the fixed-window z-score lags;
    breach tested against the PRIOR state. applyInPandas per tag; the
    oracle carries (s, v) through the identical recursive CTE."""
    from gordo_spark.operators.smoothing import ewm_volatility

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    return ewm_volatility(res, "value", lam=0.94, machine_col="tag")


O_EWM_VOL = """
WITH RECURSIVE res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT tag, ts, value,
         row_number() OVER (PARTITION BY tag ORDER BY ts) AS rn
  FROM res
),
rec AS (
  SELECT tag, ts, rn, value,
         value AS s, CAST(0.0 AS DOUBLE) AS v, 0 AS breach
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT q.tag, q.ts, q.rn, q.value,
         0.94 * r.s + 0.06 * q.value,
         0.94 * r.v + 0.06 * (q.value - r.s) * (q.value - r.s),
         CASE WHEN r.v > 0
               AND abs(q.value - r.s) > 3.0 * sqrt(r.v)
              THEN 1 ELSE 0 END
  FROM rec r JOIN seq q ON q.tag = r.tag AND q.rn = r.rn + 1
)
SELECT tag, ts, value,
       floor((s) * 1000000.0 + 0.5) / 1000000.0 AS ew_mean, floor((sqrt(v)) * 1000000.0 + 0.5) / 1000000.0 AS ew_std,
       CAST(breach AS INTEGER) AS breach
FROM rec
"""


def q_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W33 — normalized spectral entropy over the 6h/24h/7d candidate
    periodogram (operators/tsa.spectral_entropy): how CONCENTRATED is
    each tag's cycling — the fleet-triage rider on w27. Entropy of the
    6dp-rounded powers (stated), so both engines fold identical
    numbers."""
    from gordo_spark.operators.tsa import spectral_entropy

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return spectral_entropy(res, [21600, 86400, 604800])


O_SPECTRAL_ENTROPY = """
WITH res AS (
  SELECT event_type AS tag,
         floor(epoch(ts)/3600)*3600 AS t,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
dm AS (
  SELECT tag, t,
         value - avg(value) OVER (PARTITION BY tag) AS d
  FROM res
),
per AS (
  SELECT tag, t, d, p.period_s
  FROM dm CROSS JOIN (VALUES (21600), (86400), (604800)) AS p(period_s)
),
agg AS (
  SELECT tag, period_s, count(*) AS n,
         sum(d * cos(2 * pi() * (CAST(t AS BIGINT) % period_s)
                     / period_s)) AS sc,
         sum(d * sin(2 * pi() * (CAST(t AS BIGINT) % period_s)
                     / period_s)) AS ss
  FROM per GROUP BY 1, 2
),
pw AS (
  SELECT tag, floor(((sc * sc + ss * ss) / n) * 1000000.0 + 0.5) / 1000000.0 AS power FROM agg
),
nm AS (
  SELECT tag, power,
         sum(power) OVER (PARTITION BY tag) AS tp
  FROM pw
),
terms AS (
  SELECT tag, tp,
         CASE WHEN power / tp > 0
              THEN -(power / tp) * ln(power / tp) ELSE 0.0 END AS h
  FROM nm
)
SELECT tag, CAST(count(*) AS BIGINT) AS n_periods,
       floor((max(tp)) * 1000000.0 + 0.5) / 1000000.0 AS total_power,
       floor((CASE WHEN max(tp) > 0
             THEN sum(h) / ln(3.0) END) * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM terms GROUP BY tag ORDER BY tag
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification (operators/similarity.
    knn_classify): 20 query vectors, modal label of the exact-cosine
    top-10 vs the true label — the zero-training embedding-quality
    baseline that closes the retrieval-eval loop (ndcg/mrr/pr grade
    the RANKING; this grades the decision)."""
    from gordo_spark.operators.similarity import knn_classify

    embs = read_table(spark, sf_dir, "embeddings")
    return knn_classify(embs, embs.filter(F.col("vec_id") < 20), k=10)


O_KNN_CLASSIFY = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT q.query_id, e.vec_id AS doc_id, q.ql, e.label AS dl,
         list_dot_product(qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))) AS sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, ql, dl,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= 10
),
votes AS (
  SELECT query_id, any_value(ql) AS ql, dl AS pred_label,
         count(*) AS votes
  FROM ranked GROUP BY query_id, dl
),
pred AS (
  SELECT query_id, ql, pred_label, votes
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY votes DESC, pred_label) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT query_id, ql AS true_label, pred_label,
       CAST(votes AS BIGINT) AS votes,
       pred_label = ql AS correct
FROM pred ORDER BY query_id
"""


def q_null_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-fingerprint mining (operators/profile.null_patterns)
    over an events frame with DETERMINISTIC planted nulls (the lake is
    null-free; value nulls on error events, props nulls on every 7th
    event id, user nulls on every 50th user — three mechanisms, so the
    pattern table separates them): top patterns by frequency."""
    from gordo_spark.operators.profile import null_patterns

    ev = read_table(spark, sf_dir, "events").select(
        F.when(F.pmod(F.col("user_id"), F.lit(50)) != 0, F.col("user_id"))
        .alias("user_id"),
        F.when(F.col("event_type") != "error", F.col("value"))
        .alias("value"),
        F.when(F.pmod(F.col("event_id"), F.lit(7)) != 0, F.col("props"))
        .alias("props"),
    )
    return null_patterns(ev, ["user_id", "value", "props"], topk=10)


O_NULL_PATTERNS = """
WITH ev AS (
  SELECT CASE WHEN user_id % 50 <> 0 THEN user_id END AS user_id,
         CASE WHEN event_type <> 'error' THEN value END AS value,
         CASE WHEN event_id % 7 <> 0 THEN props END AS props
  FROM events
),
pat AS (
  SELECT (CASE WHEN user_id IS NULL THEN '1' ELSE '0' END
          || CASE WHEN value IS NULL THEN '1' ELSE '0' END
          || CASE WHEN props IS NULL THEN '1' ELSE '0' END) AS pattern,
         coalesce(array_to_string(list_filter([
           CASE WHEN user_id IS NULL THEN 'user_id' END,
           CASE WHEN value IS NULL THEN 'value' END,
           CASE WHEN props IS NULL THEN 'props' END
         ], x -> x IS NOT NULL), ','), '') AS null_cols
  FROM ev
),
counts AS (
  SELECT pattern, null_cols, count(*) AS n FROM pat GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS t FROM counts)
SELECT pattern, null_cols,
       CAST(len(replace(pattern, '0', '')) AS INTEGER) AS n_cols_null,
       CAST(n AS BIGINT) AS n,
       floor((n / CAST(tot.t AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS frac
FROM counts, tot
ORDER BY n DESC, pattern
LIMIT 10
"""
