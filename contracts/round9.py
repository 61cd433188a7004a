"""Round-9/10 additions (exact-integer resample family, fleet consensus, experiments runbook, Heaps law) plus the entry() driver hook (flagship anomaly frame)."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from contracts.base import (
    ALIGN_TAGS,
    _events_long,
    read_table,
    resample_aggregate,
)
from contracts.core_timeseries import (
    _O_WIDE_1H,
    _wide_1h,
    q_m6_anomaly,
)
from contracts.training_data import (
    O_BM25_SEARCH,
    _lsh_pairs_sql,
)



# ---------------------------------------------------------------- contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full anomaly frame on sf0.001."""
    return q_m6_anomaly(spark, "/root/testdata/sf0.001")



# ================================================================ round 9
_EM_VALUE = (
    "floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS "
    "DOUBLE) / count(value) + 0.5) / 1000000.0"
)

_RES_1H_CTE = f"""
res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         {_EM_VALUE} AS value
  FROM events GROUP BY 1, 2
)"""


def q_flatline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-sensor runs (operators/tsa.flatline_runs): maximal
    constant-at-6dp runs >= 6 buckets on the hourly grid, with a
    planted 48-bucket freeze on the error tag (a dead transmitter
    repeating its last word) — the fleet-ops triage hampel/zscore
    cannot see (a constant has zero dispersion). Two window passes
    over one tag-keyed shuffle, output bounded by #runs."""
    from gordo_spark.operators.tsa import flatline_runs

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    planted = res.withColumn(
        "value",
        F.when(
            (F.col("tag") == "error")
            & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp")),
            F.lit(42.5),
        ).otherwise(F.col("value")),
    )
    return flatline_runs(planted, min_len=6, precision=6)


O_FLATLINE = f"""
WITH {_RES_1H_CTE.strip()},
pl AS (
  SELECT tag, ts,
         CASE WHEN tag = 'error'
                   AND ts >= TIMESTAMP '2024-01-10 00:00:00'
                   AND ts <  TIMESTAMP '2024-01-12 00:00:00'
              THEN 42.5 ELSE value END AS value
  FROM res
),
q AS (
  SELECT tag, ts,
         floor((value) * 1000000.0 + 0.5) / 1000000.0 AS qv
  FROM pl WHERE value IS NOT NULL
),
flag AS (
  SELECT tag, ts, qv,
         CASE WHEN lag(qv) OVER w IS NULL OR qv <> lag(qv) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM q WINDOW w AS (PARTITION BY tag ORDER BY ts)
),
runs AS (
  SELECT tag, ts, qv,
         sum(chg) OVER (PARTITION BY tag ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS run
  FROM flag
)
SELECT tag, min(ts) AS run_start, max(ts) AS run_end,
       count(*) AS run_len, min(qv) AS value
FROM runs GROUP BY tag, run HAVING count(*) >= 6
ORDER BY tag, run_start
"""


def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per tag (operators/tsa.hurst_exponent,
    aggregated-variance method): trending vs mean-reverting in one
    number — block-mean variances at scales 1/2/4/8/16 and the OLS
    slope of log var on log k, H = 1 + slope/2. Pure sufficient
    statistics, no windows wider than the tag key, no collect."""
    from gordo_spark.operators.tsa import hurst_exponent

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return hurst_exponent(res)


O_HURST = f"""
WITH {_RES_1H_CTE.strip()},
idx AS (
  SELECT tag, value,
         row_number() OVER (PARTITION BY tag ORDER BY ts) - 1 AS i
  FROM res WHERE value IS NOT NULL
),
bm AS (
  SELECT tag, t.k, floor(i / t.k) AS b, count(*) AS bn, avg(value) AS m
  FROM idx CROSS JOIN (VALUES (1), (2), (4), (8), (16)) t(k)
  GROUP BY 1, 2, 3 HAVING count(*) = t.k
),
vv AS (
  SELECT tag, k, var_pop(m) AS var_k, count(*) AS nb
  FROM bm GROUP BY 1, 2
),
pts AS (
  SELECT tag, ln(CAST(k AS DOUBLE)) AS x, ln(var_k) AS y
  FROM vv WHERE var_k > 0 AND nb >= 2
),
fit AS (
  SELECT tag, count(*) AS np, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pts GROUP BY tag
),
n_tot AS (
  SELECT tag, count(*) AS n FROM idx GROUP BY tag
)
SELECT f.tag, n_tot.n,
       floor((1.0 + ((np * sxy - sx * sy) / (np * sxx - sx * sx)) / 2)
             * 1000000.0 + 0.5) / 1000000.0 AS hurst,
       floor(((np * sxy - sx * sy) / (np * sxx - sx * sx))
             * 1000000.0 + 0.5) / 1000000.0 AS slope,
       floor((CASE WHEN (np * sxx - sx * sx) * (np * syy - sy * sy) > 0
              THEN (np * sxy - sx * sy) * (np * sxy - sx * sy)
                   / ((np * sxx - sx * sx) * (np * syy - sy * sy)) END)
             * 1000000.0 + 0.5) / 1000000.0 AS r2
FROM fit f JOIN n_tot ON n_tot.tag = f.tag
WHERE np >= 2
ORDER BY f.tag
"""


def q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger-causality screen over the aligned hourly grid
    (operators/tsa.granger_lag1): which sensor LEADS which, with an
    F-test frame — restricted vs unrestricted OLS, both closed forms
    over one pass of sufficient stats; the lag is an equi-join on the
    grid timestamp, never a keyless window. All 6 ordered pairs of
    the aligned tags."""
    from gordo_spark.operators.tsa import granger_lag1

    wide = _wide_1h(spark, sf_dir)
    pairs = [
        (x, y) for x in ALIGN_TAGS for y in ALIGN_TAGS if x != y
    ]
    return granger_lag1(wide, pairs, resolution="1H")


def _o_granger() -> str:
    parts = []
    for x in ALIGN_TAGS:
        for y in ALIGN_TAGS:
            if x == y:
                continue
            parts.append(f"""
SELECT '{x}' AS x, '{y}' AS y, CAST(n AS BIGINT) AS n,
       floor((CASE WHEN det > 0 AND sse_u > 0 AND n > 3
              THEN (sse_r - sse_u) / (sse_u / (n - 3)) END)
             * 1000000.0 + 0.5) / 1000000.0 AS f_stat,
       coalesce(CASE WHEN det > 0 AND sse_u > 0 AND n > 3
              THEN (sse_r - sse_u) / (sse_u / (n - 3)) > 3.86 END, FALSE)
         AS granger
FROM (
  SELECT n, cyy - CASE WHEN caa > 0 THEN cya * cya / caa ELSE 0.0 END AS sse_r,
         caa * cbb - cab * cab AS det,
         cyy - (((cya * cbb - cyb * cab) / (caa * cbb - cab * cab)) * cya
                + ((cyb * caa - cya * cab) / (caa * cbb - cab * cab)) * cyb)
           AS sse_u
  FROM (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           sum(_y * _yl) - sum(_y) * sum(_yl) / count(*) AS cya,
           sum(_y * _xl) - sum(_y) * sum(_xl) / count(*) AS cyb,
           sum(_yl * _yl) - sum(_yl) * sum(_yl) / count(*) AS caa,
           sum(_xl * _xl) - sum(_xl) * sum(_xl) / count(*) AS cbb,
           sum(_yl * _xl) - sum(_yl) * sum(_xl) / count(*) AS cab,
           sum(_y * _y) - sum(_y) * sum(_y) / count(*) AS cyy
    FROM (
      SELECT c.ts, c."{y}" AS _y, p."{y}" AS _yl, p."{x}" AS _xl
      FROM wide c JOIN wide p ON c.ts = p.ts + INTERVAL 1 HOUR
    )
  )
)""")
    return (
        "WITH wide AS (" + _O_WIDE_1H.strip() + ")\n"
        + "\nUNION ALL\n".join(parts)
        + "\nORDER BY x, y"
    )


def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitoring
    (operators/experiments.msprt_monitor — mixture SPRT, Johari et al.
    2017): per daily window, the cumulative two-sample Lambda, the
    always-valid p (1 / running max Lambda) and the crossing verdict —
    the peeking-proof readout ab_test cannot give. All inputs are
    exact integer counts, so the statistic is bit-identical on any
    engine."""
    from gordo_spark.operators.experiments import msprt_monitor

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_type") == "purchase").alias("converted"),
        "ts",
    )
    return msprt_monitor(ev, "user_id", "converted", window="1D")


O_MSPRT = """
WITH d AS (
  SELECT CAST(to_timestamp(floor(epoch(ts)/86400)*86400) AS TIMESTAMP) AS w,
         ('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events
),
per AS (
  SELECT w, variant, count(*) AS n, sum(s) AS c FROM d GROUP BY 1, 2
),
cum AS (
  SELECT w, variant,
         sum(n) OVER (PARTITION BY variant ORDER BY w
                      ROWS UNBOUNDED PRECEDING) AS cn,
         sum(c) OVER (PARTITION BY variant ORDER BY w
                      ROWS UNBOUNDED PRECEDING) AS cc
  FROM per
),
j AS (
  SELECT a.w, CAST(a.cn AS BIGINT) AS n_a, CAST(a.cc AS BIGINT) AS conv_a,
         CAST(b.cn AS BIGINT) AS n_b, CAST(b.cc AS BIGINT) AS conv_b
  FROM cum a JOIN cum b ON a.w = b.w AND a.variant = 0 AND b.variant = 1
),
lamf AS (
  SELECT w, n_a, n_b, conv_a, conv_b,
         conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE) AS theta,
         (conv_a + conv_b) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
  FROM j
),
lam AS (
  SELECT w, n_a, n_b, conv_a, conv_b, theta,
         CASE WHEN pp * (1 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                + 1.0 / CAST(n_b AS DOUBLE)) > 0
              THEN sqrt((pp * (1 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE)))
                   / ((pp * (1 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE))) + 0.0001))
                * exp(theta * theta * 0.0001
                   / (2.0 * (pp * (1 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                        + 1.0 / CAST(n_b AS DOUBLE)))
                     * ((pp * (1 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                        + 1.0 / CAST(n_b AS DOUBLE))) + 0.0001)))
         END AS lam
  FROM lamf
),
run AS (
  SELECT x.w, max(y.lam) AS mx
  FROM lam x JOIN lam y ON y.w <= x.w GROUP BY x.w
)
SELECT lam.w AS window_start, n_a, n_b, conv_a, conv_b,
       floor((theta) * 1000000.0 + 0.5) / 1000000.0 AS diff,
       floor((lam.lam) * 1000000.0 + 0.5) / 1000000.0 AS lam,
       floor((least(1.0, 1.0 / run.mx)) * 1000000.0 + 0.5) / 1000000.0
         AS p_always,
       coalesce(run.mx >= 20.0, FALSE) AS crossed
FROM lam JOIN run ON run.w = lam.w
ORDER BY window_start
"""


def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (operators/similarity.kcenter_coreset,
    Gonzalez 1985 farthest-first): 12 maximally-diverse vectors from an
    id-capped candidate sample — the pure-coverage companion of
    mmr_rerank, same bounded-collect contract class, same
    recursive-CTE oracle discipline (one argmax per step)."""
    from gordo_spark.operators.similarity import kcenter_coreset

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 120
    )
    return kcenter_coreset(emb, k=12)


O_KCENTER = """
WITH RECURSIVE cands AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 120
),
dists AS (
  SELECT a.id AS a, b.id AS b,
         floor((1.0 - list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v)))) * 1000000.0 + 0.5)
           / 1000000.0 AS d
  FROM cands a JOIN cands b ON a.id <> b.id
),
rec AS (
  SELECT 1 AS step, (SELECT min(id) FROM cands) AS id,
         CAST(NULL AS DOUBLE) AS dist,
         [(SELECT min(id) FROM cands)] AS picked
  UNION ALL
  SELECT t.step2, t.id2, t.d2, t.picked2 FROM (
    SELECT r.step + 1 AS step2, c.id AS id2,
           (SELECT min(d.d) FROM dists d
            WHERE d.a = c.id AND list_contains(r.picked, d.b)) AS d2,
           list_append(r.picked, c.id) AS picked2
    FROM rec r JOIN cands c ON NOT list_contains(r.picked, c.id)
    WHERE r.step < 12
  ) t
  QUALIFY row_number() OVER (ORDER BY t.d2 DESC, t.id2) = 1
)
SELECT id AS vec_id, CAST(step AS INTEGER) AS pick_rank,
       dist AS dist_to_centers
FROM rec ORDER BY pick_rank
"""


def q_sem_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-contamination screen
    (operators/similarity.semantic_decontaminate): per eval vector the
    max cosine over the train corpus + the offending train id —
    paraphrased leaks the 13-gram decontaminate misses. Eval side
    broadcasts (benchmarks are KBs by construction), train side is one
    scan with an eval-keyed map-side-combinable max."""
    from gordo_spark.operators.similarity import semantic_decontaminate

    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 15),
        emb.filter(F.col("vec_id") < 15),
        threshold=0.8,
    )


O_SEM_DECONTAMINATE = """
WITH ev AS (
  SELECT vec_id AS eval_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 15
),
tr AS (
  SELECT vec_id AS tid, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id >= 15
),
pairs AS (
  SELECT ev.eval_id, tr.tid,
         floor((list_dot_product(tr.v, ev.v)
           / (sqrt(list_dot_product(tr.v, tr.v))
              * sqrt(list_dot_product(ev.v, ev.v)))) * 1000000.0 + 0.5)
           / 1000000.0 AS c
  FROM ev, tr
),
sel AS (
  SELECT eval_id, c, tid,
         row_number() OVER (PARTITION BY eval_id ORDER BY c DESC, tid) AS rn
  FROM pairs
)
SELECT eval_id, c AS max_cos, tid AS nearest_train_id,
       c >= 0.8 AS contaminated
FROM sel WHERE rn = 1 ORDER BY eval_id
"""


def q_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure compliance audit
    (operators/quality_checks.erasure_audit): tombstoned customers
    (c_custkey % 97 = 0) vs the tables that may still reference them —
    per table, total rows, surviving references, and the share. A
    clean purge reports 0; any survivor localizes the table whose
    deletion job missed."""
    from gordo_spark.operators.quality_checks import erasure_audit

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    deleted = customer.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("key")
    )
    return erasure_audit(
        {"customer": (customer, "c_custkey"), "orders": (orders, "o_custkey")},
        deleted,
    )


O_ERASURE_AUDIT = """
WITH del AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
),
c AS (
  SELECT 'customer' AS "table", count(*) AS n_rows,
         count(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 END)
           AS n_referencing_deleted
  FROM customer
),
o AS (
  SELECT 'orders' AS "table", count(*) AS n_rows,
         count(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 END)
           AS n_referencing_deleted
  FROM orders
),
u AS (SELECT * FROM c UNION ALL SELECT * FROM o)
SELECT "table", n_rows, n_referencing_deleted,
       floor((CASE WHEN n_rows > 0
              THEN CAST(n_referencing_deleted AS DOUBLE) / n_rows END)
             * 1000000.0 + 0.5) / 1000000.0 AS share
FROM u ORDER BY "table"
"""


def q_fleet_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional fleet consensus (operators/anomaly.
    fleet_consensus): 20 machines (user_id % 20 slices), per (tag,
    bucket) the cross-machine median + MAD over 1e6-scaled longs
    (dyadic-exact interpolated medians on any engine), robust-z flags,
    rolled up per (machine, tag) — the broken-sensor axis no
    per-series detector sees, and the one gordo's pod-per-machine
    architecture structurally cannot compute."""
    from gordo_spark.operators.anomaly import fleet_consensus
    from gordo_spark.operators.resample import resample_aggregate

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(list(ALIGN_TAGS))
    )
    long = ev.select(
        F.concat(F.lit("m"), (F.col("user_id") % 20).cast("string")).alias(
            "machine"
        ),
        F.col("event_type").alias("tag"),
        "ts",
        "value",
    )
    res = resample_aggregate(long, "1H", "mean_exact", group_cols=["machine"])
    return fleet_consensus(res)


O_FLEET_CONSENSUS = f"""
WITH res AS (
  SELECT 'm' || (user_id % 20) AS machine, event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         {_EM_VALUE} AS value
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
  GROUP BY 1, 2, 3
),
base AS (
  SELECT machine, tag, ts,
         floor(value * 1000000 + 0.5) AS iv
  FROM res WHERE value IS NOT NULL
),
med AS (
  SELECT tag, ts, quantile_cont(iv, 0.5) AS med, count(*) AS w
  FROM base GROUP BY 1, 2
),
dev AS (
  SELECT b.machine, b.tag, b.ts, b.iv, med.med, med.w,
         abs(b.iv - med.med) AS ad
  FROM base b JOIN med ON med.tag = b.tag AND med.ts = b.ts
),
mad AS (
  SELECT tag, ts, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1, 2
),
z AS (
  SELECT dev.machine, dev.tag,
         CAST(dev.ad * 2 AS HUGEINT) AS ad2,
         CASE WHEN mad.mad > 0 AND dev.w >= 3
              THEN floor((0.6745 * (dev.iv - dev.med) / mad.mad)
                         * 1000000.0 + 0.5) / 1000000.0 END AS zz
  FROM dev JOIN mad ON mad.tag = dev.tag AND mad.ts = dev.ts
),
agg AS (
  SELECT machine, tag, count(*) AS n_buckets,
         CAST(sum(CASE WHEN abs(zz) > 3.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_flagged,
         floor((CAST(sum(ad2) AS DOUBLE) / (count(*) * 2000000.0))
               * 1000000.0 + 0.5) / 1000000.0 AS mean_abs_dev,
         floor((max(abs(zz))) * 1000000.0 + 0.5) / 1000000.0 AS worst_z
  FROM z GROUP BY 1, 2
)
SELECT machine, tag, n_buckets, n_flagged,
       floor((CAST(n_flagged AS DOUBLE) / n_buckets) * 1000000.0 + 0.5)
         / 1000000.0 AS share_flagged,
       mean_abs_dev, worst_z
FROM agg ORDER BY machine, tag
"""


def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with deterministic lowest-value tiebreak
    (operators/ranking.group_mode): the modal user per event type —
    two stacked map-side-combinable hash aggregations, no windows."""
    from gordo_spark.operators.ranking import group_mode

    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    return group_mode(ev, ["event_type"], "user_id")


O_GROUP_MODE = """
WITH counts AS (
  SELECT event_type, user_id AS v, count(*) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
sel AS (
  SELECT event_type, v, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd,
         max(n) OVER (PARTITION BY event_type) AS mn
  FROM counts
)
SELECT event_type, v AS mode, mn AS mode_n, nd AS n_distinct
FROM sel WHERE rn = 1 ORDER BY event_type
"""

O_GRANGER = _o_granger()


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W35 — partial autocorrelation lags 1-4 per tag
    (operators/tsa.pacf): Durbin-Levinson unrolled to closed-form
    column algebra over classical biased ACF sums — the AR-order
    readout completing w13_acf for ARIMA triage. One ordered window
    pass + one aggregation; recursion is row algebra on |tags| rows."""
    from gordo_spark.operators.tsa import pacf

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return pacf(res, max_lag=4, resolution_seconds=3600)


O_PACF = f"""
WITH {_RES_1H_CTE.strip()},
mu AS (SELECT tag, avg(value) AS m FROM res GROUP BY tag),
d AS (
  SELECT res.tag, epoch(res.ts) AS t, res.value - mu.m AS dd
  FROM res JOIN mu ON mu.tag = res.tag
),
sums AS (
  SELECT d.tag,
         sum(d.dd * d.dd) AS s0,
         sum(d.dd * l1.dd) AS s1,
         sum(d.dd * l2.dd) AS s2,
         sum(d.dd * l3.dd) AS s3,
         sum(d.dd * l4.dd) AS s4
  FROM d
  LEFT JOIN d l1 ON l1.tag = d.tag AND l1.t = d.t - 3600
  LEFT JOIN d l2 ON l2.tag = d.tag AND l2.t = d.t - 7200
  LEFT JOIN d l3 ON l3.tag = d.tag AND l3.t = d.t - 10800
  LEFT JOIN d l4 ON l4.tag = d.tag AND l4.t = d.t - 14400
  GROUP BY d.tag
),
r AS (
  SELECT tag, s1/s0 AS r1, s2/s0 AS r2, s3/s0 AS r3, s4/s0 AS r4
  FROM sums
),
p2 AS (
  SELECT tag, r1, r2, r3, r4,
         r1 AS phi11,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
  FROM r
),
p2b AS (
  SELECT *, phi11 - phi22 * phi11 AS phi21 FROM p2
),
p3 AS (
  SELECT *,
         (r3 - phi21 * r2 - phi22 * r1)
           / (1.0 - phi21 * r1 - phi22 * r2) AS phi33
  FROM p2b
),
p3b AS (
  SELECT *, phi21 - phi33 * phi22 AS phi31,
         phi22 - phi33 * phi21 AS phi32
  FROM p3
),
p4 AS (
  SELECT *,
         (r4 - phi31 * r3 - phi32 * r2 - phi33 * r1)
           / (1.0 - phi31 * r1 - phi32 * r2 - phi33 * r3) AS phi44
  FROM p3b
)
SELECT tag, lag,
       floor((pacf) * 1000000.0 + 0.5) / 1000000.0 AS pacf
FROM (
  SELECT tag, 1 AS lag, phi11 AS pacf FROM p4
  UNION ALL SELECT tag, 2, phi22 FROM p4
  UNION ALL SELECT tag, 3, phi33 FROM p4
  UNION ALL SELECT tag, 4, phi44 FROM p4
)
ORDER BY tag, lag
"""


def q_gap_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor uptime report (operators/tsa.gap_mtbf): per tag, outage
    runs on the hourly grid — gap count, downtime, longest gap,
    availability, MTBF/MTTR — the MISSING twin of flatline (fail loud
    vs fail quiet). One ordered pass over present rows; |tags| rows
    out."""
    from gordo_spark.operators.tsa import gap_mtbf

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return gap_mtbf(res, resolution_seconds=3600)


O_GAP_MTBF = f"""
WITH {_RES_1H_CTE.strip()},
base AS (
  SELECT DISTINCT tag, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b
  FROM res WHERE value IS NOT NULL
),
lagged AS (
  SELECT tag, b, lag(b) OVER (PARTITION BY tag ORDER BY b) AS prev
  FROM base
),
gaps AS (
  SELECT tag, (prev + 1) * 3600 AS gs, b - prev - 1 AS len
  FROM lagged WHERE prev IS NOT NULL AND b - prev > 1
),
g AS (
  SELECT tag, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(len) AS BIGINT) AS down_buckets,
         CAST(max(len) * 3600 AS BIGINT) AS longest_gap_s,
         CASE WHEN count(*) >= 2
              THEN CAST(max(gs) - min(gs) AS DOUBLE) / (count(*) - 1) END
           AS mtbf_s,
         CAST(sum(len) AS DOUBLE) * 3600 / count(*) AS mttr_s
  FROM gaps GROUP BY tag
),
span AS (
  SELECT tag, min(b) AS b0, max(b) AS b1,
         CAST(count(*) AS BIGINT) AS present
  FROM base GROUP BY tag
)
SELECT span.tag,
       CAST(b1 - b0 + 1 AS BIGINT) AS expected_buckets,
       present AS present_buckets,
       coalesce(n_gaps, 0) AS n_gaps,
       coalesce(down_buckets, 0) AS down_buckets,
       coalesce(longest_gap_s, 0) AS longest_gap_s,
       floor((CAST(present AS DOUBLE) / (b1 - b0 + 1))
             * 1000000.0 + 0.5) / 1000000.0 AS availability,
       floor((mtbf_s) * 1000000.0 + 0.5) / 1000000.0 AS mtbf_s,
       floor((mttr_s) * 1000000.0 + 0.5) / 1000000.0 AS mttr_s
FROM span LEFT JOIN g ON g.tag = span.tag
ORDER BY span.tag
"""


def q_holm_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing-honest A/B (operators/experiments.holm_ab):
    three per-user binary metrics (converted / engaged / spender),
    each a pooled two-proportion z, then Holm step-down on the z scale
    against exact inverse-normal critical values — FWER control
    without independence assumptions. One per-unit collapse + K-row
    self-joins (no windows)."""
    from gordo_spark.operators.experiments import holm_ab

    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
        ).alias("heavy_buyer"),
        (F.count(F.lit(1)) >= 67).alias("engaged"),
        (F.sum("value") > 3300.0).alias("spender"),
    )
    return holm_ab(
        per, ["engaged", "heavy_buyer", "spender"], "user_id", salt="exp1"
    )


O_HOLM_AB = """
WITH per AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS heavy_buyer,
         CASE WHEN count(*) >= 67 THEN 1 ELSE 0 END AS engaged,
         CASE WHEN sum(value) > 3300.0 THEN 1 ELSE 0 END AS spender,
         ('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant
  FROM events GROUP BY user_id
),
v AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(heavy_buyer) AS BIGINT) AS c_heavy_buyer,
         CAST(sum(engaged) AS BIGINT) AS c_engaged,
         CAST(sum(spender) AS BIGINT) AS c_spender
  FROM per GROUP BY variant
),
rows_ AS (
  SELECT 'heavy_buyer' AS metric,
         sum(CASE WHEN variant = 0 THEN n END) AS n_a,
         sum(CASE WHEN variant = 1 THEN n END) AS n_b,
         sum(CASE WHEN variant = 0 THEN c_heavy_buyer END) AS ca,
         sum(CASE WHEN variant = 1 THEN c_heavy_buyer END) AS cb
  FROM v
  UNION ALL
  SELECT 'engaged',
         sum(CASE WHEN variant = 0 THEN n END),
         sum(CASE WHEN variant = 1 THEN n END),
         sum(CASE WHEN variant = 0 THEN c_engaged END),
         sum(CASE WHEN variant = 1 THEN c_engaged END)
  FROM v
  UNION ALL
  SELECT 'spender',
         sum(CASE WHEN variant = 0 THEN n END),
         sum(CASE WHEN variant = 1 THEN n END),
         sum(CASE WHEN variant = 0 THEN c_spender END),
         sum(CASE WHEN variant = 1 THEN c_spender END)
  FROM v
),
zf AS (
  SELECT metric, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         floor((ca / CAST(n_a AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS p_a,
         floor((cb / CAST(n_b AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS p_b,
         floor((CASE WHEN (ca + cb) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                          * (1 - (ca + cb) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) > 0
                THEN (cb / CAST(n_b AS DOUBLE) - ca / CAST(n_a AS DOUBLE))
                     / sqrt((ca + cb) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                            * (1 - (ca + cb) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                END) * 1000000.0 + 0.5) / 1000000.0 AS z
  FROM rows_
),
ranked AS (
  SELECT x.metric, x.n_a, x.n_b, x.p_a, x.p_b, x.z,
         CAST(1 + sum(CASE WHEN abs(coalesce(y.z, 0.0)) > abs(coalesce(x.z, 0.0))
                     OR (abs(coalesce(y.z, 0.0)) = abs(coalesce(x.z, 0.0))
                         AND y.metric < x.metric)
                THEN 1 ELSE 0 END) AS INTEGER) AS rank
  FROM zf x CROSS JOIN zf y
  GROUP BY x.metric, x.n_a, x.n_b, x.p_a, x.p_b, x.z
),
withcrit AS (
  SELECT *, CASE WHEN rank = 1 THEN CAST(2.39398 AS DOUBLE) WHEN rank = 2 THEN CAST(2.241403 AS DOUBLE) WHEN rank = 3 THEN CAST(1.959964 AS DOUBLE) END AS critical FROM ranked
),
step AS (
  SELECT x.metric, x.n_a, x.n_b, x.p_a, x.p_b, x.z, x.rank, x.critical,
         min(CASE WHEN abs(coalesce(c.z, 0.0)) >= c.critical
                  THEN 1 ELSE 0 END) AS all_ok
  FROM withcrit x JOIN withcrit c ON c.rank <= x.rank
  GROUP BY x.metric, x.n_a, x.n_b, x.p_a, x.p_b, x.z, x.rank, x.critical
)
SELECT metric, n_a, n_b, p_a, p_b, z, rank, critical,
       all_ok = 1 AS significant
FROM step ORDER BY rank
"""


def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal OLS intervals (ml/features.conformal_intervals):
    predict order totals from item counts; md5 split train/cal/test;
    q = exact k-th smallest scaled-integer calibration residual
    (TakeOrdered, no interpolated percentile); coverage is an integer
    comparison — distribution-free >= 90% coverage, engine-exact given
    the fitted line."""
    from gordo_spark.ml.features import conformal_intervals

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = read_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(F.count(F.lit(1)).alias("n_items"))
    d = orders.join(li, "o_orderkey")
    return conformal_intervals(
        d, "n_items", "o_totalprice", "o_orderkey", alpha=0.1, salt="conf"
    )


O_CONFORMAL = """
WITH d AS (
  SELECT o.o_orderkey AS id, CAST(x.n AS DOUBLE) AS x, o.o_totalprice AS y,
         ('0x' || substr(md5('conf' || CAST(o.o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           % 4 AS b
  FROM orders o JOIN (
    SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1
  ) x ON x.l_orderkey = o.o_orderkey
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM d WHERE b <= 1
),
coef AS (
  SELECT n AS n_train,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS bb,
         (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS aa
  FROM fit
),
cal AS (
  SELECT CAST(floor(abs(d.y - (coef.aa + coef.bb * d.x)) * 1e6 + 0.5)
              AS BIGINT) AS r
  FROM d, coef WHERE d.b = 2
),
kk AS (
  SELECT CAST(least(count(*),
              CAST(ceil((count(*) + 1) * 0.9) AS BIGINT)) AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n_cal
  FROM cal
),
qq AS (
  SELECT r AS q FROM (
    SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal
  ) s, kk WHERE s.rn = kk.k
),
tst AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN CAST(floor(abs(d.y - (coef.aa + coef.bb * d.x))
                    * 1e6 + 0.5) AS BIGINT) <= qq.q
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_in
  FROM d, coef, qq WHERE d.b = 3
)
SELECT fit.n AS n_train, kk.n_cal, tst.n_test,
       floor((CAST(qq.q AS DOUBLE) / 1e6) * 1000000.0 + 0.5) / 1000000.0 AS q,
       floor((CAST(n_in AS DOUBLE) / n_test) * 1000000.0 + 0.5) / 1000000.0
         AS coverage
FROM fit, kk, qq, tst
"""


def q_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH (operators/dedup.
    incremental_lsh_candidates): the shifted-copy half of the dup
    corpus arrives as a DELTA against the originals' LANDED signature
    table — only the delta is shingled/signed; the banded bucket join
    is restricted to delta-touching pairs. incremental == full law:
    equals the full-corpus LSH pairs filtered to pairs involving a
    delta id, which is exactly what the oracle recomputes."""
    from gordo_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    landed_sigs = minhash_signatures(docs, num_hashes=8)
    delta = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    return incremental_lsh_candidates(
        landed_sigs, delta, num_hashes=8, bands=4
    ).orderBy("id_a", "id_b")


O_INCREMENTAL_LSH = f"""
SELECT * FROM ({_lsh_pairs_sql().strip()})
WHERE id_a >= 100000 OR id_b >= 100000
ORDER BY id_a, id_b
"""


def q_rm3_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (operators/text.rm3_expansion):
    BM25 top-10 feedback docs -> relevance-model term weights mixed
    50/50 with the uniform query model, top-15 expansion terms — the
    second-pass query a lexical RAG retriever actually runs. Every
    downstream frame hangs off the bounded top-k."""
    from gordo_spark.operators.text import rm3_expansion

    return rm3_expansion(
        read_table(spark, sf_dir, "documents"),
        "table scan merge window",
        k=10,
        m=15,
        mix=0.5,
    )


O_RM3_EXPAND = f"""
WITH topk AS ({O_BM25_SEARCH.strip()}),
tot AS (SELECT sum(score) AS t FROM topk),
sel AS (
  SELECT d.doc_id, t.score, string_split(d.text, ' ') AS w
  FROM documents d JOIN topk t USING (doc_id)
),
ex AS (
  SELECT doc_id, score, len(w) AS dl, unnest(w) AS term FROM sel
),
tf AS (
  SELECT doc_id, term, count(*) AS tf,
         min(score) AS s, min(dl) AS dl
  FROM ex GROUP BY 1, 2
),
rm AS (
  SELECT term,
         sum((s / tot.t) * (CAST(tf AS DOUBLE) / dl)) AS rmw
  FROM tf, tot GROUP BY term
),
q AS (
  SELECT unnest(['merge', 'scan', 'table', 'window']) AS term, 0.125 AS qw
),
mixed AS (
  SELECT coalesce(rm.term, q.term) AS term,
         floor((0.5 * coalesce(rm.rmw, 0.0) + coalesce(q.qw, 0.0))
               * 1000000.0 + 0.5) / 1000000.0 AS weight,
         q.term IS NOT NULL AS in_query
  FROM rm FULL OUTER JOIN q ON q.term = rm.term
)
SELECT term, weight, in_query FROM mixed
ORDER BY weight DESC, term LIMIT 15
"""


def q_cluster_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-randomized A/B (operators/experiments.cluster_ab):
    md5 assignment on the CLUSTER (user_id % 40 cohorts), Welch t on
    cluster-level means — the interference-safe inference a unit-level
    z over-rejects on (design effect). One collapse, one row out."""
    from gordo_spark.operators.experiments import cluster_ab

    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 40).alias("cohort"), "value"
    )
    return cluster_ab(ev, "cohort", "value", salt="exp1")


O_CLUSTER_AB = """
WITH per AS (
  SELECT user_id % 40 AS cohort, avg(value) AS m
  FROM events GROUP BY 1
),
a AS (
  SELECT m,
         ('0x' || substr(md5('exp1' || CAST(cohort AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS g
  FROM per
),
v AS (
  SELECT g, CAST(count(*) AS BIGINT) AS k, sum(m) AS s, sum(m * m) AS q
  FROM a GROUP BY g
),
one AS (
  SELECT sum(CASE WHEN g = 0 THEN k END) AS k_a,
         sum(CASE WHEN g = 1 THEN k END) AS k_b,
         sum(CASE WHEN g = 0 THEN s END) AS sa,
         sum(CASE WHEN g = 1 THEN s END) AS sb,
         sum(CASE WHEN g = 0 THEN q END) AS qa,
         sum(CASE WHEN g = 1 THEN q END) AS qb
  FROM v
),
d AS (
  SELECT CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
         sa / k_a AS ma, sb / k_b AS mb,
         sqrt((CASE WHEN k_a > 1 THEN (qa - sa * sa / k_a) / (k_a - 1) END) / k_a
              + (CASE WHEN k_b > 1 THEN (qb - sb * sb / k_b) / (k_b - 1) END) / k_b)
           AS se
  FROM one
)
SELECT k_a, k_b,
       floor((ma) * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
       floor((mb) * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
       floor((mb - ma) * 1000000.0 + 0.5) / 1000000.0 AS diff,
       floor((se) * 1000000.0 + 0.5) / 1000000.0 AS se,
       floor((CASE WHEN se > 0 THEN (mb - ma) / se END) * 1000000.0 + 0.5)
         / 1000000.0 AS t,
       coalesce(CASE WHEN se > 0 THEN abs((mb - ma) / se) > 1.96 END, FALSE)
         AS significant
FROM d
"""


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (operators/text.textrank_keywords): PageRank
    over the adjacent-token co-occurrence graph, min_count 5 — the
    corpus-wide graph-centrality companion of rake_keyphrases, and a
    pure composition of the skipgram edge build with the existing
    fixed-iteration pagerank (same node-keyed shuffles, same eager
    edge checkpoint). Top-20 terms."""
    from gordo_spark.operators.text import textrank_keywords

    return textrank_keywords(
        read_table(spark, sf_dir, "documents"), min_count=5, topk=20
    )


O_TEXTRANK = """
WITH t AS (
  SELECT string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
pos AS (SELECT w, unnest(range(1, len(w))) AS i FROM t),
bi AS (
  SELECT least(w[i], w[i + 1]) AS a, greatest(w[i], w[i + 1]) AS b
  FROM pos WHERE w[i] <> w[i + 1]
),
e AS (SELECT a, b FROM bi GROUP BY a, b HAVING count(*) >= 5),
ed AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT src AS v, count(*) AS d FROM ed GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
pr0 AS (SELECT v, 1.0 / nn.n AS r FROM deg, nn),
pr1 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr0 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr2 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr1 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr3 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr2 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr4 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr3 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr5 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr4 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr6 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr5 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr7 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr6 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
),
pr8 AS (
  SELECT deg.v,
         (1.0 - 0.85) / nn.n
         + 0.85 * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr7 p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
)
SELECT v AS term, floor((r) * 1000000.0 + 0.5) / 1000000.0 AS rank
FROM pr8 ORDER BY rank DESC, term LIMIT 20
"""


def q_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W36 — KPSS level-stationarity per tag (operators/tsa.kpss_level,
    Bartlett bandwidth 8): the null-stationary complement of w23_adf;
    read as a pair per the standard protocol. Cumulative window + 8
    shared-sort lag frames + one aggregation."""
    from gordo_spark.operators.tsa import kpss_level

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return kpss_level(res, bandwidth=8, resolution_seconds=3600)


O_KPSS = f"""
WITH {_RES_1H_CTE.strip()},
mu AS (SELECT tag, avg(value) AS m FROM res GROUP BY tag),
d AS (
  SELECT res.tag, epoch(res.ts) AS t, res.value - mu.m AS e
  FROM res JOIN mu ON mu.tag = res.tag
),
cum AS (
  SELECT tag, t, e,
         sum(e) OVER (PARTITION BY tag ORDER BY t
                      ROWS UNBOUNDED PRECEDING) AS s
  FROM d
),
agg AS (
  SELECT c.tag, CAST(count(*) AS BIGINT) AS n,
         sum(c.s * c.s) AS eta,
         sum(c.e * c.e) AS g0,
         sum(c.e * l1.e) AS g1, sum(c.e * l2.e) AS g2,
         sum(c.e * l3.e) AS g3, sum(c.e * l4.e) AS g4,
         sum(c.e * l5.e) AS g5, sum(c.e * l6.e) AS g6,
         sum(c.e * l7.e) AS g7, sum(c.e * l8.e) AS g8
  FROM cum c
  LEFT JOIN d l1 ON l1.tag = c.tag AND l1.t = c.t - 3600
  LEFT JOIN d l2 ON l2.tag = c.tag AND l2.t = c.t - 7200
  LEFT JOIN d l3 ON l3.tag = c.tag AND l3.t = c.t - 10800
  LEFT JOIN d l4 ON l4.tag = c.tag AND l4.t = c.t - 14400
  LEFT JOIN d l5 ON l5.tag = c.tag AND l5.t = c.t - 18000
  LEFT JOIN d l6 ON l6.tag = c.tag AND l6.t = c.t - 21600
  LEFT JOIN d l7 ON l7.tag = c.tag AND l7.t = c.t - 25200
  LEFT JOIN d l8 ON l8.tag = c.tag AND l8.t = c.t - 28800
  GROUP BY c.tag
),
st AS (
  SELECT tag, n,
         (g0 + CAST(1.7777777777777777 AS DOUBLE) * coalesce(g1, 0.0) + CAST(1.5555555555555556 AS DOUBLE) * coalesce(g2, 0.0) + CAST(1.3333333333333335 AS DOUBLE) * coalesce(g3, 0.0) + CAST(1.1111111111111112 AS DOUBLE) * coalesce(g4, 0.0) + CAST(0.8888888888888888 AS DOUBLE) * coalesce(g5, 0.0) + CAST(0.6666666666666667 AS DOUBLE) * coalesce(g6, 0.0) + CAST(0.4444444444444444 AS DOUBLE) * coalesce(g7, 0.0) + CAST(0.22222222222222232 AS DOUBLE) * coalesce(g8, 0.0)) / CAST(n AS DOUBLE) AS s2,
         eta
  FROM agg
)
SELECT tag, n,
       floor((CASE WHEN s2 > 0
              THEN eta / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s2) END)
             * 1000000.0 + 0.5) / 1000000.0 AS kpss,
       coalesce(CASE WHEN s2 > 0
              THEN eta / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s2)
                   <= 0.463 END, FALSE) AS level_stationary
FROM st ORDER BY tag
"""


def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm log-rank test (operators/survival.logrank_test): the
    repurchase-time curves of the md5 A/B customer halves — same
    subjects as survival_km, with the inference km_curve lacks (risk
    sets as per-group descending cumsums on the bounded day grid, one
    chi-square(1) row out)."""
    from gordo_spark.operators.experiments import ab_assign
    from gordo_spark.operators.survival import logrank_test

    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderdate")).alias("_ds")
    )
    mx = o.agg(F.max("o_orderdate").alias("_mx"))
    subj = per.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        (F.size("_ds") >= 2).alias("observed"),
        F.when(
            F.size("_ds") >= 2,
            F.datediff(F.element_at("_ds", 2), F.element_at("_ds", 1)),
        )
        .otherwise(F.datediff(F.col("_mx"), F.element_at("_ds", 1)))
        .alias("duration"),
    )
    subj = ab_assign(subj, "o_custkey", 2, "exp1")
    return logrank_test(subj, "variant", "duration", "observed")


O_LOGRANK = """
WITH per AS (
  SELECT o_custkey,
         (array_agg(o_orderdate ORDER BY o_orderdate))[1] AS f,
         (array_agg(o_orderdate ORDER BY o_orderdate))[2] AS s,
         count(*) AS n
  FROM orders GROUP BY 1
),
mx AS (SELECT max(o_orderdate) AS m FROM orders),
subj AS (
  SELECT ('0x' || substr(md5('exp1' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS g,
         CAST(CASE WHEN n >= 2 THEN date_diff('day', f, s)
              ELSE date_diff('day', f, m) END AS DOUBLE) AS t,
         n >= 2 AS ev
  FROM per, mx
),
pg AS (
  SELECT g, t, CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT g, t, d,
         sum(c) OVER (PARTITION BY g ORDER BY t DESC
                      ROWS UNBOUNDED PRECEDING) AS n
  FROM pg
),
a AS (SELECT t, d AS d0, n AS n0r FROM risk WHERE g = 0),
b AS (SELECT t, d AS d1, n AS n1r FROM risk WHERE g = 1),
grid AS (
  SELECT coalesce(a.t, b.t) AS t,
         coalesce(d0, 0) AS d0, coalesce(d1, 0) AS d1,
         first_value(n0r IGNORE NULLS) OVER (
           ORDER BY coalesce(a.t, b.t)
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n0,
         first_value(n1r IGNORE NULLS) OVER (
           ORDER BY coalesce(a.t, b.t)
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n1
  FROM a FULL OUTER JOIN b ON a.t = b.t
),
ev AS (
  SELECT d0 + d1 AS dt, coalesce(n0, 0) + coalesce(n1, 0) AS nt,
         d0, d1, coalesce(n0, 0) AS n0, coalesce(n1, 0) AS n1
  FROM grid WHERE d0 + d1 > 0
),
tot AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM subj
),
s AS (
  SELECT CAST(sum(d0) AS BIGINT) AS events_a,
         CAST(sum(d1) AS BIGINT) AS events_b,
         sum(d1 - dt * n1 / CAST(nt AS DOUBLE)) AS ome,
         sum(CASE WHEN nt > 1
             THEN dt * (n1 / CAST(nt AS DOUBLE))
                  * (1 - n1 / CAST(nt AS DOUBLE))
                  * (nt - dt) / (nt - 1) ELSE 0.0 END) AS var
  FROM ev
)
SELECT n_a, n_b, events_a, events_b,
       floor((ome) * 1000000.0 + 0.5) / 1000000.0 AS observed_minus_expected,
       floor((var) * 1000000.0 + 0.5) / 1000000.0 AS variance,
       floor((CASE WHEN var > 0 THEN ome * ome / var END) * 1000000.0 + 0.5)
         / 1000000.0 AS chi2,
       coalesce(CASE WHEN var > 0 THEN ome * ome / var > 3.841 END, FALSE)
         AS different
FROM tot, s
"""


def q_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified allocation
    (operators/sampling.neyman_allocation): a 10,000-row sampling
    budget over the event-type strata allocated by size x stddev of
    value — the variance-minimizing survey design that precedes
    stratified_take. One moment aggregation, |strata| rows."""
    from gordo_spark.operators.sampling import neyman_allocation

    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    return neyman_allocation(ev, "event_type", "value", total_n=10000)


O_NEYMAN = """
WITH st AS (
  SELECT event_type AS stratum, CAST(count(*) AS BIGINT) AS n_rows,
         stddev_samp(value) AS s
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
w AS (SELECT *, n_rows * coalesce(s, 0.0) AS wt FROM st),
tot AS (SELECT sum(wt) AS tw FROM w)
SELECT stratum, n_rows,
       floor((s) * 1000000.0 + 0.5) / 1000000.0 AS stddev,
       floor((CASE WHEN tw > 0 THEN wt / tw END) * 1000000.0 + 0.5)
         / 1000000.0 AS alloc_frac,
       CAST(floor(CASE WHEN tw > 0 THEN 10000.0 * wt / tw END) AS BIGINT)
         AS n_alloc
FROM w, tot ORDER BY stratum
"""


def q_bootstrap_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for the A/B mean-spend DIFFERENCE
    (operators/experiments.bootstrap_ab_diff): per-user spend, md5
    arms, 100 md5-Poisson replicates reweighting BOTH arms in ONE
    pass (4B map-side sums, no data replication) — the
    decision-relevant band ab_zstat only approximates. Deterministic
    on any engine (M9)."""
    from gordo_spark.operators.experiments import bootstrap_ab_diff

    ev = read_table(spark, sf_dir, "events").select("user_id", "value")
    per = ev.filter(F.col("value").isNotNull()).groupBy("user_id").agg(
        F.sum("value").alias("spend")
    )
    return bootstrap_ab_diff(per, "spend", "user_id", n_boot=100)


def _o_bootstrap_ab(n_boot: int = 100) -> str:
    from gordo_spark.operators.experiments import _POISSON1_CDF

    def w_sql(b):
        g, lane = divmod(b, 8)
        u = (
            f"((('0x' || substr(md5('bootg{g}:' || CAST(user_id AS VARCHAR)),"
            f" {lane * 4 + 1}, 4))::BIGINT + 0.5) / 65536.0)"
        )
        chain = f"{len(_POISSON1_CDF)}"
        for k in range(len(_POISSON1_CDF) - 1, -1, -1):
            chain = (
                f"CASE WHEN {u} < {_POISSON1_CDF[k]!r} THEN {k} "
                f"ELSE {chain} END"
            )
        return f"CAST({chain} AS DOUBLE)"

    sums = ",\n       ".join(
        f"sum(CASE WHEN g = 0 THEN {w_sql(b)} * v END) AS s0{b},"
        f" sum(CASE WHEN g = 0 THEN {w_sql(b)} END) AS w0{b},"
        f" sum(CASE WHEN g = 1 THEN {w_sql(b)} * v END) AS s1{b},"
        f" sum(CASE WHEN g = 1 THEN {w_sql(b)} END) AS w1{b}"
        for b in range(n_boot)
    )
    diffs = ", ".join(
        f"CASE WHEN w0{b} > 0 AND w1{b} > 0"
        f" THEN s1{b} / w1{b} - s0{b} / w0{b} END"
        for b in range(n_boot)
    )
    idx_lo = "greatest(least(CAST(ceil(0.025 * len(ds)) AS BIGINT), len(ds)), 1)"
    idx_hi = "greatest(least(CAST(ceil(0.975 * len(ds)) AS BIGINT), len(ds)), 1)"
    return f"""
WITH per AS (
  SELECT user_id, sum(value) AS v FROM events
  WHERE value IS NOT NULL GROUP BY 1
),
a AS (
  SELECT user_id, v,
         ('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS g
  FROM per WHERE v IS NOT NULL
),
agg AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       avg(CASE WHEN g = 0 THEN v END) AS m0,
       avg(CASE WHEN g = 1 THEN v END) AS m1,
       {sums}
  FROM a
),
srt AS (
  SELECT n_a, n_b, m0, m1,
         list_sort(list_filter([{diffs}], x -> x IS NOT NULL)) AS ds
  FROM agg
)
SELECT n_a, n_b,
       floor((m1 - m0) * 1000000.0 + 0.5) / 1000000.0 AS diff,
       floor((ds[{idx_lo}]) * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
       floor((ds[{idx_hi}]) * 1000000.0 + 0.5) / 1000000.0 AS ci_hi,
       {n_boot} AS n_boot,
       coalesce(ds[{idx_lo}] > 0 OR ds[{idx_hi}] < 0, FALSE) AS significant
FROM srt
"""


O_BOOTSTRAP_AB = _o_bootstrap_ab()


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalization transform table
    (operators/curation.quantile_normalize_map): per event-type, 20
    within-group percentile buckets mapped onto the pooled
    distribution's midpoint values — the bounded broadcastable mapping
    that makes one threshold mean the same thing in every source."""
    from gordo_spark.operators.curation import quantile_normalize_map

    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    return quantile_normalize_map(ev, "event_type", "value", buckets=20)


def _o_quantile_norm(buckets: int = 20) -> str:
    levels = ", ".join(repr(k / buckets) for k in range(buckets + 1))
    mids = ", ".join(repr((k - 0.5) / buckets) for k in range(1, buckets + 1))
    return f"""
WITH g AS (
  SELECT event_type AS grp, count(*) AS n_rows,
         quantile_cont(value, [{levels}]) AS b
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
pooled AS (
  SELECT quantile_cont(value, [{mids}]) AS p
  FROM events WHERE value IS NOT NULL
),
ex AS (
  SELECT grp, n_rows, k AS bucket, b[k] AS from_lo, b[k + 1] AS from_hi
  FROM g, unnest(generate_series(1, {buckets})) AS t(k)
)
SELECT grp, bucket, CAST(n_rows AS BIGINT) AS n_rows,
       floor((from_lo) * 1000000.0 + 0.5) / 1000000.0 AS from_lo,
       floor((from_hi) * 1000000.0 + 0.5) / 1000000.0 AS from_hi,
       floor((p[bucket]) * 1000000.0 + 0.5) / 1000000.0 AS to_value
FROM ex, pooled ORDER BY grp, bucket
"""


O_QUANTILE_NORM = _o_quantile_norm()


def q_temporal_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test leakage audit (operators/quality_checks.
    temporal_leakage): an md5 RANDOM split of the event stream — the
    classic forecasting-eval bug planted deliberately — audited per
    user: nearly every entity leaks (test points sandwiched between
    train points), which is exactly the reading that forces a
    time-based split. One entity-keyed aggregation."""
    from gordo_spark.operators.quality_checks import temporal_leakage

    from gordo_spark.operators.dedup import md5_long

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    split = ev.withColumn(
        "split",
        F.when(
            F.pmod(
                md5_long(F.concat(F.lit("tsplit"), F.col("event_id").cast("string"))),
                10,
            )
            < 8,
            "train",
        ).otherwise("test"),
    )
    return temporal_leakage(split, "user_id", "ts", "split")


O_TEMPORAL_LEAKAGE = """
WITH s AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN ('0x' || substr(md5('tsplit' || CAST(event_id AS VARCHAR)),
                    1, 8))::BIGINT % 10 < 8
              THEN 'train' ELSE 'test' END AS split
  FROM events
)
SELECT user_id AS entity,
       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_test,
       max(CASE WHEN split = 'train' THEN ts END) AS max_train_ts,
       min(CASE WHEN split = 'test' THEN ts END) AS min_test_ts,
       coalesce(min(CASE WHEN split = 'test' THEN ts END)
                <= max(CASE WHEN split = 'train' THEN ts END), FALSE)
         AS leaked
FROM s GROUP BY 1 ORDER BY 1
"""


def q_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning simulator (operators/quality_checks.
    pruning_report): per day-shard min/max of the event value and
    whether the hot predicate value in [140, 200] could skip the whole
    shard — the measurement that justifies (or kills) a layout rewrite
    before paying for it. One aggregation, |shards| rows."""
    from gordo_spark.operators.quality_checks import pruning_report

    ev = read_table(spark, sf_dir, "events").select(
        # timestamp, not date: dates round-trip as objects through
        # Arrow/pandas (the stickiness transport convention)
        F.date_trunc("day", F.col("ts")).alias("day"), "value"
    )
    return pruning_report(ev, "day", "value", 140.0, 200.0)


O_PRUNING_REPORT = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       floor((min(value)) * 1000000.0 + 0.5) / 1000000.0 AS vmin,
       floor((max(value)) * 1000000.0 + 0.5) / 1000000.0 AS vmax,
       max(value) < 140.0 OR min(value) > 200.0 AS skippable
FROM events
GROUP BY 1 ORDER BY 1
"""


def q_hac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W37 — HAC (Newey-West) mean CI + effective sample size per tag
    (operators/tsa.hac_mean_ci): the autocorrelation-honest SE a
    resampled sensor mean actually has (naive sd/sqrt(n) over-alarms),
    riding the w36_kpss Bartlett machinery. One mean join + 8
    shared-sort lag frames + one aggregation."""
    from gordo_spark.operators.tsa import hac_mean_ci

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return hac_mean_ci(res, bandwidth=8, resolution_seconds=3600)


O_HAC = f"""
WITH {_RES_1H_CTE.strip()},
mu AS (SELECT tag, avg(value) AS m, count(*) AS n FROM res
       WHERE value IS NOT NULL GROUP BY tag),
d AS (
  SELECT res.tag, epoch(res.ts) AS t, res.value - mu.m AS e
  FROM res JOIN mu ON mu.tag = res.tag WHERE res.value IS NOT NULL
),
agg AS (
  SELECT c.tag,
         sum(c.e * c.e) AS g0,
         sum(c.e * l1.e) AS g1, sum(c.e * l2.e) AS g2,
         sum(c.e * l3.e) AS g3, sum(c.e * l4.e) AS g4,
         sum(c.e * l5.e) AS g5, sum(c.e * l6.e) AS g6,
         sum(c.e * l7.e) AS g7, sum(c.e * l8.e) AS g8
  FROM d c
  LEFT JOIN d l1 ON l1.tag = c.tag AND l1.t = c.t - 3600
  LEFT JOIN d l2 ON l2.tag = c.tag AND l2.t = c.t - 7200
  LEFT JOIN d l3 ON l3.tag = c.tag AND l3.t = c.t - 10800
  LEFT JOIN d l4 ON l4.tag = c.tag AND l4.t = c.t - 14400
  LEFT JOIN d l5 ON l5.tag = c.tag AND l5.t = c.t - 18000
  LEFT JOIN d l6 ON l6.tag = c.tag AND l6.t = c.t - 21600
  LEFT JOIN d l7 ON l7.tag = c.tag AND l7.t = c.t - 25200
  LEFT JOIN d l8 ON l8.tag = c.tag AND l8.t = c.t - 28800
  GROUP BY c.tag
),
st AS (
  SELECT a.tag, CAST(mu.n AS BIGINT) AS n, mu.m,
         a.g0,
         (a.g0 + CAST(1.7777777777777777 AS DOUBLE) * coalesce(g1, 0.0) + CAST(1.5555555555555556 AS DOUBLE) * coalesce(g2, 0.0) + CAST(1.3333333333333335 AS DOUBLE) * coalesce(g3, 0.0) + CAST(1.1111111111111112 AS DOUBLE) * coalesce(g4, 0.0) + CAST(0.8888888888888888 AS DOUBLE) * coalesce(g5, 0.0) + CAST(0.6666666666666667 AS DOUBLE) * coalesce(g6, 0.0) + CAST(0.4444444444444444 AS DOUBLE) * coalesce(g7, 0.0) + CAST(0.22222222222222232 AS DOUBLE) * coalesce(g8, 0.0)) / CAST(mu.n AS DOUBLE) AS lrv
  FROM agg a JOIN mu ON mu.tag = a.tag
)
SELECT tag, n,
       floor((m) * 1000000.0 + 0.5) / 1000000.0 AS mean,
       floor((sqrt((g0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS se_naive,
       floor((CASE WHEN lrv > 0 THEN sqrt(lrv / CAST(n AS DOUBLE)) END)
             * 1000000.0 + 0.5) / 1000000.0 AS se_hac,
       floor((CASE WHEN lrv > 0
              THEN CAST(n AS DOUBLE) * (g0 / CAST(n AS DOUBLE)) / lrv END)
             * 1000000.0 + 0.5) / 1000000.0 AS n_eff,
       floor((m - 1.96 * (CASE WHEN lrv > 0
              THEN sqrt(lrv / CAST(n AS DOUBLE)) END))
             * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
       floor((m + 1.96 * (CASE WHEN lrv > 0
              THEN sqrt(lrv / CAST(n AS DOUBLE)) END))
             * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
FROM st ORDER BY tag
"""


def q_sensor_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fleet-triage composition (operators/tsa.sensor_health):
    availability/outages + longest flatline + Hurst + KPSS + a
    composed healthy verdict, one row per tag — the table an operator
    reads before opening any chart (the curation_verdict pattern
    applied to sensors). Each branch is the contract-tested operator
    verbatim; joins on the bounded tag key."""
    from gordo_spark.operators.tsa import sensor_health

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return sensor_health(res, resolution_seconds=3600, flatline_min=6)


O_SENSOR_HEALTH = f"""
WITH gaps_t AS ({{O_GAP}}),
fl AS (
  WITH {_RES_1H_CTE.strip()},
  q AS (
    SELECT tag, ts, floor((value) * 1000000.0 + 0.5) / 1000000.0 AS qv
    FROM res WHERE value IS NOT NULL
  ),
  flag AS (
    SELECT tag, ts, qv,
           CASE WHEN lag(qv) OVER w IS NULL OR qv <> lag(qv) OVER w
                THEN 1 ELSE 0 END AS chg
    FROM q WINDOW w AS (PARTITION BY tag ORDER BY ts)
  ),
  runs AS (
    SELECT tag, sum(chg) OVER (PARTITION BY tag ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS run
    FROM flag
  ),
  rl AS (SELECT tag, run, count(*) AS len FROM runs GROUP BY 1, 2)
  SELECT tag, CAST(max(len) AS BIGINT) AS longest_flatline
  FROM rl GROUP BY tag
),
hu AS (SELECT tag, hurst FROM ({{O_HURST}})),
kp AS (SELECT tag, kpss, level_stationary FROM ({{O_KPSS}}))
SELECT g.tag, g.expected_buckets, g.availability, g.longest_gap_s,
       g.n_gaps,
       coalesce(fl.longest_flatline, 0) AS longest_flatline,
       hu.hurst, kp.kpss, kp.level_stationary,
       (g.availability >= 0.9 AND coalesce(fl.longest_flatline, 0) < 6
        AND coalesce(kp.level_stationary, FALSE)) AS healthy
FROM gaps_t g
LEFT JOIN fl ON fl.tag = g.tag
LEFT JOIN hu ON hu.tag = g.tag
LEFT JOIN kp ON kp.tag = g.tag
ORDER BY g.tag
"""


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law shingle-vocabulary forecast (operators/text.heaps_law,
    shingle_n=3): fit V(n) = K n^beta on id-order prefixes and predict
    the 3-shingle vocabulary at 1e9 documents — the capacity-planning
    number behind every term-keyed structure (LSH posting lists, df
    tables), and the measured evidence (beta ~ 0.83 here) for the
    plan-audit rule that a term-keyed aggregate bounds nothing. One
    corpus pass + small-frame closed-form OLS."""
    from gordo_spark.operators.text import heaps_law

    return heaps_law(
        read_table(spark, sf_dir, "documents"),
        predict_at=1_000_000_000,
        shingle_n=3,
    )


O_HEAPS_LAW = """
WITH ids AS (SELECT DISTINCT doc_id AS id FROM documents),
b AS (
  SELECT quantile_cont(id, [0.125, 0.25, 0.5, 0.75, 1.0]) AS bs
  FROM ids
),
pts AS (
  SELECT i, bs[i] AS bound FROM b, unnest(generate_series(1, 5)) t(i)
),
cnts AS (
  SELECT p.i, p.bound,
         (SELECT CAST(count(*) AS BIGINT) FROM ids WHERE id <= p.bound)
           AS n_docs
  FROM pts p
),
shingled AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
         )) AS shingle
  FROM documents
),
hashed AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS sh
  FROM shingled
),
first AS (SELECT sh, min(doc_id) AS f FROM hashed GROUP BY sh),
vocab AS (
  SELECT DISTINCT c.n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM first WHERE f <= c.bound)
           AS v
  FROM cnts c WHERE c.n_docs >= 2
),
fit AS (
  SELECT count(*) AS np, sum(ln(CAST(n_docs AS DOUBLE))) AS sx,
         sum(ln(CAST(greatest(v, 1) AS DOUBLE))) AS sy,
         sum(ln(CAST(n_docs AS DOUBLE))
             * ln(CAST(greatest(v, 1) AS DOUBLE))) AS sxy,
         sum(ln(CAST(n_docs AS DOUBLE))
             * ln(CAST(n_docs AS DOUBLE))) AS sxx
  FROM vocab
),
co AS (
  SELECT (np * sxy - sx * sy) / (np * sxx - sx * sx) AS beta,
         exp((sy - ((np * sxy - sx * sy) / (np * sxx - sx * sx)) * sx)
             / np) AS k
  FROM fit
)
SELECT v.n_docs, v.v AS vocab,
       floor((co.beta) * 1000000.0 + 0.5) / 1000000.0 AS beta,
       floor((co.k) * 1000000.0 + 0.5) / 1000000.0 AS k_coef,
       floor(co.k * pow(1000000000.0, co.beta)) AS predicted_vocab_at
FROM vocab v, co ORDER BY v.n_docs
"""
