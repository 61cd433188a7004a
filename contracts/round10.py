"""Round-10 additions: drift inference hardening — exact 1-D
Wasserstein drift, md5-permutation p-values, and Benjamini-Hochberg FDR
over the drift family (the multiple-testing gate a fleet-wide sweep
needs before paging anyone)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from contracts.base import _events_long, read_table
from contracts.round9 import _EM_VALUE


def q_w1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 drift per tag between the first and
    second half of the range (operators/tsa.wasserstein_drift) over the
    1H mean_exact resample: the drift statistic WITH UNITS (average
    value movement), binning-free where psi_drift needs a bin knob.
    One (tag, grid-value) hash aggregate + one per-tag ordered window
    over the bounded support; step terms quantized to 1e-12 and summed
    as exact decimals."""
    from gordo_spark.operators.resample import resample_aggregate
    from gordo_spark.operators.tsa import wasserstein_drift

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return wasserstein_drift(res)


O_W1_DRIFT = f"""
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         {_EM_VALUE} AS value
  FROM events GROUP BY 1, 2
),
span AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid FROM res),
d AS (
  SELECT tag, value, epoch(ts) < (SELECT mid FROM span) AS is_ref FROM res
  WHERE value IS NOT NULL
),
cnt AS (
  SELECT tag, floor(value * 1000000.0 + 0.5) / 1000000.0 AS v,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS nc
  FROM d GROUP BY 1, 2
),
cum AS (
  SELECT tag, v, nr, nc,
         sum(nr) OVER (PARTITION BY tag) AS totr,
         sum(nc) OVER (PARTITION BY tag) AS totc,
         sum(nr) OVER (PARTITION BY tag ORDER BY v) AS cr,
         sum(nc) OVER (PARTITION BY tag ORDER BY v) AS cc,
         lead(v) OVER (PARTITION BY tag ORDER BY v) AS nv
  FROM cnt
),
term AS (
  SELECT tag, CAST(totr AS BIGINT) AS n_ref, CAST(totc AS BIGINT) AS n_cur,
         CAST(floor((CASE WHEN nv IS NOT NULL THEN
             abs((CASE WHEN totr > 0 THEN cr / totr ELSE 0.0 END)
                 - (CASE WHEN totc > 0 THEN cc / totc ELSE 0.0 END))
             * (nv - v) ELSE 0.0 END) * 1000000000000.0 + 0.5) AS HUGEINT)
           AS ti
  FROM cum
)
SELECT tag,
       floor((CAST(sum(ti) AS DOUBLE) / 1000000000000.0) * 1000000.0 + 0.5)
         / 1000000.0 AS w1,
       n_ref, n_cur
FROM term GROUP BY tag, n_ref, n_cur ORDER BY tag
"""


def _perm_oracle(n_perm: int = 39) -> str:
    """CTE mirror of operators/tsa.perm_test_drift: md5-Bernoulli
    relabelings from 16-bit lanes, exact scaled-integer sums, add-one
    Monte-Carlo p."""
    n_groups = (n_perm + 7) // 8

    def u(b: int) -> str:
        g, lane = divmod(b, 8)
        return (
            f"((CAST(('0x' || substr(md5('permg{g}:' ||"
            f" CAST(event_id AS VARCHAR)), {lane * 4 + 1}, 4))::BIGINT"
            f" AS DOUBLE) + 0.5) / 65536.0)"
        )

    perm_sums = ",\n         ".join(
        f"CAST(sum(CASE WHEN {u(b)} < pcur THEN iv END) AS DOUBLE) AS sb{b},"
        f" sum(CASE WHEN {u(b)} < pcur THEN 1 ELSE 0 END) AS kb{b}"
        for b in range(n_perm)
    )
    exceed = " + ".join(
        f"(CASE WHEN kb{b} > 0 AND kb{b} < n AND"
        f" abs(sb{b} / kb{b} - ((s - sb{b}) / (n - kb{b})))"
        f" >= abs(sc / nc - ((s - sc) / (n - nc))) THEN 1 ELSE 0 END)"
        for b in range(n_perm)
    )
    return f"""
WITH raw AS (
  SELECT event_type AS tag, ts, value, event_id FROM events
),
span AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid FROM raw),
d AS (
  SELECT tag, value, event_id,
         epoch(ts) < (SELECT mid FROM span) AS is_ref
  FROM raw WHERE value IS NOT NULL
),
sizes AS (
  SELECT tag,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) / count(*) AS pcur
  FROM d GROUP BY tag
),
rows_ AS (
  SELECT d.tag, floor(d.value * 1000000.0 + 0.5) AS iv, d.is_ref,
         d.event_id, sizes.pcur
  FROM d JOIN sizes USING (tag)
),
agg AS (
  SELECT tag, count(*) AS n,
         CAST(sum(CAST(iv AS HUGEINT)) AS DOUBLE) AS s,
         CAST(sum(CASE WHEN NOT is_ref THEN CAST(iv AS HUGEINT) END)
              AS DOUBLE) AS sc,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS nc,
         {perm_sums}
  FROM rows_ GROUP BY tag
)
SELECT tag,
       CASE WHEN nc = 0 OR nc = n THEN NULL ELSE
         floor(((sc / nc - ((s - sc) / (n - nc))) / 1000000.0) * 1000000.0
               + 0.5) / 1000000.0 END AS delta_obs,
       CASE WHEN nc = 0 OR nc = n THEN NULL ELSE
         CAST(1 + {exceed} AS DOUBLE) / {float(n_perm + 1)!r} END AS p_value,
       CAST(n - nc AS BIGINT) AS n_ref,
       CAST(nc AS BIGINT) AS n_cur
FROM agg ORDER BY tag
"""


def q_perm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo permutation p-value per tag for the half-mean drift
    (operators/tsa.perm_test_drift, B=39 md5-Bernoulli relabelings from
    16-bit lanes): distribution-free inference on the drift the
    W1/PSI/KS screens only rank — ONE aggregation pass of 2B+4 exact
    scaled-integer sums per tag, bit-reproducible on any engine."""
    from gordo_spark.operators.tsa import perm_test_drift

    raw = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("tag"), "ts", "value", "event_id"
    )
    return perm_test_drift(raw, n_perm=39)


O_PERM_DRIFT = _perm_oracle(39)


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR over the per-tag permutation
    drift p-values (operators/tsa.bh_fdr, q=0.10) — the
    multiple-testing gate before a fleet-wide drift sweep pages anyone
    (the FDR sibling of the Holm FWER control already shipped for A/B
    families). Pure rank arithmetic over the bounded hypothesis
    family."""
    from gordo_spark.operators.tsa import bh_fdr, perm_test_drift

    raw = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("tag"), "ts", "value", "event_id"
    )
    return bh_fdr(perm_test_drift(raw, n_perm=39), q=0.10)


O_BH_FDR = f"""
WITH pv AS ({O_PERM_DRIFT.replace("ORDER BY tag", "")}),
ranked AS (
  SELECT tag, p_value,
         CAST(row_number() OVER (ORDER BY p_value ASC, tag ASC) AS INTEGER)
           AS rank,
         CAST(0.1 AS DOUBLE) * row_number() OVER (ORDER BY p_value ASC, tag ASC)
           / count(*) OVER () AS bh_threshold
  FROM pv
),
kk AS (
  SELECT max(CASE WHEN p_value <= bh_threshold THEN rank ELSE 0 END) AS k
  FROM ranked
)
SELECT tag, p_value, rank,
       floor((bh_threshold) * 1000000.0 + 0.5) / 1000000.0 AS bh_threshold,
       rank <= (SELECT k FROM kk) AS rejected
FROM ranked ORDER BY rank
"""


def q_drift_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed per-tag DRIFT TRIAGE table — the sensor_health /
    curation_verdict pattern applied to distribution drift: every
    screen and the inference in ONE read per tag. Columns: PSI (binned
    screen), KS + its 5%-level flag (binning-free screen), W1 (drift
    magnitude WITH UNITS), the permutation p-value, and the
    BH-at-q=0.10 rejection — so the on-call reads "how big, is it
    significant, and does it survive the fleet-wide multiple-testing
    gate" in one row. Three bounded per-tag frames joined on the tag
    key (broadcast-sized by construction); each component is its own
    gated contract, so this composition adds no new numeric surface."""
    from gordo_spark.operators.resample import resample_aggregate
    from gordo_spark.operators.tsa import (
        bh_fdr,
        ks_drift,
        perm_test_drift,
        psi_drift,
        wasserstein_drift,
    )

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    psi = psi_drift(res, bins=10).select("tag", "psi")
    ks = ks_drift(res).select(
        "tag", "ks", F.col("drift").alias("ks_drift"), "n_ref", "n_cur"
    )
    w1 = wasserstein_drift(res).select("tag", "w1")
    raw = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("tag"), "ts", "value", "event_id"
    )
    bh = bh_fdr(perm_test_drift(raw, n_perm=39), q=0.10).select(
        "tag", "p_value", "rejected"
    )
    return (
        ks.join(psi, "tag")
        .join(w1, "tag")
        .join(bh, "tag")
        .select(
            "tag", "psi", "ks", "ks_drift", "w1", "p_value",
            F.col("rejected").alias("bh_rejected"), "n_ref", "n_cur",
        )
        .orderBy("tag")
    )


def _drift_verdict_oracle() -> str:
    from contracts.rounds5to8_a import O_KS_DRIFT, O_PSI_DRIFT

    return f"""
WITH psi_t AS ({O_PSI_DRIFT}),
ks_t AS ({O_KS_DRIFT}),
w1_t AS ({O_W1_DRIFT}),
bh_t AS ({O_BH_FDR})
SELECT ks_t.tag, psi_t.psi, ks_t.ks, ks_t.drift AS ks_drift, w1_t.w1,
       bh_t.p_value, bh_t.rejected AS bh_rejected,
       ks_t.n_ref, ks_t.n_cur
FROM ks_t
JOIN psi_t ON ks_t.tag = psi_t.tag
JOIN w1_t ON ks_t.tag = w1_t.tag
JOIN bh_t ON ks_t.tag = bh_t.tag
ORDER BY ks_t.tag
"""


O_DRIFT_VERDICT = _drift_verdict_oracle()
