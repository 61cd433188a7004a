"""Round-8 SQL-matched additions: drift, sampling, text and event-analytics contracts."""

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
    read_table,
    resample_aggregate,
)
from contracts.training_data import (
    O_BM25_SEARCH,
    O_DEDUP_COMPONENTS,
    _O_DOCS_DUPS,
    _docs_with_dups,
    _simhash_sql,
)





# --------------------------------------------------- round-8 wave (SQL-matched)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health kNN-graph diagnostics
    (operators/similarity.knn_graph_stats): per-vector in-degree
    (hubness) and reciprocal-neighbor rate from the exact cosine k=5
    graph over a bounded id-capped sample (the dedup_embed_cosine
    all-pairs-diagnostic convention)."""
    from gordo_spark.operators.similarity import knn_graph_stats

    embs = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    return knn_graph_stats(embs, k=5)


O_KNN_GRAPH = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 1000
),
p AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         floor((list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e)))) * 1000000.0 + 0.5) / 1000000.0 AS c
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
),
topk AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS r
    FROM p
  ) WHERE r <= 5
),
indeg AS (SELECT dst AS id, count(*) AS in_degree FROM topk GROUP BY 1),
recip AS (
  SELECT x.src AS id, count(*) AS n_reciprocal
  FROM topk x JOIN topk y ON x.src = y.dst AND x.dst = y.src
  GROUP BY 1
)
SELECT v.vec_id,
       COALESCE(in_degree, 0) AS in_degree,
       COALESCE(n_reciprocal, 0) AS n_reciprocal,
       floor((COALESCE(n_reciprocal, 0) / 5.0) * 1000000.0 + 0.5) / 1000000.0 AS reciprocal_rate
FROM v
LEFT JOIN indeg ON v.vec_id = indeg.id
LEFT JOIN recip ON v.vec_id = recip.id
"""


def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion (operators/similarity.rrf_fusion):
    BM25 lexical top-20 + exact-cosine ANN top-20 (query vector 0;
    vec_id aligns with doc_id) fused by reciprocal rank, k=60 — the
    standard RAG hybrid-search combiner over two bounded retriever
    outputs."""
    from gordo_spark.operators.similarity import cosine_topk, rrf_fusion
    from gordo_spark.operators.text import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    embs = read_table(spark, sf_dir, "embeddings")
    bm = bm25_topk(docs, "table scan merge window", k=20)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm_r = bm.select("doc_id", F.row_number().over(w).alias("rank"))
    ann = cosine_topk(embs, embs.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fusion([bm_r, ann], rrf_k=60)


def _o_rrf_hybrid() -> str:
    bm20 = O_BM25_SEARCH.strip().replace("LIMIT 10", "LIMIT 20")
    return f"""
WITH bm AS ({bm20}),
bm_r AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id AS doc_id,
         list_dot_product(qv, embedding::DOUBLE[])
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[]))) AS sim
  FROM embeddings, q WHERE vec_id <> 0
),
ann AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
    FROM scored
  ) WHERE rank <= 20
),
un AS (
  SELECT doc_id, 1.0 / (60 + rank) AS c FROM bm_r
  UNION ALL
  SELECT doc_id, 1.0 / (60 + rank) AS c FROM ann
),
agg AS (
  SELECT doc_id, count(*) AS n_lists, floor((sum(c)) * 1000000.0 + 0.5) / 1000000.0 AS rrf_score
  FROM un GROUP BY 1
)
SELECT doc_id, n_lists, rrf_score,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank
FROM agg
"""


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-group deterministic sample
    (operators/sampling.sample_k_per_group): 5 documents per source by
    md5(salt || id) rank — uniform within group, reproducible from ids
    alone, no RNG (M9)."""
    from gordo_spark.operators.sampling import sample_k_per_group

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_k_per_group(docs, "source", "doc_id", k=5)


O_GROUP_SAMPLE = """
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5('gsample' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= 5
"""


def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter ingest routing (operators/quality_checks.
    quarantine_split): every event routed ok/quarantine with the
    comma-joined reasons (late window, value spike, error type) — row
    count in == row count out, nothing silently dropped."""
    from gordo_spark.operators.quality_checks import quarantine_split

    ev = read_table(spark, sf_dir, "events")
    out = quarantine_split(
        ev,
        [
            ("late_window", F.col("ts") >= F.lit("2024-01-28 00:00:00")),
            ("value_spike", F.col("value") > 400.0),
            ("error_event", F.col("event_type") == "error"),
        ],
    )
    return out.select("event_id", "status", "reasons")


O_QUARANTINE = """
SELECT event_id,
       CASE WHEN reasons = '' THEN 'ok' ELSE 'quarantine' END AS status,
       CASE WHEN reasons <> '' THEN reasons END AS reasons
FROM (
  SELECT event_id,
         concat_ws(',',
           CASE WHEN ts >= TIMESTAMP '2024-01-28 00:00:00' THEN 'late_window' END,
           CASE WHEN value > 400.0 THEN 'value_spike' END,
           CASE WHEN event_type = 'error' THEN 'error_event' END) AS reasons
  FROM events
)
"""


def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot profile drift (operators/quality_checks.schema_drift):
    events first half vs second half of January — per numeric column
    null rate / mean comparison with engine-portable 6dp-rounded
    verdict thresholds; a column missing from either snapshot reports
    'missing' (the hard schema break)."""
    from gordo_spark.operators.quality_checks import schema_drift

    ev = read_table(spark, sf_dir, "events")
    old = ev.filter(F.col("ts") < F.lit("2024-01-16 00:00:00"))
    new = ev.filter(F.col("ts") >= F.lit("2024-01-16 00:00:00"))
    return schema_drift(old, new, ["value", "user_id", "event_id"])


def _o_schema_drift() -> str:
    def prof(name, cond):
        cols = []
        for c in ("value", "user_id", "event_id"):
            cols.append(
                f"SELECT '{c}' AS \"column\", count(*) AS n, "
                f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nulls, "
                f"avg({c}) AS mean FROM events WHERE {cond}"
            )
        return f"{name} AS (" + " UNION ALL ".join(cols) + ")"

    return f"""
WITH {prof("po", "ts < TIMESTAMP '2024-01-16 00:00:00'")},
{prof("pn", "ts >= TIMESTAMP '2024-01-16 00:00:00'")},
j AS (
  SELECT COALESCE(po."column", pn."column") AS "column",
         po.n AS n_o, po.nulls AS nu_o, po.mean AS m_o,
         pn.n AS n_n, pn.nulls AS nu_n, pn.mean AS m_n
  FROM po FULL OUTER JOIN pn ON po."column" = pn."column"
),
v AS (
  SELECT "column",
         floor((nu_o / CAST(n_o AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_rate_old,
         floor((nu_n / CAST(n_n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_rate_new,
         floor((m_o) * 1000000.0 + 0.5) / 1000000.0 AS mean_old,
         floor((m_n) * 1000000.0 + 0.5) / 1000000.0 AS mean_new,
         floor((abs(m_n - m_o) / greatest(abs(m_o), 1e-12)) * 1000000.0 + 0.5) / 1000000.0 AS rel,
         n_o, n_n, nu_o, nu_n
  FROM j
)
SELECT "column", null_rate_old, null_rate_new, mean_old, mean_new,
       CASE WHEN n_o IS NOT NULL AND n_n IS NOT NULL THEN rel END
         AS rel_mean_delta,
       CASE WHEN n_o IS NULL OR n_n IS NULL THEN 'missing'
            WHEN rel > 0.10 THEN 'mean_drift'
            WHEN floor((abs(nu_n / CAST(n_n AS DOUBLE)
                           - nu_o / CAST(n_o AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 > 0.05
              THEN 'null_drift'
            ELSE 'stable' END AS verdict
FROM v
"""


def q_control_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western-Electric control-chart rules (operators/tsa.
    control_rules) on the hourly-resampled event series: |z|>3 spikes
    plus the 2-of-3/4-of-5/8-run sustained-shift rules a bare sigma
    monitor misses — every window tag-partitioned, all rule decisions
    on 6dp-rounded z (engine-portable booleans)."""
    from gordo_spark.operators.tsa import control_rules

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return _r6(control_rules(res), "value")


O_CONTROL_RULES = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT tag, floor((avg(value)) * 1000000.0 + 0.5) / 1000000.0 AS mu, floor((stddev_pop(value)) * 1000000.0 + 0.5) / 1000000.0 AS sd
  FROM res GROUP BY 1
),
z AS (
  SELECT r.tag, r.ts, r.value,
         CASE WHEN sd > 0 THEN floor(((r.value - mu) / sd) * 1000000.0 + 0.5) / 1000000.0 END AS z
  FROM res r JOIN stats USING (tag)
),
runs AS (
  SELECT tag, ts, value, z,
         count(z) OVER w3 AS c3, count(z) OVER w5 AS c5, count(z) OVER w8 AS c8,
         sum(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 AS u2,
         sum(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 AS d2,
         sum(CASE WHEN z > 1 THEN 1 ELSE 0 END) OVER w5 AS u1,
         sum(CASE WHEN z < -1 THEN 1 ELSE 0 END) OVER w5 AS d1,
         sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 AS uc,
         sum(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 AS dc
  FROM z
  WINDOW w3 AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w8 AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT tag, ts, floor((value) * 1000000.0 + 0.5) / 1000000.0 AS value, z,
       COALESCE(z IS NOT NULL AND abs(z) > 3, false) AS r1_beyond_3s,
       COALESCE(z IS NOT NULL AND (u2 >= 2 OR d2 >= 2) AND c3 >= 3, false) AS r2_2of3_2s,
       COALESCE(z IS NOT NULL AND (u1 >= 4 OR d1 >= 4) AND c5 >= 5, false) AS r3_4of5_1s,
       COALESCE(z IS NOT NULL AND (uc >= 8 OR dc >= 8) AND c8 >= 8, false) AS r4_8_run,
       COALESCE((z IS NOT NULL AND abs(z) > 3)
                OR (z IS NOT NULL AND (u2 >= 2 OR d2 >= 2) AND c3 >= 3)
                OR (z IS NOT NULL AND (u1 >= 4 OR d1 >= 4) AND c5 >= 5)
                OR (z IS NOT NULL AND (uc >= 8 OR dc >= 8) AND c8 >= 8),
                false) AS any_signal
FROM runs
"""


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 10%-trimmed mean (operators/ranking.trimmed_mean) of
    order totals by market segment — the robust location estimate
    between mean and median; cut points are exact percentiles rounded
    to 6dp before the inclusive boundary comparison."""
    from gordo_spark.operators.ranking import trimmed_mean

    j = (
        read_table(spark, sf_dir, "orders")
        .join(
            read_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_totalprice")
    )
    return trimmed_mean(j, "c_mktsegment", "o_totalprice", trim=0.1)


O_TRIMMED_MEAN = """
WITH j AS (
  SELECT c_mktsegment, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
),
cuts AS (
  SELECT c_mktsegment, count(*) AS n,
         floor((quantile_cont(o_totalprice, 0.1)) * 1000000.0 + 0.5) / 1000000.0 AS lo_cut,
         floor((quantile_cont(o_totalprice, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS hi_cut
  FROM j WHERE o_totalprice IS NOT NULL GROUP BY 1
)
SELECT j.c_mktsegment, n, count(*) AS n_used, lo_cut, hi_cut,
       floor((avg(o_totalprice)) * 1000000.0 + 0.5) / 1000000.0 AS trimmed_mean
FROM j JOIN cuts ON j.c_mktsegment = cuts.c_mktsegment
WHERE floor((o_totalprice) * 1000000.0 + 0.5) / 1000000.0 >= lo_cut AND floor((o_totalprice) * 1000000.0 + 0.5) / 1000000.0 <= hi_cut
GROUP BY j.c_mktsegment, n, lo_cut, hi_cut
"""



def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free smoothed target encoding (ml/features.target_encode,
    leave-one-out): order priority encoded against order value with the
    row's own target excluded from its category mean, 20
    pseudo-observations of shrinkage toward the global mean — the
    high-cardinality categorical-feature standard."""
    from gordo_spark.ml.features import target_encode

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return target_encode(
        orders, "o_orderpriority", "o_totalprice",
        smoothing=20.0, leave_one_out=True,
    )


O_TARGET_ENCODE = """
WITH r AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_totalprice IS NOT NULL
),
per AS (
  SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS s
  FROM r GROUP BY 1
),
g AS (SELECT avg(o_totalprice) AS gm FROM r)
SELECT o_orderkey, o_orderpriority, o_totalprice,
       floor((COALESCE(
         ((n - 1) * (CASE WHEN n > 1
                          THEN (s - o_totalprice) / (n - 1) END)
          + 20.0 * gm) / ((n - 1) + 20.0),
         gm)) * 1000000.0 + 0.5) / 1000000.0 AS target_enc
FROM r JOIN per USING (o_orderpriority), g
"""


def q_isotonic_calib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) probability calibration (ml/features.
    isotonic_calibration): monotone map from a 3dp score grid to
    empirical P(y=1) — the non-parametric companion to brier/ECE.
    Score = md5-derived pseudo-probability, label = high-value order.
    FULLY oracle-checked despite PAV being sequential: the oracle uses
    the minimax identity ``fit(k) = max_{i<=k} min_{j>=k}
    mean(y_i..y_j)`` over prefix sums of the INTEGER grid counts —
    pooled means are exact integer ratios in both formulations, so the
    doubles agree bit-for-bit (verified: 0.0 max diff on 1000 grid
    points)."""
    from gordo_spark.ml.features import isotonic_calibration

    orders = read_table(spark, sf_dir, "orders").select(
        (F.pmod(F.col("o_orderkey"), F.lit(1000)) / 1000.0).alias("p"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("y"),
    )
    return isotonic_calibration(orders, "p", "y", precision=3)


O_ISOTONIC_CALIB = """
WITH g AS (
  SELECT floor(((o_orderkey % 1000) / 1000.0) * 1000.0 + 0.5) / 1000.0 AS s,
         count(*) AS n,
         CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM orders GROUP BY 1
),
o AS (
  SELECT s, n, pos,
         row_number() OVER (ORDER BY s) AS k,
         sum(n) OVER (ORDER BY s) AS cn,
         sum(pos) OVER (ORDER BY s) AS cp
  FROM g
),
pairs AS (
  SELECT i.k AS ik, j.k AS jk,
         (j.cp - (i.cp - i.pos))
           / CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS avgij
  FROM o i JOIN o j ON i.k <= j.k
),
sufmin AS (
  SELECT ik, jk AS k,
         min(avgij) OVER (PARTITION BY ik ORDER BY jk DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM pairs
),
fit AS (
  SELECT k, ik,
         max(m) OVER (PARTITION BY k ORDER BY ik
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
  FROM sufmin
)
SELECT o.s AS score_grid, o.n AS n, o.pos AS n_pos,
       floor((fit.f) * 1000000.0 + 0.5) / 1000000.0 AS calibrated
FROM fit JOIN o ON o.k = fit.k
WHERE fit.ik = fit.k
ORDER BY o.s
"""


def q_json_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload conformance monitor (operators/quality_checks.
    json_conformance): per event type, parse rate + per-required-key
    presence rates ('k' is the real payload key, 'missing_key' the
    planted absent one) — the ingest-contract tripwire."""
    from gordo_spark.operators.quality_checks import json_conformance

    ev = read_table(spark, sf_dir, "events")
    return json_conformance(
        ev, "props", ["k", "missing_key"], group_col="event_type"
    )


O_JSON_CONFORMANCE = """
SELECT event_type, count(*) AS n,
       floor((avg(CASE WHEN json_valid(props) THEN 1 ELSE 0 END)) * 1000000.0 + 0.5) / 1000000.0
         AS parse_rate,
       floor((avg(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                      THEN 1 ELSE 0 END)) * 1000000.0 + 0.5) / 1000000.0 AS has_k,
       floor((avg(CASE WHEN json_extract(props, '$.missing_key') IS NOT NULL
                      THEN 1 ELSE 0 END)) * 1000000.0 + 0.5) / 1000000.0 AS has_missing_key
FROM events GROUP BY 1
"""


def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster quality audit (operators/dedup.cluster_cohesion):
    per connected component, exact pairwise shingle-Jaccard min/mean —
    catches LSH transitive over-merging (a chain-welded cluster shows a
    near-zero min_jaccard) on the clusters survivor selection acts on."""
    from gordo_spark.operators.dedup import (
        cluster_cohesion,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs_with_dups(spark, sf_dir)
    sigs = minhash_signatures(docs, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return cluster_cohesion(docs, connected_components(pairs))


def _o_cluster_cohesion() -> str:
    return f"""
WITH comp AS ({O_DEDUP_COMPONENTS}),
docs AS ({_O_DOCS_DUPS}),
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
prs AS (
  SELECT a.component, a.id AS ia, b.id AS ib
  FROM comp a JOIN comp b ON a.component = b.component AND a.id < b.id
),
jac AS (
  SELECT component,
         len(list_intersect(ta.toks, tb.toks))
           / CAST(len(ta.toks) + len(tb.toks)
                  - len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) AS j
  FROM prs JOIN tt ta ON prs.ia = ta.doc_id JOIN tt tb ON prs.ib = tb.doc_id
),
sizes AS (SELECT component, count(*) AS n_members FROM comp GROUP BY 1)
SELECT component, n_members, count(*) AS n_pairs,
       floor((min(j)) * 1000000.0 + 0.5) / 1000000.0 AS min_jaccard, floor((avg(j)) * 1000000.0 + 0.5) / 1000000.0 AS avg_jaccard
FROM jac JOIN sizes USING (component)
GROUP BY component, n_members
"""


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking (operators/similarity.mmr_rerank) of the
    exact-cosine top-20 for query vector 0 (lambda=0.7, k=10) — the
    retrieve-then-diversify pass of a RAG stack; greedy argmax over the
    bounded candidate set, numpy on a bounded collect. FULLY
    oracle-checked despite being greedy-sequential: the DuckDB oracle
    carries the picked set through a recursive CTE (one argmax per
    step via a derived-table QUALIFY — the alias must NOT collide with
    a rec column name or the window orders by the carried NULL)."""
    from gordo_spark.operators.similarity import cosine_topk, mmr_rerank

    embs = read_table(spark, sf_dir, "embeddings")
    cands = (
        cosine_topk(embs, embs.filter(F.col("vec_id") == 0), k=20)
        .select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("cosine_sim").alias("relevance"),
        )
        .join(embs.select("vec_id", "embedding"), "vec_id")
    )
    return mmr_rerank(cands, k=10, lam=0.7)



O_MMR_RERANK = """
WITH RECURSIVE q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
         list_dot_product(q.qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))) AS sim
  FROM embeddings e, q WHERE e.vec_id <> 0
),
cands AS (
  SELECT vec_id AS id, floor((sim) * 1000000.0 + 0.5) / 1000000.0 AS rel, v
  FROM scored ORDER BY sim DESC, vec_id LIMIT 20
),
sims AS (
  SELECT a.id AS a, b.id AS b,
         floor((list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v)))) * 1000000.0 + 0.5) / 1000000.0 AS s
  FROM cands a JOIN cands b ON a.id <> b.id
),
rec AS (
  SELECT 0 AS step, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS rel, CAST(NULL AS DOUBLE) AS obj,
         CAST([] AS BIGINT[]) AS picked
  UNION ALL
  SELECT t.step2, t.id2, t.rel2, t.obj2, t.picked2 FROM (
    SELECT r.step + 1 AS step2, c.id AS id2, c.rel AS rel2,
           floor((0.7 * c.rel - 0.3 * coalesce(
             (SELECT max(s.s) FROM sims s
              WHERE s.a = c.id AND list_contains(r.picked, s.b)), 0.0)) * 1000000.0 + 0.5) / 1000000.0
             AS obj2,
           list_append(r.picked, c.id) AS picked2
    FROM rec r JOIN cands c ON NOT list_contains(r.picked, c.id)
    WHERE r.step < 10
  ) t
  QUALIFY row_number() OVER (ORDER BY t.obj2 DESC, t.id2) = 1
)
SELECT id AS vec_id, CAST(step AS INTEGER) AS mmr_rank, rel AS relevance,
       obj AS objective
FROM rec WHERE step >= 1 ORDER BY mmr_rank
"""


def q_simhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SimHash hamming join (operators/dedup.simhash_hamming_join,
    32-bit fingerprints, hamming <= 3) over the dup corpus — pigeonhole
    banding bounds candidates, bit_count(xor) verifies exactly.
    Completes the guaranteed-recall join family (Jaccard / containment
    / hamming). Banding runs the Manku C(6,3) multi-block scheme: the
    round-11 SCALE_BENCH experiment measured ~4x fewer candidate pairs
    than the contiguous max_hamming+1 bands at IDENTICAL output
    (guaranteed recall either way — ``blocks`` is purely a
    candidate-volume knob, and this contract shares its oracle with
    ``simhash_join_blocks`` which pins the contiguous-vs-multi-block
    equivalence)."""
    from gordo_spark.operators.dedup import simhash_hamming_join

    return simhash_hamming_join(
        _docs_with_dups(spark, sf_dir), max_hamming=3, bits=32, blocks=6
    )


def _o_simhash_join() -> str:
    body = _simhash_sql(32).strip()
    # the helper reads FROM documents; point it at the dup-corpus CTE
    body = body.replace("FROM documents", "FROM docs")
    return f"""
WITH docs AS ({_O_DOCS_DUPS}),
fp AS ({body})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_dice_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Dice-coefficient join (operators/dedup.dice_threshold_join,
    t=0.9) over the dup corpus: PPJoin candidates at the equivalent
    Jaccard threshold (minus an ulp of slack), Dice verified directly
    from exact integer sizes."""
    from gordo_spark.operators.dedup import dice_threshold_join

    return dice_threshold_join(_docs_with_dups(spark, sf_dir), threshold=0.9)


def _o_dice_join() -> str:
    return f"""
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
         len(a.toks) + len(b.toks) AS size_sum
  FROM tt a JOIN tt b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(inter AS INT) AS inter,
       CAST(size_sum AS INT) AS size_sum,
       floor((2.0 * inter / size_sum) * 1000000.0 + 0.5) / 1000000.0 AS dice
FROM pairs WHERE 2.0 * inter / size_sum >= 0.9
"""


def q_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed skip-gram co-occurrence counts (operators/text.
    skipgram_pairs, window=3, min_count=5): the word2vec training-pair
    extraction; shifted-copy equi-join keeps volume at window x tokens,
    never L^2 per document."""
    from gordo_spark.operators.text import skipgram_pairs

    docs = read_table(spark, sf_dir, "documents")
    return skipgram_pairs(docs, window=3, min_count=5)


O_SKIPGRAMS = """
WITH toks AS (
  SELECT doc_id, p - 1 AS p, tok
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS p
    FROM documents
  ) WHERE tok <> ''
),
d AS (SELECT unnest(generate_series(1, 3)) AS d),
pairs AS (
  SELECT c.tok AS center, x.tok AS context
  FROM toks c CROSS JOIN d
  JOIN toks x ON x.doc_id = c.doc_id AND x.p = c.p + d.d
)
SELECT center, context, count(*) AS n
FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5
"""



def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the exact-cosine retriever (operators/experiments.
    ndcg_at_k): queries = vectors 0..4, ranked = cosine_topk(k=10),
    graded relevance = label match between query and neighbor (the
    embeddings table's label column) — the ranking-quality eval closing
    the retrieval family's loop."""
    from gordo_spark.operators.experiments import ndcg_at_k
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
    return ndcg_at_k(ranked, rel, k=10)


O_NDCG = """
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
terms AS (
  SELECT query_id,
         (pow(2.0, CASE WHEN ql = dl THEN 1 ELSE 0 END) - 1.0)
           / (ln(rank + 1.0) / ln(2.0)) AS d,
         (pow(2.0, CASE WHEN ql = dl THEN 1 ELSE 0 END) - 1.0)
           / (ln(row_number() OVER (
                PARTITION BY query_id
                ORDER BY CASE WHEN ql = dl THEN 1 ELSE 0 END DESC, rank
              ) + 1.0) / ln(2.0)) AS i
  FROM ranked
),
per AS (
  SELECT query_id, floor((sum(d)) * 1000000.0 + 0.5) / 1000000.0 AS dcg, floor((sum(i)) * 1000000.0 + 0.5) / 1000000.0 AS idcg
  FROM terms GROUP BY 1
)
SELECT query_id, dcg, idcg,
       floor((CASE WHEN idcg > 0 THEN dcg / idcg END) * 1000000.0 + 0.5) / 1000000.0 AS ndcg
FROM per
"""


def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift deciles (operators/experiments.
    lift_curve): md5-derived pseudo-score against the high-value-order
    label — the targeting readout that says WHERE to cut, beside
    auc_exact's single number. Deterministic ntile split (score desc,
    orderkey tiebreak)."""
    from gordo_spark.operators.experiments import lift_curve

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.pmod(F.col("o_orderkey") * 37, F.lit(1000)) / 1000.0).alias("p"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("y"),
    )
    return lift_curve(orders, "p", "y", n_buckets=10, id_col="o_orderkey")


O_LIFT_CURVE = """
WITH r AS (
  SELECT o_orderkey,
         floor((((o_orderkey * 37) % 1000) / 1000.0) * 1000.0 + 0.5) / 1000.0 AS p,
         CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS y
  FROM orders
),
binned AS (
  SELECT ntile(10) OVER (ORDER BY p DESC, o_orderkey) AS bucket, y FROM r
),
agg AS (
  SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
  FROM binned GROUP BY 1
),
tot AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM agg)
SELECT bucket, n, n_pos,
       floor((n_pos / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS response_rate,
       CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
       floor(((sum(n_pos) OVER w / CAST(tp AS DOUBLE))
             / (sum(n) OVER w / CAST(tn AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS cum_lift
FROM agg, tot
WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY bucket
"""



def q_funnel_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (operators/ranges.funnel_steps with
    max_gap_seconds): signup -> click -> purchase where each step lands
    within 48h of the previous step's FIRST match (first-touch
    semantics, stated — greedy is not reachability-optimal under a gap
    constraint). The 'did they convert PROMPTLY' readout the
    unconstrained funnel hides."""
    from gordo_spark.operators.ranges import funnel_steps

    ev = read_table(spark, sf_dir, "events")
    return funnel_steps(
        ev, ["signup", "click", "purchase"], max_gap_seconds=172_800
    )


O_FUNNEL_WITHIN = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
   AND epoch(e.ts) <= epoch(s1.t) + 172800.0
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t
   AND epoch(e.ts) <= epoch(s2.t) + 172800.0
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
c AS (
  SELECT 1 AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'click', count(*) FROM s2
  UNION ALL SELECT 3, 'purchase', count(*) FROM s3
),
b AS (SELECT n_users AS base FROM c WHERE step = 1)
SELECT step, event_type, n_users,
       floor((n_users * 1.0 / base) * 1000000.0 + 0.5) / 1000000.0 AS conversion
FROM c, b
"""



def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing / gaps-and-islands (operators/ranges.
    merge_intervals): per event type, 2h alert windows around error-ish
    events merged into incident islands — a sustained incident pages
    once, not per bucket. Two windows on one key shuffle."""
    from gordo_spark.operators.ranges import merge_intervals

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value") > 300.0
    )
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 7200 SECOND")).alias("end"),
    )
    return merge_intervals(iv, ["event_type"])


O_MERGE_INTERVALS = """
WITH iv AS (
  SELECT event_type, ts AS start, ts + INTERVAL 7200 SECOND AS "end"
  FROM events WHERE value > 300.0
),
flagged AS (
  SELECT event_type, start, "end",
         CASE WHEN max("end") OVER (
                PARTITION BY event_type ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start > max("end") OVER (
                PARTITION BY event_type ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS is_new
  FROM iv
),
islands AS (
  SELECT event_type, start, "end",
         sum(is_new) OVER (
           PARTITION BY event_type ORDER BY start, "end"
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM flagged
)
SELECT event_type, CAST(island AS BIGINT) AS island,
       min(start) AS start, max("end") AS "end",
       count(*) AS n_merged
FROM islands GROUP BY 1, 2
"""


def q_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language CHAR-WEIGHTED length quantiles (operators/ranking.
    weighted_quantile): "the median document BY VOLUME is how long?" —
    the training-cost view unweighted quantiles understate under length
    skew. Lower weighted-quantile convention on the collapsed value
    grid; integer weights keep the cumulative sums exact in f64."""
    from gordo_spark.operators.ranking import weighted_quantile

    docs = read_table(spark, sf_dir, "documents")
    return weighted_quantile(
        docs, "lang", "n_chars", "n_chars", qs=(0.5, 0.9)
    )


O_WEIGHTED_QUANTILE = """
WITH rows_ AS (
  SELECT lang AS g, floor((CAST(n_chars AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS v,
         CAST(n_chars AS DOUBLE) AS w
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
hist AS (SELECT g, v, sum(w) AS hw FROM rows_ GROUP BY 1, 2),
cum AS (
  SELECT g, v,
         sum(hw) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(hw) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - hw AS cw_prev,
         sum(hw) OVER (PARTITION BY g) AS W
  FROM hist
),
fanned AS (
  SELECT g, v, cw, cw_prev, W, q.q
  FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS q) q
)
SELECT g AS lang, q, floor((W) * 1000000.0 + 0.5) / 1000000.0 AS total_weight, v AS estimate
FROM fanned
WHERE cw >= q * W AND cw_prev < q * W
"""


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for the mean event value
    (operators/experiments.bootstrap_ci_mean, B=100): per-replicate
    Poisson(1) weights from md5(salt||b||id) — the at-scale bootstrap
    (Chamandy 2012) with NO RNG, reproducible bit-for-bit on any
    engine; one pass, 2B map-side sums, no data replication."""
    from gordo_spark.operators.experiments import bootstrap_ci_mean

    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    return bootstrap_ci_mean(ev, "value", n_boot=100, id_col="event_id")


def _o_bootstrap_ci(n_boot: int = 100) -> str:
    from gordo_spark.operators.experiments import _POISSON1_CDF

    def w_sql(b):
        g, lane = divmod(b, 8)
        u = (
            f"((('0x' || substr(md5('bootg{g}:' || CAST(event_id AS VARCHAR)), {lane * 4 + 1}, 4))"
            f"::BIGINT + 0.5) / 65536.0)"
        )
        chain = f"{len(_POISSON1_CDF)}"
        for k in range(len(_POISSON1_CDF) - 1, -1, -1):
            chain = f"CASE WHEN {u} < {_POISSON1_CDF[k]!r} THEN {k} ELSE {chain} END"
        return f"CAST({chain} AS DOUBLE)"

    sums = ",\n       ".join(
        f"sum({w_sql(b)} * value) AS s{b}, sum({w_sql(b)}) AS w{b}"
        for b in range(n_boot)
    )
    means = ", ".join(
        f"CASE WHEN w{b} > 0 THEN s{b} / w{b} END" for b in range(n_boot)
    )
    return f"""
WITH agg AS (
  SELECT count(*) AS n, avg(value) AS m,
       {sums}
  FROM events WHERE value IS NOT NULL
),
srt AS (
  SELECT n, m,
         list_sort(list_filter([{means}], x -> x IS NOT NULL)) AS ms
  FROM agg
)
SELECT n, floor((m) * 1000000.0 + 0.5) / 1000000.0 AS mean,
       floor((ms[greatest(least(CAST(ceil(0.025 * len(ms)) AS BIGINT), len(ms)), 1)]) * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
       floor((ms[greatest(least(CAST(ceil(0.975 * len(ms)) AS BIGINT), len(ms)), 1)]) * 1000000.0 + 0.5) / 1000000.0 AS ci_hi,
       100 AS n_boot
FROM srt
"""
