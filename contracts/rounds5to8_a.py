"""Rounds 5-7 additions (first half): apply-halves of iterative fits, sketches, experiments, graph/session analytics."""

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
from contracts.training_data import (
    O_TERM_STATS,
    _O_DOCS_DUPS,
    _docs_with_dups,
    _oracle_embeddings,
    _oracle_sf_dir,
    _sql_vec,
)



# ------------------------------------------------- round-5 additions:
# deterministic APPLY halves of iterative fits (logreg scoring, PCA
# projection — trained on the bounded deterministic sample, PQ-style,
# so the oracle embeds bit-identical weights), scalar quantization,
# corpus collocations, exact-substring dup spans, event transitions,
# and Holt trend smoothing.
def q_w11_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 — Holt double-exponential (level+trend) smoothing per tag
    (operators/smoothing.holt): the trend-aware upgrade of the
    reference's ewm smoothing (diff.py:302-308). Recursive, so it runs
    the sanctioned applyInPandas-per-series path like w3_ewma; the
    oracle states the same recursion as a per-tag recursive CTE. The
    resampled input is rounded to 6dp on BOTH engines before the
    recursion so summation-order ulps in avg() cannot compound through
    the feedback loop."""
    from gordo_spark.operators.smoothing import holt

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    out = holt(res, "value", alpha=0.2, beta=0.1, machine_col="tag")
    return _r6(
        out.select("tag", "ts", "value", "level", "trend", "forecast"),
        "level",
        "trend",
        "forecast",
    )


O_W11_HOLT = """
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
  SELECT tag, ts, rn, value, value AS l, CAST(0 AS DOUBLE) AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.tag, s.ts, s.rn, s.value,
         0.2 * s.value + (1 - 0.2) * (r.l + r.b),
         0.1 * ((0.2 * s.value + (1 - 0.2) * (r.l + r.b)) - r.l) + (1 - 0.1) * r.b
  FROM rec r JOIN seq s ON s.tag = r.tag AND s.rn = r.rn + 1
)
SELECT tag, ts, value, floor((l) * 1000000.0 + 0.5) / 1000000.0 AS level, floor((b) * 1000000.0 + 0.5) / 1000000.0 AS trend,
       floor((l + b) * 1000000.0 + 0.5) / 1000000.0 AS forecast
FROM rec
"""


def q_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11b — one-step-ahead Holt backtest per tag
    (operators/smoothing.holt_backtest): yesterday's forecast scored
    against today's actual — n/bias/MAE/RMSE/MAPE per series, the
    evidence behind an (alpha, beta) choice. One lag window over the
    Holt output + one hash agg; the oracle extends the w11 recursive
    CTE with the same lag."""
    from gordo_spark.operators.smoothing import holt_backtest

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    res = res.withColumn("value", qround("value", 6))
    return holt_backtest(res, "value", alpha=0.2, beta=0.1, machine_col="tag")


O_HOLT_BACKTEST = """
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
  SELECT tag, ts, rn, value, value AS l, CAST(0 AS DOUBLE) AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.tag, s.ts, s.rn, s.value,
         0.2 * s.value + (1 - 0.2) * (r.l + r.b),
         0.1 * ((0.2 * s.value + (1 - 0.2) * (r.l + r.b)) - r.l) + (1 - 0.1) * r.b
  FROM rec r JOIN seq s ON s.tag = r.tag AND s.rn = r.rn + 1
),
f AS (
  SELECT tag, ts, value,
         lag(floor((l + b) * 1000000.0 + 0.5) / 1000000.0) OVER (PARTITION BY tag ORDER BY ts) AS fp
  FROM rec
),
e AS (SELECT tag, value, value - fp AS err FROM f WHERE fp IS NOT NULL)
SELECT tag, CAST(count(*) AS BIGINT) AS n,
       floor((avg(err)) * 1000000.0 + 0.5) / 1000000.0 AS bias,
       floor((avg(abs(err))) * 1000000.0 + 0.5) / 1000000.0 AS mae,
       floor((sqrt(avg(err * err))) * 1000000.0 + 0.5) / 1000000.0 AS rmse,
       floor((avg(CASE WHEN value != 0 THEN abs(err / value) END)) * 1000000.0 + 0.5) / 1000000.0 AS mape
FROM e GROUP BY tag
"""


def q_user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type Markov transition matrix (operators/ranges.
    event_transitions): one user-keyed lag window + one aggregation on
    the (prev, next) pair whose cardinality is #event-types squared —
    model-sized output regardless of corpus size."""
    from gordo_spark.operators.ranges import event_transitions

    return event_transitions(read_table(spark, sf_dir, "events"))


O_USER_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
c AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       floor((n * 1.0 / sum(n) OVER (PARTITION BY prev_type)) * 1000000.0 + 0.5) / 1000000.0 AS prob
FROM c
"""


def q_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI (operators/text.pmi_bigrams, Church &
    Hanks 1990): one bigram explode + count is the only corpus-sized
    work; marginals are aggregates OF the count table."""
    from gordo_spark.operators.text import pmi_bigrams

    return pmi_bigrams(read_table(spark, sf_dir, "documents"), min_count=5, topk=20)


O_PMI_COOCCUR = """
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
scored AS (
  SELECT c.w1, c.w2, c.n,
         floor((ln((c.n * 1.0 * tot.nn) / (l.c1 * 1.0 * r.c2))) * 1000000.0 + 0.5) / 1000000.0 AS pmi
  FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
  WHERE c.n >= 5
)
SELECT w1, w2, n, pmi
FROM scored
ORDER BY pmi DESC, w1, w2
LIMIT 20
"""


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring spans (operators/dedup.duplicate_spans
    — Lee et al. 2021 exact-substring dedup, re-expressed as the
    shuffle-native positional-fingerprint join + gaps-and-islands merge
    since suffix arrays don't distribute)."""
    from gordo_spark.operators.dedup import duplicate_spans

    return duplicate_spans(
        read_table(spark, sf_dir, "documents"), k=8, min_len=12, max_df=16
    )


_DUP_SPANS_CTES = """t AS (
  SELECT doc_id AS doc, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 8
),
pos AS (SELECT doc, w, unnest(range(1, len(w) - 8 + 2)) AS i FROM t),
g AS (
  SELECT doc, i - 1 AS pos,
         md5(array_to_string(w[i:i + 7], ' ')) AS gh
  FROM pos
),
st AS (SELECT gh FROM g GROUP BY gh HAVING count(*) BETWEEN 2 AND 16),
m AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos - b.pos AS diff,
         a.pos AS pa, b.pos AS pb
  FROM g a JOIN st USING (gh) JOIN g b USING (gh)
  WHERE a.doc < b.doc
),
runs AS (
  SELECT doc_a, doc_b, diff, pa, pb,
         pa - row_number() OVER (
           PARTITION BY doc_a, doc_b, diff ORDER BY pa
         ) AS island
  FROM m
),
spans AS (
  SELECT doc_a, doc_b, min(pa) AS start_a, min(pb) AS start_b,
         count(*) + 7 AS span_tokens
  FROM runs GROUP BY doc_a, doc_b, diff, island
  HAVING count(*) + 7 >= 12
)"""

O_DUP_SPANS = (
    "WITH "
    + _DUP_SPANS_CTES
    + "\nSELECT doc_a, doc_b, start_a, start_b, span_tokens FROM spans"
)

O_DUP_STRIP = (
    "WITH "
    + _DUP_SPANS_CTES
    + """,
cutpos AS (
  SELECT doc_b AS doc_id, unnest(range(start_b, start_b + span_tokens)) AS p
  FROM spans
),
cut AS (SELECT doc_id, list(DISTINCT p) AS cut FROM cutpos GROUP BY doc_id),
src AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
SELECT src.doc_id,
       CASE WHEN cut.cut IS NULL THEN src.text
            ELSE coalesce(array_to_string(
              list_transform(
                list_filter(range(0, len(ws)), i -> NOT list_contains(cut.cut, i)),
                i -> ws[i + 1]
              ), ' '), '')
       END AS text_clean,
       coalesce(len(cut.cut), 0)::INT AS n_removed
FROM src LEFT JOIN cut USING (doc_id)"""
)


def q_dup_spans_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT step of exact-substring dedup (operators/dedup.
    strip_duplicate_spans — Lee et al. 2021: remove one copy of every
    duplicated span, from the younger document): span rows explode to
    bounded cut-marks, ONE position-set per affected doc, and the text
    rebuild is row-local — document text never shuffles."""
    from gordo_spark.operators.dedup import duplicate_spans, strip_duplicate_spans

    docs = read_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, k=8, min_len=12, max_df=16)
    return strip_duplicate_spans(docs, spans)


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column (operators/
    similarity.quantize_embeddings): one min/max aggregation (2d-double
    fit boundary) + one row-local codegen encode — first 4 codes and
    the reconstruction MSE per vector."""
    from gordo_spark.operators.similarity import quantize_embeddings

    out = quantize_embeddings(read_table(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        *[F.element_at("codes", j + 1).alias(f"c{j + 1}") for j in range(4)],
        qround("mse", 6).alias("mse"),
    )


def _o_embedding_quantize(levels: int = 255) -> str:
    import pyarrow.parquet as papq

    d = len(
        papq.read_table(
            os.path.join(_oracle_sf_dir(), "embeddings.parquet"),
            columns=["embedding"],
        ).column("embedding")[0]
    )
    L = f"{float(levels)!r}"
    code = f"floor((ex.x - st.mn) * {L} / st.sp + 0.5)"
    cols = ",\n       ".join(
        f"max(CASE WHEN j = {j + 1} THEN code END)::BIGINT AS c{j + 1}"
        for j in range(4)
    )
    return f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
pos AS (SELECT vec_id, e, unnest(range(1, {d + 1})) AS j FROM v),
ex AS (SELECT vec_id, j, e[j] AS x FROM pos),
st AS (SELECT j, min(x) AS mn, max(x) - min(x) AS sp FROM ex GROUP BY j),
enc AS (
  SELECT ex.vec_id, ex.j,
         CASE WHEN st.sp > 0 THEN {code} ELSE 0 END AS code,
         CASE WHEN st.sp > 0
              THEN ({code} * st.sp / {L}) - (ex.x - st.mn)
              ELSE -(ex.x - st.mn) END AS err
  FROM ex JOIN st USING (j)
)
SELECT vec_id,
       {cols},
       floor((sum(err * err) / {float(d)!r}) * 1000000.0 + 0.5) / 1000000.0 AS mse
FROM enc GROUP BY vec_id"""


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection with components trained on the bounded
    deterministic sample (operators/similarity.pca_sample_fit — the
    pq_train posture): the oracle generator calls the SAME pca_np on
    the SAME sample, so the embedded components are bit-identical and
    the corpus-wide projection is plain dot-product arithmetic on both
    engines. The full-corpus sufficient-stats fit stays the rows-only
    embedding_pca contract."""
    from gordo_spark.operators.similarity import pca_sample_fit, pca_transform

    embs = read_table(spark, sf_dir, "embeddings")
    mean, comps, _ = pca_sample_fit(embs, k=4, sample_n=256)
    out = pca_transform(embs, mean, comps)
    return out.select(
        "vec_id",
        *[
            qround(F.element_at("pca", j + 1), 6).alias(f"pc{j + 1}")
            for j in range(4)
        ],
    )


def _o_pca_project(k: int = 4, sample_n: int = 256) -> str:
    from gordo_spark.operators.similarity import pca_np

    X = _oracle_embeddings(sample_n)
    mean, comps, _ = pca_np(X, k)
    cols = ",\n       ".join(
        f"floor((list_dot_product(e, {_sql_vec(comps[j])}) - "
        f"{float(np.dot(mean, comps[j]))!r}) * 1000000.0 + 0.5) / 1000000.0 AS pc{j + 1}"
        for j in range(k)
    )
    return (
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)\n"
        f"SELECT vec_id,\n       {cols}\nFROM v"
    )


def q_logreg_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier APPLY with weights trained on the bounded
    deterministic sample (first 256 doc_ids, driver-side numpy_irls —
    the labeled-sample-train / corpus-apply pattern of production
    quality filters): scoring is one row-local sigmoid over the whole
    corpus. The oracle generator computes the SAME features in pure
    Python on the SAME sample and runs the SAME numpy_irls, so the
    embedded weights are bit-identical; the distributed-IRLS fit stays
    the rows-only quality_logreg contract."""
    from gordo_spark.ml.logreg import LogisticModel

    feats = _logreg_features(read_table(spark, sf_dir, "documents"))
    sample = (
        feats.orderBy("doc_id")
        .limit(256)
        .select("f_chars", "f_words", "f_uniq", "label")
        .collect()
    )
    from gordo_spark.ml.logreg import numpy_irls

    X = np.array([[r["f_chars"], r["f_words"], r["f_uniq"]] for r in sample])
    y = np.array([float(r["label"]) for r in sample])
    model = LogisticModel(["f_chars", "f_words", "f_uniq"], "label")
    model.coef_ = numpy_irls(X, y)
    return model.score(feats).select(
        "doc_id",
        qround("score", 6).alias("score"),
        (F.col("score") >= 0.5).alias("pred"),
    )


def _logreg_features(docs: DataFrame) -> DataFrame:
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        (F.col("n_chars") / 100.0).alias("f_chars"),
        (F.size(words) / 100.0).alias("f_words"),
        (F.size(F.array_distinct(words)) / F.size(words)).alias("f_uniq"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )


def _o_logreg_apply(sample_n: int = 256) -> str:
    import pyarrow.parquet as papq

    from gordo_spark.ml.logreg import numpy_irls

    t = papq.read_table(
        os.path.join(_oracle_sf_dir(), "documents.parquet"),
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    rows = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )[: int(sample_n)]
    X, y = [], []
    for _id, text, lang, n_chars in rows:
        wds = text.split(" ")
        X.append([n_chars / 100.0, len(wds) / 100.0, len(set(wds)) / len(wds)])
        y.append(1.0 if lang == "en" else 0.0)
    w = numpy_irls(np.array(X), np.array(y))
    z = (
        f"{float(w[0])!r} + {float(w[1])!r} * (n_chars / 100.0)"
        f" + {float(w[2])!r} * (len(string_split(text, ' ')) / 100.0)"
        f" + {float(w[3])!r} * (len(list_distinct(string_split(text, ' ')))"
        f" / len(string_split(text, ' ')))"
    )
    return f"""SELECT doc_id,
       floor((1 / (1 + exp(-({z})))) * 1000000.0 + 0.5) / 1000000.0 AS score,
       (1 / (1 + exp(-({z})))) >= 0.5 AS pred
FROM documents"""


def _o_score_calibration(sample_n: int = 256, bins: int = 10) -> str:
    """Same embedded-IRLS-weights trick as _o_logreg_apply, one level
    up: bucket the sigmoid scores and compare predicted vs observed."""
    apply_sql = _o_logreg_apply(sample_n)
    return f"""
WITH scored AS (
  SELECT s.doc_id, s.score,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS label
  FROM ({apply_sql}) s JOIN documents d USING (doc_id)
),
b AS (
  SELECT least({bins - 1}, CAST(floor(score * {bins}) AS BIGINT)) AS bin,
         score, label
  FROM scored
),
g AS (
  SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
         floor((avg(score)) * 1000000.0 + 0.5) / 1000000.0 AS mean_score,
         floor((avg(label)) * 1000000.0 + 0.5) / 1000000.0 AS frac_positive
  FROM b GROUP BY bin
)
SELECT bin, n, mean_score, frac_positive,
       floor((mean_score - frac_positive) * 1000000.0 + 0.5) / 1000000.0 AS gap
FROM g
"""


def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration curve (ml/logreg.calibration_bins) over
    the logreg_apply quality scores: 10 fixed-width probability bins,
    per-bin predicted-vs-observed rate and gap — the readout that
    decides whether score >= 0.9 can be TRUSTED as a 90% sampling
    probability downstream. One row-local sigmoid scan + one hash agg
    on <= 10 keys. Oracle embeds the identical IRLS weights
    (_o_logreg_apply's generator, one level up)."""
    from gordo_spark.ml.logreg import LogisticModel, calibration_bins, numpy_irls

    feats = _logreg_features(read_table(spark, sf_dir, "documents"))
    sample = (
        feats.orderBy("doc_id")
        .limit(256)
        .select("f_chars", "f_words", "f_uniq", "label")
        .collect()
    )
    X = np.array([[r["f_chars"], r["f_words"], r["f_uniq"]] for r in sample])
    y = np.array([float(r["label"]) for r in sample])
    model = LogisticModel(["f_chars", "f_words", "f_uniq"], "label")
    model.coef_ = numpy_irls(X, y)
    scored = model.score(feats).select(
        qround("score", 6).alias("score"), F.col("label")
    )
    return calibration_bins(scored, "score", "label", bins=10)


def q_vocab_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vocabulary maintenance (operators/text.
    merge_term_stats): the landed corpus's full term-stats table
    absorbs a doc-disjoint delta batch via one delta-sized aggregation
    + one vocab-keyed full-outer join — and the result must equal a
    FULL RECOMPUTE over the union, which is exactly what the oracle
    does (the incremental==full law, the rollup_sensor_lake pattern
    applied to vocab tables). Top-50 cut for the contract surface."""
    from gordo_spark.operators.text import merge_term_stats, term_stats

    docs = read_table(spark, sf_dir, "documents")
    landed = term_stats(docs.filter(F.col("doc_id") < 400), top_k=None)
    delta = term_stats(docs.filter(F.col("doc_id") >= 400), top_k=None)
    merged = merge_term_stats(landed, delta)
    return merged.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(50)


# the oracle IS the full recompute — identical to O_TERM_STATS
O_VOCAB_INCREMENTAL = O_TERM_STATS


def q_w12_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 — modified z-score outliers (operators/smoothing.mad_zscore,
    Iglewicz & Hoaglin 1993): median/MAD have a 50% breakdown point, so
    the flag holds where spike-inflated mean/std under-flag; two exact
    median aggregations per tag, joined back on the bounded series
    key."""
    from gordo_spark.operators.smoothing import mad_zscore

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return _r6(mad_zscore(res, threshold=3.5), "value")


O_W12_MAD = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
med AS (SELECT tag, floor((median(value)) * 1000000.0 + 0.5) / 1000000.0 AS med FROM res GROUP BY tag),
mad AS (
  SELECT res.tag, floor((median(abs(res.value - med.med))) * 1000000.0 + 0.5) / 1000000.0 AS mad
  FROM res JOIN med USING (tag) GROUP BY res.tag
)
SELECT r.tag, r.ts, floor((r.value) * 1000000.0 + 0.5) / 1000000.0 AS value,
       CASE WHEN mad.mad > 0
            THEN floor((0.6745 * (r.value - med.med) / mad.mad) * 1000000.0 + 0.5) / 1000000.0 END AS mad_z,
       CASE WHEN mad.mad > 0
             AND abs(floor((0.6745 * (r.value - med.med) / mad.mad) * 1000000.0 + 0.5) / 1000000.0) > 3.5
            THEN 1 ELSE 0 END AS is_outlier
FROM res r JOIN med USING (tag) JOIN mad USING (tag)
"""


def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-load concurrency curve (operators/ranges.concurrency_curve):
    active sessions per hour bucket via the bin-explode shape — the
    sweep-line running sum would need a GLOBAL time-ordered window
    (single partition at any scale), so the curve is a bucket-keyed
    count instead; fan-out bounded by session duration / bucket."""
    from gordo_spark.operators.ranges import concurrency_curve

    ev = read_table(spark, sf_dir, "events")
    return concurrency_curve(ev, ["user_id"], gap_seconds=3600)


O_CONCURRENCY = """
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
lagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN epoch(ts) - epoch(lag(ts) OVER w) > 3600 THEN 1
              ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged
),
spans AS (
  SELECT user_id, session_id,
         floor(epoch(min(ts)) / 3600) AS b0,
         floor(epoch(max(ts)) / 3600) AS b1
  FROM sess GROUP BY 1, 2
),
buckets AS (
  SELECT unnest(range(CAST(b0 AS BIGINT), CAST(b1 AS BIGINT) + 1)) AS b
  FROM spans
)
SELECT CAST(to_timestamp(b * 3600) AS TIMESTAMP) AS bucket_ts,
       count(*) AS n_active
FROM buckets GROUP BY 1
"""


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick doc embeddings (operators/text.feature_hash_embed,
    Weinberger 2009): training-free featurizer — md5 slot/sign signed
    counts, L2-normalized, one row-local codegen pass, no fit, no
    vocab, no shuffle. First 4 of 8 dims shown (the norm uses all 8)."""
    from gordo_spark.operators.text import feature_hash_embed

    out = feature_hash_embed(read_table(spark, sf_dir, "documents"), dim=8)
    return _r6(
        out.select("doc_id", "h0", "h1", "h2", "h3"), "h0", "h1", "h2", "h3"
    )


def _o_feature_hash(dim: int = 8) -> str:
    case = lambda j: (  # noqa: E731 - local SQL fragment builder
        f"sum(CASE WHEN slot = {j} AND pos THEN 1"
        f" WHEN slot = {j} THEN -1 ELSE 0 END)::DOUBLE"
    )
    norm = " + ".join(f"h{j} * h{j}" for j in range(dim))
    cols = ",\n       ".join(
        f"floor((CASE WHEN sqrt({norm}) > 0 THEN h{j} / sqrt({norm})"
        f" ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS h{j}"
        for j in range(4)
    )
    slots = ",\n    ".join(f"{case(j)} AS h{j}" for j in range(dim))
    return f"""WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 8))::BIGINT % {dim} AS slot,
         ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0 AS pos
  FROM tk
),
v AS (
  SELECT doc_id,
    {slots}
  FROM h GROUP BY doc_id
)
SELECT doc_id,
       {cols}
FROM v"""


def q_w13_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 — per-tag sample autocorrelation at lags 1/2/3/24 over the
    hourly grid (operators/tsa.acf): TIME-keyed lags (a RANGE frame
    pinned at exactly k hours back, so grid gaps yield null partners
    instead of mispaired rows); one ordered window pass builds all lag
    columns, ONE aggregation computes all four correlations, stack()
    unpivots — per-tag cost is a single sort regardless of lag count."""
    from gordo_spark.operators.tsa import acf

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return acf(res, [1, 2, 3, 24], 3600)


O_W13_ACF = """
WITH res AS (
  SELECT event_type AS tag,
         floor(epoch(ts)/3600)*3600 AS t,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT tag, value,
         last_value(value) OVER (PARTITION BY tag ORDER BY t
           RANGE BETWEEN 3600 PRECEDING AND 3600 PRECEDING) AS l1,
         last_value(value) OVER (PARTITION BY tag ORDER BY t
           RANGE BETWEEN 7200 PRECEDING AND 7200 PRECEDING) AS l2,
         last_value(value) OVER (PARTITION BY tag ORDER BY t
           RANGE BETWEEN 10800 PRECEDING AND 10800 PRECEDING) AS l3,
         last_value(value) OVER (PARTITION BY tag ORDER BY t
           RANGE BETWEEN 86400 PRECEDING AND 86400 PRECEDING) AS l24
  FROM res
),
wide AS (
  SELECT tag,
         floor((corr(value, l1)) * 1000000.0 + 0.5) / 1000000.0 AS a1,
         floor((corr(value, l2)) * 1000000.0 + 0.5) / 1000000.0 AS a2,
         floor((corr(value, l3)) * 1000000.0 + 0.5) / 1000000.0 AS a3,
         floor((corr(value, l24)) * 1000000.0 + 0.5) / 1000000.0 AS a24
  FROM lagged GROUP BY tag
)
SELECT tag, 1 AS lag, a1 AS acf FROM wide
UNION ALL SELECT tag, 2 AS lag, a2 AS acf FROM wide
UNION ALL SELECT tag, 3 AS lag, a3 AS acf FROM wide
UNION ALL SELECT tag, 24 AS lag, a24 AS acf FROM wide
"""


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best mean-shift split per tag (operators/tsa.
    mean_shift_changepoint — binary-segmentation step 1): prefix sums
    give every candidate split's two means in O(n) per tag; argmax is
    one max(struct) aggregation, earliest-ts tie-break."""
    from gordo_spark.operators.tsa import mean_shift_changepoint

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return mean_shift_changepoint(res)


O_CHANGEPOINT = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT tag, ts, value,
         row_number() OVER w AS i,
         sum(value) OVER (PARTITION BY tag ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS cs,
         count(*) OVER (PARTITION BY tag) AS n,
         sum(value) OVER (PARTITION BY tag) AS tot
  FROM res WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY tag ORDER BY ts)
),
sc AS (
  SELECT tag, ts,
         floor((sqrt(i * (n - i) / n) * abs(cs / i - (tot - cs) / (n - i))) * 1000000.0 + 0.5) / 1000000.0
           AS score,
         floor((cs / i) * 1000000.0 + 0.5) / 1000000.0 AS ml,
         floor(((tot - cs) / (n - i)) * 1000000.0 + 0.5) / 1000000.0 AS mr
  FROM d WHERE i >= 2 AND i <= n - 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tag
                               ORDER BY score DESC, ts ASC) AS rn
  FROM sc
)
SELECT tag, ts AS split_ts, score AS shift_score,
       ml AS mean_before, mr AS mean_after
FROM ranked WHERE rn = 1
"""


def q_w14_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14 — hour-of-day seasonal profile per tag (operators/tsa.
    seasonal_profile): two bounded-key hash aggs + one tag-keyed join;
    seasonal_z standardizes bucket means against the tag's own
    mean/std."""
    from gordo_spark.operators.tsa import seasonal_profile

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return seasonal_profile(res)


O_W14_SEASONAL = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
prof AS (
  SELECT tag, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
         count(*) AS n,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
           / (count(*) * 1000000.0) AS hm
  FROM res GROUP BY 1, 2
),
ov AS (
  SELECT tag,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
           / (count(*) * 1000000.0) AS tm,
         stddev_samp(value) AS tsd
  FROM res GROUP BY tag
)
SELECT p.tag, p.hod, p.n, floor((p.hm) * 1000000.0 + 0.5) / 1000000.0 AS hod_mean,
       CASE WHEN o.tsd > 0 THEN floor(((p.hm - o.tm) / o.tsd) * 1000000.0 + 0.5) / 1000000.0 END
         AS seasonal_z
FROM prof p JOIN ov o USING (tag)
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift per tag between the first and
    second half of the observed range (operators/tsa.psi_drift): pure
    hash aggregation — a 1-row midpoint scalar, reference-half min/max
    per tag, one (tag, bin) count, one per-tag sum. No ordered windows,
    so the whole thing is map-side-combinable at any scale."""
    from gordo_spark.operators.tsa import psi_drift

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return psi_drift(res, bins=10)


O_PSI_DRIFT = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
span AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid FROM res),
d AS (
  SELECT tag, value, epoch(ts) < (SELECT mid FROM span) AS is_ref FROM res
),
ref AS (
  SELECT tag, min(value) AS lo, max(value) AS hi FROM d WHERE is_ref
  GROUP BY tag
),
b AS (
  SELECT d.tag, d.is_ref,
         CASE WHEN (ref.hi - ref.lo) / 10 > 0
              THEN least(9, greatest(0, CAST(floor(
                     (d.value - ref.lo) / ((ref.hi - ref.lo) / 10))
                   AS BIGINT)))
              ELSE 0 END AS bin
  FROM d LEFT JOIN ref USING (tag)
),
cnt AS (
  SELECT tag, bin,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS nc
  FROM b GROUP BY 1, 2
),
tot AS (
  SELECT tag, CAST(sum(nr) AS BIGINT) AS n_ref, CAST(sum(nc) AS BIGINT) AS n_cur
  FROM cnt GROUP BY tag
),
term AS (
  SELECT cnt.tag, tot.n_ref, tot.n_cur,
         (greatest(CASE WHEN tot.n_cur > 0 THEN nc / tot.n_cur ELSE 0 END, 1e-6)
          - greatest(CASE WHEN tot.n_ref > 0 THEN nr / tot.n_ref ELSE 0 END, 1e-6))
         * ln(greatest(CASE WHEN tot.n_cur > 0 THEN nc / tot.n_cur ELSE 0 END, 1e-6)
              / greatest(CASE WHEN tot.n_ref > 0 THEN nr / tot.n_ref ELSE 0 END, 1e-6))
           AS term
  FROM cnt JOIN tot USING (tag)
)
SELECT tag, floor((sum(term)) * 1000000.0 + 0.5) / 1000000.0 AS psi, n_ref, n_cur
FROM term GROUP BY tag, n_ref, n_cur
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov two-sample drift per tag, first vs second half
    (operators/tsa.ks_drift): ties collapse in a map-side (tag, value)
    count BEFORE any sort, then the max ECDF gap runs as cumulative
    sums over the per-tag distinct values — the binning-free companion
    to psi_drift, with the 5%-level rejection bound applied per tag."""
    from gordo_spark.operators.tsa import ks_drift

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return ks_drift(res)


O_KS_DRIFT = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
span AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid FROM res),
d AS (
  SELECT tag, value AS v, epoch(ts) < (SELECT mid FROM span) AS is_ref
  FROM res WHERE value IS NOT NULL
),
cnt AS (
  SELECT tag, v,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS nc
  FROM d GROUP BY 1, 2
),
c AS (
  SELECT tag,
         sum(nr) OVER (PARTITION BY tag) AS totr,
         sum(nc) OVER (PARTITION BY tag) AS totc,
         sum(nr) OVER (PARTITION BY tag ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cumr,
         sum(nc) OVER (PARTITION BY tag ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cumc
  FROM cnt
),
agg AS (
  SELECT tag, CAST(totr AS BIGINT) AS n_ref, CAST(totc AS BIGINT) AS n_cur,
         floor((max(CASE WHEN totr > 0 AND totc > 0
                        THEN abs(cumr * 1.0 / totr - cumc * 1.0 / totc)
                   END)) * 1000000.0 + 0.5) / 1000000.0 AS ks
  FROM c GROUP BY tag, totr, totc
)
SELECT tag, ks, n_ref, n_cur,
       CASE WHEN ks IS NOT NULL
            THEN ks > 1.358 * sqrt((n_ref + n_cur) * 1.0
                                   / (n_ref * CAST(n_cur AS DOUBLE)))
       END AS drift
FROM agg
"""


def q_reconcile_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-vs-lineitem ledger reconciliation
    (operators/quality_checks.reconcile_totals): per order, the stored
    o_totalprice vs sum(extendedprice*(1-disc)*(1+tax)) recomputed from
    line items, classified matched/mismatched/orphan both directions
    (nothing silently dropped). One child aggregation + one full-outer
    join + one global aggregate; 1% tolerance."""
    from gordo_spark.operators.quality_checks import reconcile_totals

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    return reconcile_totals(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        li,
        "l_orderkey",
        "o_totalprice",
        amount,
        rel_tol=0.01,
    )


O_RECONCILE_TOTALS = """
WITH c AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS rec
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_totalprice AS stored, c.rec
  FROM orders o FULL OUTER JOIN c ON o.o_orderkey = c.l_orderkey
)
SELECT
  CAST(sum(CASE WHEN stored IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_parents,
  CAST(sum(CASE WHEN stored IS NOT NULL AND rec IS NOT NULL
                 AND abs(stored - rec) <= 0.01 * abs(stored)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
  CAST(sum(CASE WHEN stored IS NOT NULL AND rec IS NOT NULL
                 AND abs(stored - rec) > 0.01 * abs(stored)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
  CAST(sum(CASE WHEN stored IS NOT NULL AND rec IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_childless_parents,
  CAST(sum(CASE WHEN stored IS NULL AND rec IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_child_groups,
  floor((max(CASE WHEN stored IS NOT NULL AND rec IS NOT NULL
                  AND abs(stored) > 0
                 THEN abs(stored - rec) / abs(stored)
                 WHEN stored IS NOT NULL AND rec IS NOT NULL
                  AND abs(stored - rec) = 0 THEN 0.0 END)) * 1000000.0 + 0.5) / 1000000.0
    AS max_rel_err
FROM j
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/quality_checks.k_anonymity) over
    customer quasi-identifiers (nation, segment, balance-thousand):
    rows whose quasi tuple has < 5 peers are re-identifiable by an
    external join — the release gate beside pii_scrub (column
    redaction) and forget_keys (row erasure). One hash agg on the
    quasi tuple + one bounded summary."""
    from gordo_spark.operators.quality_checks import k_anonymity

    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_k"),
    )
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment", "bal_k"], k=5)


O_K_ANONYMITY = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
         count(*) AS n
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(n) AS BIGINT) AS min_group_size,
       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) = 0 AS anonymous
FROM g
"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test (operators/experiments.ab_zstat):
    deterministic md5-bucket assignment (the sampling module's
    convention — reproducible from the id alone, no assignment table),
    per-user conversion collapse, pooled-proportion z with a 5%
    two-sided verdict. Two map-side-combinable exchanges, one row out."""
    from gordo_spark.operators.experiments import ab_zstat

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("event_type") == "purchase").alias("converted")
    )
    return ab_zstat(ev, "user_id", "converted", salt="exp1")


O_AB_TEST = """
WITH per_unit AS (
  SELECT user_id,
         ('0x' || substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
  FROM events GROUP BY 1, 2
),
one AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 0 THEN s ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(sum(CASE WHEN variant = 1 THEN s ELSE 0 END) AS BIGINT) AS conv_b
  FROM per_unit
),
st AS (
  SELECT n_a, n_b, conv_a, conv_b,
         CASE WHEN n_a > 0 THEN conv_a / CAST(n_a AS DOUBLE) END AS pa,
         CASE WHEN n_b > 0 THEN conv_b / CAST(n_b AS DOUBLE) END AS pb,
         (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS pool
  FROM one
),
z AS (
  SELECT *,
         CASE WHEN sqrt(pool * (1 - pool) * (1.0 / n_a + 1.0 / n_b)) > 0
              THEN (pb - pa) / sqrt(pool * (1 - pool) * (1.0 / n_a + 1.0 / n_b))
         END AS zv
  FROM st
)
SELECT n_a, n_b, conv_a, conv_b,
       floor((pa) * 1000000.0 + 0.5) / 1000000.0 AS p_a, floor((pb) * 1000000.0 + 0.5) / 1000000.0 AS p_b, floor((zv) * 1000000.0 + 0.5) / 1000000.0 AS z,
       COALESCE(abs(zv) > 1.96, FALSE) AS significant
FROM z
"""


def q_tag_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the click and view hourly series
    (operators/tsa.tag_mutual_info): fixed-width 8x8 binning from each
    tag's own min/max (deterministic — ntile's tie order is engine-
    dependent), one bounded joint histogram, marginals as window sums
    over the <= 64-row frame. The nonlinear-coupling readout Pearson
    correlation misses."""
    from gordo_spark.operators.tsa import tag_mutual_info

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return tag_mutual_info(res, "click", "view", bins=8)


O_TAG_MUTUAL_INFO = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2
),
wide AS (
  SELECT ts,
         avg(CASE WHEN tag = 'click' THEN value END) AS a,
         avg(CASE WHEN tag = 'view' THEN value END) AS b
  FROM res GROUP BY ts
),
w2 AS (SELECT a, b FROM wide WHERE a IS NOT NULL AND b IS NOT NULL),
bounds AS (
  SELECT min(a) AS la, max(a) AS ha, min(b) AS lb, max(b) AS hb FROM w2
),
binned AS (
  SELECT
    CASE WHEN (ha - la) / 8 > 0
         THEN least(7, greatest(0,
                CAST(floor((a - la) / ((ha - la) / 8)) AS BIGINT)))
         ELSE 0 END AS ba,
    CASE WHEN (hb - lb) / 8 > 0
         THEN least(7, greatest(0,
                CAST(floor((b - lb) / ((hb - lb) / 8)) AS BIGINT)))
         ELSE 0 END AS bb
  FROM w2, bounds
),
cnt AS (SELECT ba, bb, count(*) AS n FROM binned GROUP BY 1, 2),
m AS (
  SELECT n,
         sum(n) OVER () AS tot,
         sum(n) OVER (PARTITION BY ba) AS na,
         sum(n) OVER (PARTITION BY bb) AS nb
  FROM cnt
)
SELECT floor((sum((n * 1.0 / tot)
             * ln((n * 1.0 / tot) / ((na * 1.0 / tot) * (nb * 1.0 / tot))))) * 1000000.0 + 0.5) / 1000000.0 AS mi,
       CAST(max(tot) AS BIGINT) AS n_pairs,
       CAST(count(*) AS BIGINT) AS n_cells
FROM m
"""


def q_seasonal_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day quantile envelope per tag (operators/tsa.
    seasonal_envelope): exact p10/p50/p90 per (tag, hour) — the robust
    companion to w14's mean/z profile and the band a dashboard shades
    behind the live trace. One hash agg on the bounded key."""
    from gordo_spark.operators.tsa import seasonal_envelope

    return seasonal_envelope(_events_long(spark, sf_dir))


O_SEASONAL_ENVELOPE = """
SELECT event_type AS tag, CAST(hour(ts) AS INT) AS hod,
       count(value) AS n,
       floor((quantile_cont(value, 0.1)) * 1000000.0 + 0.5) / 1000000.0 AS p10,
       floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
       floor((quantile_cont(value, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90
FROM events GROUP BY 1, 2
"""


def q_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift: Pearson chi-square on the event-type x half
    contingency table (operators/tsa.chisq_drift) — the drift-family
    member for columns where PSI's bins and KS's ordering don't exist.
    One (category, half) count + window marginals, one summary row."""
    from gordo_spark.operators.tsa import chisq_drift

    ev = read_table(spark, sf_dir, "events")
    return chisq_drift(ev, "event_type")


O_CHISQ_DRIFT = """
WITH span AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid FROM events),
d AS (
  SELECT event_type AS c, epoch(ts) < (SELECT mid FROM span) AS is_ref
  FROM events
),
cnt AS (
  SELECT c,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS nc
  FROM d GROUP BY c
),
m AS (
  SELECT nr, nc,
         sum(nr) OVER () AS totr,
         sum(nc) OVER () AS totc
  FROM cnt
),
t AS (
  SELECT nr, nc, totr, totc,
         (nr + nc) * totr * 1.0 / (totr + totc) AS er,
         (nr + nc) * totc * 1.0 / (totr + totc) AS ec
  FROM m
)
SELECT floor((sum(CASE WHEN er > 0 THEN (nr - er) * (nr - er) / er ELSE 0 END
           + CASE WHEN ec > 0 THEN (nc - ec) * (nc - ec) / ec ELSE 0 END)) * 1000000.0 + 0.5) / 1000000.0
         AS chi2,
       CAST(count(*) - 1 AS BIGINT) AS dof,
       CAST(max(totr) AS BIGINT) AS n_ref,
       CAST(max(totc) AS BIGINT) AS n_cur,
       CAST(count(*) AS BIGINT) AS n_categories
FROM t
"""


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part affinity over orders (operators/affinity.
    pair_counts): one shuffle builds per-order sorted item arrays, pairs
    generate ROW-LOCALLY (k(k-1)/2 fan-out, k = lines per order — no
    self-join), the marginal join is UNHINTED (part is sf-proportional),
    and only the 1-row group-total scalar is force-broadcast. Top 15 by
    (n_both desc, part_a, part_b) — fully deterministic tie-break."""
    from gordo_spark.operators.affinity import pair_counts

    li = read_table(spark, sf_dir, "lineitem")
    out = pair_counts(li, "l_orderkey", "l_partkey")
    return (
        out.select(
            F.col("item_a").alias("part_a"),
            F.col("item_b").alias("part_b"),
            "n_both",
            "lift",
        )
        .orderBy(F.col("n_both").desc(), "part_a", "part_b")
        .limit(15)
    )


O_BASKET_PAIRS = """
WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
pairs AS (
  SELECT l.item AS part_a, r.item AS part_b, count(*) AS n_both
  FROM g l JOIN g r ON l.g = r.g AND l.item < r.item
  GROUP BY 1, 2
),
marg AS (SELECT item, count(*) AS n_item FROM g GROUP BY item),
tot AS (SELECT count(DISTINCT g) AS n_groups FROM g)
SELECT p.part_a, p.part_b, p.n_both,
       floor((p.n_both * tot.n_groups / (ma.n_item * mb.n_item)) * 1000000.0 + 0.5) / 1000000.0 AS lift
FROM pairs p
JOIN marg ma ON ma.item = p.part_a
JOIN marg mb ON mb.item = p.part_b
CROSS JOIN tot
ORDER BY p.n_both DESC, p.part_a, p.part_b
LIMIT 15
"""


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths across user streams (operators/
    ranges.top_paths — depth-3 generalization of user_transitions): one
    user-keyed lead window (ts, event_id tie key), one count on the
    #types^3-bounded path key."""
    from gordo_spark.operators.ranges import top_paths

    ev = read_table(spark, sf_dir, "events")
    return top_paths(ev, depth=3)


O_EVENT_PATHS = """
WITH s AS (
  SELECT event_type AS e0,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT concat_ws('>', e0, e1, e2) AS path, count(*) AS n
FROM s WHERE e2 IS NOT NULL GROUP BY path
"""


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language (operators/text.zipf_slope_by_lang):
    rank window over the AGGREGATED vocab table (Heaps'-law bounded,
    same posture as the LM-quality ops), regression as one
    regr_slope/regr_r2 aggregation — no driver math."""
    from gordo_spark.operators.text import zipf_slope_by_lang

    return zipf_slope_by_lang(read_table(spark, sf_dir, "documents"))


O_ZIPF_SLOPE = """
WITH tk AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (SELECT lang, t, count(*) AS f FROM tk WHERE t <> '' GROUP BY 1, 2),
ranked AS (
  SELECT lang, f,
         row_number() OVER (PARTITION BY lang ORDER BY f DESC, t ASC) AS r
  FROM tf
)
SELECT lang, floor((regr_slope(ln(f), ln(r))) * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
       floor((regr_r2(ln(f), ln(r))) * 1000000.0 + 0.5) / 1000000.0 AS r2,
       count(*) AS n_terms
FROM ranked GROUP BY lang
"""


def q_grid_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-outage detection (operators/tsa.grid_gaps): missing-bucket
    runs in the hourly grid — one per-tag lag window, row-local filter,
    no joins. Localizes WHERE data went missing where the reference's
    n_samples_threshold gate only rejects the whole series."""
    from gordo_spark.operators.tsa import grid_gaps

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return grid_gaps(res, 3600)


O_GRID_GAPS = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT tag, ts, lag(ts) OVER (PARTITION BY tag ORDER BY ts) AS prev
  FROM res
),
g AS (
  SELECT tag, prev, ts,
         (CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev) AS BIGINT)) // 3600 - 1
           AS n_missing
  FROM lagged WHERE prev IS NOT NULL
)
SELECT tag,
       CAST(to_timestamp(epoch(prev) + 3600) AS TIMESTAMP) AS gap_start,
       CAST(to_timestamp(epoch(ts) - 3600) AS TIMESTAMP) AS gap_end,
       n_missing
FROM g WHERE n_missing > 0
"""


def q_tag_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between tag pairs at lags -2..2 hours
    (operators/tsa.cross_correlation): deliberately join-based — the
    long frame joins a lag-exploded copy of itself ON THE TIME KEY (one
    ts-partitioned shuffle that scales out) instead of lead() over a
    pivoted wide frame (a single-partition global sort); output is one
    #tags^2 * #lags bounded aggregate."""
    from gordo_spark.operators.tsa import cross_correlation

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return cross_correlation(res, [-2, -1, 0, 1, 2], 3600)


O_TAG_CROSSCORR = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
l AS (SELECT tag AS tag_a, epoch(ts) AS t, value AS va FROM res),
r AS (SELECT tag AS tag_b, epoch(ts) AS tb, value AS vb FROM res),
x AS (
  SELECT l.tag_a, r.tag_b, k.lag, l.va, r.vb
  FROM l
  CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS lag) k
  JOIN r ON r.tb - k.lag * 3600 = l.t AND l.tag_a < r.tag_b
)
SELECT tag_a, tag_b, lag, floor((corr(va, vb)) * 1000000.0 + 0.5) / 1000000.0 AS xcorr,
       count(*) AS n_pairs
FROM x GROUP BY 1, 2, 3
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/ranking.rfm_segments):
    quartile thresholds from ONE exact-percentile 1-row aggregate
    (broadcast) + row-local comparisons — no global ntile sort over the
    sf-proportional customer table."""
    from gordo_spark.operators.ranking import rfm_segments

    return rfm_segments(read_table(spark, sf_dir, "orders"))


O_RFM_SEGMENTS = """
WITH per AS (
  SELECT o_custkey,
         CAST(epoch(o_orderdate) AS BIGINT) AS dt_epoch, o_totalprice
  FROM orders
),
agg AS (
  SELECT o_custkey, max(dt_epoch) AS rec, count(*) AS frequency,
         floor((sum(o_totalprice)) * 1000000.0 + 0.5) / 1000000.0 AS monetary
  FROM per GROUP BY 1
),
thr AS (
  SELECT quantile_cont(rec, 0.25) AS r25, quantile_cont(rec, 0.5) AS r50,
         quantile_cont(rec, 0.75) AS r75,
         quantile_cont(frequency, 0.25) AS f25,
         quantile_cont(frequency, 0.5) AS f50,
         quantile_cont(frequency, 0.75) AS f75,
         quantile_cont(monetary, 0.25) AS m25,
         quantile_cont(monetary, 0.5) AS m50,
         quantile_cont(monetary, 0.75) AS m75
  FROM agg
),
sc AS (
  SELECT o_custkey,
         1 + (rec > r25)::INT + (rec > r50)::INT + (rec > r75)::INT
           AS r_score,
         1 + (frequency > f25)::INT + (frequency > f50)::INT
           + (frequency > f75)::INT AS f_score,
         1 + (monetary > m25)::INT + (monetary > m50)::INT
           + (monetary > m75)::INT AS m_score
  FROM agg CROSS JOIN thr
)
SELECT o_custkey, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm
FROM sc
"""


def q_order_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort revenue-retention matrix over orders: cohort = month of a
    customer's FIRST order, cell = (cohort, months_since) with distinct
    customers + revenue. The cohort label rides a custkey-partitioned
    window min (bounded per-key — no join back to a first-order table,
    which would re-derive the scan), then one hash agg on the
    months x months bounded key."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    m = F.date_trunc("month", F.col("o_orderdate"))
    d = o.select(
        "o_custkey",
        "o_totalprice",
        m.alias("_m"),
        F.min(m).over(w).alias("cohort"),
    )
    return (
        d.withColumn(
            "months_since",
            F.months_between(F.col("_m"), F.col("cohort")).cast("int"),
        )
        .groupBy("cohort", "months_since")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            # money sums as exact cent-integers: a float sum of ~2k
            # 2dp prices flips the 6dp boundary under engine summation
            # order (observed at sf0.1)
            qround(
                F.sum(
                    F.floor(
                        F.col("o_totalprice") * 100 + F.lit(0.5)
                    ).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(100.0),
                6,
            ).alias("revenue"),
        )
    )


O_ORDER_COHORTS = """
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS m, o_totalprice
  FROM orders
),
f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
j AS (
  SELECT o.o_custkey, f.cohort,
         CAST(datediff('month', f.cohort, o.m) AS INT) AS months_since,
         o.o_totalprice
  FROM o JOIN f USING (o_custkey)
)
SELECT CAST(cohort AS TIMESTAMP) AS cohort, months_since,
       count(DISTINCT o_custkey) AS n_customers,
       floor((CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT))
                   AS DOUBLE) / 100.0) * 1000000.0 + 0.5) / 1000000.0
         AS revenue
FROM j GROUP BY 1, 2
"""


def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap over the event stream:
    one map-side-combined hash agg on a 7x24 bounded key — the load-
    pattern readout behind capacity planning (concurrency gives the
    session curve; this gives the calendar shape)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        qround(F.avg("value"), 6).alias("avg_value"),
    )


O_EVENTS_HEATMAP = """
SELECT CAST(EXTRACT(dow FROM ts) + 1 AS INT) AS dow,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
       count(*) AS n,
       floor((avg(value)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
FROM events GROUP BY 1, 2
"""




def q_w15_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15 — time-weighted average per tag per day over the RAW
    irregular event stream (operators/tsa.time_weighted_avg): trapezoid
    integration between consecutive samples so sparse-but-steady
    sensors aren't out-voted by chatty ones. One per-tag ordered window
    + one (tag, day) hash agg — no joins."""
    from gordo_spark.operators.tsa import time_weighted_avg

    return time_weighted_avg(_events_long(spark, sf_dir), 86400)


O_W15_TWA = """
WITH e AS (
  SELECT event_type AS tag, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
  FROM events
),
d AS (
  SELECT tag, t, value, t // 86400 AS bkt,
         lag(t) OVER w AS pt, lag(value) OVER w AS pv
  FROM e WINDOW w AS (PARTITION BY tag ORDER BY t, value)
),
seg AS (
  SELECT tag, bkt, value,
         CASE WHEN pt IS NOT NULL AND pt // 86400 = bkt
              THEN t - pt ELSE 0 END AS dt,
         CASE WHEN pt IS NOT NULL AND pt // 86400 = bkt
              THEN (value + pv) / 2.0 * (t - pt) ELSE 0.0 END AS area
  FROM d
)
SELECT tag, CAST(to_timestamp(bkt * 86400) AS TIMESTAMP) AS bucket_ts,
       floor((CASE WHEN sum(dt) > 0 THEN sum(area) / sum(dt)
                  ELSE avg(value) END) * 1000000.0 + 0.5) / 1000000.0 AS twa,
       count(*) AS n_samples
FROM seg GROUP BY tag, bkt
"""


def q_w16_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W16 — Prometheus-style counter increase()/rate() per tag per 6h
    bucket with reset handling (operators/tsa.counter_rate): lag window
    partitions on (tag, bucket) — FINER than the tag key, so one hot
    counter still splits across executors bucket-by-bucket."""
    from gordo_spark.operators.tsa import counter_rate

    return counter_rate(_events_long(spark, sf_dir), 21600)


O_W16_COUNTER_RATE = """
WITH e AS (
  SELECT event_type AS tag, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
  FROM events
),
d AS (
  SELECT tag, t, value, t // 21600 AS bkt,
         lag(value) OVER (PARTITION BY tag, t // 21600
                          ORDER BY t, value) AS pv
  FROM e
),
inc AS (
  SELECT tag, bkt,
         CASE WHEN pv IS NULL THEN 0.0
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         CASE WHEN pv IS NOT NULL AND value < pv THEN 1 ELSE 0 END AS r
  FROM d
),
agg AS (
  SELECT tag, bkt, floor((sum(inc)) * 1000000.0 + 0.5) / 1000000.0 AS increase, sum(r) AS n_resets
  FROM inc GROUP BY 1, 2
)
SELECT tag, CAST(to_timestamp(bkt * 21600) AS TIMESTAMP) AS bucket_ts,
       increase, floor((increase / 21600) * 1000000.0 + 0.5) / 1000000.0 AS rate_per_sec,
       CAST(n_resets AS BIGINT) AS n_resets
FROM agg
"""


def q_j1_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/OHLC — candlestick downsample per tag per day
    (operators/downsample.resample_ohlc): open/close via lexicographic
    min/max(struct(ts, value)) — deterministic tie-break, one hash agg
    on the bounded (tag, day) key, no window, no sort."""
    from gordo_spark.operators.downsample import resample_ohlc

    return resample_ohlc(_events_long(spark, sf_dir), 86400)


O_J1_RESAMPLE_OHLC = """
WITH e AS (
  SELECT event_type AS tag, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
  FROM events
),
d AS (
  SELECT tag, t, value, t // 86400 AS bkt,
         row_number() OVER (PARTITION BY tag, t // 86400
                            ORDER BY t ASC, value ASC) AS rn_o,
         row_number() OVER (PARTITION BY tag, t // 86400
                            ORDER BY t DESC, value DESC) AS rn_c
  FROM e
)
SELECT tag, CAST(to_timestamp(bkt * 86400) AS TIMESTAMP) AS bucket_ts,
       max(CASE WHEN rn_o = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn_c = 1 THEN value END) AS close,
       count(*) AS n
FROM d GROUP BY tag, bkt
"""


def q_w17_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W17 — largest-triangle-three-buckets downsample of each tag's
    hourly series to 50 points (operators/downsample.lttb,
    parallel-anchor variant: bucket-mean anchors remove classical
    LTTB's sequential dependency so buckets score independently)."""
    from gordo_spark.operators.downsample import lttb

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return lttb(res, 50)


O_W17_LTTB = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT tag, ts, value, CAST(epoch(ts) AS BIGINT) AS t,
         row_number() OVER (PARTITION BY tag ORDER BY ts) - 1 AS i,
         count(*) OVER (PARTITION BY tag) AS cnt
  FROM res
),
b AS (
  SELECT *, CASE WHEN cnt <= 50 THEN i
                 WHEN i = 0 THEN 0
                 WHEN i = cnt - 1 THEN 49
                 ELSE 1 + ((i - 1) * 48) // (cnt - 2) END AS bucket
  FROM d
),
keep_all AS (
  SELECT tag, ts, value, CAST(bucket AS BIGINT) AS bucket
  FROM b WHERE cnt <= 50
),
mid AS (SELECT * FROM b WHERE cnt > 50),
anch AS (
  SELECT tag, bucket, floor((avg(t)) * 1000000.0 + 0.5) / 1000000.0 AS ax, floor((avg(value)) * 1000000.0 + 0.5) / 1000000.0 AS ay
  FROM mid GROUP BY 1, 2
),
anch2 AS (
  SELECT tag, bucket,
         lag(ax) OVER w AS xl, lag(ay) OVER w AS yl,
         lead(ax) OVER w AS xr, lead(ay) OVER w AS yr
  FROM anch WINDOW w AS (PARTITION BY tag ORDER BY bucket)
),
scored AS (
  SELECT m.tag, m.bucket, m.ts, m.t, m.value,
         floor((abs((a.xl - a.xr) * (m.value - a.yl)
                   - (a.xl - m.t) * (a.yr - a.yl))) * 1000000.0 + 0.5) / 1000000.0 AS area
  FROM mid m JOIN anch2 a ON m.tag = a.tag AND m.bucket = a.bucket
),
ranked AS (
  SELECT tag, bucket, ts, value,
         row_number() OVER (PARTITION BY tag, bucket
                            ORDER BY coalesce(area, 0) DESC, ts ASC) AS rn
  FROM scored
)
SELECT tag, ts, value, CAST(bucket AS BIGINT) AS bucket
FROM ranked WHERE rn = 1
UNION ALL SELECT tag, ts, value, bucket FROM keep_all
"""


def q_w18_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W18 — per-tag OLS trend (operators/tsa.trend): regr_slope /
    regr_intercept / regr_r2 sufficient-statistic aggregates — one
    map-side-combinable hash agg, no window, no sort, no join."""
    from gordo_spark.operators.tsa import trend

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return trend(res)


O_W18_TREND = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
x AS (SELECT tag, value, epoch(ts) / 3600.0 AS h FROM res)
SELECT tag,
       floor((regr_slope(value, h)) * 1000000.0 + 0.5) / 1000000.0 AS slope_per_hour,
       floor((regr_intercept(value, h)) * 1000000.0 + 0.5) / 1000000.0 AS intercept,
       floor((regr_r2(value, h)) * 1000000.0 + 0.5) / 1000000.0 AS r2,
       count(value) AS n
FROM x GROUP BY tag
"""


def q_w24_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W24 — Theil-Sen robust trend per tag (operators/tsa.theil_sen):
    median of all pairwise slopes on the hourly resampled grid — the
    outlier-immune cross-check for w18's OLS slope (one spike can drag
    OLS arbitrarily; the pairwise median needs ~29% corruption to
    move). Quadratic ONLY in the bounded per-tag bucket count, then
    one exact percentile per tag."""
    from gordo_spark.operators.tsa import theil_sen

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return theil_sen(res)


O_W24_THEIL_SEN = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
x AS (SELECT tag, value AS v, epoch(ts) / 3600.0 AS t FROM res
      WHERE value IS NOT NULL),
s AS (
  SELECT l.tag, (r.v - l.v) / (r.t - l.t) AS s
  FROM x l JOIN x r ON l.tag = r.tag AND l.t < r.t
)
SELECT tag, floor((median(s)) * 1000000.0 + 0.5) / 1000000.0 AS sen_slope_per_hour,
       count(*) AS n_pairs
FROM s GROUP BY tag
"""


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group latency-style percentiles (p50/p90/p99 of event
    value per event_type) via Spark's EXACT ``percentile`` aggregate —
    linear-interpolation semantics, same as DuckDB ``quantile_cont``.
    Exact percentile is a sort-based aggregate that buffers each
    group's values: right for bounded-cardinality report groups like
    these; at 100 TB with wide groups the documented swap is
    ``approx_percentile`` (t-digest-style sketch, mergeable, bounded
    memory) at the cost of oracle exactness."""
    ev = read_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        ev.groupBy(F.col("event_type"))
        .agg(
            qround(F.get(pct, 0), 6).alias("p50"),
            qround(F.get(pct, 1), 6).alias("p90"),
            qround(F.get(pct, 2), 6).alias("p99"),
            F.count("value").alias("n"),
        )
    )


O_GROUP_QUANTILES = """
SELECT event_type,
       floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
       floor((quantile_cont(value, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
       floor((quantile_cont(value, 0.99)) * 1000000.0 + 0.5) / 1000000.0 AS p99,
       count(value) AS n
FROM events GROUP BY event_type
"""


def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals per priority class
    (operators/profile.benford): string-extracted first significant
    digit (float log10 is engine-dependent at powers of ten), densified
    to all 9 digits per group, per-group chi-square against
    log10(1 + 1/d). One bounded-key hash agg + a 9x explode."""
    from gordo_spark.operators.profile import benford

    orders = read_table(spark, sf_dir, "orders")
    return benford(orders, "o_totalprice", ["o_orderpriority"])


O_BENFORD_PRICES = """
WITH pos AS (
  SELECT o_orderpriority,
         CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0)
              AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
cnt AS (
  SELECT o_orderpriority, digit, count(*) AS n FROM pos GROUP BY 1, 2
),
tot AS (
  SELECT o_orderpriority, sum(n) AS total FROM cnt GROUP BY 1
),
dense AS (
  SELECT t.o_orderpriority, t.total, g.digit
  FROM tot t CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS digit) g
),
full_t AS (
  SELECT d.o_orderpriority, d.digit, coalesce(c.n, 0) AS n, d.total,
         log10(1 + 1.0 / d.digit) AS exp_p
  FROM dense d LEFT JOIN cnt c
    ON d.o_orderpriority = c.o_orderpriority AND d.digit = c.digit
)
SELECT o_orderpriority, CAST(digit AS INT) AS digit, n,
       floor((n / total) * 1000000.0 + 0.5) / 1000000.0 AS obs_p,
       floor((exp_p) * 1000000.0 + 0.5) / 1000000.0 AS exp_p,
       floor((sum(pow(n - total * exp_p, 2) / (total * exp_p))
               OVER (PARTITION BY o_orderpriority)) * 1000000.0 + 0.5) / 1000000.0 AS chi2
FROM full_t
"""


def q_er_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs over customer names
    (operators/linkage.blocked_pairs): blocking on (nation, segment)
    bounds the pairwise space, JVM-side levenshtein filters in-block
    pairs row-locally — sum-of-|block|^2 cost, never |N|^2."""
    from gordo_spark.operators.linkage import blocked_pairs

    cust = read_table(spark, sf_dir, "customer")
    return blocked_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"], max_dist=1
    )


O_ER_BLOCKED_PAIRS = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph (operators/graph.pagerank):
    8 fixed power iterations, damping 0.85, on the same support-
    filtered part co-occurrence edges as the triangle census. Fixed
    iteration count (not a convergence loop) is what makes an
    iterative graph algorithm oracle-checkable: the DuckDB side
    unrolls the identical 8 join+aggregate steps as CTEs. Per
    iteration: 2 node-keyed shuffles; edge/degree subplans dedupe via
    ReusedExchange instead of rebuilding 8x."""
    from gordo_spark.operators.graph import co_occurrence_edges, pagerank

    li = read_table(spark, sf_dir, "lineitem")
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return pagerank(edges, damping=0.85, iterations=8)


def _pagerank_sql(iterations: int = 8, damping: float = 0.85) -> str:
    head = """
WITH e0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (
  SELECT a.p AS a, b.p AS b, count(*) AS n
  FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
),
e AS (SELECT a, b FROM cnt WHERE n >= 2),
ed AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT src AS v, count(*) AS d FROM ed GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
pr0 AS (SELECT v, 1.0 / nn.n AS r FROM deg, nn)"""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f""",
pr{k} AS (
  SELECT deg.v,
         (1.0 - {damping}) / nn.n
         + {damping} * coalesce(s.s, 0.0) AS r
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS v, sum(p.r / dg.d) AS s
    FROM pr{k - 1} p
    JOIN deg dg ON dg.v = p.v
    JOIN ed ON ed.src = p.v
    GROUP BY ed.dst
  ) s ON s.v = deg.v
)""")
    tail = f"""
SELECT v, floor((r) * 1000000.0 + 0.5) / 1000000.0 AS rank FROM pr{iterations}
"""
    return head + "".join(steps) + tail


O_PAGERANK = _pagerank_sql()


def q_fs_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic match weights for the ER blocking
    candidates (operators/linkage.fs_scores): per-field u probabilities
    estimated from the full customer table's value histograms (one
    scalar aggregation per field, assembled into a broadcast 1-row
    frame), agreement log2(m/u) / disagreement log2((1-m)/(1-u))
    weights summed row-locally over (segment, name tail, balance
    sign). Turns the blocked candidate set into a ranked triage.

    The narrow (id, name, blocks, fields) projection is pinned ONCE
    (localCheckpoint — the lsh_eval/curation_verdict discipline): FIVE
    consumers read it (both blocking self-join sides, the u-estimation
    pass, both pair-endpoint joins), and without the pin each re-scans
    the customer parquet — fit-time scalars must not cost five corpus
    scans at 100 TB."""
    from gordo_spark.operators.linkage import blocked_pairs, fs_scores

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.substring("c_name", -2, 2).alias("_name_tail"),
        (F.col("c_acctbal") > 0).alias("_bal_pos"),
    ).localCheckpoint()
    pairs = blocked_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"], max_dist=1
    )
    return fs_scores(
        pairs, cust, "c_custkey",
        ["c_mktsegment", "_name_tail", "_bal_pos"], m=0.95,
    )


O_FS_MATCH_SCORES = """
WITH rec AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         right(c_name, 2) AS exch,
         c_acctbal > 0 AS balpos
  FROM customer
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM rec),
u AS (
  SELECT
    (SELECT sum(c * (c - 1.0)) FROM
       (SELECT count(*) AS c FROM rec WHERE c_mktsegment IS NOT NULL
        GROUP BY c_mktsegment)) / (n.n * (n.n - 1)) AS u_seg,
    (SELECT sum(c * (c - 1.0)) FROM
       (SELECT count(*) AS c FROM rec WHERE exch IS NOT NULL
        GROUP BY exch)) / (n.n * (n.n - 1)) AS u_exch,
    (SELECT sum(c * (c - 1.0)) FROM
       (SELECT count(*) AS c FROM rec WHERE balpos IS NOT NULL
        GROUP BY balpos)) / (n.n * (n.n - 1)) AS u_bal
  FROM n
),
pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_mktsegment = b.c_mktsegment
           AND a.c_mktsegment IS NOT NULL AND b.c_mktsegment IS NOT NULL
           AS ag_seg,
         a.exch = b.exch AND a.exch IS NOT NULL AND b.exch IS NOT NULL
           AS ag_exch,
         a.balpos = b.balpos AND a.balpos IS NOT NULL AND b.balpos IS NOT NULL
           AS ag_bal
  FROM rec a JOIN rec b
    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
    AND levenshtein(a.c_name, b.c_name) <= 1
)
SELECT id_a, id_b,
       CAST((CASE WHEN ag_seg THEN 1 ELSE 0 END)
          + (CASE WHEN ag_exch THEN 1 ELSE 0 END)
          + (CASE WHEN ag_bal THEN 1 ELSE 0 END) AS INT) AS n_agree,
       floor(((CASE WHEN ag_seg THEN ln(0.95 / u.u_seg)
               ELSE ln(0.05 / (1 - u.u_seg)) END
        + CASE WHEN ag_exch THEN ln(0.95 / u.u_exch)
               ELSE ln(0.05 / (1 - u.u_exch)) END
        + CASE WHEN ag_bal THEN ln(0.95 / u.u_bal)
               ELSE ln(0.05 / (1 - u.u_bal)) END) / ln(2.0)) * 1000000.0 + 0.5) / 1000000.0 AS score
FROM pairs, u
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (operators/graph):
    edges = part pairs sharing >= 2 orders (support filter BEFORE any
    self-join bounds the fan-out), triangles via canonical a<b<c
    orientation — each triangle joined exactly once; global clustering
    = 3*tri/wedges."""
    from gordo_spark.operators.graph import co_occurrence_edges, triangle_stats

    li = read_table(spark, sf_dir, "lineitem")
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return triangle_stats(edges)


O_TRIANGLE_COUNT = """
WITH e0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (
  SELECT a.p AS a, b.p AS b, count(*) AS n
  FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
),
e AS (SELECT a, b FROM cnt WHERE n >= 2),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e ab JOIN e bc ON ab.b = bc.a
            JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
  ) GROUP BY v
),
stats AS (
  SELECT count(*) AS n_nodes,
         CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges,
         CAST(sum(d) / 2 AS BIGINT) AS n_edges
  FROM deg
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       floor((CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges END) * 1000000.0 + 0.5) / 1000000.0
         AS global_clustering
FROM stats, tri
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-HLL distinct parts per return flag
    (operators/sketches.hll_det_*): the CMS trick applied to HLL — a
    fixed md5 hash makes even the approximate answer oracle-exact
    (register table = 256 rows/group of mergeable state; harmonic sum
    in EXACT bigint fixed-point so the estimate is order-independent).
    """
    from gordo_spark.operators.sketches import hll_det_estimate, hll_det_registers

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_partkey").alias("v")
    )
    regs = hll_det_registers(li, "v", ["flag"])
    return hll_det_estimate(regs, ["flag"])


O_HLL_DISTINCT = """
WITH d AS (
  SELECT l_returnflag AS flag, md5(CAST(l_partkey AS VARCHAR)) AS h
  FROM lineitem
),
r AS (
  SELECT flag,
         ('0x' || substr(h, 1, 2))::INT AS idx,
         ltrim(substr(h, 3, 13), '0') AS s
  FROM d
),
rho AS (
  SELECT flag, idx,
         CASE WHEN length(s) = 0 THEN 53
              ELSE (13 - length(s)) * 4
                   + CASE WHEN substr(s,1,1) = '1' THEN 3
                          WHEN substr(s,1,1) IN ('2','3') THEN 2
                          WHEN substr(s,1,1) IN ('4','5','6','7') THEN 1
                          ELSE 0 END + 1 END AS rho
  FROM r
),
reg AS (SELECT flag, idx, max(rho) AS m FROM rho GROUP BY 1, 2),
agg AS (
  SELECT flag, sum((1::BIGINT << (53 - m))::BIGINT)::BIGINT AS sp,
         count(*) AS np
  FROM reg GROUP BY flag
),
e AS (
  SELECT flag,
         (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * 9007199254740992.0
           / (sp + (256 - np) * 9007199254740992) AS raw,
         256 - np AS v
  FROM agg
)
SELECT flag, floor((CASE WHEN raw <= 2.5 * 256 AND v > 0
                        THEN 256.0 * ln(256.0 / v) ELSE raw END) * 10000.0 + 0.5) / 10000.0
         AS hll_distinct
FROM e
"""




def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution of purchases to click/view/signup
    channels (operators/ranges.attribution): both credits from ONE
    user-keyed ordered window pass (first/last ignoreNulls over the
    strictly preceding frame, (ts, event_id) total order), then two
    bounded channel aggregations — no event-stream self-join."""
    from gordo_spark.operators.ranges import attribution

    ev = read_table(spark, sf_dir, "events")
    return attribution(ev, "purchase", ["click", "view", "signup"])


O_ATTRIBUTION = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CASE WHEN event_type IN ('click', 'view', 'signup')
              THEN event_type END AS touch
  FROM events
),
d AS (
  SELECT user_id, event_type,
         first_value(touch IGNORE NULLS) OVER w AS ft,
         last_value(touch IGNORE NULLS) OVER w AS lt
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (SELECT coalesce(ft, 'none') AS ft, coalesce(lt, 'none') AS lt
         FROM d WHERE event_type = 'purchase'),
f AS (SELECT ft AS touch, count(*) AS n_first_touch FROM conv GROUP BY 1),
l AS (SELECT lt AS touch, count(*) AS n_last_touch FROM conv GROUP BY 1)
SELECT coalesce(f.touch, l.touch) AS touch,
       coalesce(n_first_touch, 0) AS n_first_touch,
       coalesce(n_last_touch, 0) AS n_last_touch
FROM f FULL OUTER JOIN l ON f.touch = l.touch
"""


def q_w19_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W19 — Hampel despike filter over the hourly grid
    (operators/smoothing.hampel): rolling +/-5-row median + window MAD
    via row-local sorted-array algebra (MAD's deviations depend on the
    current row's median, so it CANNOT be a precomputed column); one
    per-tag ordered window, no joins. Emits only the flagged rows."""
    from gordo_spark.operators.smoothing import hampel

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return hampel(res, k=5, n_sigmas=3.0).filter(F.col("is_outlier"))


O_W19_HAMPEL = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT tag, ts, value,
         list_sort(list(value) OVER (PARTITION BY tag ORDER BY ts
                    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS arr
  FROM res
),
m AS (
  SELECT tag, ts, value, arr,
         (arr[(len(arr) - 1) // 2 + 1]
          + arr[len(arr) // 2 + 1]) / 2 AS med
  FROM d
),
v AS (
  SELECT tag, ts, value, med,
         list_sort(list_transform(arr, x -> abs(x - med))) AS dev
  FROM m
),
s AS (
  SELECT tag, ts, value, med,
         (dev[(len(dev) - 1) // 2 + 1]
          + dev[len(dev) // 2 + 1]) / 2 AS mad
  FROM v
)
SELECT tag, ts, value, floor((med) * 1000000.0 + 0.5) / 1000000.0 AS med,
       TRUE AS is_outlier, floor((med) * 1000000.0 + 0.5) / 1000000.0 AS filtered
FROM s WHERE abs(value - med) > 3.0 * 1.4826 * mad
"""


def q_w20_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W20 — local-maximum peak detection, +/-3-row dominance window
    (operators/smoothing.peaks): two bounded frames on one per-tag
    ordered window pass; emits peaks with the margin over the stronger
    side."""
    from gordo_spark.operators.smoothing import peaks

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return peaks(res, k=3)


O_W20_PEAKS = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT tag, ts, value,
         max(value) OVER (PARTITION BY tag ORDER BY ts
                          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lm,
         max(value) OVER (PARTITION BY tag ORDER BY ts
                          ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rm
  FROM res
)
SELECT tag, ts, value, lm AS left_max, rm AS right_max,
       floor((CASE WHEN lm IS NOT NULL OR rm IS NOT NULL
                  THEN value - greatest(coalesce(lm, rm), coalesce(rm, lm))
             END) * 1000000.0 + 0.5) / 1000000.0 AS margin
FROM d
WHERE (lm IS NULL OR value > lm) AND (rm IS NULL OR value > rm)
"""


def q_w21_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W21 — SAX symbolization to a 16-letter word, 4-letter alphabet
    (operators/downsample.sax): z-norm + equal-count PAA by integer
    bucketing + Gaussian-breakpoint binning; per-tag stats ride the
    same partition as window aggregates (no join), one (tag, segment)
    hash agg, one ordered collect per tag."""
    from gordo_spark.operators.downsample import sax

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return sax(res, word_len=16, alphabet=4)


O_W21_SAX = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT tag, value,
         row_number() OVER (PARTITION BY tag ORDER BY ts) - 1 AS i,
         count(*) OVER (PARTITION BY tag) AS n,
         avg(value) OVER (PARTITION BY tag) AS mu,
         stddev_samp(value) OVER (PARTITION BY tag) AS sd
  FROM res
),
z AS (
  SELECT tag, n, (i * 16) // n AS seg,
         CASE WHEN sd > 0 THEN (value - mu) / sd ELSE 0.0 END AS z
  FROM d
),
seg AS (
  SELECT tag, seg, max(n) AS n, floor((avg(z)) * 1000000.0 + 0.5) / 1000000.0 AS pm
  FROM z GROUP BY 1, 2
),
lett AS (
  SELECT tag, seg, n,
         CASE WHEN pm <= -0.6745 THEN 'a'
              WHEN pm <= 0.0 THEN 'b'
              WHEN pm <= 0.6745 THEN 'c'
              ELSE 'd' END AS letter
  FROM seg
)
SELECT tag, string_agg(letter, '' ORDER BY seg) AS sax_word,
       max(n) AS n_points
FROM lett GROUP BY tag
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-style CDC apply (sources/lake.cdc_apply): the orders
    table plays a change feed against the customer snapshot — latest
    change per custkey wins via ONE max_by aggregation (no window
    sort), hard deletes drop the key, untouched keys pass through.
    Priority maps to op (URGENT -> D, HIGH -> I, rest -> U); value
    columns tie-break the same-date ordering so the winner is
    deterministic in any engine. The third leg of the lake-mutation
    family beside lake_merge (SCD1) and scd2_history (audit trail)."""
    from gordo_spark.sources.lake import cdc_apply

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    snap = cust.select("c_custkey", "c_acctbal", "c_mktsegment")
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").alias("ts"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "D")
        .when(F.col("o_orderpriority") == "2-HIGH", "I")
        .otherwise("U")
        .alias("op"),
        qround(F.col("o_totalprice"), 2).alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    return cdc_apply(
        snap, changes, ["c_custkey"],
        tiebreak_cols=["c_acctbal", "c_mktsegment"],
    )


O_CDC_APPLY = """
WITH ch AS (
  SELECT o_custkey AS k, o_orderdate AS ts,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 'D'
              WHEN o_orderpriority = '2-HIGH' THEN 'I'
              ELSE 'U' END AS op,
         floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS nb, o_orderpriority AS ns
  FROM orders
),
latest AS (
  SELECT k, op, nb, ns FROM (
    SELECT *, row_number() OVER (
      PARTITION BY k ORDER BY ts DESC, nb DESC, ns DESC, op DESC
    ) AS rn
    FROM ch
  ) WHERE rn = 1
),
j AS (
  SELECT coalesce(s.c_custkey, l.k) AS c_custkey,
         s.c_custkey IS NOT NULL AS has_s,
         l.k IS NOT NULL AS has_c,
         s.c_acctbal AS sa, s.c_mktsegment AS sm,
         l.op, l.nb, l.ns
  FROM customer s FULL OUTER JOIN latest l ON s.c_custkey = l.k
)
SELECT c_custkey,
       CASE WHEN has_c AND op != 'D' THEN nb ELSE sa END AS c_acctbal,
       CASE WHEN has_c AND op != 'D' THEN ns ELSE sm END AS c_mktsegment,
       CASE WHEN NOT has_c THEN 'kept'
            WHEN NOT has_s THEN 'inserted'
            ELSE 'updated' END AS action
FROM j
WHERE NOT has_c OR op != 'D'
"""


def q_lake_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE/upsert of a customer-updates frame into the current
    snapshot (sources/lake.merge_upsert — Delta-style MERGE INTO as one
    full-outer join with null-safe comparison). Updates derive
    deterministically from the same table: every custkey divisible by 3
    arrives with a shifted balance (update), keys congruent 1 mod 3
    arrive rekeyed past the current range (insert), the rest of the
    snapshot passes through (unchanged)."""
    from gordo_spark.sources.lake import merge_upsert

    cust = read_table(spark, sf_dir, "customer")
    current = cust.select("c_custkey", "c_acctbal", "c_mktsegment")
    upd = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        qround(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    ins = cust.filter(F.col("c_custkey") % 3 == 1).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    updates = upd.unionByName(ins)
    return merge_upsert(
        current, updates, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
    )


O_LAKE_MERGE = """
WITH cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
),
upd AS (
  SELECT c_custkey, floor((c_acctbal + 100.0) * 100.0 + 0.5) / 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 10000000, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 3 = 1
),
j AS (
  SELECT coalesce(c.c_custkey, u.c_custkey) AS c_custkey,
         c.c_custkey IS NOT NULL AS has_c,
         u.c_custkey IS NOT NULL AS has_u,
         c.c_acctbal AS ca, c.c_mktsegment AS cm,
         u.c_acctbal AS ua, u.c_mktsegment AS um
  FROM cur c FULL OUTER JOIN upd u ON c.c_custkey = u.c_custkey
)
SELECT c_custkey,
       CASE WHEN has_u THEN ua ELSE ca END AS c_acctbal,
       CASE WHEN has_u THEN um ELSE cm END AS c_mktsegment,
       CASE WHEN NOT has_c THEN 'insert'
            WHEN NOT has_u THEN 'unchanged'
            WHEN ca IS DISTINCT FROM ua OR cm IS DISTINCT FROM um
              THEN 'update'
            ELSE 'unchanged' END AS action
FROM j
"""




def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement — 20
    docs per source weighted by length (operators/sampling.
    weighted_sample): the uniform draw is md5(id)-deterministic (pure
    projection — repartition-stable, engine-portable, no seeded RNG),
    so even the "random" sample hash-matches the oracle; one
    top-k-per-group window on the bounded source key."""
    from gordo_spark.operators.sampling import weighted_sample

    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", 20, group_by=["source"])


O_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT *,
         -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              + 1.0) / 4294967296.0) / n_chars AS key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY key ASC, doc_id ASC) AS sample_rank
  FROM keyed
)
SELECT doc_id, text, lang, source, n_chars,
       CAST(sample_rank AS INT) AS sample_rank,
       floor((key) * 1000000.0 + 0.5) / 1000000.0 AS sample_key
FROM ranked WHERE sample_rank <= 20
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase time-to-convert percentiles
    (operators/ranges.conversion_lag): conditional-min firsts on one
    user key, one exact-percentile 1-row aggregate — no windows."""
    from gordo_spark.operators.ranges import conversion_lag

    ev = read_table(spark, sf_dir, "events")
    return conversion_lag(ev, "signup", "purchase")


O_CONVERSION_LAG = """
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN t END) AS t0
  FROM e GROUP BY user_id
),
conv AS (
  SELECT e.user_id, per.t0, min(e.t) AS t1
  FROM e JOIN per USING (user_id)
  WHERE e.event_type = 'purchase' AND per.t0 IS NOT NULL AND e.t >= per.t0
  GROUP BY e.user_id, per.t0
),
lags AS (SELECT t1 - t0 AS lag FROM conv),
started AS (
  SELECT count(DISTINCT user_id) AS n_started FROM e
  WHERE event_type = 'signup'
)
SELECT (SELECT count(*) FROM lags) AS n_converted,
       (SELECT n_started FROM started) AS n_started,
       (SELECT floor((quantile_cont(lag, 0.25)) * 1000000.0 + 0.5) / 1000000.0 FROM lags) AS p25_s,
       (SELECT floor((quantile_cont(lag, 0.5)) * 1000000.0 + 0.5) / 1000000.0 FROM lags) AS p50_s,
       (SELECT floor((quantile_cont(lag, 0.75)) * 1000000.0 + 0.5) / 1000000.0 FROM lags) AS p75_s,
       (SELECT floor((quantile_cont(lag, 0.9)) * 1000000.0 + 0.5) / 1000000.0 FROM lags) AS p90_s,
       (SELECT floor((avg(lag)) * 1000000.0 + 0.5) / 1000000.0 FROM lags) AS mean_s
"""


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH parameter evaluation (operators/dedup.lsh_eval): recall and
    precision of the 8-perm/4-band MinHash-LSH candidates against exact
    shingle-Jaccard >= 0.5 truth on the planted-dup corpus — the dedup
    analogue of ann_recall, run before committing LSH parameters to a
    full-corpus pass. Both branches reuse the production operators
    verbatim; the metric join touches only pair-keyed bounded frames."""
    from gordo_spark.operators.dedup import lsh_eval

    return lsh_eval(
        _docs_with_dups(spark, sf_dir),
        num_hashes=8, bands=4, threshold=0.5,
    )


def _lsh_recall_sql() -> str:
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    params = _hash_params(8)
    mins = ",\n       ".join(
        f"min(({a}*sh + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
WITH corpus AS ({_O_DOCS_DUPS}),
shingled AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
         )) AS shingle
  FROM corpus
),
hashed AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS sh
  FROM shingled
),
sigs AS (
  SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
),
banded AS (
  SELECT doc_id, 0 AS band, m0 || '_' || m1 AS key FROM sigs
  UNION ALL SELECT doc_id, 1, m2 || '_' || m3 FROM sigs
  UNION ALL SELECT doc_id, 2, m4 || '_' || m5 FROM sigs
  UNION ALL SELECT doc_id, 3, m6 || '_' || m7 FROM sigs
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM hashed GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
  FROM hashed l JOIN hashed r ON l.sh = r.sh AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
),
j AS (
  SELECT coalesce(c.a, t.a) AS a,
         c.a IS NOT NULL AS is_c, t.a IS NOT NULL AS is_t
  FROM cand c FULL OUTER JOIN truth t ON c.a = t.a AND c.b = t.b
)
SELECT CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
       CAST(sum(CASE WHEN is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN is_t AND is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       floor((CASE WHEN sum(CASE WHEN is_t THEN 1 ELSE 0 END) > 0
                  THEN sum(CASE WHEN is_t AND is_c THEN 1 ELSE 0 END) * 1.0
                       / sum(CASE WHEN is_t THEN 1 ELSE 0 END) END) * 1000000.0 + 0.5) / 1000000.0
         AS recall,
       floor((CASE WHEN sum(CASE WHEN is_c THEN 1 ELSE 0 END) > 0
                  THEN sum(CASE WHEN is_t AND is_c THEN 1 ELSE 0 END) * 1.0
                       / sum(CASE WHEN is_c THEN 1 ELSE 0 END) END) * 1000000.0 + 0.5) / 1000000.0
         AS precision
FROM j
"""


O_LSH_RECALL = _lsh_recall_sql()




def q_w22_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W22 — rolling 7-day correlation between the click and view
    series (operators/tsa.rolling_corr): conditional-agg align onto the
    hourly grid (bounded), then corr as a windowed aggregate over a
    trailing 7-day TIME (RANGE) frame — gaps shrink the pair count
    instead of silently stretching the window (the acf lesson); the
    time-varying coupling a whole-range corr averages away.
    Single-series window posture (calendar-grid bounded, see
    SINGLE_SERIES_OK)."""
    from gordo_spark.operators.tsa import rolling_corr

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return rolling_corr(res, "click", "view", window_seconds=168 * 3600)


O_W22_ROLLING_CORR = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2
),
wide AS (
  SELECT ts,
         avg(CASE WHEN tag = 'click' THEN value END) AS a,
         avg(CASE WHEN tag = 'view' THEN value END) AS b
  FROM res GROUP BY ts
)
SELECT ts,
       floor((corr(a, b) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS corr_ab,
       CAST(sum(CASE WHEN a IS NOT NULL AND b IS NOT NULL
                     THEN 1 ELSE 0 END) OVER w AS BIGINT) AS n_pairs
FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM wide)
WINDOW w AS (ORDER BY t RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)
"""


def q_w23_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W23 — Dickey-Fuller stationarity screen per tag
    (operators/tsa.adf_screen): a TIME-keyed RANGE frame builds
    (dv, v_prev) only where the previous hour exists (gap-spanning
    "deltas" would bias gamma), then ONE regr_* sufficient-statistics
    aggregation yields gamma AND its t-stat (SE from Syy/Sxx — no
    residual pass); unit-root sensors flagged before level thresholds
    are trusted."""
    from gordo_spark.operators.tsa import adf_screen

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return adf_screen(res, 3600)


O_W23_ADF = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT tag,
         value - last_value(value) OVER w AS dv,
         last_value(value) OVER w AS x
  FROM (SELECT tag, value, floor(epoch(ts)) AS t FROM res)
  WINDOW w AS (PARTITION BY tag ORDER BY t
               RANGE BETWEEN 3600 PRECEDING AND 3600 PRECEDING)
),
agg AS (
  SELECT tag, regr_slope(dv, x) AS g, regr_sxx(dv, x) AS sxx,
         regr_syy(dv, x) AS syy, CAST(regr_count(dv, x) AS BIGINT) AS n
  FROM d WHERE x IS NOT NULL GROUP BY tag
),
t AS (
  SELECT tag, g, n,
         CASE WHEN sqrt(greatest(syy - g * g * sxx, 0.0) / (n - 2) / sxx) > 0
              THEN g / sqrt(greatest(syy - g * g * sxx, 0.0) / (n - 2) / sxx)
         END AS t_stat
  FROM agg
)
SELECT tag, floor((g) * 1000000.0 + 0.5) / 1000000.0 AS gamma, floor((t_stat) * 1000000.0 + 0.5) / 1000000.0 AS t_stat, n,
       t_stat < -2.86 AS stationary
FROM t
"""




def q_wordlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist curation screen (operators/text.wordlist_filter):
    LEET-folded token-exact matching against a literal wordlist
    (translate('013457@$'->'oieastas') so obfuscated variants hit),
    keep when match fraction < 2%. One explode -> codegen fold ->
    IN-list -> map-side-combined groupBy(id); token-exact by design
    (the Scunthorpe problem rules out substring matching)."""
    from gordo_spark.operators.text import wordlist_filter

    docs = read_table(spark, sf_dir, "documents")
    return wordlist_filter(docs, ["slow", "spill", "skew"], max_frac=0.02)


O_WORDLIST_FILTER = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
flagged AS (
  SELECT doc_id,
         CASE WHEN translate(lower(tok), '013457@$', 'oieastas')
                   IN ('slow', 'spill', 'skew') THEN 1 ELSE 0 END AS f
  FROM toks WHERE tok <> ''
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(f) AS BIGINT) AS n_flagged
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.n_flagged, 0) AS n_flagged,
       floor((CASE WHEN coalesce(a.n_tokens, 0) > 0
                  THEN coalesce(a.n_flagged, 0) * 1.0 / a.n_tokens
                  ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS flag_frac,
       CASE WHEN coalesce(a.n_tokens, 0) > 0
            THEN coalesce(a.n_flagged, 0) * 1.0 / a.n_tokens
            ELSE 0.0 END < 0.02 AS keep
FROM documents d LEFT JOIN agg a USING (doc_id)
"""




def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values for lineitem on (l_partkey, l_suppkey)
    (sources/zorder.zorder_value — the clustering key behind the
    measured SCALE_BENCH file-skipping): one 1-row bounds aggregate
    (broadcast), then pure shift/mask codegen — bit-identical in any
    engine, so even the curve itself is oracle-checked. Top 100 by
    (z, orderkey, partkey, suppkey) keeps the output bounded."""
    from gordo_spark.sources.zorder import zorder_value

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    d, z = zorder_value(li, ["l_partkey", "l_suppkey"], bits=8)
    return (
        d.withColumn("z", z)
        .select("l_orderkey", "l_partkey", "l_suppkey", "z")
        .orderBy("z", "l_orderkey", "l_partkey", "l_suppkey")
        .limit(100)
    )


O_ZORDER_KEYS = """
WITH b AS (
  SELECT CAST(min(l_partkey) AS DOUBLE) AS lo_p,
         CAST(max(l_partkey) AS DOUBLE) AS hi_p,
         CAST(min(l_suppkey) AS DOUBLE) AS lo_s,
         CAST(max(l_suppkey) AS DOUBLE) AS hi_s
  FROM lineitem
),
r AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         CASE WHEN hi_p - lo_p > 0
              THEN least(255, CAST(floor((l_partkey - lo_p)
                                         / (hi_p - lo_p) * 256) AS BIGINT))
              ELSE 0 END AS rp,
         CASE WHEN hi_s - lo_s > 0
              THEN least(255, CAST(floor((l_suppkey - lo_s)
                                         / (hi_s - lo_s) * 256) AS BIGINT))
              ELSE 0 END AS rs
  FROM lineitem, b
),
z AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         CAST({zexpr} AS BIGINT) AS z
  FROM r
)
SELECT * FROM z
ORDER BY z, l_orderkey, l_partkey, l_suppkey LIMIT 100
"""


def _zorder_sql() -> str:
    terms = []
    for j in range(8):
        terms.append(f"(((rp >> {j}) & 1) << {j * 2 + 1})")
        terms.append(f"(((rs >> {j}) & 1) << {j * 2})")
    return O_ZORDER_KEYS.replace("{zexpr}", " + ".join(terms))




def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 version history from the event change log
    (sources/lake.scd2_from_changes): each (user, event) becomes a
    version valid until the user's next event — ONE lead window on the
    dimension key, (ts, event_id) total order; the audit-trail
    complement of lake_merge's SCD1 overwrite. Bounded to users 0-9 so
    the contract output stays small."""
    from gordo_spark.sources.lake import scd2_from_changes

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < 10
    ).select("user_id", "event_id", "ts", "event_type")
    return scd2_from_changes(
        ev, ["user_id"], tiebreak_cols=["event_id"]
    )


O_SCD2_HISTORY = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type FROM events WHERE user_id < 10
)
SELECT user_id, event_id, ts, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current,
       CAST(row_number() OVER w AS INT) AS version
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""




def q_mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media dedup over the planted-dup corpus's binary
    payloads (operators/multimodal.payload_dedup): md5 over RAW bytes,
    min-id survivor — payload bytes never cross the exchange (only the
    digest and two longs shuffle); the no-decode first pass of
    image/audio curation. Every blob appears exactly twice here, so
    n_copies pins the planted duplication."""
    from gordo_spark.operators.multimodal import attach_binary_payload, payload_dedup

    docs = _docs_with_dups(spark, sf_dir)
    return payload_dedup(attach_binary_payload(docs))


O_MM_PAYLOAD_DEDUP = f"""
WITH corpus AS ({_O_DOCS_DUPS}),
p AS (
  SELECT doc_id, text, encode(text) AS payload FROM corpus
)
-- DuckDB's md5 takes VARCHAR; the payload IS utf-8(text), so md5(text)
-- hashes the identical bytes Spark's md5(binary) sees
SELECT md5(text) AS payload_md5,
       min(doc_id) AS survivor_id,
       count(*) AS n_copies,
       CAST(min(octet_length(payload)) AS BIGINT) AS n_bytes
FROM p GROUP BY 1
"""


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph (operators/graph.k_core): 8
    fixed peel rounds (degree agg + two endpoint semi-joins each) on
    the same support-filtered edges as the triangle census — the
    dense-cohesion extraction; oracle unrolls the identical rounds as
    CTEs (the pagerank trick)."""
    from gordo_spark.operators.graph import co_occurrence_edges, k_core

    li = read_table(spark, sf_dir, "lineitem")
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return k_core(edges, k=3, rounds=8)


def _kcore_sql(k: int = 3, rounds: int = 8) -> str:
    head = """
WITH e0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (
  SELECT a.p AS a, b.p AS b, count(*) AS n
  FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
),
e AS (SELECT a, b FROM cnt WHERE n >= 2),
a0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f""",
k{r} AS MATERIALIZED (
  SELECT src AS v FROM a{r - 1} GROUP BY src HAVING count(*) >= {k}
),
a{r} AS MATERIALIZED (
  SELECT x.src, x.dst FROM a{r - 1} x
  JOIN k{r} s ON x.src = s.v JOIN k{r} d ON x.dst = d.v
)""")
    tail = f"""
SELECT src AS v, CAST(count(*) AS BIGINT) AS degree
FROM a{rounds} GROUP BY src
"""
    return head + "".join(steps) + tail


O_KCORE = _kcore_sql()


def q_mm_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over binary media payloads
    (operators/multimodal.ahash_64 + ahash_near_dups): Arrow-batched
    aHash (64 sampled "pixels" -> mean threshold -> packed signed
    int64; fake decode pinned so the oracle reproduces the exact
    fingerprints), then 4x16-bit banding with bit_count-verified
    Hamming <= 3 — pigeonhole-complete, bucket-join only, payload
    bytes never shuffle. The re-encode-tolerant middle layer between
    byte-exact mm_payload_dedup and embedding semdedup."""
    from gordo_spark.operators.multimodal import (
        ahash_64,
        ahash_near_dups,
        attach_binary_payload,
    )

    docs = _docs_with_dups(spark, sf_dir).filter(F.length("text") > 0)
    hashes = ahash_64(attach_binary_payload(docs), mode="fake")
    return ahash_near_dups(hashes, max_hamming=3)


O_MM_AHASH_DEDUP = f"""
WITH corpus AS ({_O_DOCS_DUPS}),
hx AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM corpus
),
px AS (
  SELECT doc_id,
         j,
         ('0x' || substr(h, 2 * ((j * greatest(n - 1, 0)) // 63) + 1, 2))::INT
           AS pix
  FROM hx, (SELECT unnest(generate_series(0, 63)) AS j)
  WHERE n > 0
),
pm AS (
  SELECT doc_id, j, pix, avg(pix) OVER (PARTITION BY doc_id) AS m FROM px
),
ah AS (
  SELECT doc_id,
         sum(CASE WHEN pix > m AND j < 63 THEN CAST(1 AS BIGINT) << j
                  ELSE 0 END)
         + CASE WHEN max(CASE WHEN j = 63 AND pix > m THEN 1 ELSE 0 END) = 1
                THEN -9223372036854775808 ELSE 0 END AS ahash
  FROM pm GROUP BY doc_id
),
banded AS (
  SELECT doc_id, ahash, b.band, (ahash >> (16 * b.band)) & 65535 AS key
  FROM ah, (SELECT unnest(generate_series(0, 3)) AS band) b
),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         CAST(bit_count(xor(l.ahash, r.ahash)) AS INT) AS hamming
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
"""


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier repurchase curve (operators/survival.km_curve):
    per customer, time from first to second order (right-censored at
    the corpus's last order date for one-order customers), then the
    product-limit survival estimate on the day grid. Subjects collapse
    map-side; the cumulative product runs exp-sum-of-logs over the
    bounded duration grid (time-resolution cardinality, never
    subject-sized)."""
    from gordo_spark.operators.survival import km_curve

    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderdate")).alias("_ds")
    )
    mx = o.agg(F.max("o_orderdate").alias("_mx"))
    subj = per.crossJoin(F.broadcast(mx)).select(
        (F.size("_ds") >= 2).alias("observed"),
        F.when(
            F.size("_ds") >= 2,
            F.datediff(F.element_at("_ds", 2), F.element_at("_ds", 1)),
        )
        .otherwise(F.datediff(F.col("_mx"), F.element_at("_ds", 1)))
        .alias("duration"),
    )
    return km_curve(subj, "duration", "observed")


O_SURVIVAL_KM = """
WITH per AS (
  SELECT o_custkey,
         (array_agg(o_orderdate ORDER BY o_orderdate))[1] AS f,
         (array_agg(o_orderdate ORDER BY o_orderdate))[2] AS s,
         count(*) AS n
  FROM orders GROUP BY 1
),
mx AS (SELECT max(o_orderdate) AS m FROM orders),
subj AS (
  SELECT CASE WHEN n >= 2 THEN date_diff('day', f, s)
              ELSE date_diff('day', f, m) END AS t,
         n >= 2 AS ev
  FROM per, mx
),
grid AS (
  SELECT t, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN ev THEN 0 ELSE 1 END) AS c,
         count(*) AS at_t
  FROM subj GROUP BY t
),
risk AS (SELECT *, sum(at_t) OVER (ORDER BY t DESC) AS n_risk FROM grid),
surv AS (
  SELECT *,
         exp(sum(CASE WHEN d > 0
                      THEN ln(greatest(1 - d / CAST(n_risk AS DOUBLE), 1e-100))
                      ELSE 0 END) OVER (ORDER BY t)) AS s
  FROM risk
)
SELECT CAST(t AS INT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
       floor((s) * 1000000.0 + 0.5) / 1000000.0 AS survival
FROM surv WHERE d > 0 ORDER BY t
"""


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over order baskets
    (operators/affinity.association_rules): support/confidence/lift
    per antecedent -> consequent, both directions of each canonical
    pair (confidence is asymmetric). Same row-local pair fan-out as
    basket_pairs; min_both prunes before the marginal join. Top 20 by
    (confidence desc, antecedent, consequent) — deterministic."""
    from gordo_spark.operators.affinity import association_rules

    li = read_table(spark, sf_dir, "lineitem")
    out = association_rules(li, "l_orderkey", "l_partkey", min_both=3)
    return out.orderBy(
        F.col("confidence").desc(), "antecedent", "consequent"
    ).limit(20)


O_ASSOC_RULES = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pair AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb, count(*) AS n_both
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
directed AS (
  SELECT pa AS antecedent, pb AS consequent, n_both FROM pair
  UNION ALL
  SELECT pb, pa, n_both FROM pair
),
marg AS (SELECT l_partkey AS item, count(*) AS n_item FROM b GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem)
SELECT antecedent, consequent, n_both,
       floor((n_both / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS support,
       floor((n_both / CAST(ma.n_item AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS confidence,
       floor(((n_both / CAST(ma.n_item AS DOUBLE))
             / (mc.n_item / CAST(n AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS lift
FROM directed
JOIN marg ma ON ma.item = antecedent
JOIN marg mc ON mc.item = consequent
CROSS JOIN tot
ORDER BY confidence DESC, antecedent, consequent
LIMIT 20
"""


def q_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report (operators/skew.key_skew_audit): per
    candidate join key of lineitem, key counts, hottest-key share, and
    the Herfindahl index whose reciprocal is the effective parallelism
    a hash shuffle gets. One pass builds every histogram (the
    fs_scores explode shape); no ordering — max and sum-of-squares
    replace top-k."""
    from gordo_spark.operators.skew import key_skew_audit

    li = read_table(spark, sf_dir, "lineitem")
    return key_skew_audit(li, ["l_partkey", "l_returnflag", "l_suppkey"])


O_KEY_SKEW_AUDIT = """
WITH h AS (
  SELECT 'l_partkey' AS key, CAST(l_partkey AS VARCHAR) AS v, count(*) AS c
  FROM lineitem GROUP BY 2
  UNION ALL
  SELECT 'l_returnflag', l_returnflag, count(*) FROM lineitem GROUP BY 2
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR), count(*)
  FROM lineitem GROUP BY 2
)
SELECT key, CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       floor((max(c) / CAST(sum(c) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS max_key_frac,
       floor((sum(c * c) / (CAST(sum(c) AS DOUBLE) * sum(c))) * 1000000.0 + 0.5) / 1000000.0 AS hhi,
       floor(((CAST(sum(c) AS DOUBLE) * sum(c)) / sum(c * c)) * 100.0 + 0.5) / 100.0
         AS effective_keys
FROM h GROUP BY key ORDER BY key
"""


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition screen (operators/text.script_mix):
    per-document Latin/digit/whitespace/other fractions — the pre-
    language-ID noise filter. Row-local regexp length algebra; the
    text never leaves the scan."""
    from gordo_spark.operators.text import script_mix

    return script_mix(read_table(spark, sf_dir, "documents"))


O_SCRIPT_MIX = """
WITH m AS (
  SELECT doc_id, length(text) AS n,
         CASE WHEN length(text) > 0 THEN
           floor(((length(text)
                  - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                 / CAST(length(text) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS lf,
         CASE WHEN length(text) > 0 THEN
           floor(((length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g')))
                 / CAST(length(text) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS df,
         CASE WHEN length(text) > 0 THEN
           floor(((length(text)
                  - length(regexp_replace(text, '[ \t\r\n]', '', 'g')))
                 / CAST(length(text) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS sf
  FROM documents
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars, lf AS latin_frac,
       df AS digit_frac, sf AS space_frac,
       CASE WHEN n > 0 THEN floor((1.0 - lf - df - sf) * 1000000.0 + 0.5) / 1000000.0 END AS other_frac
FROM m
"""


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between two curation judges
    (operators/quality_checks.cohens_kappa): the Gopher rule verdict
    vs the composite quality score at 0.5 — do the two filter families
    agree beyond their base rates? One aggregation, one row."""
    from gordo_spark.operators.quality_checks import cohens_kappa
    from gordo_spark.operators.text import gopher_rule_exprs, quality_expr

    docs = read_table(spark, sf_dir, "documents")
    flags = docs.select(
        gopher_rule_exprs(F.col("text"))["keep"].alias("judge_a"),
        (quality_expr(F.col("text")) >= 0.5).alias("judge_b"),
    )
    return cohens_kappa(flags, "judge_a", "judge_b")


def _kappa_sql() -> str:
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
  SELECT (n_words >= 50 AND n_words <= 100000)
           AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
           AND (n_sym / n_words <= 0.1)
           AND (alpha_frac >= 0.8)
           AND (n_sw >= 2) AS a,
         (least(n_words / 50.0, 1.0)
          + greatest(1.0 - (n_punct / n_chars) * 5.0, 0.0)
          + n_uniq / n_words
          + least((n_sw / n_words) * 5.0, 1.0)) / 4.0 >= 0.5 AS b
  FROM m
),
agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree,
         sum(CASE WHEN a THEN 1 ELSE 0 END) AS a1,
         sum(CASE WHEN b THEN 1 ELSE 0 END) AS b1
  FROM j WHERE a IS NOT NULL AND b IS NOT NULL
)
SELECT CAST(n AS BIGINT) AS n,
       floor((agree / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS p_o,
       floor(((a1 / CAST(n AS DOUBLE)) * (b1 / CAST(n AS DOUBLE))
             + (1 - a1 / CAST(n AS DOUBLE)) * (1 - b1 / CAST(n AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS p_e,
       floor((CASE WHEN (a1 / CAST(n AS DOUBLE)) * (b1 / CAST(n AS DOUBLE))
                       + (1 - a1 / CAST(n AS DOUBLE))
                         * (1 - b1 / CAST(n AS DOUBLE)) < 1.0
                  THEN (agree / CAST(n AS DOUBLE)
                        - ((a1 / CAST(n AS DOUBLE)) * (b1 / CAST(n AS DOUBLE))
                           + (1 - a1 / CAST(n AS DOUBLE))
                             * (1 - b1 / CAST(n AS DOUBLE))))
                       / (1.0 - ((a1 / CAST(n AS DOUBLE))
                                 * (b1 / CAST(n AS DOUBLE))
                                 + (1 - a1 / CAST(n AS DOUBLE))
                                   * (1 - b1 / CAST(n AS DOUBLE))))
             END) * 1000000.0 + 0.5) / 1000000.0 AS kappa
FROM agg
"""
