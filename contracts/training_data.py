"""Training-data extensions: dedup (exact/minhash/lsh/simhash), text quality, similarity search, multimodal, BPE, PCA, k-means quantizers."""

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
    _wide_1h,
)



# ----------------------------------------------- training-data extensions
def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ shifted-id copy: every text appears exactly twice."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100000))


_O_DOCS_DUPS = """
SELECT * FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars FROM documents
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on text, survivor = min doc_id."""
    from gordo_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs_with_dups(spark, sf_dir), ["text"])


O_DEDUP_EXACT = f"""
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM ({_O_DOCS_DUPS}) GROUP BY text
"""


def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (RefinedWeb practice) over the dup
    corpus, segmenting separator-free text into 12-word blocks; the
    shifted-id copy loses every paragraph and drops out entirely
    (operators/dedup.paragraph_dedup — paragraph text never crosses a
    shuffle; see docstring)."""
    from gordo_spark.operators.dedup import paragraph_dedup, word_blocks

    return paragraph_dedup(
        _docs_with_dups(spark, sf_dir), word_blocks(F.col("text"), 12)
    )


O_DEDUP_PARAGRAPH = f"""
WITH docs AS ({_O_DOCS_DUPS}),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM docs),
paras AS (
  SELECT doc_id,
         unnest(range(0, greatest(cast(ceil(len(words)/12.0) AS int), 1))) AS pos,
         words
  FROM w
),
p2 AS (
  SELECT doc_id, pos,
         array_to_string(words[pos*12+1 : pos*12+12], ' ') AS para
  FROM paras
),
ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
  FROM p2
),
np AS (SELECT doc_id, count(*) AS n FROM p2 GROUP BY doc_id)
SELECT k.doc_id, any_value(np.n) AS n_paras, count(*) AS n_kept,
       string_agg(k.para, ' ' ORDER BY k.pos) AS text_clean
FROM (SELECT * FROM ranked WHERE rn = 1) k JOIN np USING (doc_id)
GROUP BY k.doc_id
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    log p_target/p_raw per document, target = the English slice
    (operators/importance.dsir_logweights; ratio table hard-bounded at
    4096 buckets, so its broadcast is corpus-size-independent)."""
    from gordo_spark.operators.importance import dsir_logweights

    docs = read_table(spark, sf_dir, "documents")
    return dsir_logweights(docs, F.col("lang") == "en")


O_DSIR_WEIGHTS = """
WITH w AS (SELECT doc_id, lang = 'en' AS tgt, string_split(text,' ') AS ws FROM documents),
uni AS (SELECT doc_id, tgt, f FROM (SELECT doc_id, tgt, unnest(ws) AS f FROM w) WHERE f != ''),
bi AS (SELECT doc_id, tgt,
              unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS f
       FROM w WHERE len(ws) >= 2),
feats AS (
  SELECT doc_id, tgt, ('0x' || substr(md5(f),1,8))::BIGINT % 4096 AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
raw AS (SELECT b, count(*) AS cr, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        FROM feats GROUP BY b),
tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM raw),
ratio AS (SELECT b, ln((ct + 1.0)/(tt + 4096.0)) - ln((cr + 1.0)/(tr + 4096.0)) AS lr
          FROM raw, tot)
SELECT f.doc_id, count(*) AS n_feats, round(sum(lr), 6) AS log_weight
FROM feats f JOIN ratio USING (b) GROUP BY f.doc_id
"""


def q_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of the corpus token stream (operators/sketches.
    count_min_sketch): the full depth x width counter table, exactly
    reproducible by the oracle because the hash family is deterministic
    md5+LCG. depth*width longs of mergeable state at any corpus size."""
    from gordo_spark.operators.sketches import count_min_sketch

    toks = read_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    return count_min_sketch(toks, "w", width=256, depth=4)


def _cms_sql(width: int = 256, depth: int = 4, seed: int = 777) -> tuple[str, str]:
    """(cells CTE body, base expr) replicating count_min_sketch's md5+LCG
    hash family with the SAME inlined (a, b) constants."""
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    base = "(('0x' || substr(md5(w), 1, 8))::BIGINT)"
    rows = [
        f"SELECT {r} AS row, ((({a} * {base}) + {b}) % {MINHASH_P}) % {width} AS bucket, w FROM toks"
        for r, (a, b) in enumerate(_hash_params(depth, seed=seed))
    ]
    return "\nUNION ALL\n".join(rows), base


_CMS_CELLS, _ = _cms_sql()

O_CMS_SKETCH = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
cells AS ({_CMS_CELLS})
SELECT row, bucket, count(*) AS n FROM cells GROUP BY row, bucket
"""

CMS_QUERY_WORDS = ["join", "hash", "scan", "spark", "zzz_absent"]


def q_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point estimates from the Count-Min sketch for a fixed word list
    (incl. an absent word -> 0): never an undercount, overcount bounded
    by e*N/width. Query side is |values| x depth rows."""
    from gordo_spark.operators.sketches import cms_estimate, count_min_sketch

    toks = read_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    sk = count_min_sketch(toks, "w", width=256, depth=4)
    return cms_estimate(sk, CMS_QUERY_WORDS, width=256, depth=4)


_CMS_VALUES = ", ".join(f"'{w}'" for w in CMS_QUERY_WORDS)

O_CMS_EST = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
cells AS ({_CMS_CELLS}),
sketch AS (SELECT row, bucket, count(*) AS n FROM cells GROUP BY row, bucket),
q AS (SELECT unnest([{_CMS_VALUES}]) AS w),
qc AS ({_CMS_CELLS.replace('FROM toks', 'FROM q')})
SELECT qc.w AS value, min(coalesce(sketch.n, 0)) AS est_count
FROM qc LEFT JOIN sketch USING (row, bucket)
GROUP BY qc.w
"""


def q_lm_quality_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM score (Brants et al. 2007;
    operators/text.trigram_backoff_score): mean -log S(w|u v) with
    min_count=2 pruning, alpha=0.4 — the distributed-LM quality signal
    one realism step past the bigram score. All corpus-derived count
    tables join UNHINTED."""
    from gordo_spark.operators.text import trigram_backoff_score

    return trigram_backoff_score(read_table(spark, sf_dir, "documents"))


O_LM_TRIGRAM = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws FROM w),
s AS (SELECT doc_id, ws[i] AS w,
             CASE WHEN i >= 2 THEN ws[i-1] END AS p1,
             CASE WHEN i >= 3 THEN ws[i-2] END AS p2
      FROM pos),
tri AS (SELECT * FROM s WHERE p2 IS NOT NULL),
bi  AS (SELECT * FROM s WHERE p1 IS NOT NULL),
c3 AS (SELECT p2, p1, w, count(*) AS c3 FROM tri GROUP BY 1, 2, 3 HAVING count(*) >= 2),
h2 AS (SELECT p2, p1, count(*) AS n_h2 FROM tri GROUP BY 1, 2),
c2 AS (SELECT p1, w, count(*) AS c2 FROM bi GROUP BY 1, 2 HAVING count(*) >= 2),
h1 AS (SELECT p1, count(*) AS n_h1 FROM bi GROUP BY 1),
c1 AS (SELECT w, count(*) AS c1 FROM s GROUP BY 1),
n AS (SELECT count(*) AS n_tok FROM s),
sc AS (
  SELECT tri.doc_id,
         ln(coalesce(
              c3.c3 / h2.n_h2,
              0.4 * c2.c2 / h1.n_h1,
              0.4 * 0.4 * c1.c1 / n.n_tok)) AS logs
  FROM tri
  LEFT JOIN c3 USING (p2, p1, w)
  JOIN h2 USING (p2, p1)
  LEFT JOIN c2 USING (p1, w)
  JOIN h1 USING (p1)
  JOIN c1 USING (w)
  CROSS JOIN n
)
SELECT doc_id, round(-avg(logs), 6) AS mean_nll3 FROM sc GROUP BY doc_id
"""


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal (operators/dedup.
    strip_boilerplate): paragraphs appearing in >= 2 distinct docs are
    dropped from EVERY doc (no survivor). The planted head-copies'
    entire content is boilerplate (they come back empty); originals lose
    their first two 12-word blocks. Paragraph text never shuffles."""
    from gordo_spark.operators.dedup import strip_boilerplate, word_blocks

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    heads = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 24)).alias("text"),
    )
    corpus = docs.unionByName(heads)
    return strip_boilerplate(corpus, word_blocks(F.col("text"), 12), max_doc_freq=2)


O_STRIP_BOILER = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(string_split(text, ' ')[1:24], ' ') AS text
  FROM documents
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM docs),
paras AS (
  SELECT doc_id,
         unnest(range(0, greatest(cast(ceil(len(words)/12.0) AS int), 1))) AS pos,
         words
  FROM w
),
p2 AS (
  SELECT doc_id, pos,
         array_to_string(words[pos*12+1 : pos*12+12], ' ') AS para
  FROM paras
),
freq AS (SELECT md5(para) AS ph, count(DISTINCT doc_id) AS df FROM p2 GROUP BY 1),
kept AS (
  SELECT p2.doc_id, p2.pos, p2.para
  FROM p2 JOIN freq ON md5(p2.para) = freq.ph
  WHERE freq.df < 2
),
np AS (SELECT doc_id, count(*) AS n FROM p2 GROUP BY doc_id)
SELECT np.doc_id, any_value(np.n) AS n_paras,
       count(kept.pos) AS n_kept,
       coalesce(string_agg(kept.para, ' ' ORDER BY kept.pos), '') AS text_clean
FROM np LEFT JOIN kept USING (doc_id)
GROUP BY np.doc_id
"""


def q_salvage_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local paragraph salvage (operators/text.salvage_paragraphs):
    keep 12-word blocks with >= 5 words and alphabetic ratio >= 0.6,
    reassemble the doc — pure higher-order-function projection, ZERO
    exchanges (the no-shuffle complement of strip_boilerplate's
    corpus-frequency drop)."""
    from gordo_spark.operators.dedup import word_blocks
    from gordo_spark.operators.text import salvage_paragraphs

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return salvage_paragraphs(docs, word_blocks(F.col("text"), 12))


O_SALVAGE_PARAS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(cast(ceil(len(words)/12.0) AS int), 1)),
           i -> array_to_string(words[i*12+1 : i*12+12], ' ')
         ) AS paras
  FROM w
),
k AS (
  SELECT doc_id, paras,
         list_filter(paras, q ->
           len(string_split(q, ' ')) >= 5
           AND CASE WHEN length(q) > 0
                    THEN length(regexp_replace(q, '[^A-Za-z ]', '', 'g'))
                         * 1.0 / length(q) >= 0.6
                    ELSE FALSE END
         ) AS kept
  FROM p
)
SELECT doc_id,
       CAST(len(paras) AS INT) AS n_paras,
       CAST(len(kept) AS INT) AS n_kept,
       array_to_string(kept, ' ') AS text_clean
FROM k
"""


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (Jegou et al. 2011; operators/
    similarity.pq_train/pq_encode): codebooks trained on a bounded
    deterministic sample (faiss practice), corpus encoded to m codebook
    indices per vector — d doubles -> m small ints, the compression that
    keeps a billion-vector index in RAM. FIT is iterative (numpy-parity
    pinned in pytest); the ENCODE is deterministic given the codebooks,
    so the oracle embeds them as literal VALUES and restates the argmin
    in SQL (house rule: iterative fit rows-only, deterministic apply
    oracle-checked)."""
    from gordo_spark.operators.similarity import pq_encode, pq_train

    embs = read_table(spark, sf_dir, "embeddings")
    books = pq_train(embs, m=4, k=16, iters=8, sample_n=256)
    enc = pq_encode(embs, books)
    return enc.select(
        "vec_id", *[F.element_at("codes", s + 1).alias(f"c{s}") for s in range(4)]
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ search (ADC): per-query (m x k) lookup
    table, each Arrow batch scores its codes with m table lookups per
    row and emits a partial top-k — no decompression, batches*k*q
    shuffle bound. Exact numpy-ADC parity pinned in pytest; the oracle
    embeds the trained codebooks as literal VALUES and restates the
    encode + ADC arithmetic in SQL."""
    from gordo_spark.operators.similarity import pq_adc_topk, pq_encode, pq_train

    embs = read_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 10)
    books = pq_train(embs, m=4, k=16, iters=8, sample_n=256)
    return pq_adc_topk(pq_encode(embs, books), queries, books, k=5)


# ------------------------------------------------ PQ oracle generation
# Training (k-means) is iterative and stays out of SQL; but given FIXED
# codebooks, encode and ADC search are deterministic arithmetic — so the
# oracle materializes the numpy-trained codebooks as literal VALUES
# tables and restates the decode/distance math in ANSI SQL. The
# generator reads the same parquet, takes the same deterministic sample
# (first sample_n ids), and calls the SAME _lloyds_np the Spark operator
# uses, so codebooks match bit-for-bit; the only cross-engine arithmetic
# is the argmin/ADC sums, compared after 6dp rounding like every other
# float contract. The gate always compares at one sf; the generator
# follows via SPARK_GRAFT_ORACLE_SF_DIR (default sf0.01, the driver's).
def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _index_fingerprint(sf_dir: str, table: str = "embeddings") -> str:
    """Content fingerprint of a source table for trained-artifact
    staleness markers: a regenerated dataset under the SAME directory
    name must invalidate a cached index/tokenizer, so markers carry the
    source parquet's size + mtime alongside the layout version."""
    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    return f"{st.st_size}:{st.st_mtime_ns}"


# Trained BPE merge lists, memoized per (corpus fingerprint, n_merges):
# the tokenizer artifact is trained once and reused — exactly the
# production pattern — so q_bpe_merges and q_bpe_tokenize in one gate
# run share a single 8-iteration training instead of paying it twice.
_BPE_MERGE_CACHE: dict[tuple[str, int], list] = {}


def _trained_bpe_merges(spark: SparkSession, sf_dir: str, n_merges: int = 8):
    from gordo_spark.operators.bpe import bpe_train

    key = (_index_fingerprint(sf_dir, "documents"), n_merges)
    if key not in _BPE_MERGE_CACHE:
        _BPE_MERGE_CACHE[key] = bpe_train(
            read_table(spark, sf_dir, "documents"), n_merges=n_merges
        )
    return _BPE_MERGE_CACHE[key]


def _oracle_embeddings(sample_n: int) -> "np.ndarray":
    import pyarrow.parquet as papq

    t = papq.read_table(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t.column("vec_id"))
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return X[np.argsort(ids, kind="stable")][: int(sample_n)]


def _sql_vec(v) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


def _sql_codebooks(books) -> str:
    m, k, _ = books.shape
    rows = [
        f"({s}, {c}, {_sql_vec(books[s, c])})"
        for s in range(m)
        for c in range(k)
    ]
    return ",\n".join(rows)


_PQ_ENCODE_CTES = """
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
subs AS (SELECT unnest(range(0, {m})) AS s),
sub AS (
  SELECT vec_id, s, list_slice(e, s*{dsub}+1, s*{dsub}+{dsub}) AS sv
  FROM v, subs
),
code_scored AS (
  SELECT vec_id, sub.s, cb.c,
         row_number() OVER (
           PARTITION BY vec_id, sub.s
           ORDER BY list_dot_product(cb.ce, cb.ce)
                    - 2 * list_dot_product(sub.sv, cb.ce), cb.c
         ) AS r
  FROM sub JOIN cb ON sub.s = cb.s
),
codes AS (SELECT vec_id, s, c FROM code_scored WHERE r = 1)
"""


def _o_pq_codes(m: int = 4, k: int = 16, iters: int = 8, sample_n: int = 256) -> str:
    from gordo_spark.operators.similarity import _lloyds_np

    X = _oracle_embeddings(sample_n)
    dsub = X.shape[1] // m
    books = np.stack(
        [_lloyds_np(X[:, s * dsub : (s + 1) * dsub], k, iters) for s in range(m)]
    )
    ctes = _PQ_ENCODE_CTES.format(m=m, dsub=dsub)
    cols = ",\n       ".join(
        f"max(CASE WHEN s = {s} THEN c END) AS c{s}" for s in range(m)
    )
    return (
        f"WITH cb(s, c, ce) AS (VALUES\n{_sql_codebooks(books)}\n),"
        f"{ctes}\n"
        f"SELECT vec_id,\n       {cols}\nFROM codes GROUP BY vec_id"
    )


def _o_pq_search(
    m: int = 4,
    k: int = 16,
    iters: int = 8,
    sample_n: int = 256,
    topk: int = 5,
    n_queries: int = 10,
) -> str:
    from gordo_spark.operators.similarity import _lloyds_np

    X = _oracle_embeddings(sample_n)
    dsub = X.shape[1] // m
    books = np.stack(
        [_lloyds_np(X[:, s * dsub : (s + 1) * dsub], k, iters) for s in range(m)]
    )
    ctes = _PQ_ENCODE_CTES.format(m=m, dsub=dsub)
    return f"""WITH cb(s, c, ce) AS (VALUES
{_sql_codebooks(books)}
),{ctes},
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {n_queries}),
qsub AS (
  SELECT query_id, s, list_slice(qe, s*{dsub}+1, s*{dsub}+{dsub}) AS qs
  FROM q, subs
),
lut AS (
  SELECT query_id, qsub.s, cb.c,
         list_dot_product(qs, qs) - 2 * list_dot_product(qs, cb.ce)
           + list_dot_product(cb.ce, cb.ce) AS dd
  FROM qsub JOIN cb ON qsub.s = cb.s
),
dist AS (
  SELECT l.query_id, co.vec_id AS neighbor_id, sum(l.dd) AS adc
  FROM codes co JOIN lut l ON co.s = l.s AND co.c = l.c
  WHERE co.vec_id != l.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id
         ) AS rank
  FROM dist
)
SELECT query_id, neighbor_id, floor((adc) * 1000000.0 + 0.5) / 1000000.0 AS adc_dist, rank
FROM ranked WHERE rank <= {topk}"""


def _o_ivf_pq_search(
    n_cells: int = 8,
    m: int = 4,
    k: int = 16,
    iters: int = 8,
    sample_n: int = 4096,
    n_probe: int = 2,
    topk: int = 5,
    n_queries: int = 10,
) -> str:
    from gordo_spark.operators.similarity import _lloyds_np

    X = _oracle_embeddings(sample_n)
    d = X.shape[1]
    dsub = d // m
    C = _lloyds_np(X, n_cells, iters)
    cell_of = np.argmin(
        np.einsum("ij,ij->i", X, X)[:, None]
        - 2.0 * (X @ C.T)
        + np.einsum("ij,ij->i", C, C)[None, :],
        axis=1,
    )
    R = X - C[cell_of]
    books = np.stack(
        [_lloyds_np(R[:, s * dsub : (s + 1) * dsub], k, iters) for s in range(m)]
    )
    cents = ",\n".join(
        f"({c}, {_sql_vec(C[c])})" for c in range(len(C))
    )
    return f"""WITH cent(cell, cv) AS (VALUES
{cents}
),
cb(s, c, ce) AS (VALUES
{_sql_codebooks(books)}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
subs AS (SELECT unnest(range(0, {m})) AS s),
vcell AS (
  SELECT vec_id, e, cell FROM (
    SELECT vec_id, e, cent.cell,
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY list_dot_product(cent.cv, cent.cv)
                      - 2 * list_dot_product(e, cent.cv), cent.cell
           ) AS r
    FROM v, cent
  ) WHERE r = 1
),
res AS (
  SELECT vec_id, vcell.cell,
         list_transform(range(1, {d} + 1), i -> e[i] - cent.cv[i]) AS re
  FROM vcell JOIN cent ON vcell.cell = cent.cell
),
rsub AS (
  SELECT vec_id, cell, s, list_slice(re, s*{dsub}+1, s*{dsub}+{dsub}) AS sv
  FROM res, subs
),
code_scored AS (
  SELECT vec_id, cell, rsub.s, cb.c,
         row_number() OVER (
           PARTITION BY vec_id, rsub.s
           ORDER BY list_dot_product(cb.ce, cb.ce)
                    - 2 * list_dot_product(rsub.sv, cb.ce), cb.c
         ) AS r
  FROM rsub JOIN cb ON rsub.s = cb.s
),
codes AS (SELECT vec_id, cell, s, c FROM code_scored WHERE r = 1),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {n_queries}),
qprobe AS (
  SELECT query_id, cell, qr FROM (
    SELECT q.query_id, cent.cell,
           list_transform(range(1, {d} + 1), i -> q.qe[i] - cent.cv[i]) AS qr,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qe, q.qe)
                      - 2 * list_dot_product(q.qe, cent.cv)
                      + list_dot_product(cent.cv, cent.cv), cent.cell
           ) AS r
    FROM q, cent
  ) WHERE r <= {n_probe}
),
qrsub AS (
  SELECT query_id, cell, s, list_slice(qr, s*{dsub}+1, s*{dsub}+{dsub}) AS qs
  FROM qprobe, subs
),
lut AS (
  SELECT query_id, cell, qrsub.s, cb.c,
         list_dot_product(qs, qs) - 2 * list_dot_product(qs, cb.ce)
           + list_dot_product(cb.ce, cb.ce) AS dd
  FROM qrsub JOIN cb ON qrsub.s = cb.s
),
dist AS (
  SELECT l.query_id, co.vec_id AS neighbor_id, sum(l.dd) AS adc
  FROM codes co
  JOIN lut l ON co.cell = l.cell AND co.s = l.s AND co.c = l.c
  WHERE co.vec_id != l.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id
         ) AS rank
  FROM dist
)
SELECT query_id, neighbor_id, floor((adc) * 1000000.0 + 0.5) / 1000000.0 AS adc_dist, rank
FROM ranked WHERE rank <= {topk}"""


def q_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (operators/dedup.
    winnow_fingerprints — Schleimer et al. SIGMOD 2003 / MOSS): 5-gram
    hashes, window 4, min-per-window with rightmost tie-break; the
    substring-level copy-detection index."""
    from gordo_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        read_table(spark, sf_dir, "documents"), k=5, w=4
    )


O_WINNOW_FP = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i,
         ws
  FROM w
),
g2 AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8))::BIGINT AS h
  FROM g
),
packed AS (
  SELECT doc_id, pos,
         h * 4194304 + (4194303 - least(pos, 4194303)) AS p
  FROM g2
),
sel AS (
  SELECT DISTINCT doc_id,
         min(p) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
         ) AS s
  FROM packed
)
SELECT doc_id,
       4194303 - (s % 4194304) AS pos,
       s // 4194304 AS fp
FROM sel
"""


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match step (operators/dedup.winnow_copy_pairs): document
    pairs sharing >= 3 winnowed fingerprints over the dup corpus —
    substring-level copy candidates; every shifted-id copy must pair
    with its original. max_df=60 is the stop-fingerprint cut that caps
    the inverted-index fan-out."""
    from gordo_spark.operators.dedup import winnow_copy_pairs

    return winnow_copy_pairs(
        _docs_with_dups(spark, sf_dir), k=5, w=4, min_shared=3, max_df=60
    )


O_WINNOW_PAIRS = f"""
WITH docs AS ({_O_DOCS_DUPS}),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs),
g AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i,
         ws
  FROM w
),
g2 AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8))::BIGINT AS h
  FROM g
),
packed AS (
  SELECT doc_id, pos,
         h * 4194304 + (4194303 - least(pos, 4194303)) AS p
  FROM g2
),
sel AS (
  SELECT DISTINCT doc_id,
         min(p) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
         ) AS s
  FROM packed
),
fps AS (SELECT DISTINCT doc_id, s // 4194304 AS fp FROM sel),
keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 60),
pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep USING (fp))
SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_shared
FROM pruned l JOIN pruned r ON l.fp = r.fp AND l.doc_id < r.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
"""


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screen decontamination (operators/dedup.decontaminate_bloom):
    every 50th doc plays the benchmark, filter size 2^16 bits x 4 md5-LCG
    hashes; per corpus doc the might-be-benchmark shingle fraction. Fully
    deterministic — the oracle computes the identical bit set, so even
    the (reproducible) false positives hash-match."""
    from gordo_spark.operators.dedup import decontaminate_bloom

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate_bloom(corpus, bench, bits=1 << 16, k_hashes=4)


def _bloom_sql(bits: int, k_hashes: int) -> str:
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    params = _hash_params(k_hashes, seed=777)
    pos = ", ".join(f"({a} * sh + {b}) % {MINHASH_P} % {bits}" for a, b in params)
    return f"""
WITH shingled AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
         )) AS shingle
  FROM documents
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS sh
  FROM shingled
),
posed AS (
  SELECT doc_id, sh, list_distinct([{pos}]) AS parr FROM hashed
),
bench_bits AS (
  SELECT DISTINCT unnest(parr) AS bit FROM posed WHERE doc_id % 50 = 0
),
corpus AS (
  SELECT doc_id, sh, any_value(parr) AS parr, count(*) AS c
  FROM posed WHERE doc_id % 50 <> 0 GROUP BY doc_id, sh
),
probed AS (
  SELECT doc_id, sh, c, len(parr) AS np, unnest(parr) AS bit FROM corpus
),
flagged AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_flagged FROM (
    SELECT p.doc_id, p.sh, any_value(p.c) AS c, any_value(p.np) AS np,
           count(*) AS hits
    FROM probed p JOIN bench_bits b USING (bit)
    GROUP BY p.doc_id, p.sh
    HAVING count(*) = any_value(p.np)
  ) GROUP BY doc_id
),
totals AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams FROM corpus GROUP BY doc_id)
SELECT t.doc_id, t.n_grams,
       COALESCE(f.n_flagged, 0) AS n_flagged,
       floor((COALESCE(f.n_flagged, 0) * 1.0 / t.n_grams) * 1000000.0 + 0.5) / 1000000.0 AS flagged_frac
FROM totals t LEFT JOIN flagged f USING (doc_id)
"""


O_DECONTAMINATE_BLOOM = _bloom_sql(1 << 16, 4)


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-integrity manifest per source shard (operators/sampling.
    shard_manifest): row/byte counts, id range, order-insensitive
    md5-sum checksum — what a 100 TB export publishes next to the data
    so consumers can verify with one aggregation."""
    from gordo_spark.operators.sampling import shard_manifest

    return shard_manifest(
        read_table(spark, sf_dir, "documents"), "source", "doc_id"
    )


O_SHARD_MANIFEST = """
SELECT source,
       count(*) AS n_rows,
       CAST(sum(length(text)) AS BIGINT) AS n_bytes,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       CAST(sum(('0x' || substr(md5(cast(doc_id AS varchar) || chr(31) || text), 1, 8))::BIGINT) AS BIGINT) AS checksum
FROM documents GROUP BY source
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-landed incremental dedup (operators/dedup.
    incremental_dedup): the new batch = an all-duplicate shifted copy
    (every row must drop: content already landed) union a 'v2' edit
    included TWICE (one survivor each, n_dups=2). Only md5 keys cross
    either exchange; the anti-join is unhinted (landed side is
    corpus-sized)."""
    from gordo_spark.operators.dedup import incremental_dedup

    docs = read_table(spark, sf_dir, "documents")
    v2 = docs.withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    new = (
        docs.withColumn("doc_id", F.col("doc_id") + 100000)
        .unionByName(v2.withColumn("doc_id", F.col("doc_id") + 200000))
        .unionByName(v2.withColumn("doc_id", F.col("doc_id") + 300000))
    )
    out = incremental_dedup(new, docs, ["text"])
    return out.select("doc_id", "source", "n_dups")


O_DEDUP_INCREMENTAL = """
WITH newb AS (
  SELECT doc_id + 100000 AS doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || ' v2' AS text, source FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, text || ' v2' AS text, source FROM documents
),
surv AS (
  SELECT md5(text) AS k, min(doc_id) AS doc_id, count(*) AS n_dups
  FROM newb GROUP BY 1
),
fresh AS (
  SELECT s.doc_id, s.n_dups
  FROM surv s LEFT JOIN (SELECT DISTINCT md5(text) AS k FROM documents) seen
    ON s.k = seen.k
  WHERE seen.k IS NULL
)
SELECT f.doc_id, n.source, f.n_dups
FROM fresh f JOIN newb n USING (doc_id)
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (alpha=0.7, 60% token budget):
    per-source keep rate from n_s^alpha weights, deterministic md5-bucket
    sampling, per-source achieved counts
    (operators/sampling.mixture_weights / mixture_sample)."""
    from gordo_spark.operators.sampling import mixture_sample, mixture_weights

    docs = read_table(spark, sf_dir, "documents")
    rates = mixture_weights(docs, "source", alpha=0.7, budget_frac=0.6)
    got = (
        mixture_sample(docs, "source", "doc_id", rates=rates)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return rates.join(got, "source", "left").select(
        "source",
        "n_docs",
        qround("rate", 6).alias("rate"),
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


O_MIXTURE_SAMPLE = """
WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT sum(n_docs) AS n, sum(pow(n_docs, 0.7)) AS z FROM counts),
rates AS (
  SELECT source, n_docs,
         least(1.0, 0.6 * n * pow(n_docs, 0.7) / z / n_docs) AS rate
  FROM counts, tot
),
sampled AS (
  SELECT d.source
  FROM documents d JOIN rates r USING (source)
  WHERE ('0x' || substr(md5(cast(d.doc_id AS varchar)), 1, 8))::BIGINT % 10000
        < cast(floor(r.rate * 10000) AS int)
)
SELECT r.source, r.n_docs, round(r.rate, 6) AS rate,
       (SELECT count(*) FROM sampled s WHERE s.source = r.source) AS n_sampled
FROM rates r
"""


def _minhash_sql(num_hashes: int = 8) -> str:
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    params = _hash_params(num_hashes)
    mins = ",\n       ".join(
        f"min(({a}*sh + {b}) % {MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(params)
    )
    return f"""
WITH shingled AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
         )) AS shingle
  FROM documents
),
hashed AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS sh
  FROM shingled
)
SELECT doc_id,
       {mins}
FROM hashed GROUP BY doc_id
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 perms, word-3-gram shingles, md5-based hashes)."""
    from gordo_spark.operators.dedup import minhash_signatures

    docs = read_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, num_hashes=8)


O_DEDUP_MINHASH = _minhash_sql(8)


def q_dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (8 perms, 4 bands) over the dup corpus."""
    from gordo_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(_docs_with_dups(spark, sf_dir), num_hashes=8)
    return lsh_candidate_pairs(sigs, num_hashes=8, bands=4)


def _lsh_pairs_sql(corpus_sql: str | None = None) -> str:
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    params = _hash_params(8)
    mins = ",\n       ".join(
        f"min(({a}*sh + {b}) % {MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(params)
    )
    return f"""
WITH corpus AS ({corpus_sql or _O_DOCS_DUPS}),
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
)
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM banded l JOIN banded r
  ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
"""


O_DEDUP_LSH = _lsh_pairs_sql()


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs >= 0.5 over the dup corpus (inverted
    index join, no cross product)."""
    from gordo_spark.operators.dedup import shingle_jaccard_pairs

    out = shingle_jaccard_pairs(_docs_with_dups(spark, sf_dir), threshold=0.5)
    return _r6(out, "jaccard")


O_DEDUP_JACCARD = f"""
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
sizes AS (SELECT doc_id, count(*) AS sz FROM hashed GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS inter
  FROM hashed l JOIN hashed r ON l.sh = r.sh AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       floor((inter * 1.0 / (sa.sz + sb.sz - inter)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints."""
    from gordo_spark.operators.dedup import simhash

    return simhash(read_table(spark, sf_dir, "documents"), bits=16)


def _simhash_sql(bits: int = 16) -> str:
    votes = ",\n       ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
),
votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
)
SELECT doc_id, {fp} AS simhash FROM votes
"""


O_DEDUP_SIMHASH = _simhash_sql(16)


def q_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs >= 0.45 over the corpus union an
    exact shifted-id copy (copies pair at cosine 1.0; the top natural pairs
    land in [0.45, 1))."""
    from gordo_spark.operators.similarity import cosine_neardup_pairs

    embs = read_table(spark, sf_dir, "embeddings")
    dup = embs.unionByName(embs.withColumn("vec_id", F.col("vec_id") + 100000))
    return _r6(cosine_neardup_pairs(dup, threshold=0.45), "cosine_sim")


O_DEDUP_EMBED = """
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
)
SELECT id_a, id_b, floor((sim) * 1000000.0 + 0.5) / 1000000.0 AS cosine_sim
FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS sim
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
WHERE sim >= 0.45
"""


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semdedup): 8-cell coarse
    quantizer, within-cell cosine >= 0.9 to an earlier id marks a
    semantic duplicate. Corpus = embeddings union a shifted-id copy, so
    every copy (cosine exactly 1.0 to its original, same cell) must be
    pruned; the oracle states the keep rule as one within-cell
    self-join EXISTS."""
    from gordo_spark.operators.similarity import semdedup

    embs = read_table(spark, sf_dir, "embeddings")
    dup = embs.unionByName(embs.withColumn("vec_id", F.col("vec_id") + 100000))
    return semdedup(dup, threshold=0.9, n_cells=8)


O_SEMDEDUP = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
cents AS (SELECT vec_id AS cell, e AS ce FROM v ORDER BY vec_id LIMIT 8),
assign_scored AS (
  SELECT v.vec_id AS neighbor_id, v.e AS nv, cents.cell,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_dot_product(v.e, cents.ce)
                    / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(cents.ce, cents.ce))) DESC,
                    cents.cell
         ) AS r
  FROM v, cents
),
assigned AS (SELECT neighbor_id, nv, cell FROM assign_scored WHERE r = 1),
dups AS (
  SELECT b.neighbor_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.neighbor_id < b.neighbor_id
   AND list_dot_product(a.nv, b.nv)
         / (sqrt(list_dot_product(a.nv, a.nv)) * sqrt(list_dot_product(b.nv, b.nv))) >= 0.9
  GROUP BY b.neighbor_id
)
SELECT a.neighbor_id AS vec_id, a.cell, d.neighbor_id IS NULL AS keep
FROM assigned a LEFT JOIN dups d ON a.neighbor_id = d.neighbor_id
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN tuning harness (operators/similarity.recall_at_k): recall@5 of
    the 8-cell/2-probe IVF search against exact brute-force top-5 for the
    first 10 query vectors — the metric that picks n_probe before an
    index layout is committed."""
    from gordo_spark.operators.similarity import cosine_topk, ivf_topk, recall_at_k

    embs = read_table(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id") < 10)
    approx = ivf_topk(embs, q, k=5, n_cells=8, n_probe=2)
    exact = cosine_topk(embs, q, k=5)
    return recall_at_k(approx, exact, k=5)


O_ANN_RECALL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS ce FROM v ORDER BY vec_id LIMIT 8),
assign_scored AS (
  SELECT v.vec_id AS neighbor_id, v.e AS nv, cents.cell,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_dot_product(v.e, cents.ce)
                    / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(cents.ce, cents.ce))) DESC,
                    cents.cell
         ) AS r
  FROM v, cents
),
assigned AS (SELECT neighbor_id, nv, cell FROM assign_scored WHERE r = 1),
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 10),
probe_scored AS (
  SELECT q.query_id, q.qv, cents.cell,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.qv, cents.ce)
                    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cents.ce, cents.ce))) DESC,
                    cents.cell
         ) AS r
  FROM q, cents
),
probes AS (SELECT query_id, qv, cell FROM probe_scored WHERE r <= 2),
ivf_scored AS (
  SELECT p.query_id, a.neighbor_id,
         list_dot_product(p.qv, a.nv)
           / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.nv, a.nv))) AS sim
  FROM assigned a JOIN probes p ON a.cell = p.cell
  WHERE a.neighbor_id != p.query_id
),
ivf_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM ivf_scored
  ) WHERE rank <= 5
),
brute_scored AS (
  SELECT q.query_id, v2.vec_id AS neighbor_id,
         list_dot_product(q.qv, v2.e)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v2.e, v2.e))) AS sim
  FROM v v2, q WHERE v2.vec_id != q.query_id
),
brute_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM brute_scored
  ) WHERE rank <= 5
),
hits AS (
  SELECT b.query_id, count(*) AS n_hit
  FROM brute_top b JOIN ivf_top i
    ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
  GROUP BY b.query_id
)
SELECT q.query_id,
       COALESCE(h.n_hit, 0) AS n_hit,
       floor((COALESCE(h.n_hit, 0) / least(5.0, q.n_truth)) * 1000000.0 + 0.5) / 1000000.0 AS recall
FROM (SELECT query_id, count(*) AS n_truth FROM brute_top GROUP BY 1) q
LEFT JOIN hits h USING (query_id)
"""


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact PCA whitening prep
    (operators/similarity.pca_fit_exact / pca_transform_exact): exact
    scaled-integer mean/covariance statistics, then fixed-24-step power
    iteration with deflation in portable scalar arithmetic (left folds,
    correctly-rounded sqrt/divide, 1e-9-grid requantization, first-
    nonzero-positive sign pin) — bit-identical on any engine, unrolled
    into the DuckDB oracle. On the near-isotropic test corpus the fixed-
    step basis captures 99.7% of eigh's top-4 variance (pinned in
    pytest); the eigh path (pca_fit) remains the exact-solver option
    and keeps its full-matrix numpy parity test."""
    from gordo_spark.operators.similarity import (
        pca_fit_exact,
        pca_transform_exact,
    )

    embs = read_table(spark, sf_dir, "embeddings")
    mean, comps = pca_fit_exact(embs, k=4, iters=24)
    out = pca_transform_exact(embs, mean, comps)
    return out.select(
        "vec_id",
        *[qround(f"pc{i + 1}", 4).alias(f"pc{i + 1}") for i in range(4)],
    )


def _o_embedding_pca(k: int = 4, iters: int = 24, dim: int = 64) -> str:
    """CTE-unrolled mirror of pca_fit_exact + pca_transform_exact: exact
    HUGEINT mean/cov sums, then per component ``iters`` matvec/normalize
    steps (left folds via list_reduce with a prepended 0.0 — the same
    IEEE add sequence as the Python driver loop), sign pin, Rayleigh
    quotient, deflation; projection is the same left-fold dot."""
    fold = lambda arr: (  # noqa: E731 - local SQL snippet builder
        f"list_reduce(list_prepend(0.0, {arr}), (acc, x2) -> acc + x2)"
    )
    matvec = (
        "list_transform(C, row -> "
        + fold(f"list_transform(generate_series(1, {dim}), d -> row[d] * v[d])")
        + ")"
    )
    q9 = lambda e: f"floor(({e}) * 1000000000.0 + 0.5) / 1000000000.0"  # noqa: E731
    v0 = "0.125" if dim == 64 else q9(f"1.0 / sqrt({float(dim)!r})")
    parts = [
        f"""
WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
nn AS MATERIALIZED (SELECT count(*) AS n FROM v),
md AS MATERIALIZED (
  SELECT dim,
         CAST(sum(CAST(floor(x * 1000000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
           AS s
  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS dim FROM v)
  GROUP BY dim
),
mm AS MATERIALIZED (
  SELECT list({q9("(s / 1000000000.0) / n")} ORDER BY dim) AS m
  FROM md, nn
),
cd AS MATERIALIZED (
  SELECT vec_id,
         list_transform(generate_series(1, {dim}), d -> e[d] - m[d]) AS ce
  FROM v, mm
),
pr AS MATERIALIZED (
  SELECT a.i, b.j
  FROM (SELECT unnest(generate_series(1, {dim})) AS i) a,
       (SELECT unnest(generate_series(1, {dim})) AS j) b
  WHERE b.j >= a.i
),
cvt AS MATERIALIZED (
  SELECT pr.i, pr.j,
         CAST(sum(CAST(floor((ce[pr.i] * ce[pr.j]) * 1000000000.0 + 0.5)
                       AS HUGEINT)) AS DOUBLE) AS s
  FROM cd, pr GROUP BY 1, 2
),
cfull AS MATERIALIZED (
  SELECT i, j, {q9("(s / 1000000000.0) / (n - 1)")} AS val FROM cvt, nn
  UNION ALL
  SELECT j AS i, i AS j, {q9("(s / 1000000000.0) / (n - 1)")} AS val
  FROM cvt, nn WHERE i != j
),
cm1 AS MATERIALIZED (
  SELECT list(row ORDER BY i) AS C FROM (
    SELECT i, list(val ORDER BY j) AS row FROM cfull GROUP BY i)
)"""
    ]
    for c in range(1, k + 1):
        parts.append(
            f""",
p{c}_0 AS MATERIALIZED (SELECT list_transform(generate_series(1, {dim}), d -> {v0}) AS v)"""
        )
        for t in range(1, iters + 1):
            parts.append(
                f""",
p{c}_{t} AS MATERIALIZED (
  SELECT list_transform(u, x -> {q9("x / nrm")}) AS v
  FROM (
    SELECT u, sqrt({fold("list_transform(u, x -> x * x)")}) AS nrm
    FROM (SELECT {matvec} AS u FROM cm{c}, p{c}_{t - 1}))
)"""
            )
        parts.append(
            f""",
s{c} AS MATERIALIZED (
  SELECT CASE
    WHEN v[list_filter(generate_series(1, {dim}), d -> v[d] != 0.0)[1]] < 0
    THEN list_transform(v, x -> -1.0 * x) ELSE v END AS v
  FROM p{c}_{iters}
),
l{c} AS MATERIALIZED (
  SELECT {q9(fold(f"list_transform(generate_series(1, {dim}), i -> v[i] * cv[i])"))}
           AS lam, v
  FROM (SELECT v, {matvec} AS cv FROM cm{c}, s{c})
),
cm{c + 1} AS MATERIALIZED (
  SELECT list_transform(generate_series(1, {dim}), i ->
           list_transform(generate_series(1, {dim}), j ->
             {q9("C[i][j] - lam * v[i] * v[j]")})) AS C
  FROM cm{c}, l{c}
)"""
        )
    pcs = ",\n       ".join(
        f"floor(({fold(f'list_transform(generate_series(1, {dim}), d -> ce[d] * s{c}.v[d])')}) * 10000.0 + 0.5) / 10000.0 AS pc{c}"
        for c in range(1, k + 1)
    )
    joins = ", ".join(f"s{c}" for c in range(1, k + 1))
    parts.append(
        f"""
SELECT vec_id,
       {pcs}
FROM cd, {joins}"""
    )
    return "".join(parts)


O_EMBEDDING_PCA = _o_embedding_pca()


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.hard_negatives): top-3
    most-similar DIFFERENT-label vectors for the first 10 queries —
    per-label corpus complement keeps the batch-local partial top-k
    exact."""
    from gordo_spark.operators.similarity import hard_negatives

    embs = read_table(spark, sf_dir, "embeddings")
    out = hard_negatives(embs, k=3, queries=embs.filter(F.col("vec_id") < 10))
    return _r6(out, "cosine_sim")


O_HARD_NEGATIVES = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS ql, e AS qv FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_dot_product(q.qv, v.e)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(v.e, v.e))) AS sim
  FROM v, q
  WHERE v.vec_id != q.query_id AND v.label <> q.ql
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, floor((sim) * 1000000.0 + 0.5) / 1000000.0 AS cosine_sim, rank
FROM ranked WHERE rank <= 3
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over the token stream with the exact
    VERIFICATION pass (operators/sketches.heavy_hitters verified=True):
    constant sketch state per partition, mergeable partials, then an
    exact broadcast-recount of the bounded candidate set and a
    (count desc, value asc) total-order cut — deterministic and equal
    to the global exact top-20 because every term above n/(cand+1) is
    a guaranteed candidate. Raw-estimate mode stays pytest-bounded."""
    from gordo_spark.operators.sketches import heavy_hitters

    toks = read_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return heavy_hitters(toks, "term", k=20, verified=True)


O_HEAVY_HITTERS = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS value FROM documents
)
SELECT value, CAST(count(*) AS BIGINT) AS exact_count
FROM toks GROUP BY value
ORDER BY exact_count DESC, value ASC LIMIT 20
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges trained on the corpus (operators/bpe.bpe_train
    — Sennrich 2016): distributed word count once, then vocab-sized
    merge iterations with the (pair_freq desc, left asc, right asc)
    total-order tie rule. All-integer arithmetic end to end, so the
    8-block CTE-unrolled DuckDB oracle (pair count -> argmax -> greedy
    non-overlapping list merge per word) hash-matches exactly; the
    pure-Python Sennrich reference stays pinned word-for-word in
    pytest."""
    merges = _trained_bpe_merges(spark, sf_dir, n_merges=8)
    return spark.createDataFrame(
        [(i + 1, a, b, f) for i, (a, b, f) in enumerate(merges)],
        schema="rank int, left string, right string, pair_freq long",
    )


def _o_bpe_merges(n_merges: int = 8) -> str:
    """CTE-unrolled mirror of bpe_train: v{t} is the (word, freq,
    symbols) table after t merges, b{t} the t-th argmax pair, and the
    greedy left-to-right non-overlapping apply is pure list index math
    (a position merges iff it matches and its offset inside its run of
    consecutive matches is even)."""
    parts = [
        """
WITH w AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word != '' GROUP BY word
),
v0 AS (
  SELECT word, freq,
         list_append(string_split(word, ''), '</w>') AS symbols
  FROM w
)"""
    ]
    for t in range(n_merges):
        parts.append(
            f""",
p{t} AS (
  SELECT s[i] AS a, s[i + 1] AS b, sum(freq) AS pf
  FROM (SELECT freq, symbols AS s,
               unnest(generate_series(1, len(symbols) - 1)) AS i
        FROM v{t} WHERE len(symbols) >= 2)
  GROUP BY 1, 2
),
b{t} AS (SELECT a, b, pf FROM p{t} ORDER BY pf DESC, a ASC, b ASC LIMIT 1),
v{t + 1} AS (
  SELECT word, freq,
    list_filter(
      list_transform(generate_series(1, len(s)), i ->
        CASE WHEN sel[i] THEN s[i] || s[i + 1]
             WHEN i > 1 AND sel[i - 1] THEN NULL
             ELSE s[i] END),
      x -> x IS NOT NULL) AS symbols
  FROM (
    SELECT word, freq, s,
      list_transform(generate_series(1, len(s)), i ->
        m[i] AND ((i - coalesce(lz[i], 0) - 1) % 2 = 0)) AS sel
    FROM (
      SELECT word, freq, s, m,
        list_transform(generate_series(1, len(s)), i ->
          list_max(list_filter(generate_series(1, i), j -> NOT m[j])))
          AS lz
      FROM (
        SELECT word, freq, symbols AS s,
          list_transform(generate_series(1, len(symbols)), i ->
            i < len(symbols) AND symbols[i] = bb.a
            AND symbols[i + 1] = bb.b) AS m
        FROM v{t}, b{t} bb)))
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({t + 1} AS INTEGER) AS rank, a AS \"left\","
        f" b AS \"right\", CAST(pf AS BIGINT) AS pair_freq FROM b{t}"
        for t in range(n_merges)
    )
    parts.append("\n" + union + "\nORDER BY rank")
    return "".join(parts)


O_BPE_MERGES = _o_bpe_merges()


def q_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter, engine-exact fit
    (ml/logreg.LogisticModel.fit_gd_exact): fixed-6-iteration full-batch
    gradient descent over cheap text features (n_chars, word count,
    distinct-word ratio) with label = English slice — quantized per-row
    probabilities, exact scaled-integer gradient sums, 1e-9-grid weight
    updates — then a row-local sigmoid score. The whole training loop
    unrolls into the DuckDB oracle (one scalar CTE pair per iteration);
    the statistical IRLS path (.fit) stays pinned against a pure-numpy
    IRLS at 1e-8 in pytest."""
    from gordo_spark.ml.logreg import LogisticModel

    docs = read_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    feats = docs.select(
        "doc_id",
        (F.col("n_chars") / 100.0).alias("f_chars"),
        (F.size(words) / 100.0).alias("f_words"),
        (F.size(F.array_distinct(words)) / F.size(words)).alias("f_uniq"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    model = LogisticModel(["f_chars", "f_words", "f_uniq"], "label")
    model.fit_gd_exact(feats, lr=0.05, gd_iters=6)
    return model.score(feats).select(
        "doc_id",
        qround("score", 4).alias("score"),
        (F.col("score") >= 0.5).alias("pred"),
    )


def _o_quality_logreg(lr: float = 0.05, gd_iters: int = 6) -> str:
    """CTE-unrolled mirror of fit_gd_exact: per iteration one quantized-
    probability projection + exact HUGEINT gradient sums (g{t}) and one
    1e-9-grid weight update (w{t+1}); identical op sequence per term."""

    def z(wt: str) -> str:
        return (
            f"((({wt}.w0 + {wt}.w1 * x1) + {wt}.w2 * x2) + {wt}.w3 * x3)"
        )

    def p(wt: str) -> str:
        return (
            f"floor((1.0 / (1.0 + exp(-{z(wt)}))) * 1000000.0 + 0.5)"
            f" / 1000000.0"
        )

    xs = ["1.0", "x1", "x2", "x3"]
    parts = [
        """
WITH f AS (
  SELECT doc_id,
         n_chars / 100.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2,
         len(list_distinct(string_split(text, ' ')))
           / len(string_split(text, ' ')) AS x3,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
),
w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    ]
    for t in range(gd_iters):
        gsums = ",\n         ".join(
            f"CAST(sum(CAST(floor(((y - p) * {xs[i]}) * 1000000000000.0"
            f" + 0.5) AS HUGEINT)) AS DOUBLE) AS g{i}"
            for i in range(4)
        )
        wups = ",\n         ".join(
            f"floor((w{t}.w{i} + {lr!r} * ((g{i} / 1000000000000.0) / n))"
            f" * 1000000000.0 + 0.5) / 1000000000.0 AS w{i}"
            for i in range(4)
        )
        parts.append(
            f""",
g{t} AS (
  SELECT {gsums},
         count(*) AS n
  FROM (SELECT f.*, {p(f"w{t}")} AS p FROM f, w{t})
),
w{t + 1} AS (
  SELECT {wups}
  FROM g{t}, w{t}
)"""
        )
    parts.append(
        f"""
SELECT doc_id,
       floor((1.0 / (1.0 + exp(-{z(f"w{gd_iters}")}))) * 10000.0 + 0.5)
         / 10000.0 AS score,
       (1.0 / (1.0 + exp(-{z(f"w{gd_iters}")}))) >= 0.5 AS pred
FROM f, w{gd_iters}"""
    )
    return "".join(parts)


O_QUALITY_LOGREG = _o_quality_logreg()


def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (8 cells seeded from the first 8 vectors, 2 probes)
    for the first 10 query vectors."""
    from gordo_spark.operators.similarity import ivf_topk

    embs = read_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        embs, embs.filter(F.col("vec_id") < 10), k=5, n_cells=8, n_probe=2
    )
    return _r6(out, "cosine_sim")


O_SIM_IVF = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS ce FROM v ORDER BY vec_id LIMIT 8),
assign_scored AS (
  SELECT v.vec_id AS neighbor_id, v.e AS nv, cents.cell,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_dot_product(v.e, cents.ce)
                    / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(cents.ce, cents.ce))) DESC,
                    cents.cell
         ) AS r
  FROM v, cents
),
assigned AS (SELECT neighbor_id, nv, cell FROM assign_scored WHERE r = 1),
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 10),
probe_scored AS (
  SELECT q.query_id, q.qv, cents.cell,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.qv, cents.ce)
                    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cents.ce, cents.ce))) DESC,
                    cents.cell
         ) AS r
  FROM q, cents
),
probes AS (SELECT query_id, qv, cell FROM probe_scored WHERE r <= 2),
scored AS (
  SELECT p.query_id, a.neighbor_id,
         list_dot_product(p.qv, a.nv)
           / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.nv, a.nv))) AS sim
  FROM assigned a JOIN probes p ON a.cell = p.cell
  WHERE a.neighbor_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, floor((sim) * 1000000.0 + 0.5) / 1000000.0 AS cosine_sim, rank
FROM ranked WHERE rank <= 5
"""


def q_sim_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned ANN over the MATERIALIZED IVF index
    (operators/similarity.ivf_write / ivf_probe): the corpus is written
    PARTITIONED BY cell with centroids alongside, then each query's probe
    carries ``cell IN (...)`` which lands as a PartitionFilter — only the
    probed cell directories are ever read. Same quantizer and parameters
    as sim_ivf, so results (and the oracle) are identical; the index is
    written once per sf and reused (immutable testdata)."""
    import os
    import tempfile

    from gordo_spark.operators.similarity import ivf_probe, ivf_write

    embs = read_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"gordo_spark_ivf_{tag}")
    marker = os.path.join(path, "_done")
    # layout version + source-content fingerprint (stale-index guard)
    version = "ivf-v1 cells=8 fp=" + _index_fingerprint(sf_dir)
    stale = True
    if os.path.exists(marker):
        with open(marker) as fh:
            stale = fh.read().strip() != version
    if stale:
        ivf_write(embs, path, n_cells=8)
        with open(marker, "w") as fh:
            fh.write(version + "\n")
    out = ivf_probe(
        spark, path, embs.filter(F.col("vec_id") < 10), k=5, n_probe=2
    )
    return _r6(out, "cosine_sim")


def q_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/similarity.ivf_pq_write / ivf_pq_probe —
    the faiss IVFPQ shape): residual-PQ codes written PARTITIONED BY
    cell, probe = cell PartitionFilter + per-(query, cell) ADC lookup
    tables — n_probe/n_cells of the directories read, m small ints per
    vector instead of d doubles. FIT (quantizer + codebook k-means) is
    iterative and numpy-parity-pinned in pytest; APPLY (encode + ADC) is
    deterministic given the codebooks, so the oracle embeds the trained
    tensors as literal VALUES and restates the arithmetic in SQL."""
    import os
    import tempfile

    from gordo_spark.operators.similarity import ivf_pq_probe, ivf_pq_write

    embs = read_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"gordo_spark_ivfpq_{tag}")
    marker = os.path.join(path, "_done")
    # layout version + source-content fingerprint: regenerating the data
    # under the same dir name must not reuse a stale index
    version = (
        "ivfpq-v2 lloyd cells=8 m=4 k=16 fp=" + _index_fingerprint(sf_dir)
    )
    stale = True
    if os.path.exists(marker):
        with open(marker) as fh:
            stale = fh.read().strip() != version
    if stale:
        ivf_pq_write(embs, path, n_cells=8, m=4, k=16, iters=8, sample_n=4096)
        with open(marker, "w") as fh:
            fh.write(version + "\n")
    return ivf_pq_probe(
        spark, path, embs.filter(F.col("vec_id") < 10), kq=5, n_probe=2
    )


def q_o11_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period analytics (the dashboard lag shape Spark gives
    for free): monthly revenue per nation with month-over-month growth —
    an unhinted customer join (customer is sf-proportional, NOT a dim;
    the planner broadcasts it only while it fits), one broadcast nation
    dim join, one (nation, month) aggregate, one lag window PARTITIONED
    by nation (bounded by months per nation)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(qround(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "n_name",
        "month",
        "revenue",
        qround(
            F.when(prev != 0, (F.col("revenue") - prev) / prev), 6
        ).alias("mom_growth"),
    )


O_O11_GROWTH = """
WITH monthly AS (
  SELECT n_name,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, month, revenue,
       floor((CASE WHEN lag(revenue) OVER w != 0
              THEN (revenue - lag(revenue) OVER w) / lag(revenue) OVER w
         END) * 1000000.0 + 0.5) / 1000000.0 AS mom_growth
FROM monthly
WINDOW w AS (PARTITION BY n_name ORDER BY month)
"""


def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite (operators/quality_checks — the
    deequ-style ingest/export gate): all row-local checks fold into ONE
    aggregation over one scan; uniqueness adds one map-side-combined
    groupBy; referential integrity one anti-join. Summary counts only —
    a violation LIST is itself a dataset at 100 TB."""
    from gordo_spark.operators.quality_checks import check_constraints

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    return check_constraints(
        li,
        [
            {"check": "not_null", "col": "l_shipdate"},
            {"check": "in_range", "col": "l_quantity", "min": 1, "max": 30},
            {"check": "in_set", "col": "l_returnflag", "values": ["A", "N"]},
            {"check": "expression", "name": "discount<=0.1",
             "expr": "l_discount <= 0.1"},
            {"check": "unique", "cols": ["l_orderkey", "l_linenumber"]},
            {"check": "foreign_key", "col": "l_orderkey", "ref": orders,
             "ref_col": "o_orderkey"},
        ],
    )


O_DATA_QUALITY = """
WITH rl AS (
  SELECT count(*) AS total,
         sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v0,
         sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 30 THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END) AS v2,
         sum(CASE WHEN NOT coalesce(l_discount <= 0.1, FALSE) THEN 1 ELSE 0 END) AS v3
  FROM lineitem
),
uq AS (
  SELECT coalesce(sum(n), 0) AS v4 FROM (
    SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber
    HAVING count(*) > 1
  )
),
fk AS (
  SELECT count(*) AS v5 FROM lineitem
  WHERE l_orderkey IS NOT NULL
    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
SELECT * FROM (
  SELECT 0 AS check_id, 'not_null(l_shipdate)' AS check, CAST(v0 AS BIGINT) AS n_violations, v0 = 0 AS passed FROM rl
  UNION ALL
  SELECT 1, 'in_range(l_quantity,1,30)', CAST(v1 AS BIGINT), v1 = 0 FROM rl
  UNION ALL
  SELECT 2, 'in_set(l_returnflag)', CAST(v2 AS BIGINT), v2 = 0 FROM rl
  UNION ALL
  SELECT 3, 'discount<=0.1', CAST(v3 AS BIGINT), v3 = 0 FROM rl
  UNION ALL
  SELECT 4, 'unique(l_orderkey,l_linenumber)', CAST(v4 AS BIGINT), v4 = 0 FROM uq
  UNION ALL
  SELECT 5, 'foreign_key(l_orderkey->o_orderkey)', CAST(v5 AS BIGINT), v5 = 0 FROM fk
) ORDER BY check_id
"""


SUBSEQ_QUERY = [0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, -1.0, -2.0, -1.0, 0.0, 1.0]


def q_subsequence_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence search (operators/similarity.
    subsequence_topk — UCR semantics, ED_znorm^2 = 2w(1-r)): top-10
    sliding windows across the resampled tag fleet most similar to a
    12-point hill-and-valley pattern, shift/scale-invariant. Pure
    codegen window algebra (rolling mean/std + w literal-weight lag
    terms), every window PARTITIONED BY tag, one k-row TakeOrdered."""
    from gordo_spark.operators.resample import resample_aggregate
    from gordo_spark.operators.similarity import subsequence_topk

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return subsequence_topk(res, SUBSEQ_QUERY, k=10)


def _subseq_sql() -> str:
    import numpy as np

    q = np.asarray(SUBSEQ_QUERY, dtype=np.float64)
    qz = (q - q.mean()) / q.std()
    w = len(q)
    dot = " + ".join(
        f"({qz[j]!r}) * lag(value, {w - 1 - j}) OVER (PARTITION BY tag ORDER BY ts)"
        for j in range(w)
    )
    return f"""
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
f AS (
  SELECT tag, ts,
         avg(value) OVER win AS m,
         stddev_pop(value) OVER win AS s,
         row_number() OVER (PARTITION BY tag ORDER BY ts) AS rn,
         {dot} AS dot
  FROM res
  WINDOW win AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
)
SELECT tag, ts AS window_end,
       floor((sqrt(greatest(2.0*{w} * (1.0 - dot/({w} * s)), 0.0))) * 1000000.0 + 0.5) / 1000000.0 AS znorm_dist
FROM f WHERE rn >= {w} AND s > 1e-9
ORDER BY znorm_dist, tag, window_end LIMIT 10
"""


O_SUBSEQ = _subseq_sql()


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-tokenizer application (operators/bpe.bpe_encode): replay
    the learned merge list (training order, all-occurrence merges) over
    the corpus — one Arrow-batched pass, merge-rank table in the task
    closure (per-distinct-word memoized), no shuffle. SQL-MATCHED:
    the oracle (`_o_bpe_tokenize`) trains the same merge list with the
    pure-Python reference and replays the apply rule as a recursive CTE
    over the distinct-word set (iterative TRAINING stays rows-only in
    q_bpe_merges; word-for-word apply parity additionally pinned in
    pytest). The trained merge list is the memoized tokenizer artifact
    (shared with q_bpe_merges): the round-4 4.6 s gate time was the
    8-iteration TRAINING run twice per gate — the encode itself
    measures 0.4 s."""
    from gordo_spark.operators.bpe import bpe_encode

    docs = read_table(spark, sf_dir, "documents")
    merges = _trained_bpe_merges(spark, sf_dir, n_merges=8)
    return bpe_encode(docs, merges).select("doc_id", "n_words", "n_tokens")


def _o_bpe_tokenize(n_merges: int = 8) -> str:
    """SQL oracle for the trained-tokenizer APPLY (house rule: iterative
    FIT stays rows-only, deterministic apply gets an oracle — the PQ /
    pca_project / logreg_apply pattern, applied to BPE). The generator
    trains the merge list with the pure-Python reference (pytest pins it
    word-for-word against the distributed bpe_train), embeds the pair
    ranks as a CASE table, and replays the Sennrich apply rule as a
    recursive CTE over the DISTINCT-word set: each step merges the
    LEFTMOST occurrence of the lowest-rank adjacent pair. Single-merge
    steps are equivalent to the operator's all-occurrence batch merges
    because a trained list always ranks a pair containing a merged
    symbol AFTER the merge that created the symbol, so the best rank
    cannot improve mid-batch. Per-doc counts then join the word stream
    back to the per-word token counts."""
    import pyarrow.parquet as papq

    from gordo_spark.operators.bpe import bpe_train_reference

    t = papq.read_table(
        os.path.join(_oracle_sf_dir(), "documents.parquet"), columns=["text"]
    )
    texts = [x for x in t.column("text").to_pylist() if x is not None]
    merges = bpe_train_reference(texts, n_merges=n_merges)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rank_case = (
        "CASE "
        + " ".join(
            f"WHEN syms[i] = {q(a)} AND syms[i+1] = {q(b)} THEN {r}"
            for r, (a, b, _) in enumerate(merges)
        )
        + " ELSE 999999 END"
    )
    return f"""WITH RECURSIVE
w AS (
  SELECT DISTINCT word FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word != ''
),
rec AS (
  SELECT word, list_append(string_split(word, ''), '</w>') AS syms
  FROM w
  UNION ALL
  SELECT word,
         list_slice(syms, 1, pos - 1)
           || [syms[pos] || syms[pos + 1]]
           || list_slice(syms, pos + 2, len(syms))
  FROM (
    SELECT word, syms,
           list_position(pr, list_min(pr)) AS pos, list_min(pr) AS mr
    FROM (
      SELECT word, syms,
             list_transform(range(1, len(syms)), i -> {rank_case}) AS pr
      FROM rec
    )
  ) WHERE mr < 999999
),
done AS (
  SELECT word, len(syms) AS tc
  FROM (
    SELECT word, syms,
           list_transform(range(1, len(syms)), i -> {rank_case}) AS pr
    FROM rec
  )
  WHERE len(syms) <= 1 OR list_min(pr) = 999999
),
dw AS (
  SELECT doc_id, ws[i] AS word
  FROM (
    SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  )
  WHERE ws[i] != ''
),
agg AS (
  SELECT dw.doc_id, count(*) AS n_words, sum(done.tc) AS n_tokens
  FROM dw JOIN done USING (word) GROUP BY dw.doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_words, 0)::INT AS n_words,
       coalesce(agg.n_tokens, 0)::INT AS n_tokens
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id"""


def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace vs BPE-ish regex lexer counts."""
    from gordo_spark.operators.text import bpe_token_count

    out = bpe_token_count(read_table(spark, sf_dir, "documents"))
    return _r6(out, "bpe_per_word")


O_TEXT_BPE = r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       floor((len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) * 1.0
             / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS bpe_per_word
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length, punctuation, diversity, stopwords)."""
    from gordo_spark.operators.text import quality_score

    out = quality_score(read_table(spark, sf_dir, "documents"))
    return _r6(out, "quality")


def _quality_sql() -> str:
    from gordo_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) * 1.0 AS n_tokens,
         length(text) * 1.0 AS n_chars,
         (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0 AS n_punct,
         len(list_distinct(string_split(text, ' '))) * 1.0 AS n_uniq,
         len(list_filter(string_split(text, ' '), t -> list_contains([{sw}], t))) * 1.0 AS n_sw
  FROM documents
)
SELECT doc_id,
       floor(((least(n_tokens / 50.0, 1.0)
              + greatest(1.0 - (n_punct / n_chars) * 5.0, 0.0)
              + n_uniq / n_tokens
              + least((n_sw / n_tokens) * 5.0, 1.0)) / 4.0) * 1000000.0 + 0.5) / 1000000.0 AS quality
FROM base
"""


O_TEXT_QUALITY = _quality_sql()


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components (min-label propagation)
    over the LSH candidate pairs of the dup corpus — the survivor-selection
    step; component id = the min doc id to keep."""
    from gordo_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs_with_dups(spark, sf_dir), num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return connected_components(pairs)


O_DEDUP_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({_lsh_pairs_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc(id, label) AS (
  SELECT src AS id, src AS label FROM edges
  UNION
  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src
)
SELECT id, min(label) AS component FROM cc GROUP BY id
"""


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size histogram (operators/dedup.
    component_size_histogram) over the dup corpus's connected components
    — every text appears exactly twice, so the dominant cluster size is
    2 (plus natural near-dup clusters merging further)."""
    from gordo_spark.operators.dedup import (
        component_size_histogram,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs_with_dups(spark, sf_dir), num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return component_size_histogram(connected_components(pairs))


O_DEDUP_CLUSTER_SIZES = f"""
SELECT cluster_size, count(*) AS n_clusters FROM (
  SELECT component, count(*) AS cluster_size
  FROM ({O_DEDUP_COMPONENTS}) GROUP BY component
) GROUP BY cluster_size
"""


def q_dedup_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection (operators/dedup.
    best_survivors): per duplicate component keep the LONGEST member
    (ties -> min id) — "keep the most complete copy", the curation
    refinement of dedup_survivors' min-id rule. One max_by aggregation
    on the component key after the same pairs->components chain."""
    from gordo_spark.operators.dedup import (
        best_survivors,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs_with_dups(spark, sf_dir).withColumn(
        "_len", F.length("text").cast("long")
    )
    sigs = minhash_signatures(docs, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return best_survivors(docs, connected_components(pairs), "_len")


O_DEDUP_BEST_SURVIVOR = f"""
WITH RECURSIVE pairs AS ({_lsh_pairs_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc(id, label) AS (
  SELECT src AS id, src AS label FROM edges
  UNION
  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src
),
comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id),
q AS (
  SELECT comp.component, d.doc_id, CAST(length(d.text) AS BIGINT) AS len
  FROM ({_O_DOCS_DUPS}) d JOIN comp ON comp.id = d.doc_id
),
r AS (
  SELECT component, doc_id, len,
         row_number() OVER (PARTITION BY component
                            ORDER BY len DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY component) AS n_members
  FROM q
)
SELECT component, doc_id AS survivor_id, len AS best,
       CAST(n_members AS BIGINT) AS n_members
FROM r WHERE rn = 1
"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: signatures -> LSH pairs -> connected components
    -> survivor corpus (one doc per duplicate component, everything else
    untouched). The full pipeline a 100 TB pretraining-dedup job runs."""
    from gordo_spark.operators.dedup import (
        connected_components,
        keep_survivors,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs_with_dups(spark, sf_dir)
    sigs = minhash_signatures(docs, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return keep_survivors(docs, connected_components(pairs))


O_DEDUP_SURVIVORS = f"""
WITH RECURSIVE pairs AS ({_lsh_pairs_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc(id, label) AS (
  SELECT src AS id, src AS label FROM edges
  UNION
  SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src
),
comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id)
SELECT d.* FROM ({_O_DOCS_DUPS}) d
WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
"""


def q_sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED coarse quantizer itself, engine-exact
    (operators/similarity.kmeans_fit_exact): fixed-3-iteration Lloyd's
    k-means, first-6-by-id init, left-fold euclidean argmin with
    lowest-cell tie-break, exact scaled-integer mean updates — every
    centroid on the 1e-6 grid, bit-identical on any engine, so the
    6x64 centroid table hash-matches a 3-block CTE-unrolled DuckDB
    oracle. The numpy-matmul throughput twin (kmeans_fit) and the ANN
    probe path over a trained quantizer (ivf_topk_trained) stay pinned
    in pytest (tests/test_training_data_ops.py); the probe path is
    also gated via the sim_ivf contract."""
    from gordo_spark.operators.similarity import kmeans_fit_exact

    embs = read_table(spark, sf_dir, "embeddings")
    return kmeans_fit_exact(embs, k=6, iters=3)


def _o_kmeans_exact(k: int = 6, iters: int = 3, dim: int = 64) -> str:
    """CTE-unrolled mirror of kmeans_fit_exact: per iteration one
    assignment block (left-fold d2, argmin by (d2, cell)) and one
    exact-mean update block; empty cells coalesce to the previous
    centroid, exactly the Spark fallback."""
    d2 = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {dim}), "
        f"i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i]))), "
        f"(acc, x) -> acc + x)"
    )
    parts = [
        f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS ce
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k})
)"""
    ]
    for t in range(iters):
        parts.append(
            f""",
a{t} AS (
  SELECT cell, e,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC)
           AS rnk
  FROM (SELECT v.vec_id, v.e, c.cell, {d2} AS d2
        FROM v CROSS JOIN c{t} c)
),
m{t} AS (
  SELECT cell, dim,
         floor(CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS HUGEINT))
                    AS DOUBLE) / count(*) + 0.5) / 1000000.0 AS m
  FROM (SELECT cell, unnest(e) AS x, generate_subscripts(e, 1) AS dim
        FROM a{t} WHERE rnk = 1)
  GROUP BY 1, 2
),
c{t + 1} AS (
  SELECT c.cell, coalesce(u.ml, c.ce) AS ce
  FROM c{t} c LEFT JOIN (
    SELECT cell, list(m ORDER BY dim) AS ml FROM m{t} GROUP BY cell
  ) u USING (cell)
)"""
        )
    parts.append(
        f"""
SELECT cell, generate_subscripts(ce, 1) - 1 AS dim,
       unnest(ce) AS centroid
FROM c{iters} ORDER BY cell, dim"""
    )
    return "".join(parts)


O_SIM_IVF_KMEANS = _o_kmeans_exact()


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text stats: token counts, avg token length, punctuation ratio."""
    from gordo_spark.operators.text import text_stats

    out = text_stats(read_table(spark, sf_dir, "documents"))
    return _r6(out, "avg_token_len", "punct_ratio")


O_TEXT_STATS = """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       floor((length(text) * 1.0 / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS avg_token_len,
       floor(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
             * 1.0 / length(text)) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens
FROM documents
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword fraction -> en/unknown."""
    from gordo_spark.operators.text import lang_id

    out = lang_id(read_table(spark, sf_dir, "documents"))
    return _r6(out, "stopword_frac")


def _langid_sql() -> str:
    from gordo_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
SELECT doc_id,
       floor((len(list_filter(string_split(text, ' '), t -> list_contains([{sw}], t)))
             * 1.0 / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS stopword_frac,
       CASE WHEN len(list_filter(string_split(text, ' '), t -> list_contains([{sw}], t)))
                 * 1.0 / len(string_split(text, ' ')) >= 0.08
            THEN 'en' ELSE 'unknown' END AS lang_pred
FROM documents
"""


O_TEXT_LANG = _langid_sql()


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint of the first 8 tokens."""
    from gordo_spark.operators.text import fingerprint

    return fingerprint(read_table(spark, sf_dir, "documents"), n_lead=8)


O_TEXT_FP = """
SELECT doc_id,
       list_reduce(
         list_transform(list_slice(string_split(text, ' '), 1, 8),
                        t -> ('0x' || substr(md5(t), 1, 8))::BIGINT),
         (acc, h) -> (acc * 31 + h) % 2147483647
       ) AS fingerprint
FROM documents
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-bigram coverage + duplicate-
    trigram fraction per document (operators/text.repetition_stats)."""
    from gordo_spark.operators.text import repetition_stats

    out = repetition_stats(read_table(spark, sf_dir, "documents"))
    return _r6(out, "top_ngram_frac", "dup_ngram_frac")


O_TEXT_REPETITION = """
WITH g2 AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i+1), ' ')
         )) AS g
  FROM documents
),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS top_ngram_count FROM c2 GROUP BY 1),
g3 AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i+2), ' ')
         )) AS g
  FROM documents
),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
dup AS (
  SELECT doc_id,
         floor((SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / SUM(c)) * 1000000.0 + 0.5) / 1000000.0
           AS dup_ngram_frac
  FROM c3 GROUP BY 1
),
n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
SELECT n.doc_id, n.n_tokens, top.top_ngram_count,
       floor((top.top_ngram_count * 2.0 / n.n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS top_ngram_frac,
       dup.dup_ngram_frac
FROM n JOIN top USING (doc_id) JOIN dup USING (doc_id)
"""


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.pack_sequences):
    256-token chunks within 8 hash shards, summarized per chunk. The
    cumulative-sum window is PARTITIONED BY shard — the scale path."""
    from gordo_spark.operators.packing import pack_sequences

    packed = pack_sequences(
        read_table(spark, sf_dir, "documents"), budget=256, shards=8
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


O_PACK_CHUNKS = """
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
         ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ok
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens, shard,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ok, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seq_start
  FROM t
)
SELECT shard,
       CAST(FLOOR(seq_start / 256.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc
FROM s
GROUP BY 1, 2
"""


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequency, top-50 by (tf desc, term asc) —
    the vocab-training first pass (operators/text.term_stats). One
    shuffle with map-side combine; the cut is a deterministic total
    order."""
    from gordo_spark.operators.text import term_stats

    return term_stats(read_table(spark, sf_dir, "documents"), top_k=50)


O_TERM_STATS = """
SELECT term, tf, n_docs FROM (
  SELECT token AS term, count(*) AS tf, count(DISTINCT doc_id) AS n_docs
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
)
ORDER BY tf DESC, term ASC
LIMIT 50
"""


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping word-window chunking (operators/text.chunk_text):
    64-token windows advancing by 48. Shuffle-free — scan -> explode ->
    project, embarrassingly parallel per document."""
    from gordo_spark.operators.text import chunk_text

    return chunk_text(
        read_table(spark, sf_dir, "documents"), chunk_words=64, stride_words=48
    )


O_CHUNK_OVERLAP = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM t
)
SELECT doc_id,
       start // 48 AS chunk_id,
       len(toks[start + 1 : least(start + 64, len(toks))]) AS n_tokens,
       array_to_string(toks[start + 1 : least(start + 64, len(toks))], ' ') AS chunk
FROM s
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/text.pii_scrub) over documents with
    synthetic PII injected deterministically from doc_id (the corpus
    itself is clean, so the injection makes every row exercise all three
    patterns). regexp_replace/regexp_count are codegen JVM expressions;
    patterns are RE2-compatible so the oracle replaces identical spans.
    Phones are injected in three shapes — bare 7-digit, parenthesized
    10-digit, dotted 10-digit — exercising the longest-first alternation
    (a 7-digit-only pattern would leave dangling '555-' remnants on the
    10-digit forms)."""
    from gordo_spark.operators.text import pii_scrub

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit(
                "@mail.example.org or 555-0147 or (555) 123-4567"
                " or 555.123.4567 at 10.0.0."
            ),
            (F.col("doc_id") % 256).cast("string"),
        ),
    )
    return pii_scrub(injected)


_O_PHONE_RE = (
    "(\\+1[-. ])?\\(\\d{3}\\)[-. ]?\\d{3}[-. ]\\d{4}\\b"
    "|(\\+1[-. ])?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
    "|\\b\\d{3}[- ]\\d{4}\\b"
)

O_PII_SCRUB = f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR)
              || '@mail.example.org or 555-0147 or (555) 123-4567'
              || ' or 555.123.4567 at 10.0.0.'
              || CAST(doc_id % 256 AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
           '{_O_PHONE_RE}', '<PHONE>', 'g'),
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g') AS text,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
       len(regexp_extract_all(text, '{_O_PHONE_RE}')) AS n_phone,
       len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ipv4
FROM injected
"""


def q_source_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level curation (operators/text.source_quality_filter): keep
    docs whose source's mean lexical diversity >= the corpus mean. Two
    small broadcast joins back onto the doc stream — no doc-table
    shuffle."""
    from gordo_spark.operators.text import source_quality_filter

    return source_quality_filter(read_table(spark, sf_dir, "documents"))


O_SOURCE_QUALITY_FILTER = """
WITH d AS (
  SELECT doc_id, source,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS div
  FROM documents
),
s AS (SELECT source, avg(div) AS src_div FROM d GROUP BY source),
c AS (SELECT avg(div) AS corpus_div FROM d)
SELECT d.doc_id, d.source, floor((s.src_div) * 1000000.0 + 0.5) / 1000000.0 AS src_div
FROM d JOIN s USING (source), c
WHERE s.src_div >= c.corpus_div
"""


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality proxy
    (operators/text.unigram_logprob_score): per-doc mean negative log-prob
    under the corpus's own PRUNED unigram distribution — vocab cut at
    min_df=2 / top-65536, all out-of-vocab tokens scored at one smoothed
    floor so the broadcast table is hard-bounded at corpus scale. A
    singleton token ('uq<doc_id>') is appended to every doc so the
    contract exercises BOTH the in-vocab and the OOV branch (each
    injected token has corpus frequency 1 < min_df)."""
    from gordo_spark.operators.text import unigram_logprob_score

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" uq"), F.col("doc_id").cast("string")),
    )
    return unigram_logprob_score(docs)


O_LM_QUALITY = """
WITH t AS (
  SELECT doc_id, token AS term
  FROM (
    SELECT doc_id,
           unnest(string_split(text || ' uq' || CAST(doc_id AS VARCHAR), ' '))
             AS token
    FROM documents
  )
  WHERE token <> ''
),
counts AS (SELECT term, count(*) AS tf FROM t GROUP BY term),
total AS (SELECT sum(tf) AS total, count(*) AS nt FROM counts),
vocab AS (
  SELECT term, tf FROM (
    SELECT term, tf,
           row_number() OVER (ORDER BY tf DESC, term ASC) AS r
    FROM counts WHERE tf >= 2
  ) WHERE r <= 65536
),
vsum AS (SELECT COALESCE(sum(tf), 0) AS vs, count(*) AS nv FROM vocab),
oov AS (
  SELECT ln(greatest(total - vs, 1) * 1.0 / total / greatest(nt - nv, 1))
    AS oov_logp
  FROM total, vsum
),
logp AS (SELECT term, ln(tf * 1.0 / total) AS logp FROM vocab, total)
SELECT doc_id, floor((-avg(COALESCE(logp.logp, oov.oov_logp))) * 1000000.0 + 0.5) / 1000000.0 AS mean_nll
FROM t LEFT JOIN logp USING (term), oov
GROUP BY doc_id
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher table-A1 document quality rules (operators/text.gopher_rules):
    per-rule boolean panel + conjunctive keep verdict, pure row-local
    column algebra (free rider on the scan at 100 TB)."""
    from gordo_spark.operators.text import gopher_rules

    return gopher_rules(read_table(spark, sf_dir, "documents"))


O_GOPHER_RULES = """
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
         len(list_filter(ws, x -> list_contains(
           ['the','a','of','and','to','in','is','on','for','with',
            'as','by','at','an','be','this','that','from','or','are'], x)))
           AS n_sw
  FROM w
)
SELECT doc_id,
       n_words >= 50 AND n_words <= 100000 AS ok_words,
       mean_wl >= 3.0 AND mean_wl <= 10.0 AS ok_word_len,
       n_sym / n_words <= 0.1 AS ok_symbols,
       alpha_frac >= 0.8 AS ok_alpha,
       n_sw >= 2 AS ok_stopwords,
       (n_words >= 50 AND n_words <= 100000)
         AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
         AND (n_sym / n_words <= 0.1)
         AND (alpha_frac >= 0.8)
         AND (n_sw >= 2) AS keep
FROM m
"""


def q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cavnar-Trenkle profile language ID (operators/text.
    char_ngram_lang_profiles + char_ngram_lang_id): top-200 char-trigram
    profiles per labeled language, then per-doc argmax profile overlap
    (ties -> lexicographically first language). The |langs| x 200
    profile table is broadcast-bounded by construction; profiles train
    on the deterministic md5(doc_id) % 4 == 0 quarter-sample (the
    PQ-codebook economics — trigram rankings saturate with hundreds of
    docs, and the training explode was 60% of the query's cost)."""
    from gordo_spark.operators.text import (
        char_ngram_lang_id,
        char_ngram_lang_profiles,
    )

    docs = read_table(spark, sf_dir, "documents")
    profiles = char_ngram_lang_profiles(docs, top_k=200, sample_mod=4)
    return char_ngram_lang_id(docs, profiles)


O_LANG_ID_NGRAM = """
WITH ex AS (
  SELECT lang, substring(text, i, 3) AS g
  FROM (SELECT lang, text,
               unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 4 = 0)
),
counts AS (SELECT lang, g, count(*) AS tf FROM ex GROUP BY 1, 2),
prof AS (
  SELECT lang, g FROM (
    SELECT lang, g,
           row_number() OVER (PARTITION BY lang ORDER BY tf DESC, g ASC) AS r
    FROM counts
  ) WHERE r <= 200
),
docg AS (
  SELECT DISTINCT doc_id, substring(text, i, 3) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
        FROM documents)
),
scored AS (
  SELECT d.doc_id, p.lang, count(*) AS overlap
  FROM docg d JOIN prof p USING (g) GROUP BY 1, 2
),
mx AS (SELECT doc_id, max(overlap) AS overlap FROM scored GROUP BY 1),
best AS (
  SELECT s.doc_id, min(s.lang) AS lang_pred, s.overlap
  FROM scored s JOIN mx USING (doc_id, overlap)
  GROUP BY s.doc_id, s.overlap
)
SELECT d.doc_id,
       COALESCE(b.lang_pred, 'unknown') AS lang_pred,
       COALESCE(b.overlap, 0) AS overlap
FROM documents d LEFT JOIN best b USING (doc_id)
"""


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail per-language LM-score terciles
    (operators/text.perplexity_buckets over unigram_logprob_score).
    Exact ntile(3) semantics with (score, doc_id) tie-break, computed via
    ranking.distributed_ntile — histogram + bounded windows, no
    per-language global sort; the oracle runs DuckDB's real ntile()."""
    from gordo_spark.operators.text import perplexity_buckets, unigram_logprob_score

    docs = read_table(spark, sf_dir, "documents")
    # pin the per-doc score frame once (r12, guide §5 — the
    # curation_verdict discipline): the exact-ntile bucketing consumes
    # it through the histogram AND the join-back, and left lazy each
    # reference replayed the whole vocab-fit + rescore subtree (12
    # document scans in plans/r12/perplexity_buckets_before)
    scored = unigram_logprob_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).localCheckpoint()
    return perplexity_buckets(scored)


O_PERPLEXITY_BUCKETS = """
WITH t AS (
  SELECT doc_id, token AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
counts AS (SELECT term, count(*) AS tf FROM t GROUP BY term),
total AS (SELECT sum(tf) AS total, count(*) AS nt FROM counts),
vocab AS (
  SELECT term, tf FROM (
    SELECT term, tf,
           row_number() OVER (ORDER BY tf DESC, term ASC) AS r
    FROM counts WHERE tf >= 2
  ) WHERE r <= 65536
),
vsum AS (SELECT COALESCE(sum(tf), 0) AS vs, count(*) AS nv FROM vocab),
oov AS (
  SELECT ln(greatest(total - vs, 1) * 1.0 / total / greatest(nt - nv, 1))
    AS oov_logp
  FROM total, vsum
),
logp AS (SELECT term, ln(tf * 1.0 / total) AS logp FROM vocab, total),
scored AS (
  SELECT doc_id, floor((-avg(COALESCE(logp.logp, oov.oov_logp))) * 1000000.0 + 0.5) / 1000000.0 AS mean_nll
  FROM t LEFT JOIN logp USING (term), oov
  GROUP BY doc_id
),
tiled AS (
  SELECT s.doc_id, d.lang, s.mean_nll,
         ntile(3) OVER (PARTITION BY d.lang ORDER BY s.mean_nll, s.doc_id) AS tl
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, mean_nll,
       CASE tl WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM tiled
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for one lexical query (operators/text.bm25_topk) —
    the retrieval half of a RAG stack beside the ANN operators. Only
    query-term postings ever shuffle; final top-k is a TakeOrdered."""
    from gordo_spark.operators.text import bm25_topk

    return bm25_topk(
        read_table(spark, sf_dir, "documents"), "table scan merge window", k=10
    )


O_BM25_SEARCH = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('table', 'scan', 'merge', 'window')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
idf AS (
  SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
  FROM dfreq, stats
),
scored AS (
  SELECT tf.doc_id,
         floor((SUM(idf.idf * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / idf.avgdl)))) * 1000000.0 + 0.5) / 1000000.0
           AS score
  FROM tf JOIN idf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""


def q_curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation decision (operators/curation.
    curation_verdict): Gopher rules AND not-CCNet-perplexity-tail AND
    repetition below threshold — the conjunction real pipelines ship on,
    stated once over the three contract-tested signal branches. The
    oracle composes the three existing oracle subqueries verbatim."""
    from gordo_spark.operators.curation import curation_verdict

    return curation_verdict(read_table(spark, sf_dir, "documents"))


def _curation_sql() -> str:
    return f"""
SELECT g.doc_id, g.keep AS keep_rules, p.bucket, r.dup_ngram_frac,
       (g.keep AND COALESCE(p.bucket <> 'tail', false)
              AND COALESCE(r.dup_ngram_frac <= 0.3, false)) AS keep
FROM ({O_GOPHER_RULES}) g
LEFT JOIN ({O_PERPLEXITY_BUCKETS}) p USING (doc_id)
LEFT JOIN ({O_TEXT_REPETITION}) r USING (doc_id)
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by tf-idf (operators/text.tfidf_topk):
    broadcast document-frequency table, row_number window PARTITIONED by
    doc. Rank order uses the rounded score so ties resolve identically
    on any engine."""
    from gordo_spark.operators.text import tfidf_topk

    return tfidf_topk(read_table(spark, sf_dir, "documents"), k=3)


O_TFIDF_TOPK = """
WITH t AS (
  SELECT doc_id, token AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
docfreq AS (SELECT term, count(DISTINCT doc_id) AS n_docs FROM t GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         floor((tf.tf * ln(n.n * 1.0 / docfreq.n_docs)) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
  FROM tf JOIN docfreq USING (term), n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup matrix (operators/dedup.source_overlap) over
    MinHash-LSH candidate pairs on documents plus a 'mirror' copy of
    every doc (a planted cross-source contamination), endpoints joined to
    sources, counted per canonicalized source pair. LSH candidates (not
    exact all-shared-shingle Jaccard) are the 100 TB pair source: the
    banded bucket join bounds candidate volume where the inverted-index
    intersection count is quadratic in shingle popularity."""
    from gordo_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        source_overlap,
    )

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
            "source", F.lit("mirror")
        )
    )
    sigs = minhash_signatures(corpus, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return source_overlap(pairs, corpus)


_O_DOCS_MIRROR = """
SELECT * FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text, lang, 'mirror' AS source, n_chars
FROM documents
"""

O_SOURCE_OVERLAP = f"""
WITH mirror_corpus AS ({_O_DOCS_MIRROR}),
pairs AS ({_lsh_pairs_sql(_O_DOCS_MIRROR)})
SELECT least(ca.source, cb.source) AS source_a,
       greatest(ca.source, cb.source) AS source_b,
       count(*) AS n_pairs
FROM pairs p
JOIN mirror_corpus ca ON ca.doc_id = p.id_a
JOIN mirror_corpus cb ON cb.doc_id = p.id_b
GROUP BY 1, 2
"""


def q_sample_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N per-stratum eval-set take (operators/sampling.stratified_take):
    5 docs per source ranked by (md5(id), id) — deterministic on every
    run/partitioning/engine, one source-partitioned window."""
    from gordo_spark.operators.sampling import stratified_take

    docs = read_table(spark, sf_dir, "documents")
    return stratified_take(docs, ["source"], 5).select("doc_id", "source")


O_SAMPLE_TAKE = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 5
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, long form
    (operators/similarity.label_centroids): posexplode -> groupBy(label,
    pos) avg — map-side combined, no Python in the plan."""
    from gordo_spark.operators.similarity import label_centroids

    return label_centroids(read_table(spark, sf_dir, "embeddings"))


O_LABEL_CENTROIDS = """
SELECT label, pos, floor((avg(val)) * 1000000.0 + 0.5) / 1000000.0 AS mean FROM (
  SELECT label,
         unnest(generate_series(0, len(embedding) - 1)) AS pos,
         unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
  FROM embeddings
)
GROUP BY label, pos
"""


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift per label (operators/similarity.
    embedding_drift): cosine + L2 between the md5-parity halves'
    centroids — the vector-space drift screen beside psi/ks (has the
    CLASS moved in representation space?). Pure posexplode/hash-agg
    algebra; nothing above |labels| x dim shuffles."""
    from gordo_spark.operators.similarity import embedding_drift

    return embedding_drift(read_table(spark, sf_dir, "embeddings"))


O_EMBEDDING_DRIFT = """
WITH v AS (
  SELECT label,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS h,
         unnest(generate_series(0, len(embedding) - 1)) AS pos,
         unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
  FROM embeddings
),
cent AS (
  SELECT label, h, pos, avg(val) AS c, count(*) AS n
  FROM v GROUP BY 1, 2, 3
),
wide AS (
  SELECT label, pos,
         sum(CASE WHEN h = 0 THEN c END) AS a,
         sum(CASE WHEN h = 1 THEN c END) AS b,
         max(CASE WHEN h = 0 THEN n END) AS na,
         max(CASE WHEN h = 1 THEN n END) AS nb
  FROM cent GROUP BY 1, 2
),
agg AS (
  SELECT label,
         sum(a * b) AS dot,
         sqrt(sum(a * a)) AS la,
         sqrt(sum(b * b)) AS lb,
         sqrt(sum((a - b) * (a - b))) AS l2,
         CAST(max(na) AS BIGINT) AS n_ref,
         CAST(max(nb) AS BIGINT) AS n_cur
  FROM wide GROUP BY label
)
SELECT label,
       floor((CASE WHEN la > 0 AND lb > 0 THEN dot / (la * lb) END) * 1000000.0 + 0.5) / 1000000.0
         AS cosine,
       floor((l2) * 1000000.0 + 0.5) / 1000000.0 AS l2,
       n_ref, n_cur
FROM agg
"""


def q_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label intra-class cohesion
    (operators/similarity.label_cohesion): mean cosine of each vector to
    its label centroid; |labels| x dim centroid table broadcast, cosine
    via the shared Arrow-batched numpy kernel."""
    from gordo_spark.operators.similarity import label_cohesion

    return label_cohesion(read_table(spark, sf_dir, "embeddings"))


O_LABEL_COHESION = """
WITH v AS (
  SELECT vec_id, label,
         unnest(generate_series(0, len(embedding) - 1)) AS pos,
         unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
  FROM embeddings
),
c AS (SELECT label, pos, avg(val) AS m FROM v GROUP BY label, pos),
dots AS (
  SELECT v.vec_id, v.label,
         sum(v.val * c.m) AS dot,
         sum(v.val * v.val) AS nv,
         sum(c.m * c.m) AS nc
  FROM v JOIN c ON v.label = c.label AND v.pos = c.pos
  GROUP BY v.vec_id, v.label
)
SELECT label, count(*) AS n,
       floor((avg(dot / (sqrt(nv) * sqrt(nc)))) * 1000000.0 + 0.5) / 1000000.0 AS mean_cosine
FROM dots
GROUP BY label
"""


def q_length_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum stages by exact length percentile
    (operators/text.length_curriculum): one exact-percentile row
    broadcast onto the doc stream, boundaries rounded 6dp so bucket
    edges are engine-portable."""
    from gordo_spark.operators.text import length_curriculum

    return length_curriculum(read_table(spark, sf_dir, "documents"), n_stages=4)


O_LENGTH_CURRICULUM = """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
b AS (
  SELECT floor((quantile_cont(n_tokens, 0.25)) * 1000000.0 + 0.5) / 1000000.0 AS b0,
         floor((quantile_cont(n_tokens, 0.50)) * 1000000.0 + 0.5) / 1000000.0 AS b1,
         floor((quantile_cont(n_tokens, 0.75)) * 1000000.0 + 0.5) / 1000000.0 AS b2
  FROM t
)
SELECT doc_id, n_tokens,
       (CASE WHEN n_tokens > b0 THEN 1 ELSE 0 END
        + CASE WHEN n_tokens > b1 THEN 1 ELSE 0 END
        + CASE WHEN n_tokens > b2 THEN 1 ELSE 0 END) AS stage
FROM t, b
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (operators/text.vocab_coverage): corpus
    token fraction covered by the top-k terms — the tokenizer-sizing
    curve. Running sums window over the vocabulary-sized term table,
    never the corpus."""
    from gordo_spark.operators.text import vocab_coverage

    return vocab_coverage(read_table(spark, sf_dir, "documents"))


O_VOCAB_COVERAGE = """
WITH counts AS (
  SELECT token AS term, count(*) AS tf
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
),
ranked AS (
  SELECT row_number() OVER (ORDER BY tf DESC, term ASC) AS k,
         sum(tf) OVER (ORDER BY tf DESC, term ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           * 1.0 / sum(tf) OVER () AS cum_frac
  FROM counts
)
SELECT k, floor((cum_frac) * 1000000.0 + 0.5) / 1000000.0 AS coverage
FROM ranked
WHERE k IN (1, 10, 100, 1000, 10000)
"""


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm z-score outlier flags
    (operators/similarity.embedding_norm_outliers): the cheap detector
    for embedding-pipeline bugs; norms JVM-side, label stats broadcast."""
    from gordo_spark.operators.similarity import embedding_norm_outliers

    return embedding_norm_outliers(read_table(spark, sf_dir, "embeddings"))


O_EMBEDDING_NORMS = """
WITH v AS (
  SELECT vec_id, label,
         unnest(list_transform(embedding, x -> x::DOUBLE)) AS val
  FROM embeddings
),
norms AS (
  SELECT vec_id, label, sqrt(sum(val * val)) AS norm
  FROM v GROUP BY vec_id, label
),
stats AS (
  SELECT label, avg(norm) AS mu, stddev(norm) AS sd FROM norms GROUP BY label
)
SELECT n.vec_id, n.label,
       floor((n.norm) * 1000000.0 + 0.5) / 1000000.0 AS norm,
       floor(((n.norm - s.mu) / s.sd) * 1000.0 + 0.5) / 1000.0 AS z,
       abs((n.norm - s.mu) / s.sd) > 3.0 AS is_outlier
FROM norms n JOIN stats s USING (label)
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup canonicalization (operators/text.normalize_text):
    lowercase, strip non-alphanumerics, collapse whitespace — shown with
    the post-normalize token count."""
    from gordo_spark.operators.text import normalize_text, tokens

    out = normalize_text(read_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "text", F.size(tokens(F.col("text"))).alias("n_tokens_norm")
    )


O_NORMALIZE_TEXT = """
SELECT doc_id, text,
       len(string_split(text, ' ')) AS n_tokens_norm
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS text
  FROM documents
)
"""


def q_lm_quality_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality proxy (operators/text.bigram_logprob_score):
    mean -log p(w_i | w_{i-1}) under the corpus's own bigram
    distribution — catches shuffled-word junk the unigram score calls
    fluent. The distinct-bigram ratio table is corpus-proportional, so
    both count joins are UNHINTED shuffle equi-joins (AQE broadcasts
    when genuinely small); docs under two words emit no row."""
    from gordo_spark.operators.text import bigram_logprob_score

    return bigram_logprob_score(read_table(spark, sf_dir, "documents"))


O_LM_QUALITY_BIGRAM = """
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 1),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
         )) AS g
  FROM documents
),
bg AS (SELECT g, count(*) AS c2 FROM g GROUP BY g),
hist AS (SELECT split_part(g, ' ', 1) AS h, count(*) AS c1 FROM g GROUP BY h),
logp AS (
  SELECT bg.g, ln(c2 * 1.0 / c1) AS logp
  FROM bg JOIN hist ON split_part(bg.g, ' ', 1) = hist.h
)
SELECT doc_id, floor((-avg(logp)) * 1000000.0 + 0.5) / 1000000.0 AS mean_nll2
FROM g JOIN logp USING (g)
GROUP BY doc_id
"""


def q_source_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source raw vs dedup-effective token budgets
    (operators/dedup.source_effective_tokens) over the mirror corpus:
    the planted 'mirror' source dedups away entirely (unique_ratio 0),
    real sources keep their survivors."""
    from gordo_spark.operators.dedup import source_effective_tokens

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
            "source", F.lit("mirror")
        )
    )
    return source_effective_tokens(corpus)


O_SOURCE_TOKENS = f"""
WITH corpus AS ({_O_DOCS_MIRROR}),
base AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS nt, text FROM corpus
),
surv AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY text),
kept AS (SELECT b.* FROM base b JOIN surv USING (doc_id)),
raw AS (
  SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM base GROUP BY source
),
eff AS (
  SELECT source, count(*) AS n_docs_unique,
         CAST(sum(nt) AS BIGINT) AS n_tokens_unique
  FROM kept GROUP BY source
)
SELECT raw.source, n_docs, n_tokens,
       COALESCE(n_docs_unique, 0) AS n_docs_unique,
       COALESCE(n_tokens_unique, 0) AS n_tokens_unique,
       floor((COALESCE(n_tokens_unique, 0) * 1.0 / n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS unique_ratio
FROM raw LEFT JOIN eff USING (source)
"""


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/dedup.corpus_diff) between documents and
    a deterministically mutated next release: every doc_id % 10 == 0 is
    edited, ids >= max-50 are dropped, and 20 new ids appended — the diff
    must report exactly those changed/removed/added sets."""
    from gordo_spark.operators.dedup import corpus_diff

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    edited = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    # fixed id cut (not sf-derived) so Spark and oracle agree at any sf
    new = (
        edited.filter(F.col("doc_id") < F.lit(450))
        .unionByName(
            docs.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 900000).alias("doc_id"), "text"
            )
        )
    )
    return corpus_diff(docs, new)


O_CORPUS_DIFF = """
WITH old AS (SELECT doc_id, text FROM documents),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id < 450
  UNION ALL
  SELECT doc_id + 900000 AS doc_id, text FROM documents WHERE doc_id < 20
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new USING (doc_id)
WHERE old.doc_id IS NULL OR new.doc_id IS NULL OR old.text <> new.text
"""


def q_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repeated-span fractions (operators/dedup.
    repeated_ngram_stats, Lee et al. 2022 signal) over the mirror-dup
    corpus: every mirrored doc's 10-grams repeat, so planted copies sit
    at repeated_frac 1.0 while organic repetition floats the base."""
    from gordo_spark.operators.dedup import repeated_ngram_stats

    return repeated_ngram_stats(_docs_with_dups(spark, sf_dir), n=10)


O_REPEATED_NGRAMS = f"""
WITH corpus AS ({_O_DOCS_DUPS}),
g AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT AS gh
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - 9, 1)),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 9), ' ')
           )) AS gram
    FROM corpus
  )
),
c AS (SELECT gh, count(*) AS cnt FROM g GROUP BY gh)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       floor((sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0
         AS repeated_frac
FROM g JOIN c USING (gh)
GROUP BY doc_id
"""


def q_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-based Jaccard estimates for LSH candidate pairs
    (operators/dedup.minhash_jaccard_estimate, Broder 1997): the verify
    step between banding and exact Jaccard that never re-reads text —
    two id-keyed joins of (id, 8 longs) rows. Planted clones (identical
    signatures) must land at est_jaccard 1.0."""
    from gordo_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs_with_dups(spark, sf_dir), num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    return minhash_jaccard_estimate(sigs, pairs, num_hashes=8)


def _minhash_est_sql() -> str:
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params

    params = _hash_params(8)
    mins = ",\n       ".join(
        f"min(({a}*sh + {b}) % {MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(params)
    )
    eq = " + ".join(f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(8))
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
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
)
SELECT p.id_a, p.id_b, floor((({eq}) / 8.0) * 1000000.0 + 0.5) / 1000000.0 AS est_jaccard
FROM pairs p
JOIN sigs a ON a.doc_id = p.id_a
JOIN sigs b ON b.doc_id = p.id_b
"""


O_MINHASH_EST = _minhash_est_sql()


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc first-seen n-gram fractions (operators/dedup.ngram_novelty)
    over the mirror-dup corpus: every mirrored copy's grams first appear
    in the original, so clones sit at novel_frac 0 while originals carry
    the organic novelty curve. Same hot/tail split join as
    repeated_ngrams (the shared grams ARE the skewed keys)."""
    from gordo_spark.operators.dedup import ngram_novelty

    return ngram_novelty(_docs_with_dups(spark, sf_dir), n=5)


O_NGRAM_NOVELTY = f"""
WITH corpus AS ({_O_DOCS_DUPS}),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ')
         )) AS gram
  FROM corpus
),
s AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       floor((sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS novel_frac
FROM g JOIN s USING (gram)
GROUP BY doc_id
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Shannon entropy
    (operators/text.token_entropy) — the one-number junk detector; pure
    two-level aggregation, no joins."""
    from gordo_spark.operators.text import token_entropy

    return token_entropy(read_table(spark, sf_dir, "documents"))


O_TOKEN_ENTROPY = """
WITH t AS (
  SELECT doc_id, token AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY doc_id, term)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       floor((ln(sum(c)) - sum(c * ln(c)) / sum(c)) * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM tf GROUP BY doc_id
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length histogram (operators/text.doc_length_histogram,
    bin width 32) — the packing/truncation-budget profile; one corpus
    scan, 1-row total broadcast onto the histogram-sized table."""
    from gordo_spark.operators.text import doc_length_histogram

    return doc_length_histogram(read_table(spark, sf_dir, "documents"))


O_LENGTH_HISTOGRAM = """
WITH n AS (SELECT len(string_split(text, ' ')) AS nt FROM documents),
hist AS (
  SELECT CAST(floor(nt / 32) * 32 AS BIGINT) AS bin_start,
         count(*) AS n_docs
  FROM n GROUP BY 1
),
total AS (SELECT sum(n_docs) AS t FROM hist)
SELECT bin_start, n_docs, floor((n_docs * 1.0 / t) * 1000000.0 + 0.5) / 1000000.0 AS frac
FROM hist, total
"""


def q_source_langmix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language mixture per source (operators/text.source_langmix):
    (source, lang) doc counts + within-source fractions — one groupBy,
    fraction via a source-PARTITIONED window over the aggregate."""
    from gordo_spark.operators.text import source_langmix

    return source_langmix(read_table(spark, sf_dir, "documents"))


O_SOURCE_LANGMIX = """
WITH c AS (
  SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs,
       floor((n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY source)) * 1000000.0 + 0.5) / 1000000.0 AS frac
FROM c
"""


def q_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0-based export ids in (n_chars, doc_id) order — the
    DataFrame-native zipWithIndex (operators/sampling.with_global_ids):
    range shuffle + per-partition row_number + broadcast prefix offsets;
    no global single-partition sort anywhere in the plan."""
    from gordo_spark.operators.sampling import with_global_ids

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        # unique composite sort key (doc_id disambiguates equal lengths)
        (F.col("n_chars") * 1_000_000 + F.col("doc_id")).alias("_key"),
    )
    return with_global_ids(docs, "_key").select("doc_id", "n_chars", "global_id")


O_GLOBAL_IDS = """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS global_id
FROM documents
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (operators/dedup.contamination_pairs):
    every 50th doc plays the benchmark; corpus docs sharing >= 3 distinct
    trigrams with a benchmark doc are flagged with the leaked fraction."""
    from gordo_spark.operators.dedup import contamination_pairs

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    out = contamination_pairs(corpus, bench, min_shared=3)
    return _r6(out, "overlap_frac")


O_DECONTAMINATE = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i+2), ' ')
         )) AS shingle
  FROM documents
),
hashed AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS sh
  FROM sh
),
c AS (SELECT * FROM hashed WHERE doc_id % 50 <> 0),
b AS (SELECT doc_id AS bench_id, sh FROM hashed WHERE doc_id % 50 = 0),
bsz AS (SELECT bench_id, count(*) AS bench_sz FROM b GROUP BY 1),
j AS (
  SELECT c.doc_id, b.bench_id, count(*) AS n_shared
  FROM c JOIN b USING (sh)
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT j.doc_id, j.bench_id, j.n_shared,
       floor((j.n_shared * 1.0 / bsz.bench_sz) * 1000000.0 + 0.5) / 1000000.0 AS overlap_frac
FROM j JOIN bsz USING (bench_id)
"""


def q_sim_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 vectors (broadcast
    nested loop; corpus side never shuffles)."""
    from gordo_spark.operators.similarity import cosine_topk

    embs = read_table(spark, sf_dir, "embeddings")
    out = cosine_topk(embs, embs.filter(F.col("vec_id") < 10), k=5)
    return _r6(out, "cosine_sim")


O_SIM_BRUTE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, nv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS sim
  FROM v, q WHERE neighbor_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, floor((sim) * 1000000.0 + 0.5) / 1000000.0 AS cosine_sim, rank
FROM ranked WHERE rank <= 5
"""


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH ANN top-5. The 24 hyperplane vectors are
    deterministic (portable LCG), so the DuckDB oracle embeds the same
    literals, generated from the same code."""
    from gordo_spark.operators.similarity import lsh_ann_topk

    embs = read_table(spark, sf_dir, "embeddings")
    out = lsh_ann_topk(embs, embs.filter(F.col("vec_id") < 10), k=5, bits=6, tables=4)
    return _r6(out, "cosine_sim")


def _sim_ann_sql(bits: int = 6, tables: int = 4, dim: int = 64) -> str:
    from gordo_spark.operators.similarity import hyperplanes

    all_planes = [hyperplanes(dim, bits, seed=7 + 1000 * t) for t in range(tables)]
    bucket_rows = []
    for t in range(tables):
        bits_sql = " + ".join(
            f"(CASE WHEN list_dot_product(e, {all_planes[t][j]!r}::DOUBLE[]) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        )
        bucket_rows.append(f"SELECT vec_id, e, {t} AS tbl, {bits_sql} AS bkt FROM v")
    banded = "\nUNION ALL\n".join(bucket_rows)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
banded AS ({banded}),
q AS (SELECT tbl, bkt, vec_id AS query_id, e AS qv FROM banded WHERE vec_id < 10),
scored AS (
  SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id,
         list_dot_product(q.qv, b.e)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.e, b.e))) AS sim
  FROM banded b JOIN q ON b.tbl = q.tbl AND b.bkt = q.bkt
  WHERE b.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, floor((sim) * 1000000.0 + 0.5) / 1000000.0 AS cosine_sim, rank
FROM ranked WHERE rank <= 5
"""


O_SIM_ANN = _sim_ann_sql()


def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload -> Arrow-batched metadata decode
    (decode stubbed deterministically; plumbing is real mapInPandas)."""
    from gordo_spark.operators.multimodal import attach_binary_payload, decode_media_metadata

    docs = read_table(spark, sf_dir, "documents")
    # mode pinned: the oracle reproduces the deterministic fake formula
    return decode_media_metadata(attach_binary_payload(docs), mode="fake")


O_MM_METADATA = """
SELECT doc_id,
       'image/fake' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 32 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 480 + 32 AS INTEGER) AS height
FROM documents
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: every-10th-frame (doc_id, frame_idx)
    plan over the fake binary payload (decode is the stubbed step)."""
    from gordo_spark.operators.multimodal import attach_binary_payload, frame_sample_plan

    docs = read_table(spark, sf_dir, "documents")
    return frame_sample_plan(attach_binary_payload(docs), every_n=10)


O_MM_FRAMES = """
SELECT doc_id, 10 * unnest(generate_series(0,
         greatest(CAST(octet_length(encode(text)) // 10 AS INTEGER) - 1, 0)
       )) AS frame_idx
FROM documents
"""


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON ``props``
    column JVM-side (get_json_object — no Python, codegen-friendly) and
    aggregate. The 100 TB shape for log/event payloads: extract-then-agg,
    never parse-into-driver."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qround(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_gt_50"),
        )
        .orderBy("event_type")
    )


O_JSON_EXTRACT = """
WITH ex AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*) AS n, floor((avg(k)) * 1000000.0 + 0.5) / 1000000.0 AS avg_k,
       max(k) AS max_k,
       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_50
FROM ex
GROUP BY 1
ORDER BY 1
"""


def q_o9_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 — ranked top-k per group: 3 priciest orders per priority via a
    partitioned row_number window (ties broken by orderkey so both
    engines pick identical rows)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rank")
    )


O_O9_TOPK = """
SELECT o_orderpriority, rank, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""


def q_o10_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 — grouped string aggregation: the distinct users per event
    type as one sorted comma-joined string (collect_set -> array_sort ->
    array_join; lexicographic order so both engines serialize
    identically)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col("user_id").cast("string"))), ","
            ).alias("users")
        )
        .orderBy("event_type")
    )


O_O10_STRING_AGG = """
SELECT event_type,
       string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
                  ORDER BY CAST(user_id AS VARCHAR)) AS users
FROM events
GROUP BY 1
ORDER BY 1
"""


def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature binning: decile buckets of order value per
    priority (partitioned ntile window — the discretization step of
    feature pipelines), then per-bin stats."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.withColumn("decile", F.ntile(10).over(w))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qround(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .orderBy("o_orderpriority", "decile")
    )


O_FEATURE_BINNING = """
SELECT o_orderpriority, decile, count(*) AS n,
       floor((avg(o_totalprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         ntile(10) OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_tag_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the aligned tag matrix in ONE
    aggregation (all pairs as parallel corr() aggregates — the
    feature-redundancy screen, never a per-pair job)."""
    wide = _wide_1h(spark, sf_dir)
    tags = ["click", "view", "purchase"]
    aggs = []
    for i, a in enumerate(tags):
        for b in tags[i + 1:]:
            aggs.append(
                qround(F.corr(F.col(a), F.col(b)), 6).alias(f"corr_{a}_{b}")
            )
    return wide.agg(*aggs)


def q_tag_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs SPEARMAN rank correlation of the aligned tag matrix —
    the monotone-relationship screen Pearson misses on nonlinear
    sensor couplings. Ranks are exact global row_numbers over
    (value, ts) computed WITHOUT a corpus-sized window
    (operators/ranking.global_rank — histogram cumulative counts +
    tie-group row_numbers); the tie rule is stated (ties broken by ts)
    so the rank, and hence the coefficient, is engine-portable.
    Listwise alignment (rows where every tag is present), then one
    aggregation of parallel corr() over the rank columns."""
    from gordo_spark.operators.ranking import global_rank

    wide = _wide_1h(spark, sf_dir)
    tags = ["click", "view", "purchase"]
    # pin the aligned grid once (r12, guide §5): it is calendar-bounded
    # (hourly buckets), and each chained global_rank references its
    # input twice (frame + histogram), so three chained calls put
    # 2^3 = 8 copies of the events resample+pivot in the plan
    ranked = wide.na.drop(subset=tags).localCheckpoint()
    for t in tags:
        ranked = global_rank(ranked, t, "ts", out_col=f"_r_{t}")
    aggs = []
    for i, a in enumerate(tags):
        for b in tags[i + 1:]:
            aggs.append(
                qround(F.corr(f"_r_{a}", f"_r_{b}"), 6).alias(
                    f"spearman_{a}_{b}"
                )
            )
    return ranked.agg(*aggs)


def _spearman_sql() -> str:
    from textwrap import dedent

    return dedent("""
    WITH res AS (
      SELECT event_type AS tag,
             CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
             floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
      FROM events WHERE event_type IN ('click','view','purchase')
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT ts,
             max(CASE WHEN tag='click' THEN value END) AS click,
             max(CASE WHEN tag='view' THEN value END) AS view,
             max(CASE WHEN tag='purchase' THEN value END) AS purchase
      FROM res GROUP BY ts
    ),
    aligned AS (
      SELECT * FROM wide
      WHERE click IS NOT NULL AND view IS NOT NULL AND purchase IS NOT NULL
    ),
    ranked AS (
      SELECT ts,
             row_number() OVER (ORDER BY click, ts) AS r_click,
             row_number() OVER (ORDER BY view, ts) AS r_view,
             row_number() OVER (ORDER BY purchase, ts) AS r_purchase
      FROM aligned
    )
    SELECT floor((corr(r_click, r_view)) * 1000000.0 + 0.5) / 1000000.0 AS spearman_click_view,
           floor((corr(r_click, r_purchase)) * 1000000.0 + 0.5) / 1000000.0 AS spearman_click_purchase,
           floor((corr(r_view, r_purchase)) * 1000000.0 + 0.5) / 1000000.0 AS spearman_view_purchase
    FROM ranked
    """)


O_TAG_SPEARMAN = _spearman_sql()


def _corr_sql() -> str:
    from textwrap import dedent

    return dedent("""
    WITH res AS (
      SELECT event_type AS tag,
             CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
             floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
      FROM events WHERE event_type IN ('click','view','purchase')
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT ts,
             max(CASE WHEN tag='click' THEN value END) AS click,
             max(CASE WHEN tag='view' THEN value END) AS view,
             max(CASE WHEN tag='purchase' THEN value END) AS purchase
      FROM res GROUP BY ts
    ),
    aligned AS (
      SELECT * FROM wide
      WHERE click IS NOT NULL AND view IS NOT NULL AND purchase IS NOT NULL
    )
    SELECT floor((corr(click, view)) * 1000000.0 + 0.5) / 1000000.0 AS corr_click_view,
           floor((corr(click, purchase)) * 1000000.0 + 0.5) / 1000000.0 AS corr_click_purchase,
           floor((corr(view, purchase)) * 1000000.0 + 0.5) / 1000000.0 AS corr_view_purchase
    FROM aligned
    """)


O_TAG_CORR = _corr_sql()


def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (operators/profile): every column's null
    rate / cardinality / range / mean from a single aggregation (20+
    parallel aggregates, then stack to long form). exact_distinct=True
    here so DuckDB reproduces it; the scale path uses HLL++."""
    from gordo_spark.operators.profile import profile

    docs = read_table(spark, sf_dir, "documents")
    out = profile(
        docs, ["doc_id", "lang", "source", "n_chars"], exact_distinct=True
    )
    return out.withColumn("mean_numeric", qround(F.col("mean_numeric"), 6))


O_DATA_PROFILE = """
SELECT 'doc_id' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_repr,
       CAST(max(doc_id) AS VARCHAR) AS max_repr,
       floor((avg(doc_id)) * 1000000.0 + 0.5) / 1000000.0 AS mean_numeric
FROM documents
UNION ALL
SELECT 'lang', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT lang),
       CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR),
       CAST(NULL AS DOUBLE)
FROM documents
UNION ALL
SELECT 'source', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT source),
       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR),
       CAST(NULL AS DOUBLE)
FROM documents
UNION ALL
SELECT 'n_chars', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT n_chars),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR),
       floor((avg(n_chars)) * 1000000.0 + 0.5) / 1000000.0
FROM documents
"""


def q_o8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 — hierarchical rollup (event_type, week) -> subtotals -> grand
    total in ONE pass (Spark expands grouping sets before the partial
    aggregation, so it stays a single shuffle, not one job per level)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week"), "value"
    )
    return (
        ev.rollup("event_type", "week")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qround(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("event_type", "week")
    )


O_O8_ROLLUP = """
SELECT event_type, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week,
       count(*) AS n_events, floor((avg(value)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
FROM events
GROUP BY ROLLUP (event_type, week)
ORDER BY event_type, week
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof): each click event gets the user's
    latest purchase value at or before it (ties match, pandas
    merge_asof 'backward' semantics). Spark has no native as-of join;
    this is the union+window form — one shuffle on the key, no
    cross-join. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from gordo_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(clicks, purchases, on=["user_id"])
    return out.select(
        "user_id",
        "ts",
        "click_value",
        F.col("purchase_value_right").alias("last_purchase"),
        F.col("ts_right").alias("purchase_ts"),
    )


O_ASOF = """
WITH clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value AS click_value
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.user_id, c.ts, c.click_value,
       p.purchase_value AS last_purchase, p.ts AS purchase_ts
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def _asof_sides(spark: SparkSession, sf_dir: str):
    """Unique-keyed click/purchase sides for the direction contracts
    (left grouped too, so the oracle's candidate join-back is
    unambiguous)."""
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("click_value"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return clicks, purchases


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (operators/asof direction='forward'): each
    click gets the user's NEXT purchase at or after it within 7 days —
    same union+window machinery over the reverse time order, still one
    key shuffle. Oracle: manual min-over-candidates (DuckDB's native
    ASOF is backward-only)."""
    from gordo_spark.operators.asof import asof_join

    clicks, purchases = _asof_sides(spark, sf_dir)
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        direction="forward",
        tolerance_seconds=7 * 86400,
    )
    return out.select(
        "user_id",
        "ts",
        "click_value",
        F.col("purchase_value_right").alias("next_purchase"),
        F.col("ts_right").alias("purchase_ts"),
    )


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (direction='nearest', equidistant ties go
    BACKWARD — stated where pandas leaves it unspecified): both
    directional windows evaluate over ONE key exchange, per-row pick by
    time distance."""
    from gordo_spark.operators.asof import asof_join

    clicks, purchases = _asof_sides(spark, sf_dir)
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        direction="nearest",
        tolerance_seconds=7 * 86400,
    )
    return out.select(
        "user_id",
        "ts",
        "click_value",
        F.col("purchase_value_right").alias("near_purchase"),
        F.col("ts_right").alias("purchase_ts"),
    )


_ASOF_SIDES_SQL = """
clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, min(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)"""

O_ASOF_FORWARD = (
    "WITH "
    + _ASOF_SIDES_SQL
    + """,
cand AS (
  SELECT c.user_id, c.ts, p.purchase_value, p.ts AS pts,
         row_number() OVER (
           PARTITION BY c.user_id, c.ts ORDER BY p.ts ASC
         ) AS rn
  FROM clicks c JOIN purch p
    ON c.user_id = p.user_id AND p.ts >= c.ts
   AND epoch(p.ts) - epoch(c.ts) <= 7 * 86400
)
SELECT c.user_id, c.ts, c.click_value,
       k.purchase_value AS next_purchase, k.pts AS purchase_ts
FROM clicks c
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k USING (user_id, ts)"""
)

O_ASOF_NEAREST = (
    "WITH "
    + _ASOF_SIDES_SQL
    + """,
cand AS (
  SELECT c.user_id, c.ts, p.purchase_value, p.ts AS pts,
         row_number() OVER (
           PARTITION BY c.user_id, c.ts
           ORDER BY abs(epoch(p.ts) - epoch(c.ts)) ASC,
                    CASE WHEN p.ts <= c.ts THEN 0 ELSE 1 END ASC
         ) AS rn
  FROM clicks c JOIN purch p
    ON c.user_id = p.user_id
   AND abs(epoch(p.ts) - epoch(c.ts)) <= 7 * 86400
)
SELECT c.user_id, c.ts, c.click_value,
       k.purchase_value AS near_purchase, k.pts AS purchase_ts
FROM clicks c
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k USING (user_id, ts)"""
)


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (operators/ranges.interval_join): events vs
    per-type "busy week" intervals (weeks with above-average volume).
    Binned equi-join + refine — NOT a nested-loop BETWEEN join."""
    from gordo_spark.operators.ranges import interval_join

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    weeks = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("start")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    avg_per_type = weeks.groupBy("event_type").agg(F.avg("cnt").alias("ac"))
    busy = (
        weeks.join(F.broadcast(avg_per_type), "event_type")
        .filter(F.col("cnt") > F.col("ac"))
        .select(
            "event_type",
            "start",
            (F.col("start") + F.expr("INTERVAL 7 DAYS")).alias("end"),
        )
    )
    joined = interval_join(
        ev, busy, on=["event_type"], bin_seconds=7 * 86_400
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.countDistinct("start").alias("n_busy_weeks"),
            F.count(F.lit(1)).alias("n_events"),
            qround(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


O_INTERVAL = """
WITH ev AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
weeks AS (
  SELECT event_type, date_trunc('week', ts) AS start, count(*) AS cnt
  FROM ev GROUP BY 1, 2
),
busy AS (
  SELECT w.event_type, w.start, w.start + INTERVAL 7 DAY AS iv_end
  FROM weeks w
  JOIN (SELECT event_type, avg(cnt) AS ac FROM weeks GROUP BY 1) a
    USING (event_type)
  WHERE w.cnt > a.ac
)
SELECT e.event_type,
       count(DISTINCT b.start) AS n_busy_weeks,
       count(*) AS n_events,
       floor((avg(e.value)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
FROM ev e JOIN busy b
  ON e.event_type = b.event_type AND e.ts >= b.start AND e.ts < b.iv_end
GROUP BY 1
ORDER BY 1
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (operators/ranges.sessionize): per-user sessions at
    a 1h inactivity gap, reported as the session-size distribution.
    Two window passes over one user_id shuffle; ties in ts are safe (a
    zero gap can never start a session, so ordering among ties cannot
    change ids)."""
    from gordo_spark.operators.ranges import session_stats

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    stats = session_stats(ev, ["user_id"], gap_seconds=3600)
    return (
        stats.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            qround(F.avg("duration_s"), 6).alias("avg_duration_s"),
        )
        .orderBy("n_events")
    )


O_SESSIONIZE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
lagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN epoch(ts) - epoch(lag(ts) OVER w) > 3600 THEN 1
              ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged
),
per AS (
  SELECT user_id, session_id, count(*) AS n_events,
         epoch(max(ts)) - epoch(min(ts)) AS duration_s
  FROM sess GROUP BY 1, 2
)
SELECT n_events, count(*) AS n_sessions,
       floor((avg(duration_s)) * 1000000.0 + 0.5) / 1000000.0 AS avg_duration_s
FROM per
GROUP BY 1
ORDER BY 1
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup -> click -> purchase funnel
    (operators/ranges.funnel_steps): per step, users who completed the
    chain in order (greedy earliest-match), with conversion vs step 1.
    ONE user-keyed shuffle + row-local cascading mins — a single job."""
    from gordo_spark.operators.ranges import funnel_steps

    ev = read_table(spark, sf_dir, "events")
    return funnel_steps(ev, ["signup", "click", "purchase"])


O_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t
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


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts (operators/ranges.retention_cohorts):
    users grouped by first-activity week; per (cohort, week_offset) the
    active count and retention ratio. One distinct shuffle; cohort-size
    join keyed by the bounded calendar-week dimension."""
    from gordo_spark.operators.ranges import retention_cohorts

    return retention_cohorts(read_table(spark, sf_dir, "events"))


O_EVENTS_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS week
  FROM events
),
c AS (SELECT u, min(week) AS cohort_week FROM uw GROUP BY u),
a AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
         count(*) AS n_users
  FROM uw JOIN c USING (u)
  GROUP BY 1, 2
),
s AS (SELECT cohort_week, n_users AS sz FROM a WHERE week_offset = 0)
SELECT a.cohort_week, a.week_offset, a.n_users,
       floor((a.n_users * 1.0 / s.sz) * 1000000.0 + 0.5) / 1000000.0 AS retention
FROM a JOIN s USING (cohort_week)
"""


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (operators/sampling): md5-bucket
    thresholds — a pure projection, no shuffle, stable under
    repartitioning, reproduced verbatim by the SQL oracle."""
    from gordo_spark.operators.sampling import deterministic_split

    docs = read_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


O_SAMPLE_SPLIT = """
WITH b AS (
  SELECT lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
  FROM documents
)
SELECT CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val'
            WHEN b < 10000 THEN 'test' END AS split,
       lang, count(*) AS n_docs
FROM b
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: rebalance languages (half of
    'en', a fifth of 'zh'; other strata dropped) — the corpus-curation
    step, shuffle-free."""
    from gordo_spark.operators.sampling import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    picked = stratified_sample(
        docs, "doc_id", {"en": 0.5, "zh": 0.2}, strata_col="lang"
    )
    return (
        picked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            qround(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


O_SAMPLE_STRATIFIED = """
WITH b AS (
  SELECT lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
  FROM documents
)
SELECT lang, count(*) AS n_docs, floor((avg(n_chars)) * 1000000.0 + 0.5) / 1000000.0 AS avg_chars
FROM b
WHERE (lang = 'en' AND b < 5000) OR (lang = 'zh' AND b < 2000)
GROUP BY lang
ORDER BY lang
"""
