"""Round-11 contracts: multi-block SimHash banding.

The Manku et al. (WWW'07) C(b, k) block-combination banding is a pure
candidate-volume knob — guaranteed recall plus an exact bit_count(xor)
verify means the OUTPUT is identical to the shipped contiguous banding,
so this contract shares `simhash_join`'s oracle byte-for-byte: the gate
proves the widened posting-list keys change the plan, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from contracts.training_data import _docs_with_dups
from contracts.wave8 import _o_simhash_join


def q_simhash_join_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SimHash hamming join on MULTI-BLOCK banding
    (operators/dedup.simhash_hamming_join blocks=6, 32-bit, hamming<=3):
    C(6,3)=20 posting-list tables of 16-bit combination keys instead of
    4 tables of 8-bit band keys — bucket populations shrink
    exponentially with key width, the standard answer when banded
    buckets grow linear-in-corpus at billions of docs (Manku WWW'07
    §3). Output identical to `simhash_join` by construction."""
    from gordo_spark.operators.dedup import simhash_hamming_join

    return simhash_hamming_join(
        _docs_with_dups(spark, sf_dir), max_hamming=3, bits=32, blocks=6
    )


def o_simhash_join_blocks() -> str:
    return _o_simhash_join()


# ----------------------------------------------------- model-eval wave
from pyspark.sql import functions as F

from contracts.base import read_table

_ARMS = "'click','view','purchase','signup','error'"


def q_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k per task (operators/evals.pass_at_k — the
    HumanEval estimator, exact product form): tasks = users, a sample
    passes when its event value clears the corpus-median-ish bar. One
    map-side-combinable aggregation; k literal so the combinatorial
    ratio unrolls into a fixed expression."""
    from gordo_spark.operators.evals import pass_at_k

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("task"),
        (F.col("value") > 35.0).alias("passed"),
    )
    return pass_at_k(ev, ks=(1, 5, 10))


def _pass_sql(ks=(1, 5, 10)) -> str:
    terms = []
    for k in ks:
        prod = " * ".join(
            f"((CAST(n - c - {i} AS DOUBLE)) / (CAST(n - {i} AS DOUBLE)))"
            for i in range(k)
        )
        terms.append(
            f"CASE WHEN n < {k} THEN NULL WHEN c = 0 THEN 0.0 "
            f"WHEN n - c < {k} THEN 1.0 "
            f"ELSE floor((1.0 - (1.0 * {prod})) * 1000000.0 + 0.5) "
            f"/ 1000000.0 END AS pass_at_{k}"
        )
    cols = ",\n       ".join(terms)
    return f"""
WITH s AS (
  SELECT user_id AS task,
         CASE WHEN value > 35.0 THEN 1 ELSE 0 END AS ok
  FROM events
),
a AS (SELECT task, count(*) AS n, CAST(sum(ok) AS BIGINT) AS c FROM s GROUP BY task)
SELECT task, n, c,
       {cols}
FROM a ORDER BY task
"""


O_EVAL_PASS_AT_K = _pass_sql()


def q_eval_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-consistency aggregation (operators/evals.majority_vote):
    per user, the modal event type with the deterministic (count desc,
    answer asc) tie-break — partitioning-independent winner."""
    from gordo_spark.operators.evals import majority_vote

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("task"),
        F.col("event_type").alias("answer"),
    )
    return majority_vote(ev)


O_EVAL_MAJORITY = """
WITH c AS (
  SELECT user_id AS task, event_type AS answer, count(*) AS votes
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT task, answer, votes,
         row_number() OVER (PARTITION BY task
                            ORDER BY votes DESC, answer ASC) AS rk,
         CAST(sum(votes) OVER (PARTITION BY task) AS BIGINT) AS n_samples,
         count(*) OVER (PARTITION BY task) AS n_distinct
  FROM c
)
SELECT task, n_samples, n_distinct, answer AS top_answer,
       votes AS top_votes,
       floor((CAST(votes AS DOUBLE) / n_samples) * 1000000.0 + 0.5)
         / 1000000.0 AS vote_share
FROM r WHERE rk = 1 ORDER BY task
"""


def _judge_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic synthetic raters over documents: rater j's
    label = the doc's length band shifted when an md5 lane of
    (doc_id, j) fires — so agreement is high but not perfect, the
    regime kappa exists to measure."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    parts = []
    for j in range(3):
        lane = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"fk{j}:"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        flip = F.when(lane < 13107, F.lit(1)).otherwise(F.lit(0))
        idx = (F.col("n_chars") % 3 + flip * F.lit(j + 1)) % 3
        parts.append(
            docs.select(
                F.col("doc_id").alias("item"),
                F.lit(f"rater{j}").alias("rater"),
                F.element_at(
                    F.array(F.lit("keep"), F.lit("drop"), F.lit("review")),
                    (idx + 1).cast("int"),
                ).alias("category"),
            )
        )
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


def q_eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over a 3-rater panel (operators/evals.fleiss_kappa)
    — multi-annotator chance-corrected agreement from pure INTEGER
    sufficient statistics (P_i*n(n-1) and the category totals are
    integers, so the whole statistic is order-free exact)."""
    from gordo_spark.operators.evals import fleiss_kappa

    return fleiss_kappa(_judge_panel(spark, sf_dir))


def _judge_sql(j: int) -> str:
    return f"""
  SELECT doc_id AS item,
         (CAST((n_chars % 3) +
               (CASE WHEN ('0x' || substr(md5('fk{j}:' ||
                     CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT < 13107
                THEN 1 ELSE 0 END) * {j + 1} AS BIGINT) % 3) AS idx
  FROM documents"""


O_EVAL_FLEISS = f"""
WITH r AS (
  SELECT item, (['keep','drop','review'])[CAST(idx + 1 AS INTEGER)] AS cat
  FROM ({_judge_sql(0)} UNION ALL {_judge_sql(1)} UNION ALL {_judge_sql(2)})
),
cell AS (SELECT item, cat, count(*) AS c FROM r GROUP BY 1, 2),
items AS (SELECT item, sum(c * c) - 3 AS num FROM cell GROUP BY item),
tot AS (SELECT count(*) AS n_items, sum(num) AS s FROM items),
cats AS (SELECT cat, sum(c) AS cj FROM cell GROUP BY cat),
ct AS (SELECT count(*) AS n_categories, sum(cj * cj) AS c2 FROM cats)
SELECT n_items, 3 AS n_raters, n_categories,
       floor((CAST(s AS DOUBLE) / (n_items * 6)) * 1000000.0 + 0.5)
         / 1000000.0 AS p_bar,
       floor((CAST(c2 AS DOUBLE) / ((n_items * 3) * (n_items * 3)))
             * 1000000.0 + 0.5) / 1000000.0 AS p_e,
       CASE WHEN CAST(c2 AS DOUBLE) / ((n_items * 3) * (n_items * 3)) = 1.0
            THEN NULL
            ELSE floor(((CAST(s AS DOUBLE) / (n_items * 6)
                         - CAST(c2 AS DOUBLE)
                           / ((n_items * 3) * (n_items * 3)))
                        / (1.0 - CAST(c2 AS DOUBLE)
                           / ((n_items * 3) * (n_items * 3))))
                       * 1000000.0 + 0.5) / 1000000.0 END AS kappa
FROM tot, ct
"""


def q_eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry arena ratings (operators/evals.bradley_terry, 20
    MM steps): pairwise outcomes derived deterministically from events
    (arm vs a user-keyed opponent, winner by the value bar); the heavy
    count aggregation is distributed, the MM fit runs on the
    |models|^2-bounded pair table in exact 1e-9-grid arithmetic — the
    DuckDB oracle unrolls the identical 20 steps as CTEs."""
    from gordo_spark.operators.evals import bradley_terry

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.element_at(
            F.array(
                F.lit("click"), F.lit("view"), F.lit("purchase"),
                F.lit("signup"), F.lit("error"),
            ),
            (F.col("user_id") % 5 + 1).cast("int"),
        ).alias("b"),
        "value",
    ).filter(F.col("a") != F.col("b"))
    duels = ev.select(
        F.when(F.col("value") > 35.0, F.col("a"))
        .otherwise(F.col("b"))
        .alias("winner"),
        F.when(F.col("value") > 35.0, F.col("b"))
        .otherwise(F.col("a"))
        .alias("loser"),
    )
    return bradley_terry(duels, iters=20)


def _bt_sql(iters: int = 20) -> str:
    head = f"""
WITH raw AS (
  SELECT event_type AS a,
         (['click','view','purchase','signup','error'])
           [CAST(user_id % 5 + 1 AS INTEGER)] AS b,
         value
  FROM events
),
g AS (
  SELECT CASE WHEN value > 35.0 THEN a ELSE b END AS w,
         CASE WHEN value > 35.0 THEN b ELSE a END AS l
  FROM raw WHERE a <> b
),
wl AS MATERIALIZED (SELECT w, l, count(*) AS n FROM g GROUP BY 1, 2),
models AS (
  SELECT DISTINCT m FROM (SELECT w AS m FROM wl UNION SELECT l FROM wl)
),
wtot AS MATERIALIZED (
  SELECT m.m AS model,
         CAST(coalesce((SELECT sum(n) FROM wl WHERE w = m.m), 0) AS BIGINT) AS w
  FROM models m
),
npair AS MATERIALIZED (
  SELECT i, j, CAST(sum(n) AS BIGINT) AS nij FROM (
    SELECT w AS i, l AS j, n FROM wl
    UNION ALL SELECT l AS i, w AS j, n FROM wl
  ) GROUP BY i, j
),
p0 AS MATERIALIZED (SELECT model, CAST(1.0 AS DOUBLE) AS p FROM wtot)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
r{k} AS MATERIALIZED (
  SELECT t.model,
         CASE WHEN d.den > 0 AND t.w > 0
              THEN floor((CAST(t.w AS DOUBLE) / d.den) * 1000000000.0
                         + 0.5) / 1000000000.0
              ELSE 0.0 END AS p
  FROM wtot t LEFT JOIN (
    SELECT pi.model,
           CAST(sum(CAST(floor((CAST(np.nij AS DOUBLE) / (pi.p + pj.p))
                               * 1000000000.0 + 0.5) AS HUGEINT))
                AS DOUBLE) / 1000000000.0 AS den
    FROM p{k - 1} pi
    JOIN npair np ON np.i = pi.model
    JOIN p{k - 1} pj ON pj.model = np.j
    WHERE pi.p + pj.p > 0
    GROUP BY pi.model
  ) d ON d.model = t.model
),
p{k} AS MATERIALIZED (
  SELECT model,
         CASE WHEN mn.mean > 0
              THEN floor((p / mn.mean) * 1000000000.0 + 0.5)
                   / 1000000000.0
              ELSE p END AS p
  FROM r{k}, (
    SELECT CAST(sum(CAST(floor(p * 1000000000.0 + 0.5) AS HUGEINT))
                AS DOUBLE) / (count(*) * 1000000000.0) AS mean
    FROM r{k}
  ) mn
)""")
    tail = f"""
SELECT t.model AS model, t.w AS wins,
       CAST((SELECT sum(nij) FROM npair WHERE i = t.model) AS BIGINT) AS games,
       floor(p.p * 1000000.0 + 0.5) / 1000000.0 AS rating
FROM wtot t JOIN p{iters} p ON p.model = t.model
ORDER BY rating DESC, t.model ASC
"""
    return head + "".join(steps) + tail


O_EVAL_BRADLEY_TERRY = _bt_sql()
