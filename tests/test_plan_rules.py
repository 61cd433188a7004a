"""Regression guard for scripts/plan_audit.py's scale rules.

The audit is the repo's 100 TB conscience: it must FIRE on a hinted
broadcast whose build side is an unaggregated corpus scan (the round-2
scale-killers' shape) and must NOT fire when the build side is bounded by
an aggregate, a limit, or a cost-based (unhinted) broadcast the planner
picked because the data is genuinely small.
"""

import contextlib
import importlib.util
import io
import os

import pytest
from pyspark.sql import functions as F

_PA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "plan_audit.py",
)
_spec = importlib.util.spec_from_file_location("plan_audit", _PA_PATH)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)


@pytest.fixture(scope="module")
def docs(spark):
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    return spark.read.parquet(f"{sf}/documents.parquet")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_fires_on_hinted_broadcast_of_unaggregated_corpus_scan(docs):
    # the keep_survivors round-2 shape: broadcast(filter+project of corpus)
    losers = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("k")
    )
    bad = docs.join(F.broadcast(losers), docs.doc_id == F.col("k"), "left_anti")
    flags = plan_audit.unbounded_broadcasts(_plan(bad), "not_allowlisted")
    assert flags and "documents" in flags[0]


def test_quiet_when_aggregate_bounds_the_broadcast(docs):
    per_source = docs.groupBy("source").agg(F.count("*").alias("n"))
    ok = docs.join(F.broadcast(per_source), "source")
    assert plan_audit.unbounded_broadcasts(_plan(ok), "not_allowlisted") == []


def test_quiet_when_limit_bounds_the_broadcast(docs):
    top = docs.orderBy("doc_id").limit(5).select("doc_id")
    ok = docs.join(F.broadcast(top), "doc_id")
    assert plan_audit.unbounded_broadcasts(_plan(ok), "not_allowlisted") == []


def test_allowlist_suppresses_named_pair(docs):
    q = docs.filter(F.col("doc_id") < 10).select(F.col("doc_id").alias("k"))
    bad = docs.join(F.broadcast(q), docs.doc_id == F.col("k"))
    assert plan_audit.unbounded_broadcasts(_plan(bad), "nope") != []
    # the same shape under an allowlisted (query, table) pair is accepted
    key = ("sim_bruteforce", "documents")
    plan_audit.BOUNDED_BROADCAST_OK[key] = "test: bounded by id filter"
    try:
        assert (
            plan_audit.unbounded_broadcasts(_plan(bad), "sim_bruteforce") == []
        )
    finally:
        plan_audit.BOUNDED_BROADCAST_OK.pop(key)


def test_bounded_dim_table_broadcasts_never_flag(spark):
    # nation/region are genuinely bounded dims (25 / 5 rows at ANY sf)
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    nat = spark.read.parquet(f"{sf}/nation.parquet")
    ok = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
    assert plan_audit.unbounded_broadcasts(_plan(ok), "x") == []


def test_fires_on_sf_proportional_table_broadcast(spark):
    # round-4 finding 1: customer/part/supplier grow linearly with scale
    # factor — a hinted broadcast of one is an OOM at sf1000
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    bad = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
    flags = plan_audit.unbounded_broadcasts(_plan(bad), "x")
    assert flags and "supplier" in flags[0]


def test_fires_on_aggregate_keyed_by_corpus_id(spark):
    # round-4's q17/q18 shape: broadcasting an aggregate whose grouping
    # key is a per-entity corpus id (one group per order) — the Aggregate
    # node does NOT bound the build side, so the rule must still fire
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_key"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    bad = li.join(F.broadcast(big), li.l_orderkey == F.col("big_key"))
    flags = plan_audit.unbounded_broadcasts(_plan(bad), "x")
    assert flags and "lineitem" in flags[0]


def test_fires_on_token_keyed_vocab_broadcast(docs):
    # round-7's similarity-join shape: broadcasting a shingle/token-
    # frequency table — an aggregate KEYED ON THE TOKEN, whose output is
    # the corpus vocabulary (Heaps-law corpus-proportional). The round-7
    # audit's blind spot: token keys weren't in UNBOUNDED_AGG_KEY_RE, so
    # the Aggregate counted as bounding. Must fire now.
    exploded = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("_tok")
    )
    freq = exploded.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    bad = exploded.join(F.broadcast(freq), "_tok")
    flags = plan_audit.unbounded_broadcasts(_plan(bad), "not_allowlisted")
    assert flags and "documents" in flags[0]


def test_token_keyed_vocab_with_limit_still_bounds(docs):
    # the lm_quality house precedent: a max_vocab Limit above the token-
    # keyed aggregate bounds the build side — must stay quiet
    exploded = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("_tok")
    )
    vocab = (
        exploded.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .orderBy(F.col("_df").desc(), F.col("_tok").asc())
        .limit(50)
    )
    ok = exploded.join(F.broadcast(vocab), "_tok")
    assert plan_audit.unbounded_broadcasts(_plan(ok), "not_allowlisted") == []


def test_keyless_aggregate_still_bounds(spark):
    # a keyless (1-row) aggregate over a corpus table is always bounded
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    mx = li.agg(F.max("l_quantity").alias("mx"))
    ok = li.join(F.broadcast(mx), li.l_quantity == F.col("mx"))
    assert plan_audit.unbounded_broadcasts(_plan(ok), "x") == []


def test_fires_on_hinted_embedding_broadcast_under_theta_join(spark):
    # the round-8 knn_graph_stats hazard: an explicit broadcast hint on
    # the vector side of a theta-join (src != dst all-pairs cosine). The
    # library de-hinted it in round 9 and the allowlist entry was removed,
    # so a re-added hint must fire.
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("src"), "embedding")
    b = emb.select(F.col("vec_id").alias("dst"), "embedding")
    bad = a.join(F.broadcast(b), F.col("src") != F.col("dst"))
    flags = plan_audit.unbounded_broadcasts(_plan(bad), "knn_graph")
    assert flags and "embeddings" in flags[0]


def test_qround_over_window_binds_operand_once(spark):
    # the round-9 regression tripwire: qround mentions its operand 3x and
    # Catalyst extracts every textual occurrence of a window expression
    # into its own _weN slot (no dedup) — rolling_zscore's plan carried 22
    # slots for 3 distinct window functions (2.3x wall). The bind-once fix
    # must keep the slot count at the distinct-window level.
    import re

    from gordo_spark.operators.smoothing import rolling_zscore

    from gordo_spark.sources.io import read_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    ev = read_table(spark, sf, "events").select(
        F.col("event_type").alias("tag"), "ts", "value"
    )
    out = rolling_zscore(ev, "value", window=24)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    slots = len(set(re.findall(r"_we\d+", plan)))
    assert slots <= 10, f"window-slot blowup: {slots} _weN slots"


def test_knn_graph_stats_plan_has_no_hinted_broadcast(spark):
    # the shipped operator itself: under autoBroadcastJoinThreshold=-1
    # (the audit's hint-exposure pass) its plan must contain NO
    # BroadcastExchange — AQE may still broadcast a genuinely small side
    # at runtime, but nothing is FORCED.
    from gordo_spark.operators.similarity import knn_graph_stats

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").filter(
        F.col("vec_id") < 50
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(knn_graph_stats(emb, k=3))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan
    assert plan_audit.unbounded_broadcasts(plan, "knn_graph") == []
