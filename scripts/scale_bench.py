#!/usr/bin/env python
"""Measured evidence for the scale layouts (not just asserted plans).

Two experiments at sf0.1-ish sizes, timed on the local session:

1. Skew join: a synthetic big table where ONE key owns half the rows,
   joined (broadcast disabled) to a mid-size dim — plain shuffle join vs
   operators/skew.salted_join. Locally the absolute gap is modest (one
   straggler among N local threads still finishes quickly); on a cluster
   the plain join's wall-clock IS the straggler. The interesting locally-
   measurable fact: per-task input sizes equalize (max/median task rows).

2. Bucketed join: lineitem x orders joined plain (SMJ with two shuffles)
   vs pre-bucketed tables (zero Exchange). The bucketed run excludes the
   one-time layout write — that's the amortized cost model.

Writes SCALE_BENCH.md. Run alone (a concurrent JVM skews timings).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gordo_spark import get_spark  # noqa: E402
from gordo_spark.operators.skew import salted_join  # noqa: E402
from gordo_spark.sources.bucketed import colocated_join, write_bucketed  # noqa: E402
from gordo_spark.sources.io import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def skew_experiment(spark):
    n_rows, n_keys = 2_000_000, 1_000
    # key 0 owns ~half the rows; the rest uniform
    big = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise((F.col("id") * 2654435761 % n_keys))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("w")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t_plain = timed(
            "plain", lambda: big.join(dim, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()
        )
        t_salted = timed(
            "salted",
            lambda: salted_join(big, dim, "k", salt=32)
            .agg(F.sum(F.col("v") * F.col("w")))
            .collect(),
        )
        # task balance: rows per shuffle partition of the join key
        plain_parts = (
            big.groupBy("k").count().groupBy(F.pmod(F.hash("k"), 32).alias("p"))
            .agg(F.sum("count").alias("rows")).agg(
                F.max("rows").alias("mx"), F.expr("percentile(rows, 0.5)").alias("md")
            ).collect()[0]
        )
        salted = big.withColumn(
            "_s", F.pmod(F.xxhash64("k", "v"), F.lit(32))
        )
        salted_parts = (
            salted.groupBy("k", "_s").count()
            .groupBy(F.pmod(F.hash("k", "_s"), 32).alias("p"))
            .agg(F.sum("count").alias("rows")).agg(
                F.max("rows").alias("mx"), F.expr("percentile(rows, 0.5)").alias("md")
            ).collect()[0]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return {
        "t_plain_s": round(t_plain, 3),
        "t_salted_s": round(t_salted, 3),
        "plain_max_over_median_partition_rows": round(
            plain_parts["mx"] / max(plain_parts["md"], 1), 1
        ),
        "salted_max_over_median_partition_rows": round(
            salted_parts["mx"] / max(salted_parts["md"], 1), 1
        ),
    }


def bucket_experiment(spark):
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = (
        read_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t_plain = timed(
            "plain-smj",
            lambda: li.join(orders, "l_orderkey").agg(
                F.sum(F.col("l_quantity") * F.col("o_totalprice"))
            ).collect(),
        )
        base = "/tmp/gordo_spark_scale_bench"
        write_bucketed(li, "sb_li", "l_orderkey", buckets=8, path=f"{base}/li")
        write_bucketed(orders, "sb_ord", "l_orderkey", buckets=8, path=f"{base}/ord")
        t_bucketed = timed(
            "bucketed",
            lambda: colocated_join(spark, "sb_li", "sb_ord", "l_orderkey").agg(
                F.sum(F.col("l_quantity") * F.col("o_totalprice"))
            ).collect(),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS sb_li")
        spark.sql("DROP TABLE IF EXISTS sb_ord")
    return {"t_plain_smj_s": round(t_plain, 3), "t_bucketed_s": round(t_bucketed, 3)}


def hot_split_experiment(spark):
    """Planted-boilerplate corpus: documents x20 (shifted ids), half with
    a shared 24-token boilerplate suffix — every fully-inside 10-gram of
    the suffix occurs in HALF the corpus, the power-law key
    repeated_ngram_stats joins on. Measures wall-clock (plain vs adaptive
    split) and the cluster-relevant number: max/median rows per shuffle
    partition of the join input with and without the hot keys removed."""
    import statistics

    from gordo_spark.operators.dedup import _gram_stream, repeated_ngram_stats

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    wide = docs
    for i in range(1, 20):
        wide = wide.unionByName(
            docs.select(
                (F.col("doc_id") + 100_000 * i).alias("doc_id"), "text"
            )
        )
    boiler = " ".join(f"bp{i}" for i in range(24))
    skewed = wide.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" " + boiler)),
        ).otherwise(F.col("text")),
    )
    kw = dict(n=10, hot_min=10_000)  # boilerplate grams ~ |corpus|/2 >> hot_min
    t_plain = timed(
        "plain",
        lambda: repeated_ngram_stats(skewed, hot_k=0, **kw)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    t_split = timed(
        "split",
        lambda: repeated_ngram_stats(skewed, **kw)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )

    grams = _gram_stream(skewed, "doc_id", "text", 10)
    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("_c"))
    hot_keys = [r["gh"] for r in counts.filter(F.col("_c") >= 10_000).collect()]

    def balance(df, nparts=2048):
        # 2048 partitions = cluster-realistic shuffle width. The ratio
        # scales with partition count (hot-key volume is fixed, median
        # partition shrinks), so measuring at local[32]'s 32 partitions
        # would understate the straggler by ~64x.
        rows = (
            df.repartition(nparts, "gh")
            .select(F.spark_partition_id().alias("p"))
            .groupBy("p")
            .count()
            .collect()
        )
        cnts = sorted(r["count"] for r in rows)
        return round(cnts[-1] / statistics.median(cnts), 2)

    return {
        "n_hot_keys": len(hot_keys),
        "t_plain_s": round(t_plain, 3),
        "t_split_s": round(t_split, 3),
        "plain_max_over_median": balance(grams),
        "tail_max_over_median": balance(
            grams.filter(~F.col("gh").isin(hot_keys))
        ),
    }


def paragraph_experiment(spark):
    """Narrow vs naive paragraph dedup on a 10x corpus: the shipped
    operator moves only (id, pos, md5) through every exchange and
    re-derives paragraph text row-locally at the end; the naive plan
    window-ranks over md5(para) CARRYING the text and re-collects it
    through a second shuffle. Wall-clock both; also report the analytic
    bytes-through-exchange ratio (text bytes vs ~48 B/narrow row) —
    at 100 TB the exchange is the bill."""
    from pyspark.sql import Window

    from gordo_spark.operators.dedup import paragraph_dedup, word_blocks

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    wide = docs
    for i in range(1, 10):
        wide = wide.unionByName(
            docs.select((F.col("doc_id") + 100_000 * i).alias("doc_id"), "text")
        )
    # 48-word blocks ~ real paragraph sizes (hundreds of bytes); the
    # narrow row is a constant ~48 B, so the bytes ratio scales with
    # paragraph length — 12-word toy blocks would understate it ~5x
    paras = word_blocks(F.col("text"), 48)

    t_narrow = timed(
        "narrow",
        lambda: paragraph_dedup(wide, paras)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )

    def naive():
        ex = wide.select(
            F.col("doc_id"), F.posexplode(paras).alias("pos", "para")
        ).withColumn("ph", F.md5("para"))
        w = Window.partitionBy("ph").orderBy("doc_id", "pos")
        kept = ex.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        out = kept.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
            ).alias("text_clean"),
        )
        out.write.mode("overwrite").format("noop").save()

    t_naive = timed("naive", naive)

    stats = wide.select(
        F.posexplode(paras).alias("pos", "para")
    ).agg(
        F.sum(F.length("para")).alias("text_bytes"),
        F.count(F.lit(1)).alias("n_paras"),
    ).collect()[0]
    return {
        "t_narrow_s": round(t_narrow, 3),
        "t_naive_s": round(t_naive, 3),
        "text_bytes_per_exchange": int(stats["text_bytes"]),
        "narrow_bytes_per_exchange": int(stats["n_paras"] * 48),
    }


def pq_experiment(spark):
    """IVF-PQ index economics at sf0.1: bytes on disk for the raw vector
    table vs the residual-PQ code index (the RAM/IO multiplier), probe
    wall-clock vs exact brute force (index build excluded — amortized),
    and recall@5 of the compressed probe, measured not asserted."""
    import glob
    import shutil
    import tempfile

    from gordo_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_probe,
        ivf_pq_write,
        recall_at_k,
    )

    embs = read_table(spark, SF_DIR, "embeddings")
    queries = embs.filter(F.col("vec_id") < 10)
    root = tempfile.mkdtemp(prefix="scale_pq_")
    raw_path = os.path.join(root, "raw")
    idx_path = os.path.join(root, "ivfpq")
    embs.select("vec_id", "embedding").write.mode("overwrite").parquet(raw_path)
    ivf_pq_write(embs, idx_path, n_cells=8, m=4, k=16)

    def dir_bytes(d):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(d, "**", "*"), recursive=True)
            if os.path.isfile(f)
        )

    raw_b = dir_bytes(raw_path)
    idx_b = dir_bytes(os.path.join(idx_path, "index"))

    t_exact = timed(
        "exact",
        lambda: cosine_topk(embs, queries, k=5)
        .write.mode("overwrite").format("noop").save(),
    )
    t_pq = timed(
        "pq",
        lambda: ivf_pq_probe(spark, idx_path, queries, kq=5, n_probe=2)
        .write.mode("overwrite").format("noop").save(),
    )
    exact = cosine_topk(embs, queries, k=5)
    recs = {}
    for np_ in (2, 8):
        approx = ivf_pq_probe(spark, idx_path, queries, kq=5, n_probe=np_)
        recs[np_] = float(
            recall_at_k(approx, exact, k=5).agg(F.avg("recall")).collect()[0][0]
        )
    # finer operating point: m=16 (4 dims/subspace) = 4x the code bytes,
    # still ~16x smaller than raw doubles
    idx16 = os.path.join(root, "ivfpq16")
    ivf_pq_write(embs, idx16, n_cells=8, m=16, k=64)
    fine = ivf_pq_probe(spark, idx16, queries, kq=5, n_probe=8)
    rec16 = float(
        recall_at_k(fine, exact, k=5).agg(F.avg("recall")).collect()[0][0]
    )
    idx16_b = dir_bytes(os.path.join(idx16, "index"))
    shutil.rmtree(root, ignore_errors=True)
    return {
        "raw_bytes": raw_b,
        "index_bytes": idx_b,
        "t_exact_s": round(t_exact, 3),
        "t_pq_s": round(t_pq, 3),
        "recall_np2": round(recs[2], 3),
        "recall_np8": round(recs[8], 3),
        "recall_m16": round(rec16, 3),
        "index16_bytes": idx16_b,
    }




def hll_experiment(spark):
    """Distinct-count paths at 5M rows / 2M distinct: exact
    countDistinct (shuffles every distinct pair), deterministic md5-HLL
    (256 register rows per group — the oracle-exact contract sketch),
    native HLL++ (binary sketch state)."""
    n, card, groups = 5_000_000, 2_000_000, 16
    df = spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * 2654435761) % card).cast("string").alias("v"),
    )
    df.write.mode("overwrite").parquet("/tmp/_hll_bench")
    df = spark.read.parquet("/tmp/_hll_bench")

    from gordo_spark.operators.sketches import (
        hll_det_estimate,
        hll_det_registers,
    )

    def run_exact():
        df.groupBy("g").agg(F.countDistinct("v")).collect()

    def run_det():
        hll_det_estimate(hll_det_registers(df, "v", ["g"]), ["g"]).collect()

    def run_native():
        df.groupBy("g").agg(F.approx_count_distinct("v", 0.02)).collect()

    t_exact = round(timed("exact", run_exact), 3)
    t_det = round(timed("det", run_det), 3)
    t_native = round(timed("native", run_native), 3)
    exact = {
        r["g"]: r[1] for r in df.groupBy("g").agg(F.countDistinct("v")).collect()
    }
    det = {
        r["g"]: r["hll_distinct"]
        for r in hll_det_estimate(hll_det_registers(df, "v", ["g"]), ["g"]).collect()
    }
    err = max(abs(det[g] - exact[g]) / exact[g] for g in exact)
    pairs = df.select("g", "v").distinct().count()
    return {
        "t_exact_s": t_exact,
        "t_det_s": t_det,
        "t_native_s": t_native,
        "max_rel_err": round(err, 4),
        "exact_shuffled_pairs": pairs,
        "sketch_rows": groups * 256,
    }




def zorder_experiment(spark):
    """Multi-dim file skipping at sf0.1: lineitem laid out sorted by
    l_partkey vs z-ordered on (l_partkey, l_suppkey), 64 files each;
    count the files whose min/max rectangle overlaps a ~2% band on each
    dimension (what a stats-pruning scan would read)."""
    from gordo_spark.sources.zorder import file_ranges, write_zordered

    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    plain, zpath = "/tmp/_zb_plain", "/tmp/_zb_zord"
    n_files = 64
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(plain)
    )
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
    hi_p = li.agg(F.max("l_partkey")).collect()[0][0]
    hi_s = li.agg(F.max("l_suppkey")).collect()[0][0]
    bp = (1, max(2, hi_p // 50))
    bs = (1, max(2, hi_s // 50))

    def overlapping(path, col, lo, hi):
        fr = file_ranges(spark, path, ["l_partkey", "l_suppkey"])
        return fr.filter(
            (F.col(f"min_{col}") <= hi) & (F.col(f"max_{col}") >= lo)
        ).count()

    return {
        "n_files": n_files,
        "plain_partkey": overlapping(plain, "l_partkey", *bp),
        "plain_suppkey": overlapping(plain, "l_suppkey", *bs),
        "z_partkey": overlapping(zpath, "l_partkey", *bp),
        "z_suppkey": overlapping(zpath, "l_suppkey", *bs),
    }


def iter_lineage_experiment(spark):
    """Fixed-iteration PageRank (8 rounds) on a synthetic 200k-edge
    graph: LAZY lineage (every iteration's plan re-derives the whole
    upstream edge build — the naive composition) vs the shipped
    operator's localCheckpoint-truncated base frames. The scan count in
    the lazy plan is the cluster number: it multiplies the most
    expensive stage by the iteration count."""
    n_edges, n_nodes = 200_000, 50_000
    raw = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("x"),
        ((F.col("id") * 2654435761) % n_nodes).alias("y"),
    ).filter("x != y").select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    )
    raw.write.mode("overwrite").parquet("/tmp/_pr_edges")
    base = spark.read.parquet("/tmp/_pr_edges")
    # nontrivial edge build, same shape as co_occurrence_edges' output
    def build_edges():
        return base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n")).drop("n")

    def lazy_pagerank():
        e = build_edges()
        dirs = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("_e")
        ).select("_e.src", "_e.dst")
        deg = dirs.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("_d")
        )
        total = deg.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        nodes = deg.crossJoin(F.broadcast(total))
        ranks = nodes.select("v", "_d", "_n", (1.0 / F.col("_n")).alias("r"))
        for _ in range(8):
            contrib = (
                ranks.select("v", (F.col("r") / F.col("_d")).alias("_c"))
                .join(dirs, F.col("v") == F.col("src"))
                .groupBy(F.col("dst").alias("v"))
                .agg(F.sum("_c").alias("_s"))
            )
            ranks = nodes.join(contrib, "v", "left").select(
                "v", "_d", "_n",
                ((1.0 - 0.85) / F.col("_n")
                 + 0.85 * F.coalesce(F.col("_s"), F.lit(0.0))).alias("r"),
            )
        return ranks.select("v", F.round("r", 6).alias("rank"))

    from gordo_spark.operators.graph import pagerank

    lazy_plan = lazy_pagerank()._jdf.queryExecution().executedPlan().toString()
    t_lazy = round(timed("lazy", lambda: lazy_pagerank().collect()), 3)
    t_ckpt = round(
        timed("ckpt", lambda: pagerank(build_edges(), 0.85, 8).collect()), 3
    )
    return {
        "t_lazy_s": t_lazy,
        "t_ckpt_s": t_ckpt,
        "lazy_scans": lazy_plan.count("Scan parquet"),
    }


def tenx_experiment(spark):
    """sf0.1 vs a 10x-replicated corpus (sf1-equivalent volume): does
    the end-to-end dedup pipeline (minhash -> LSH -> label-prop
    components -> survivors) and fixed-iteration PageRank scale
    near-linearly, as the docstring envelopes argue?

    Replicated documents are PERTURBED per replica (a 10-letter
    consonant/vowel rotation via ``translate``) so each replica is a
    DISTINCT document: duplicate-group count scales 10x while group
    size stays 2 (the contract fixture's exact-copy union). A verbatim
    10x copy would grow within-group candidate pairs quadratically and
    measure a different (and unrealistic) workload.

    PageRank's 10x input replicates lineitem with shifted order keys:
    the item domain is fixed, so co-occurrence SUPPORT grows and the
    support-filtered edge set densifies — n_edges is reported alongside
    wall time because per-iteration cost is edge-volume-bound, not
    input-row-bound.
    """
    from gordo_spark.operators.dedup import (
        connected_components,
        keep_survivors,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from gordo_spark.operators.graph import co_occurrence_edges, pagerank

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    alpha = "aeiousnrtl"

    # the replica (+r*1_000_000) and duplicate-copy (+100_000) id offsets
    # assume the corpus id domain fits under them — if it outgrew either,
    # replicas/dups would silently COLLIDE with real ids, merging distinct
    # documents and distorting the measured workload. Assert, don't hope.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    assert max_id is not None and max_id < 100_000, (
        f"tenx_experiment id offsets assume max(doc_id) < 100_000; "
        f"got {max_id} — raise the offsets (next power of ten above it)"
    )

    def corpus(mult):
        reps = []
        for r in range(mult):
            rot = alpha[r:] + alpha[:r]
            reps.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                    F.translate(F.col("text"), alpha, rot).alias("text"),
                )
            )
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        # every text exactly twice — the contract fixture's dup shape
        return out.unionByName(
            out.withColumn("doc_id", F.col("doc_id") + 100_000)
        )

    def dedup_run(mult):
        d = corpus(mult)
        sigs = minhash_signatures(d, num_hashes=8)
        pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
        return keep_survivors(d, connected_components(pairs)).count()

    n1 = dedup_run(1)  # warm (footers, codegen)
    t_d1 = round(timed("dedup 1x", lambda: dedup_run(1)), 3)
    t_d10 = round(timed("dedup 10x", lambda: dedup_run(10), n=2), 3)
    n10 = dedup_run(10)

    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    max_ok = li.agg(F.max("l_orderkey")).first()[0]
    assert max_ok is not None and max_ok < 10_000_000, (
        f"replica offset assumes max(l_orderkey) < 10_000_000; got {max_ok}"
    )

    def li_mult(mult):
        parts = [
            li.select(
                (F.col("l_orderkey") + F.lit(r * 10_000_000)).alias(
                    "l_orderkey"
                ),
                "l_partkey",
            )
            for r in range(mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def pr_run(mult):
        edges = co_occurrence_edges(
            li_mult(mult), "l_orderkey", "l_partkey", min_support=2
        )
        return pagerank(edges, 0.85, 8).count()

    def n_edges(mult):
        return co_occurrence_edges(
            li_mult(mult), "l_orderkey", "l_partkey", min_support=2
        ).count()

    pr_run(1)  # warm
    t_p1 = round(timed("pagerank 1x", lambda: pr_run(1)), 3)
    t_p10 = round(timed("pagerank 10x", lambda: pr_run(10), n=2), 3)
    return {
        "dedup_docs_1x": n1,
        "dedup_docs_10x": n10,
        "t_dedup_1x_s": t_d1,
        "t_dedup_10x_s": t_d10,
        "pr_edges_1x": n_edges(1),
        "pr_edges_10x": n_edges(10),
        "t_pr_1x_s": t_p1,
        "t_pr_10x_s": t_p10,
    }


def sparse_prune_experiment(spark):
    """sparse_cosine_pairs' max_df prune, measured: the candidate-pair
    volume of the term-keyed self-join is sum over terms of
    df*(df-1)/2 — computed ANALYTICALLY from the document-frequency
    table for the unpruned case (running it would be the quadratic
    blowup the prune exists to prevent) and compared with the pruned
    volume the shipped operator actually joins, plus the pruned
    operator's wall time."""
    from pyspark.sql import functions as F

    from gordo_spark.operators.text import sparse_cosine_pairs, tokens

    docs = read_table(spark, SF_DIR, "documents")
    exf = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    df_t = exf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    vol = df_t.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("all_pairs"),
        F.sum(
            F.when(
                F.col("df") <= 400, F.col("df") * (F.col("df") - 1) / 2
            ).otherwise(F.lit(0))
        ).alias("pruned_pairs"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum((F.col("df") > 400).cast("long")).alias("n_pruned_terms"),
    ).collect()[0]
    t = round(
        timed(
            "sparse pruned",
            lambda: sparse_cosine_pairs(
                docs, max_df=400, min_cosine=0.2, top_k=50
            ).collect(),
        ),
        3,
    )
    return {
        "all_pairs": int(vol["all_pairs"]),
        "pruned_pairs": int(vol["pruned_pairs"]),
        "n_terms": int(vol["n_terms"]),
        "n_pruned_terms": int(vol["n_pruned_terms"]),
        "t_pruned_s": t,
    }



def simjoin_experiment(spark):
    """Exact-similarity family at 1x and 10x volume + PPJoin filter
    ablation. Two claims under measurement: (1) the rare-first prefix
    filter bounds candidate volume ~linearly in corpus size (replicas
    are vocabulary-rotated, so cross-replica candidates ~ 0 — the
    realistic envelope); (2) the round-8 length+positional filters cut
    the candidates the verify join must pay for, at identical recall
    (both modes are EXACT — they differ only in false candidates)."""
    from gordo_spark.operators.dedup import (
        connected_components,
        containment_candidates,
        containment_join,
        jaccard_candidates,
        jaccard_threshold_join,
        shingle_token_table,
    )
    from gordo_spark.operators.linkage import blocked_pairs

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    alpha = "aeiousnrtl"
    max_id = docs.agg(F.max("doc_id")).first()[0]
    assert max_id is not None and max_id < 1_000_000

    def corpus(mult):
        reps = []
        for r in range(mult):
            rot = alpha[r:] + alpha[:r]
            reps.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                    F.translate(F.col("text"), alpha, rot).alias("text"),
                )
            )
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        # planted near-dups: first 30 words of every 5th doc (containment
        # hits) ride along so the 10x workload has real matches to verify
        return out.unionByName(
            out.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat_ws(
                    " ", F.slice(F.split(F.col("text"), " "), 1, 30)
                ).alias("text"),
            )
        )

    def jac_run(mult):
        return jaccard_threshold_join(corpus(mult), threshold=0.9).count()

    def con_run(mult):
        return containment_join(corpus(mult), threshold=0.9).count()

    jac_run(1)  # warm
    t_j1 = round(timed("jaccard 1x", lambda: jac_run(1), n=2), 3)
    t_j10 = round(timed("jaccard 10x", lambda: jac_run(10), n=1), 3)
    t_c1 = round(timed("containment 1x", lambda: con_run(1), n=2), 3)
    t_c10 = round(timed("containment 10x", lambda: con_run(10), n=1), 3)

    # ER at 10x: replicate customers across synthetic nation shards so
    # block sizes stay constant (the blocking-bound claim) and volume 10x
    cust = read_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    max_ck = cust.agg(F.max("c_custkey")).first()[0]
    assert max_ck is not None and max_ck < 10_000_000

    def cust_mult(mult):
        parts = [
            cust.select(
                (F.col("c_custkey") + F.lit(r * 10_000_000)).alias("c_custkey"),
                "c_name",
                (F.col("c_nationkey") + F.lit(r * 100)).alias("c_nationkey"),
                "c_mktsegment",
            )
            for r in range(mult)
        ]
        out = parts[0]
        for prt in parts[1:]:
            out = out.unionByName(prt)
        return out

    def er_run(mult):
        pairs = blocked_pairs(
            cust_mult(mult),
            "c_custkey",
            "c_name",
            ["c_nationkey", "c_mktsegment"],
            max_dist=1,
        )
        return connected_components(pairs.select("id_a", "id_b")).count()

    er_run(1)  # warm
    t_e1 = round(timed("er 1x", lambda: er_run(1), n=2), 3)
    t_e10 = round(timed("er 10x", lambda: er_run(10), n=1), 3)

    # filter ablation at 1x workload (with planted containment dups)
    c1 = corpus(1)
    toks_j = shingle_token_table(c1)
    jc_prefix = jaccard_candidates(toks_j, 0.9, filters="prefix").count()
    jc_full = jaccard_candidates(toks_j, 0.9, filters="ppjoin").count()
    cc_prefix = containment_candidates(toks_j, 0.9, filters="prefix").count()
    cc_full = containment_candidates(toks_j, 0.9, filters="ppjoin").count()

    return {
        "t_jac_1x_s": t_j1,
        "t_jac_10x_s": t_j10,
        "t_con_1x_s": t_c1,
        "t_con_10x_s": t_c10,
        "t_er_1x_s": t_e1,
        "t_er_10x_s": t_e10,
        "jac_cand_prefix": jc_prefix,
        "jac_cand_ppjoin": jc_full,
        "con_cand_prefix": cc_prefix,
        "con_cand_ppjoin": cc_full,
    }


def simhash_banding_experiment(spark):
    """SimHash banding vs Manku multi-block keys (round 11) on a planted
    HEAVY-BUCKET corpus: half the docs share a 40-word boilerplate
    prefix, so their fingerprints agree on most bits and pile into the
    same band buckets — the regime where contiguous k+1 banding's
    per-bucket quadratic blows up. The measured number is CANDIDATE
    VOLUME (the rows the verify join must pay for — the pre-distinct
    bucket self-join size IS the shuffle+compare bill at scale); wider
    C(b, k) combination keys shrink buckets exponentially at the cost
    of C(b, k) posting tables. Output equality asserted in-script
    (both schemes are guaranteed-recall + exact-verify)."""
    from gordo_spark.operators.dedup import (
        simhash,
        simhash_hamming_join,
        simhash_posting_lists,
    )

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    boiler = " ".join(f"bp{i}" for i in range(40))
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(boiler + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fps = simhash(corpus, bits=32).localCheckpoint()
    out = {"n_docs": fps.count()}
    for label, blocks in (("banded", None), ("b6", 6), ("b8", 8)):
        ex = simhash_posting_lists(fps, 32, 3, blocks=blocks)
        out[f"cand_{label}"] = (
            ex.alias("a")
            .join(ex.alias("b"), ["_b", "_v"])
            .filter(F.col("a._id") < F.col("b._id"))
            .count()
        )
        out[f"tables_{label}"] = 4 if blocks is None else 20 if blocks == 6 else 56

    def run(blocks):
        return simhash_hamming_join(
            corpus, max_hamming=3, bits=32, blocks=blocks
        ).count()

    pairs = run(None)
    assert run(6) == pairs and run(8) == pairs  # identical output
    out["pairs"] = pairs
    out["t_banded_s"] = round(timed("sh banded", lambda: run(None), n=2), 3)
    out["t_b6_s"] = round(timed("sh b6", lambda: run(6), n=2), 3)
    out["t_b8_s"] = round(timed("sh b8", lambda: run(8), n=2), 3)
    return out


def fleet_experiment(spark):
    """Fleet-width multi-machine path (plans/multi.fleet_long_frame):
    the stacked O(1)-size plan vs per-machine solo plans. The cluster
    claim: fleet cost ~ one shared scan + output-sized work, solo cost
    ~ one full scan PER MACHINE — the reference's pod-per-machine
    architecture re-reads the lake N times."""
    from itertools import combinations

    from gordo_spark.plans import TimeSeriesDataset, fleet_long_frame

    types = ["click", "view", "purchase", "signup", "error"]
    combos = [list(c) for c in combinations(types, 3)]

    def fleet(n):
        out = {}
        for i in range(n):
            d0 = 1 + (i // len(combos)) % 20
            out[f"m{i:04d}"] = TimeSeriesDataset(
                tag_list=combos[i % len(combos)],
                train_start_date=f"2024-01-{d0:02d} 00:00:00",
                train_end_date=f"2024-01-{d0 + 8:02d} 00:00:00",
                resolution="1H",
                interpolation_method="ffill",
                interpolation_limit="6H",
                data_provider={
                    "type": "EventsAsSensorProvider",
                    "sf_dir": SF_DIR,
                },
            )
        return out

    def run_fleet(n):
        fleet_long_frame(spark, fleet(n)).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_solo(n):
        for ds in fleet(n).values():
            ds.long_filled(spark).write.mode("overwrite").format("noop").save()

    def compile_stats(n):
        # driver-side cost of fleet width: config -> optimized plan, and
        # the plan's size — the two things that COULD grow with machines
        t0 = time.time()
        plan = (
            fleet_long_frame(spark, fleet(n))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return round(time.time() - t0, 3), len(plan.splitlines())

    run_fleet(20)  # warm
    t_f20 = round(timed("fleet 20", lambda: run_fleet(20), n=2), 3)
    t_f200 = round(timed("fleet 200", lambda: run_fleet(200), n=2), 3)
    t_f2000 = round(timed("fleet 2000", lambda: run_fleet(2000), n=2), 3)
    t_s20 = round(timed("solo 20", lambda: run_solo(20), n=2), 3)
    c200_t, c200_lines = compile_stats(200)
    c2000_t, c2000_lines = compile_stats(2000)
    assert c2000_lines == c200_lines, (
        f"fleet plan must be O(1) in width: {c200_lines} lines at 200 vs "
        f"{c2000_lines} at 2000"
    )
    return {
        "t_fleet_20_s": t_f20,
        "t_fleet_200_s": t_f200,
        "t_fleet_2000_s": t_f2000,
        "t_solo_20_s": t_s20,
        "solo_200_implied_s": round(t_s20 * 10, 1),
        "solo_2000_implied_s": round(t_s20 * 100, 1),
        "compile_200": {"s": c200_t, "plan_lines": c200_lines},
        "compile_2000": {"s": c2000_t, "plan_lines": c2000_lines},
    }




def grid_invariance_experiment(spark):
    """matrix_profile's cost claim is that the quadratic term is bound
    by the CALENDAR grid, not event volume: the resample collapses
    volume first, so 10x the events over the SAME time range must cost
    ~the same wall (the pairs count is identical). Replicas jitter the
    value (not the timestamp), so the grid cells change value but the
    grid — and the pair space — does not.
    """
    from gordo_spark.operators.resample import resample_aggregate
    from gordo_spark.operators.tsa import matrix_profile

    ev = read_table(spark, SF_DIR, "events").select(
        "ts", "event_type", "value"
    )

    def volume(mult):
        reps = [
            ev.withColumn("value", F.col("value") * F.lit(1.0 + 0.01 * r))
            for r in range(mult)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out

    def run(mult):
        long = volume(mult).select(
            F.col("event_type").alias("tag"), "ts", "value"
        )
        res = resample_aggregate(long, "1H", "mean").filter(
            F.col("tag").isin("click", "purchase")
        )
        return matrix_profile(res, m=8, precision=3)

    n_1x = run(1).count()
    t1 = round(timed("mp 1x", lambda: run(1).count()), 3)
    n_10x = run(10).count()
    t10 = round(timed("mp 10x", lambda: run(10).count()), 3)

    # the round-9 horizon band on a MULTI-YEAR grid: a 3-year hourly
    # series (26,280 positions) is where the full profile's quadratic
    # bites (~6.9e8 pairs/tag); horizon=168 (one week) makes the pair
    # space linear (positions x 2*168) — measure both
    def synth_years(years):
        n = years * 365 * 24
        return (
            spark.range(n)
            .select(
                F.lit("syn").alias("tag"),
                F.timestamp_seconds(
                    F.lit(1704067200) + F.col("id") * 3600
                ).alias("ts"),
                (
                    F.sin(F.col("id") % 24 / 24.0 * 6.2831853)
                    + (F.col("id") % 7919) / 7919.0
                ).alias("value"),
            )
        )

    from gordo_spark.operators.tsa import matrix_profile as _mp

    long3 = synth_years(3)
    t_banded = round(timed(
        "mp 3y banded",
        lambda: _mp(long3, m=24, precision=3, horizon=168).count(),
    ), 3)
    return {
        "t_1x_s": t1,
        "t_10x_s": t10,
        "windows_1x": n_1x,
        "windows_10x": n_10x,
        "t_3y_banded_s": t_banded,
        "positions_3y": 3 * 365 * 24 - 23,
    }


def drift_sweep_experiment(spark):
    """Fleet-wide drift sweep (round 10): perm_test_drift over a
    W-machine long frame — hypothesis key = machine:tag — then BH FDR
    over the whole family. The scale claim: the sweep is ONE
    aggregation pass whose cost is bounded by ROWS (the hypothesis
    width only changes the group count of a map-side-combinable
    aggregate), and the BH step is rank arithmetic over the bounded
    family — so 10x the machines costs ~nothing beyond the group
    bookkeeping, where a per-machine testing loop would pay a scan per
    machine."""
    from gordo_spark.operators.tsa import bh_fdr, perm_test_drift

    ev = read_table(spark, SF_DIR, "events")

    def sweep(width):
        long = ev.select(
            F.concat(
                F.lit("m"),
                (F.col("user_id") % width).cast("string"),
                F.lit(":"),
                F.col("event_type"),
            ).alias("tag"),
            "ts",
            "value",
            "event_id",
        )
        return bh_fdr(perm_test_drift(long, n_perm=39), q=0.10)

    def run(width):
        sweep(width).write.mode("overwrite").format("noop").save()

    t20 = timed("w20", lambda: run(20))
    t200 = timed("w200", lambda: run(200))
    fam20 = sweep(20).count()
    fam200 = sweep(200).count()
    plan200 = len(
        sweep(200)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
        .splitlines()
    )
    return {
        "t_w20_s": round(t20, 2),
        "t_w200_s": round(t200, 2),
        "family_20": fam20,
        "family_200": fam200,
        "plan_lines_200": plan200,
    }


def main():
    spark = get_spark("scale_bench")
    skew = skew_experiment(spark)
    bucket = bucket_experiment(spark)
    hot = hot_split_experiment(spark)
    para = paragraph_experiment(spark)
    pq = pq_experiment(spark)
    hll = hll_experiment(spark)
    zo = zorder_experiment(spark)
    il = iter_lineage_experiment(spark)
    tx = tenx_experiment(spark)
    sp = sparse_prune_experiment(spark)
    sj = simjoin_experiment(spark)
    fl = fleet_experiment(spark)
    gi = grid_invariance_experiment(spark)
    dr = drift_sweep_experiment(spark)
    sb = simhash_banding_experiment(spark)
    lines = [
        "# SCALE_BENCH — measured layout effects (local[32], best of 3)",
        "",
        "Generated by `python scripts/scale_bench.py` (run it alone).",
        "",
        "## Skew join (2M rows, 1k keys, one key owns 50%)",
        "",
        f"- plain shuffle join: {skew['t_plain_s']} s; "
        f"max/median rows per shuffle partition = "
        f"{skew['plain_max_over_median_partition_rows']}x",
        f"- salted_join (salt=32): {skew['t_salted_s']} s; "
        f"max/median rows per shuffle partition = "
        f"{skew['salted_max_over_median_partition_rows']}x",
        "",
        "The partition-balance ratio is the cluster-relevant number: plain",
        "puts the hot key's entire volume in ONE task (wall-clock = that",
        "straggler at scale); salting spreads it across the salt space.",
        "",
        "## Fact-fact join at sf0.1 (lineitem x orders on orderkey)",
        "",
        f"- plain SortMergeJoin (2 shuffles): {bucket['t_plain_smj_s']} s",
        f"- pre-bucketed colocated join (0 Exchange): {bucket['t_bucketed_s']} s",
        "",
        "Bucketed excludes the one-time layout write: the layout is paid",
        "once and amortized over every subsequent join on that key.",
        "",
        "## Hot-gram split (repeated_ngram_stats, 100k docs, 50% boilerplate)",
        "",
        f"- {hot['n_hot_keys']} grams above the hot cutoff (each in ~half "
        "the corpus)",
        f"- plain shuffle count-join: {hot['t_plain_s']} s; gram-key "
        "shuffle max/median partition rows AT CLUSTER WIDTH (2048 "
        f"partitions) = {hot['plain_max_over_median']}x",
        f"- adaptive hot/tail split: {hot['t_split_s']} s; TAIL shuffle "
        f"max/median partition rows = {hot['tail_max_over_median']}x",
        "",
        "The balance ratio is the cluster number: at a 2048-wide shuffle,",
        "plain lands each boilerplate gram's whole volume in one task (the",
        "straggler whose finish time IS the stage's); the split's broadcast",
        "branch absorbs those keys so the shuffle only carries the balanced",
        "tail. Local wall-clock runs the OTHER way (the split's extra scan",
        "costs more than 32 local threads lose to a straggler) — which is",
        "exactly why the split is ADAPTIVE: the sampled probe engages it",
        "only when some key's volume crosses hot_min, the point where one",
        "task's input stops fitting the task-size envelope; below that the",
        "operator stays on the plain join (and AQE's skew-split smooths",
        "partition-level imbalance).",
        "",
        "## Paragraph dedup: narrow vs text-through-shuffle (100k docs)",
        "",
        f"- shipped narrow plan ((id, pos, md5) exchanges only): "
        f"{para['t_narrow_s']} s",
        f"- naive plan (window over md5 carrying text + collect_list "
        f"re-shuffle): {para['t_naive_s']} s",
        f"- bytes offered to a text-carrying exchange: "
        f"{para['text_bytes_per_exchange']:,} vs narrow "
        f"{para['narrow_bytes_per_exchange']:,} "
        f"(~{round(para['text_bytes_per_exchange'] / max(para['narrow_bytes_per_exchange'], 1), 1)}x)",
        "",
        "Local wall-clock favors the NAIVE plan (fewer jobs, RAM-speed",
        "shuffle, tiny corpus) — the narrow design is not a local win and",
        "is not claimed as one. The bytes column is the cluster number:",
        "the narrow row is a constant ~48 B while text bytes scale with",
        "paragraph length, and the naive plan ships the full corpus text",
        "through TWO exchanges (rank + reassembly). At 100 TB the",
        "exchange is the bill.",
        "",
        "## IVF-PQ index economics (embeddings at sf0.1, m=4 k=16, n_probe=2/8)",
        "",
        f"- bytes on disk: raw vectors {pq['raw_bytes']:,} vs PQ code index "
        f"{pq['index_bytes']:,} "
        f"(~{round(pq['raw_bytes'] / max(pq['index_bytes'], 1), 1)}x smaller)",
        f"- probe wall-clock: exact brute force {pq['t_exact_s']} s vs "
        f"IVF-PQ probe {pq['t_pq_s']} s (build excluded — amortized)",
        f"- recall@5: {pq['recall_np2']} at n_probe=2, {pq['recall_np8']} "
        "at n_probe=8 (full scan; the residue below 1.0 is pure PQ",
        "  quantization loss on these near-random vectors, the gap between",
        "  the two operating points is cell-miss loss)",
        f"- accuracy dial: m=16, k=64 ({pq['index16_bytes']:,} bytes, still "
        f"~{round(pq['raw_bytes'] / max(pq['index16_bytes'], 1), 1)}x smaller) "
        f"lifts recall@5 to {pq['recall_m16']}",
        "",
        "The disk ratio is the cluster number: the probe reads",
        "n_probe/n_cells of the partition directories AND m small ints per",
        "vector instead of d doubles — multiplicative reductions that both",
        "grow with corpus size, while recall is tuned by (m, k, n_probe).",
        "These near-random synthetic embeddings are PQ's worst case;",
        "clustered real embeddings sit far higher at the same settings.",
        "",
        "## Distinct counting at 5M rows / 2M distinct, 16 groups",
        "",
        f"- exact countDistinct: {hll['t_exact_s']} s; the expanded",
        f"  aggregate shuffles every distinct (group, value) pair — ",
        f"  {hll['exact_shuffled_pairs']:,} rows of intermediate state",
        f"- deterministic md5-HLL (contract sketch): {hll['t_det_s']} s; ",
        f"  {hll['sketch_rows']:,} register rows TOTAL (256/group, constant",
        "  at any cardinality), max relative error "
        f"{hll['max_rel_err']} (m=256 -> ~6.5% rsd; and bit-identical in",
        "  any engine with md5 — the estimate itself is oracle-checked)",
        f"- native HLL++ (rsd 2%): {hll['t_native_s']} s (binary sketch",
        "  state; the default when oracle-exactness is not required)",
        "",
        "The state row counts are the cluster numbers: the exact path's",
        "intermediate grows with cardinality (petabyte-scale at 100 TB),",
        "both sketch paths stay constant per group and merge map-side.",
        "",
        "## Z-order file skipping (lineitem sf0.1, 64 files, ~2% band per dim)",
        "",
        f"- sorted by l_partkey: a partkey band touches "
        f"{zo['plain_partkey']}/{zo['n_files']} files, but a SUPPKEY band "
        f"touches {zo['plain_suppkey']}/{zo['n_files']} — the second",
        "  dimension's stats span the whole domain in every file",
        f"- z-ordered (partkey, suppkey): partkey band "
        f"{zo['z_partkey']}/{zo['n_files']} files, suppkey band "
        f"{zo['z_suppkey']}/{zo['n_files']} — BOTH dimensions prune",
        "",
        "The one-column sort wins slightly on its own key and loses the",
        "entire second dimension; the Morton layout pays one re-layout",
        "shuffle for rectangle stats on every participating key — at",
        "100 TB the skipped files are the scan bill.",
        "",
        "## Iterative lineage: lazy vs localCheckpoint (PageRank, 8 rounds, 200k edges)",
        "",
        f"- lazy composition: {il['t_lazy_s']} s; the final plan contains "
        f"{il['lazy_scans']} parquet scans — every iteration re-derives "
        "the edge build",
        f"- shipped operator (edges/degrees localCheckpoint'd once): "
        f"{il['t_ckpt_s']} s; 1 scan into the checkpoint, iterations then "
        "touch only node-keyed frames",
        "",
        "The scan count is the cluster number: lazy lineage multiplies the",
        "most expensive upstream stage by the iteration count (at 100 TB",
        "the edge build IS the job), while truncation pays it once and",
        "bounds checkpoint storage by the item-cardinality frames. Same",
        "discipline as connected_components; any fixed-iteration algorithm",
        "composed of joins inherits it.",
        "",
        "## 10x scale-up (sf0.1 -> sf1-equivalent volume)",
        "",
        "| pipeline | 1x | 10x | wall ratio |",
        "|---|---|---|---|",
        f"| dedup survivors (minhash->LSH->components->keep) | "
        f"{tx['t_dedup_1x_s']} s / {tx['dedup_docs_1x']:,} survivors | "
        f"{tx['t_dedup_10x_s']} s / {tx['dedup_docs_10x']:,} survivors | "
        f"{round(tx['t_dedup_10x_s'] / tx['t_dedup_1x_s'], 1)}x |",
        f"| pagerank 8 iters (co-purchase graph) | "
        f"{tx['t_pr_1x_s']} s / {tx['pr_edges_1x']:,} edges | "
        f"{tx['t_pr_10x_s']} s / {tx['pr_edges_10x']:,} edges | "
        f"{round(tx['t_pr_10x_s'] / tx['t_pr_1x_s'], 1)}x |",
        "",
        "Replicated docs are perturbed per replica (translate rotation) so",
        "dup-group count scales 10x at constant group size — the realistic",
        "envelope; a verbatim copy would square within-group candidates.",
        "A dedup wall ratio near 10x on 10x docs validates the LSH",
        "candidate-volume bound (band buckets stay balanced, no all-pairs",
        "blowup). PageRank's input keeps the item domain fixed, so support",
        "DENSIFIES the edge set — compare the wall ratio against the edge",
        "ratio, not the input ratio: per-iteration cost is edge-bound.",
        "",
        "## Sparse-cosine max_df prune (documents at bench scale)",
        "",
        f"- candidate pairs WITHOUT the prune (analytic sum df(df-1)/2): "
        f"{sp['all_pairs']:,}",
        f"- candidate pairs the shipped operator joins (max_df=400): "
        f"{sp['pruned_pairs']:,} "
        f"({sp['n_pruned_terms']} of {sp['n_terms']} terms pruned)",
        f"- pruned operator wall time: {sp['t_pruned_s']} s (the unpruned "
        "join is not run — its volume IS the blowup the prune prevents)",
        "",
        "A ubiquitous term contributes ~0 idf signal but df^2/2 candidate",
        "pairs; at corpus scale the prune is the difference between a",
        "bounded inverted-index join and an accidental all-pairs product.",
        "",
        "## Exact-similarity family at 10x + PPJoin filter ablation",
        "",
        "| pipeline | 1x | 10x | wall ratio |",
        "|---|---|---|---|",
        f"| jaccard_threshold_join (t=0.9) | {sj['t_jac_1x_s']} s | "
        f"{sj['t_jac_10x_s']} s | "
        f"{round(sj['t_jac_10x_s'] / sj['t_jac_1x_s'], 1)}x |",
        f"| containment_join (t=0.9) | {sj['t_con_1x_s']} s | "
        f"{sj['t_con_10x_s']} s | "
        f"{round(sj['t_con_10x_s'] / sj['t_con_1x_s'], 1)}x |",
        f"| er_entities (blocking -> levenshtein -> components) | "
        f"{sj['t_er_1x_s']} s | {sj['t_er_10x_s']} s | "
        f"{round(sj['t_er_10x_s'] / sj['t_er_1x_s'], 1)}x |",
        "",
        "Replicas are vocabulary-rotated (sim joins) / nation-shifted (ER)",
        "so per-block and per-posting-list sizes stay constant while volume",
        "grows 10x — a wall ratio near 10x validates the candidate bounds",
        "(prefix posting lists / sum-of-block-squares) the docstrings argue.",
        "",
        "Candidate-count ablation at 1x (identical exact recall, fewer",
        "false candidates reaching the verify join):",
        "",
        f"- jaccard: prefix-only {sj['jac_cand_prefix']:,} -> full PPJoin "
        f"(length+positional) {sj['jac_cand_ppjoin']:,} "
        f"({round(100 * (1 - sj['jac_cand_ppjoin'] / max(sj['jac_cand_prefix'], 1)))}% fewer)",
        f"- containment: prefix-only {sj['con_cand_prefix']:,} -> full "
        f"{sj['con_cand_ppjoin']:,} "
        f"({round(100 * (1 - sj['con_cand_ppjoin'] / max(sj['con_cand_prefix'], 1)))}% fewer)",
        "",
        "## Fleet-width multi-machine plan (events provider, 1H ffill)",
        "",
        f"- fleet_long_frame, 20 machines: {fl['t_fleet_20_s']} s",
        f"- fleet_long_frame, 200 machines: {fl['t_fleet_200_s']} s "
        f"({round(fl['t_fleet_200_s'] / max(fl['t_fleet_20_s'], 1e-9), 1)}x "
        "wall for 10x machines — the plan is O(1) in fleet width, only",
        "  the output grows)",
        f"- fleet_long_frame, 2,000 machines: {fl['t_fleet_2000_s']} s "
        f"({round(fl['t_fleet_2000_s'] / max(fl['t_fleet_20_s'], 1e-9), 1)}x "
        "wall for 100x machines)",
        f"- driver compile: {fl['compile_200']['s']} s at 200 machines, "
        f"{fl['compile_2000']['s']} s at 2,000 — optimized-plan size "
        f"{fl['compile_200']['plan_lines']} lines at BOTH widths "
        "(asserted equal in-script; only the broadcast spec table and the",
        "  pivot width grow — kilobytes, not plan nodes)",
        f"- per-machine SOLO plans, 20 machines: {fl['t_solo_20_s']} s "
        f"(implied 200-machine solo cost ~{fl['solo_200_implied_s']} s, "
        f"2,000-machine ~{fl['solo_2000_implied_s']} s — ",
        "  one scan + one plan + one job PER MACHINE, the reference's",
        "  pod-per-machine shape)",
        "",
        "The fleet path keeps the machine dimension IN the frame: configs",
        "become a bounded spec table joined onto ONE shared resample, so",
        "scheduler/compile cost stays constant and scan cost stays 1 while",
        "the solo loop pays both linearly in fleet size.",
        "",
        "## Matrix profile grid invariance (m=8, click+purchase hourly)",
        "",
        f"- 1x events:  {gi['t_1x_s']} s ({gi['windows_1x']:,} windows)",
        f"- 10x events: {gi['t_10x_s']} s ({gi['windows_10x']:,} windows, "
        f"{round(gi['t_10x_s'] / max(gi['t_1x_s'], 1e-9), 2)}x wall)",
        "",
        f"- 3-year hourly grid ({gi['positions_3y']:,} positions), "
        f"horizon=168 (1 week): {gi['t_3y_banded_s']} s — the round-9 band",
        "  turns the multi-year profile from ~6.9e8 pairs/tag (full",
        "  quadratic) into positions x 336, linear in the grid",
        "",
        "The profile's quadratic term is CALENDAR-bounded: 10x the event",
        "volume lands on the same hourly grid, so the pair space — and the",
        "wall — barely move; only the upstream resample pays for volume.",
        "The horizon band (nearest neighbor WITHIN horizon — the stated,",
        "standard semantic) is the knob for grids where calendar-bounded",
        "still means large.",
        "",
        "## Fleet-wide drift sweep (perm test B=39 + BH FDR, hypothesis = machine:tag)",
        "",
        f"- 20 machines ({dr['family_20']} hypotheses):  {dr['t_w20_s']} s",
        f"- 200 machines ({dr['family_200']} hypotheses): {dr['t_w200_s']} s "
        f"({round(dr['t_w200_s'] / max(dr['t_w20_s'], 1e-9), 2)}x wall for "
        f"10x the family)",
        f"- optimized plan at width 200: {dr['plan_lines_200']} lines "
        f"(width changes GROUP COUNT, not plan shape)",
        "",
        "The sweep is one aggregation pass bounded by event rows — the",
        "hypothesis width only re-keys a map-side-combinable aggregate —",
        "and the multiple-testing step is rank arithmetic over the bounded",
        "family. A per-machine testing loop pays a scan per machine.",
        "",
        "## SimHash banding vs Manku C(b,k) multi-block keys "
        f"(32-bit, k=3, {sb['n_docs']:,} docs, 50% boilerplate-prefixed)",
        "",
        f"- contiguous k+1 banding ({sb['tables_banded']} tables, 8-bit "
        f"keys): {sb['cand_banded']:,} candidate pairs, "
        f"{sb['t_banded_s']} s end-to-end",
        f"- blocks=6 ({sb['tables_b6']} tables, 16-bit keys): "
        f"{sb['cand_b6']:,} candidates, {sb['t_b6_s']} s",
        f"- blocks=8 ({sb['tables_b8']} tables, 20-bit keys): "
        f"{sb['cand_b8']:,} candidates, {sb['t_b8_s']} s",
        f"- verified output identical in all three: {sb['pairs']:,} pairs "
        "(asserted in-script)",
        "",
        "Candidate volume is the cluster number: each banded bucket's",
        "population grows linearly with corpus size and the verify join",
        "pays its square, while the C(b, k) combination keys are",
        "(b-k)/b x bits wide — every extra key bit HALVES the expected",
        "bucket, an exponential knob bought with a combinatorial (and",
        "small) table count. The boilerplate corpus is the planted",
        "worst case: near-identical fingerprint regions concentrate in",
        "few buckets exactly as web-scale boilerplate does (Manku et",
        "al., WWW'07 §3).",
        "",
    ]
    out = "\n".join(lines)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE_BENCH.md"), "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
