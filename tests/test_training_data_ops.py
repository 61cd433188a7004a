"""Dedup / similarity / text / multimodal operator tests (extension surface)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gordo_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_jaccard_pairs,
    simhash,
)
from gordo_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media_metadata,
    frame_sample_plan,
)
from gordo_spark.operators.similarity import cosine_topk, lsh_ann_topk
from gordo_spark.operators.text import fingerprint, lang_id, quality_score, text_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from gordo_spark.sources.io import read_table

    return read_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    from gordo_spark.sources.io import read_table

    return read_table(spark, sf_dir, "embeddings")


def test_exact_dedup(spark, docs):
    # duplicate the corpus with shifted ids: every text now appears twice
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup)
    out = exact_dedup(both, ["text"]).toPandas()
    assert (out["n_dups"] >= 2).all()
    assert out["doc_id"].max() < 100000  # survivor is always the min id


def test_minhash_lsh_finds_duplicates(spark, docs):
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup).limit(0).unionByName(docs.limit(50)).unionByName(
        dup.filter(F.col("doc_id") < 100050)
    )
    sigs = minhash_signatures(both, num_hashes=16)
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, bands=4).toPandas()
    # every exact duplicate pair must be a candidate (identical signatures)
    expected = {(i, i + 100000) for i in range(50)}
    got = set(zip(pairs.id_a, pairs.id_b))
    assert expected <= got


def test_shingle_jaccard_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d x"),  # shares shingles 'a b c', 'b c d' of 3 each
            (3, "z z z z z"),
        ],
        ["doc_id", "text"],
    )
    out = shingle_jaccard_pairs(df, threshold=0.0).toPandas()
    pair = out[(out.id_a == 1) & (out.id_b == 2)]
    assert len(pair) == 1
    assert pair.jaccard.iloc[0] == pytest.approx(2 / 4)  # 2 shared of 4 union
    assert len(out[(out.id_a == 1) & (out.id_b == 3)]) == 0


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely unrelated content here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.simhash for r in simhash(df, bits=16).collect()}
    d12 = bin(out[1] ^ out[2]).count("1")
    d13 = bin(out[1] ^ out[3]).count("1")
    assert d12 < d13


def test_cosine_topk_exact(spark, embs):
    queries = embs.filter(F.col("vec_id") < 3)
    out = cosine_topk(embs, queries, k=5).toPandas()
    assert set(out.query_id) == {0, 1, 2}
    assert (out.groupby("query_id").size() == 5).all()
    assert (out.cosine_sim <= 1.0 + 1e-9).all()
    # rank 1 has the highest sim per query
    for q, g in out.groupby("query_id"):
        assert g.sort_values("rank").cosine_sim.is_monotonic_decreasing
    # oracle: numpy brute force for query 0
    pdf = embs.toPandas().set_index("vec_id")
    v = np.array(pdf.loc[0, "embedding"], dtype=np.float64)
    sims = {}
    for vid, row in pdf.iterrows():
        if vid == 0:
            continue
        u = np.array(row["embedding"], dtype=np.float64)
        sims[vid] = float(v @ u / (np.linalg.norm(v) * np.linalg.norm(u)))
    top = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = out[out.query_id == 0].sort_values("rank")
    assert list(got.neighbor_id) == [t[0] for t in top]
    np.testing.assert_allclose(got.cosine_sim.values, [t[1] for t in top], rtol=1e-9)


def test_lsh_ann_recall(spark, embs):
    queries = embs.filter(F.col("vec_id") < 10)
    exact = cosine_topk(embs, queries, k=3).toPandas()
    approx = lsh_ann_topk(embs, queries, k=3, bits=4).toPandas()
    # LSH with 4 bits: same-bucket neighbors; recall@3 should be nontrivial
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(e & a) / len(e)
    assert recall > 0.2
    assert (approx.cosine_sim <= 1.0 + 1e-9).all()


def test_text_stats_and_quality(spark, docs):
    stats = text_stats(docs).toPandas()
    raw = docs.select("doc_id", "n_chars").toPandas()
    merged = stats.merge(raw, on="doc_id", suffixes=("", "_raw"))
    assert (merged.n_chars == merged.n_chars_raw).all()
    assert (stats.n_tokens > 0).all()
    q = quality_score(docs).toPandas()
    assert q.quality.between(0, 1).all()


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is in a house"),
            (2, "xyzzy qwerty asdf zxcv uiop hjkl vbnm qaz wsx edc"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "unknown"


def test_fingerprint_deterministic_and_prefix_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h zz yy"), (3, "b a c d e f g h i j")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.fingerprint for r in fingerprint(df, n_lead=8).collect()}
    assert out[1] == out[2]  # same first 8 tokens
    assert out[1] != out[3]  # order-sensitive


def test_multimodal_plumbing(spark, docs):
    media = attach_binary_payload(docs.limit(20))
    assert dict(media.dtypes)["payload"] == "binary"
    meta = decode_media_metadata(media).toPandas()
    assert len(meta) == 20
    assert (meta.n_bytes > 0).all()
    assert (meta.width >= 32).all() and (meta.height >= 32).all()
    frames = frame_sample_plan(media, every_n=50).toPandas()
    assert (frames.frame_idx % 50 == 0).all()
    assert frames.groupby("doc_id").size().min() >= 1


def test_multimodal_decode_gate_direction(spark, docs):
    """mode='pil' decodes real bytes when PIL imports and raises
    ImportError (not NotImplementedError at task time) when it doesn't;
    mode='fake' works regardless."""
    import gordo_spark.operators.multimodal as mm

    media = attach_binary_payload(docs.limit(3))
    fake = decode_media_metadata(media, mode="fake").toPandas()
    assert (fake.width == fake.n_bytes % 640 + 32).all()
    if mm.HAVE_PIL:
        # payloads are utf-8 text, not decodable images: the PIL path
        # must survive with null dimensions, never a task failure
        real = decode_media_metadata(media, mode="pil").toPandas()
        assert len(real) == 3 and real.width.isna().all()
    else:
        with pytest.raises(ImportError):
            decode_media_metadata(media, mode="pil")
        # auto == fake without PIL
        auto = decode_media_metadata(media, mode="auto").toPandas()
        assert auto.equals(fake)
    with pytest.raises(ValueError):
        decode_media_metadata(media, mode="bogus")


def test_ahash_matches_numpy_and_banding_is_hamming_complete(spark):
    from gordo_spark.operators.multimodal import (
        ahash_64,
        ahash_near_dups,
        attach_binary_payload,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base),                      # exact copy -> hamming 0
        (3, base[:-1] + "x"),           # tail tweak -> small hamming
        (4, "совершенно другой текст " * 8),  # multibyte, different
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashes = {r["doc_id"]: r["ahash"]
              for r in ahash_64(attach_binary_payload(df), mode="fake").collect()}

    def np_ahash(text: str) -> int:
        arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        idx = (np.arange(64) * (arr.size - 1)) // 63
        pix = arr[idx].astype(np.float64)
        bits = pix > pix.mean()
        v = sum(1 << j for j in range(63) if bits[j])
        return v - (1 << 63) if bits[63] else v

    for doc_id, text in rows:
        assert hashes[doc_id] == np_ahash(text), doc_id
    assert hashes[1] == hashes[2]

    pairs = ahash_near_dups(
        ahash_64(attach_binary_payload(df), mode="fake"), max_hamming=3
    ).toPandas()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.itertuples()}
    # every pair within hamming <= 3 must be found (pigeonhole recall)
    expect = {
        (a, b): bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
        for a in hashes for b in hashes if a < b
    }
    assert got == {k: v for k, v in expect.items() if v <= 3}
    with pytest.raises(ValueError):
        ahash_near_dups(ahash_64(attach_binary_payload(df), mode="fake"),
                        max_hamming=4)


def test_salvage_paragraphs_rules_and_zero_shuffle(spark):
    from gordo_spark.operators.dedup import word_blocks
    from gordo_spark.operators.text import salvage_paragraphs

    good = "the quick brown fox jumps over the lazy dog again and again"
    noisy = "1923 44.5 #$% 0x1f 9999 2020 12 31 00 00 00 17"
    short = "ok fine"
    df = spark.createDataFrame(
        [(1, f"{good} {noisy}"), (2, f"{short}")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in salvage_paragraphs(df, word_blocks(F.col("text"), 12)).collect()
    }
    # doc 1: block 0 = good prose (kept), block 1 = digit soup (dropped)
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text_clean"] == good
    # doc 2: single 2-word block fails min_words
    assert out[2]["n_kept"] == 0 and out[2]["text_clean"] == ""
    # the zero-exchange claim, checked against the plan
    plan = (
        salvage_paragraphs(df, word_blocks(F.col("text"), 12))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_calibration_bins_perfect_and_off(spark):
    from gordo_spark.ml.logreg import calibration_bins

    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 1),  # calibrated
            (0.55, 0), (0.55, 0), (0.55, 0), (0.55, 1)]  # over-confident
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert out[0]["gap"] == pytest.approx(0.05, abs=1e-6)
    assert out[9]["frac_positive"] == 1.0
    assert out[5]["n"] == 4
    assert out[5]["gap"] == pytest.approx(0.55 - 0.25, abs=1e-6)
    # top edge clamps into the last bin
    edge = spark.createDataFrame([(1.0, 1)], "score double, label int")
    assert calibration_bins(edge).collect()[0]["bin"] == 9


def test_multimodal_metadata_query_prunes_payload(spark, docs, tmp_path):
    """The 100 TB claim in the module docstring: a metadata-only query
    over the media lake must NOT read the binary payload column — the
    Parquet scan's ReadSchema excludes it."""
    path = str(tmp_path / "media")
    attach_binary_payload(docs.limit(50)).write.mode("overwrite").parquet(path)
    lake = spark.read.parquet(path)
    q = lake.groupBy("media_type").agg(F.count("doc_id").alias("n_docs"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    assert all("payload" not in ln for ln in scan_lines), scan_lines
    assert q.count() >= 1


def test_cosine_neardup_pairs_finds_copies(spark, embs):
    from gordo_spark.operators.similarity import cosine_neardup_pairs

    small = embs.filter(F.col("vec_id") < 50)
    dup = small.unionByName(small.withColumn("vec_id", F.col("vec_id") + 100000))
    pairs = cosine_neardup_pairs(dup, threshold=0.999).toPandas()
    # every exact copy pairs with its original at cosine ~1.0
    copies = pairs[(pairs.id_b - pairs.id_a) == 100000]
    assert len(copies) == 50
    assert (copies.cosine_sim > 0.999).all()


def test_ivf_topk_recall_vs_bruteforce(spark, embs):
    from gordo_spark.operators.similarity import ivf_topk

    queries = embs.filter(F.col("vec_id") < 5)
    exact = cosine_topk(embs, queries, k=5).toPandas()
    approx = ivf_topk(embs, queries, k=5, n_cells=8, n_probe=4).toPandas()
    # probing half the cells must recover a decent share of true neighbors
    hits = 0
    for qid in range(5):
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(e & a)
    assert hits >= 10  # >=40% recall on random data with 4/8 probes
    # and every reported similarity is a true cosine (exact verify)
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"), how="inner"
    )
    assert np.allclose(merged.cosine_sim_a, merged.cosine_sim_e)


def test_bpe_token_count(spark):
    from gordo_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "it's a test, isn't it?"), (3, "abc123 x")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in bpe_token_count(df).collect()}
    assert out[1].n_ws_tokens == 2 and out[1].n_bpe_tokens == 2
    # it ' s a test , isn ' t it ?  -> 11 BPE-ish tokens, 5 ws tokens
    assert out[2].n_ws_tokens == 5 and out[2].n_bpe_tokens == 11
    # abc 123 x -> letter run + digit run + letter run
    assert out[3].n_bpe_tokens == 3


def test_connected_components_chains_and_singletons(spark):
    from gordo_spark.operators.dedup import connected_components

    # components: {1,2,3,4} (a chain), {10,11}, {20,21,22} (a triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_deterministic_split_disjoint_stable(spark, sf_dir):
    from gordo_spark.operators.sampling import deterministic_split
    from gordo_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = deterministic_split(docs, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n              # exhaustive
    assert counts.get("train", 0) > counts.get("val", 0)
    # stable under repartitioning (the point vs randomSplit)
    again = deterministic_split(docs.repartition(7), "doc_id")
    assert again.filter(F.col("split") == "train").count() == counts["train"]


def test_deterministic_split_rejects_over_1(spark):
    from gordo_spark.operators.sampling import deterministic_split

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        deterministic_split(df, "doc_id", {"a": 0.8, "b": 0.4})


def test_stratified_sample_respects_per_stratum_fractions(spark, sf_dir):
    from gordo_spark.operators.sampling import stratified_sample
    from gordo_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    picked = stratified_sample(docs, "doc_id", {"en": 1.0, "zh": 0.0}, strata_col="lang")
    langs = {r.lang for r in picked.select("lang").distinct().collect()}
    assert langs == {"en"}  # zh fraction 0 and other strata dropped
    n_en = docs.filter(F.col("lang") == "en").count()
    assert picked.count() == n_en  # fraction 1.0 keeps every en row


def test_train_shuffle_permutes_and_is_reproducible(spark):
    from gordo_spark.operators.sampling import train_shuffle

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in train_shuffle(df, "doc_id", 4, salt="e1").collect()]
    b = [r.doc_id for r in train_shuffle(df, "doc_id", 4, salt="e1").collect()]
    c = [r.doc_id for r in train_shuffle(df, "doc_id", 4, salt="e2").collect()]
    assert a == b                       # same salt -> same order
    assert sorted(a) == list(range(500))  # a permutation, nothing lost
    assert a != c                       # new salt -> new order


def test_profile_single_pass_and_hll_variant(spark, sf_dir):
    from gordo_spark.operators.profile import profile
    from gordo_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = {r.column: r for r in profile(docs, exact_distinct=True).collect()}
    assert set(out) == set(docs.columns)
    n = docs.count()
    assert all(r.n_rows == n for r in out.values())
    assert out["doc_id"].n_distinct == n  # primary key
    assert out["lang"].mean_numeric is None  # strings have no mean
    assert float(out["n_chars"].min_repr) <= float(out["n_chars"].max_repr)
    # HLL variant close to exact
    approx = {r.column: r for r in profile(docs, exact_distinct=False).collect()}
    assert abs(approx["doc_id"].n_distinct - n) <= max(0.1 * n, 5)
    # single pass: exactly one aggregation over one scan (no per-column jobs)
    plan = profile(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1


def test_ivf_materialized_index_partition_pruned_probe(spark, sf_dir, tmp_path):
    """The IVF scale path made concrete: corpus written partitioned by
    cell, probe scan carries a cell partition filter (only probed
    directories read), results identical to the in-memory ivf_topk."""
    import contextlib
    import io as _io

    from gordo_spark.operators.similarity import ivf_probe, ivf_topk, ivf_write
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 5)
    idx_path = f"{tmp_path}/ivf"
    ivf_write(embs, idx_path, n_cells=8)

    probed = ivf_probe(spark, idx_path, queries, k=5, n_probe=2)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain(True)
    plan = buf.getvalue()
    # the cell predicate reached the scan as a PARTITION filter
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]

    got = probed.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = (
        ivf_topk(embs, queries, k=5, n_cells=8, n_probe=2)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "neighbor_id", "rank"]].equals(
        exp[["query_id", "neighbor_id", "rank"]]
    )
    np.testing.assert_allclose(got["cosine_sim"], exp["cosine_sim"], atol=1e-12)
    # the index layout really is one directory per cell
    import os

    all_cells = [d for d in os.listdir(f"{idx_path}/index") if d.startswith("cell=")]
    assert len(all_cells) == 8


def test_pack_sequences_chunk_invariants(spark, docs):
    from gordo_spark.operators.packing import pack_sequences

    out = pack_sequences(docs, budget=256, shards=8).toPandas()
    assert len(out) == docs.count()  # every doc assigned exactly once
    assert set(out["shard"].unique()) <= set(range(8))
    # offsets are within the budget, chunk ids non-negative
    assert ((out["seq_offset"] >= 0) & (out["seq_offset"] < 256)).all()
    assert (out["seq_id"] >= 0).all()
    # within a shard, chunks are densely filled: every chunk except the
    # last starts exactly where the cumulative stream says it should —
    # total tokens per shard == max chunk start + tokens of its docs
    for shard, grp in out.groupby("shard"):
        total = grp["n_tokens"].sum()
        spans = grp["seq_id"] * 256 + grp["seq_offset"] + grp["n_tokens"]
        assert spans.max() == total  # stream is contiguous (no gaps)
    # deterministic and repartition-stable
    again = (
        pack_sequences(docs.repartition(13), budget=256, shards=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again.equals(out.sort_values("doc_id").reset_index(drop=True))


def test_pack_greedy_bins_respect_budget(spark, docs):
    from gordo_spark.operators.packing import pack_greedy

    budget = 80  # smaller than some docs -> exercises the overflow path
    out = pack_greedy(docs, budget=budget, shards=4).toPandas()
    assert len(out) == docs.count()
    loads = out.groupby(["shard", "bin_id"])["n_tokens"].agg(["sum", "count"])
    over = loads[loads["sum"] > budget]
    # any over-budget bin must be a singleton holding one over-budget doc
    assert (over["count"] == 1).all()
    assert (over["sum"] > budget).all()
    # bin ids are dense per shard
    for shard, grp in out.groupby("shard"):
        bins = sorted(grp["bin_id"].unique())
        assert bins == list(range(len(bins)))
    # deterministic across repartition
    again = (
        pack_greedy(docs.repartition(7), budget=budget, shards=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again.equals(out.sort_values("doc_id").reset_index(drop=True))


def test_repetition_stats_flags_looping_text(spark):
    from gordo_spark.operators.text import repetition_stats

    rows = [
        (1, "spam spam spam spam spam spam"),  # one bigram repeated
        (2, "the quick brown fox jumps over a lazy dog today"),  # all unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top_ngram_frac"] > 0.9  # "spam spam" covers the doc
    assert out[1]["dup_ngram_frac"] == 1.0  # every trigram duplicated
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[2]["top_ngram_count"] == 1


def test_contamination_pairs_catches_planted_leak(spark, docs):
    from gordo_spark.operators.dedup import contamination_pairs

    bench = docs.filter(F.col("doc_id") < 5)
    leak = bench.filter(F.col("doc_id") == 0).withColumn(
        "doc_id", F.lit(900000)
    )  # a training doc that IS benchmark doc 0
    corpus = docs.filter(F.col("doc_id").between(100, 199)).unionByName(leak)
    out = contamination_pairs(corpus, bench, min_shared=3).toPandas()
    planted = out[(out.doc_id == 900000) & (out.bench_id == 0)]
    assert len(planted) == 1
    assert planted.overlap_frac.iloc[0] == 1.0  # full leak
    assert (out.overlap_frac <= 1.0).all()
    assert (out.n_shared >= 3).all()


def test_kmeans_fit_matches_driver_side_lloyd(spark, sf_dir):
    """The distributed k-means must equal the same deterministic Lloyd's
    run entirely in numpy on the collected corpus (init = first-k by id,
    euclidean argmin with ties to the lowest cluster)."""
    from gordo_spark.operators.similarity import kmeans_fit, kmeans_inertia
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    k = 6
    C = kmeans_fit(embs, k=k, max_iter=4)

    rows = embs.orderBy("vec_id").select("vec_id", "embedding").collect()
    V = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    ref = V[:k].copy()
    for _ in range(4):
        d2 = np.einsum("ij,ij->i", ref, ref)[None, :] - 2.0 * (V @ ref.T)
        a = np.argmin(d2, axis=1)
        new = ref.copy()
        for c in range(k):
            if (a == c).any():
                new[c] = V[a == c].mean(axis=0)
        if np.array_equal(
            np.argmin(
                np.einsum("ij,ij->i", new, new)[None, :] - 2.0 * (V @ new.T), axis=1
            ),
            a,
        ):
            ref = new
            break
        ref = new
    assert C.shape == (k, V.shape[1])
    np.testing.assert_allclose(C, ref, rtol=1e-9, atol=1e-9)

    # a trained quantizer is strictly better than its init
    init_inertia = kmeans_inertia(embs, V[:k])
    assert kmeans_inertia(embs, C) <= init_inertia


def test_pca_fit_exact_quality_and_grid(spark, sf_dir):
    """pca_fit_exact: components unit-norm on the 1e-9 grid, pairwise
    near-orthogonal, sign-pinned (first nonzero positive), and the
    fixed-step basis captures >= 95% of eigh's top-4 variance of the
    SAME quantized covariance — the honest claim on a near-isotropic
    corpus where individual eigenvectors are ill-conditioned."""
    import math

    from gordo_spark.operators.similarity import pca_fit_exact
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    mean, comps = pca_fit_exact(embs, k=4, iters=24)
    V = np.array(comps)
    assert V.shape[0] == 4
    # grid + unit norms + sign pin
    for v in comps:
        assert all(x == math.floor(x * 1e9 + 0.5) / 1e9 for x in v)
        fz = next(x for x in v if x != 0.0)
        assert fz > 0
    norms = np.einsum("ij,ij->i", V, V)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    gram = V @ V.T - np.diag(norms)
    assert np.abs(gram).max() < 0.1

    # captured variance vs eigh on the quantized covariance
    E = np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in embs.select("embedding").collect()
        ]
    )
    Ec = E - np.array(mean)
    C = Ec.T @ Ec / (len(E) - 1)
    w = np.linalg.eigvalsh(C)[::-1][:4]
    captured = sum(V[c] @ C @ V[c] for c in range(4))
    assert captured >= 0.95 * w.sum()


def test_kmeans_fit_exact_matches_numpy_lloyd(spark, sf_dir):
    """The engine-exact quantizer (left-fold distances, scaled-integer
    mean updates, fixed iterations) must agree with plain-float numpy
    Lloyd's to the 1e-6 update quantization it applies per iteration."""
    from gordo_spark.operators.similarity import kmeans_fit_exact
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    k, iters = 6, 3
    got = kmeans_fit_exact(embs, k=k, iters=iters).toPandas()

    rows = embs.orderBy("vec_id").select("vec_id", "embedding").collect()
    V = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    ref = V[:k].copy()
    for _ in range(iters):
        d2 = np.einsum("ij,ij->i", ref, ref)[None, :] - 2.0 * (V @ ref.T)
        a = np.argmin(d2, axis=1)
        new = ref.copy()
        for c in range(k):
            if (a == c).any():
                # mirror the exact update: quantize members, mean, requantize
                q = np.floor(V[a == c] * 1e6 + 0.5)
                new[c] = np.floor(q.sum(axis=0) / (a == c).sum() + 0.5) / 1e6
        ref = new
    assert got.shape == (k * V.shape[1], 3)
    got_m = got.pivot(index="cell", columns="dim", values="centroid").to_numpy()
    np.testing.assert_allclose(got_m, ref, rtol=0, atol=2e-6)


def test_ivf_topk_trained_quantizer(spark, sf_dir):
    """Trained-quantizer IVF: same output contract as ivf_topk, exact
    cosine on everything it returns, and probing all cells with a perfect
    quantizer == brute force."""
    from gordo_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_trained,
        kmeans_fit,
    )
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 4)
    C = kmeans_fit(embs, k=6, max_iter=3)
    out = ivf_topk_trained(embs, queries, C, k=5, n_probe=2).toPandas()
    assert list(out.columns) == ["query_id", "neighbor_id", "cosine_sim", "rank"]
    assert set(out.groupby("query_id")["rank"].apply(list).map(tuple)) == {
        (1, 2, 3, 4, 5)
    }
    # returned sims are the exact cosine (verify against collected vectors)
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embs.select("vec_id", "embedding").collect()
    }
    for r in out.itertuples():
        a, b = vecs[r.query_id], vecs[r.neighbor_id]
        exact = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(exact - r.cosine_sim) < 1e-9

    # n_probe = n_cells recovers the exact brute-force answer
    full = (
        ivf_topk_trained(embs, queries, C, k=5, n_probe=6)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exact = (
        cosine_topk(embs, queries, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, exact, check_exact=False, rtol=1e-9)


def test_keep_survivors_end_to_end(spark, sf_dir):
    """pairs -> components -> survivors: every duplicated text keeps
    exactly its min-id copy; docs outside any pair survive untouched."""
    from gordo_spark.operators.dedup import (
        connected_components,
        keep_survivors,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from gordo_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    dup = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    sigs = minhash_signatures(dup, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    comps = connected_components(pairs)
    kept = keep_survivors(dup, comps)

    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    pair_rows = pairs.select("id_a", "id_b").collect()
    in_pairs = {r["id_a"] for r in pair_rows} | {r["id_b"] for r in pair_rows}
    all_ids = {r["doc_id"] for r in dup.select("doc_id").collect()}
    # every clone pair (i, i+100000) that LSH caught keeps only the min id
    for r in pair_rows:
        lo, hi = min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])
        assert hi not in kept_ids or hi in {c for c in (lo,)}  # hi dropped
        assert lo in kept_ids or lo in in_pairs  # lo survives unless chained lower
    # untouched docs all survive
    assert (all_ids - in_pairs) <= kept_ids
    # survivors = all - non-representative component members
    comp_rows = comps.collect()
    losers = {r["id"] for r in comp_rows if r["id"] != r["component"]}
    assert kept_ids == all_ids - losers


def test_ivf_write_trained_centroids_probe_parity(spark, sf_dir, tmp_path):
    """Materialized IVF with a trained quantizer: probe over the written
    index returns exactly what the in-memory trained search returns."""
    from gordo_spark.operators.similarity import (
        ivf_probe,
        ivf_topk_trained,
        ivf_write,
        kmeans_fit,
    )
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 4)
    C = kmeans_fit(embs, k=6, max_iter=3)
    idx = f"{tmp_path}/ivf_km"
    ivf_write(embs, idx, centroids=C)
    got = (
        ivf_probe(spark, idx, queries, k=5, n_probe=2)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        ivf_topk_trained(embs, queries, C, k=5, n_probe=2)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-9)


def test_term_stats_counts_and_cut(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a b a", "b c", "a  c"],  # double space -> empty token dropped
            }
        )
    )
    from gordo_spark.operators.text import term_stats

    out = {r["term"]: (r["tf"], r["n_docs"]) for r in term_stats(df, top_k=10).collect()}
    assert out == {"a": (3, 2), "b": (2, 2), "c": (2, 2)}
    # deterministic cut: top-2 by (tf desc, term asc) is exactly {a, b}
    top2 = [r["term"] for r in term_stats(df, top_k=2).collect()]
    assert top2 == ["a", "b"]


def test_chunk_text_overlap_and_tail(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [" ".join(words)]}))
    from gordo_spark.operators.text import chunk_text

    rows = sorted(
        chunk_text(df, chunk_words=4, stride_words=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0,3,6,9 -> chunks [0:4],[3:7],[6:10],[9:10]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]
    assert rows[1]["chunk"] == "w3 w4 w5 w6"
    assert rows[3]["chunk"] == "w9"


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "mail bob.smith+x@corp.example.com call 555-0147 host 10.0.0.7 end",
                    "nothing sensitive here",
                ],
            }
        )
    )
    from gordo_spark.operators.text import pii_scrub

    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[0]["text"] == "mail <EMAIL> call <PHONE> host <IP> end"
    assert (rows[0]["n_email"], rows[0]["n_phone"], rows[0]["n_ipv4"]) == (1, 1, 1)
    assert rows[1]["text"] == "nothing sensitive here"
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (0, 0, 0)


def test_source_quality_filter_keeps_diverse_sources(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "source": ["hi", "hi", "lo", "lo"],
                # hi-source: all-distinct tokens (div 1.0); lo: one word repeated
                "text": ["a b c d", "e f g h", "x x x x", "y y y y"],
            }
        )
    )
    from gordo_spark.operators.text import source_quality_filter

    out = source_quality_filter(df).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1]
    assert all(r["source"] == "hi" and r["src_div"] == 1.0 for r in out)


def test_unigram_logprob_score(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a a a", "a b"]})
    )
    from gordo_spark.operators.text import unigram_logprob_score

    out = {r["doc_id"]: r["mean_nll"] for r in unigram_logprob_score(df).collect()}
    # corpus: a x4, b x1 -> p(a)=0.8, p(b)=0.2
    assert out[0] == pytest.approx(-math.log(0.8), abs=1e-6)
    assert out[1] == pytest.approx(-(math.log(0.8) + math.log(0.2)) / 2, abs=1e-6)


def test_tfidf_topk_scores_and_rank(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["rare common common", "common common common"],
            }
        )
    )
    from gordo_spark.operators.text import tfidf_topk

    rows = [
        (r["doc_id"], r["term"], r["tfidf"], r["rank"])
        for r in tfidf_topk(df, k=2).collect()
    ]
    # 'common' in both docs -> idf = ln(2/2) = 0; 'rare' only in doc 0
    by_doc = {}
    for d, t, s, rk in rows:
        by_doc.setdefault(d, []).append((rk, t, s))
    doc0 = sorted(by_doc[0])
    assert doc0[0][1] == "rare" and doc0[0][2] == pytest.approx(math.log(2), abs=1e-6)
    assert doc0[1][1] == "common" and doc0[1][2] == 0.0
    assert by_doc[1] == [(1, "common", 0.0)]


def test_with_global_ids_contiguous_and_partition_invariant(spark):
    from gordo_spark.operators.sampling import with_global_ids

    pdf = pd.DataFrame({"k": np.random.RandomState(7).permutation(1000)})
    df = spark.createDataFrame(pdf).repartition(13)  # scrambled input layout
    for parts in (1, 4, 32):
        out = with_global_ids(df, "k", partitions=parts).toPandas()
        out = out.sort_values("k").reset_index(drop=True)
        # id equals rank in k-order regardless of partitioning
        assert (out["global_id"].to_numpy() == np.arange(1000)).all()


def test_source_overlap_matrix(spark):
    from gordo_spark.operators.dedup import source_overlap

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 1, 2], "id_b": [10, 11, 3]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 10, 11],
                "source": ["web", "web", "books", "web", "mirror", "mirror"],
            }
        )
    )
    out = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in source_overlap(pairs, docs).collect()
    }
    # canonicalized (least, greatest): (mirror,web) x2, (books,web) x1
    assert out == {("mirror", "web"): 2, ("books", "web"): 1}


def test_stratified_take_exact_counts_and_stability(spark):
    from gordo_spark.operators.sampling import stratified_take

    pdf = pd.DataFrame(
        {"doc_id": range(100), "source": ["a"] * 60 + ["b"] * 37 + ["c"] * 3}
    )
    df = spark.createDataFrame(pdf)
    out = stratified_take(df, ["source"], 10).toPandas()
    counts = out.groupby("source")["doc_id"].count().to_dict()
    # exactly min(n, |stratum|) per stratum
    assert counts == {"a": 10, "b": 10, "c": 3}
    # deterministic: same selection under a different partitioning
    out2 = stratified_take(df.repartition(17), ["source"], 10).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_label_centroids_and_cohesion(spark):
    from gordo_spark.operators.similarity import label_centroids, label_cohesion

    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "label": [0, 0, 1, 1],
            "embedding": [[1.0, 0.0], [0.0, 1.0], [2.0, 2.0], [4.0, 4.0]],
        }
    )
    df = spark.createDataFrame(pdf)
    cents = {
        (r["label"], r["pos"]): r["mean"] for r in label_centroids(df).collect()
    }
    assert cents == {(0, 0): 0.5, (0, 1): 0.5, (1, 0): 3.0, (1, 1): 3.0}
    coh = {r["label"]: (r["n"], r["mean_cosine"]) for r in label_cohesion(df).collect()}
    # label 1: both vectors parallel to centroid -> cosine 1.0
    assert coh[1] == (2, 1.0)
    # label 0: each unit vector at 45 deg to (0.5, 0.5) -> cos = 1/sqrt(2)
    assert coh[0][0] == 2 and coh[0][1] == pytest.approx(0.707107, abs=1e-6)


def test_length_curriculum_stages(spark):
    from gordo_spark.operators.text import length_curriculum

    texts = [" ".join(["w"] * n) for n in [1, 2, 3, 4, 5, 6, 7, 8]]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(8), "text": texts}))
    out = {r["doc_id"]: r["stage"] for r in length_curriculum(df, n_stages=4).collect()}
    # boundaries at 25/50/75th percentiles of 1..8 = 2.75, 4.5, 6.25
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_vocab_coverage_curve(spark):
    from gordo_spark.operators.text import vocab_coverage

    # corpus: a x6, b x3, c x1 -> top-1 covers .6, top-2 covers .9, all = 1.0
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a a a b b c", "a a a b"]})
    )
    out = {r["k"]: r["coverage"] for r in vocab_coverage(df, ks=[1, 2, 3]).collect()}
    assert out == {1: 0.6, 2: 0.9, 3: 1.0}


def test_embedding_norm_outliers_flags_scaled_vector(spark):
    from gordo_spark.operators.similarity import embedding_norm_outliers

    rng = np.random.RandomState(3)
    vecs = [list(v) for v in rng.normal(0, 1, (30, 8))]
    vecs.append(list(100.0 * np.ones(8)))  # planted wrong-scale vector
    pdf = pd.DataFrame(
        {"vec_id": range(31), "label": [0] * 31, "embedding": vecs}
    )
    out = embedding_norm_outliers(spark.createDataFrame(pdf)).toPandas()
    flagged = set(out[out["is_outlier"]]["vec_id"])
    assert flagged == {30}
    norm30 = out[out["vec_id"] == 30]["norm"].iloc[0]
    assert norm30 == pytest.approx(100.0 * np.sqrt(8), abs=1e-4)


def test_normalize_text_canonical_form(spark):
    from gordo_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["  Hello,   WORLD!! x9  "]})
    )
    out = normalize_text(df).collect()[0]["text"]
    assert out == "hello world x9"


def test_bigram_logprob_score(spark):
    from gordo_spark.operators.text import bigram_logprob_score

    # corpus bigrams: "a b" x2, "a c" x1, history 'a' count 3
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b", "a b", "a c"]})
    )
    out = {r["doc_id"]: r["mean_nll2"] for r in bigram_logprob_score(df).collect()}
    assert out[0] == pytest.approx(-math.log(2 / 3), abs=1e-6)
    assert out[2] == pytest.approx(-math.log(1 / 3), abs=1e-6)


def test_source_effective_tokens_mirror_collapses(spark):
    from gordo_spark.operators.dedup import source_effective_tokens

    base = pd.DataFrame(
        {
            "doc_id": [0, 1, 10, 11],
            "source": ["web", "web", "mirror", "mirror"],
            "text": ["a b c", "d e", "a b c", "d e"],  # mirror = exact copies
        }
    )
    out = {
        r["source"]: (r["n_tokens"], r["n_tokens_unique"], r["unique_ratio"])
        for r in source_effective_tokens(spark.createDataFrame(base)).collect()
    }
    assert out["web"] == (5, 5, 1.0)
    assert out["mirror"] == (5, 0, 0.0)


def test_corpus_diff_statuses(spark):
    from gordo_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 3, 4], "text": ["a", "C", "d"]})
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # 1 unchanged (absent), 2 removed, 3 changed, 4 added
    assert out == {2: "removed", 3: "changed", 4: "added"}


def test_repeated_ngram_stats(spark):
    from gordo_spark.operators.dedup import repeated_ngram_stats

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "a b c d",      # shares "a b" trigram window? n=2 grams below
                    "a b x y",
                    "p q r s",      # nothing shared
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_repeated"], r["repeated_frac"])
        for r in repeated_ngram_stats(df, n=2).collect()
    }
    # 2-grams: doc0 {a b, b c, c d}, doc1 {a b, b x, x y}, doc2 all unique
    assert out[0] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert out[1] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert out[2] == (3, 0, 0.0)


def test_repeated_ngram_hot_split_handles_boilerplate(spark):
    """Planted 50%-boilerplate corpus: the hot-gram broadcast branch must
    absorb the skewed key (every boilerplate doc shares ONE 2-gram) so the
    shuffle join only carries tail grams, and the split must be
    result-identical to the unsplit semantics."""
    from gordo_spark.operators.dedup import repeated_ngram_stats

    n = 40
    rows = []
    for i in range(n):
        if i % 2 == 0:  # 50% of docs end with the same boilerplate 2-gram
            rows.append((i, f"u{i} v{i} subscribe now"))
        else:
            rows.append((i, f"a{i} b{i} c{i} d{i}"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    kw = dict(n=2, hot_k=4, hot_min=10, probe_fraction=1.0)
    out = {
        r["doc_id"]: (r["n_grams"], r["n_repeated"])
        for r in repeated_ngram_stats(df, **kw).collect()
    }
    # boilerplate docs: grams {u_i v_i, v_i subscribe, subscribe now} —
    # only "subscribe now" repeats corpus-wide (20x); others unique
    for i in range(0, n, 2):
        assert out[i] == (3, 1)
    for i in range(1, n, 2):
        assert out[i] == (3, 0)

    # with hot_k=4 the (count desc) cut must contain the 20x boilerplate
    # gram, so the tail shuffle join never sees the hot key; the plan keeps
    # BOTH paths: a broadcast hash join (hot) and the tail join branches
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        repeated_ngram_stats(df, **kw).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan  # hot branch is map-side
    assert "Union" in plan  # two-path join re-united before the doc agg

    # hot_k=0 degenerates to the pure shuffle path — same results
    out0 = {
        r["doc_id"]: (r["n_grams"], r["n_repeated"])
        for r in repeated_ngram_stats(df, n=2, hot_k=0).collect()
    }
    assert out0 == out

    # a skew-free corpus (no gram reaches hot_min) adaptively degrades to
    # the plain shuffle join: no union, no broadcast branch — identical
    # results with none of the split's extra scans
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        repeated_ngram_stats(df, n=2, hot_k=4, hot_min=1000,
                             probe_fraction=1.0).explain("formatted")
    assert "Union" not in buf.getvalue()


def test_unigram_vocab_pruning_and_oov_floor(spark):
    """min_df prunes singletons into one smoothed OOV bucket; max_vocab
    hard-caps the broadcast table with a deterministic (tf desc, term asc)
    cut."""
    from gordo_spark.operators.text import unigram_logprob_score

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                # corpus: a x4, b x3, rare1 x1, rare2 x1  (total 9)
                "text": ["a a b rare1", "a a b rare2", "b"],
            }
        )
    )
    out = {
        r["doc_id"]: r["mean_nll"]
        for r in unigram_logprob_score(df, min_df=2).collect()
    }
    # vocab {a: 4/9, b: 3/9}; OOV mass 2/9 over 2 pruned types -> each
    # OOV token scores like ONE rare word: ln((2/9)/2) = ln(1/9)
    la, lb, loov = math.log(4 / 9), math.log(3 / 9), math.log(2 / 9 / 2)
    assert out[0] == pytest.approx(round(-(2 * la + lb + loov) / 4, 6), abs=1e-6)
    assert out[2] == pytest.approx(round(-lb, 6), abs=1e-6)

    # max_vocab=1 keeps only 'a' (tf desc); b + rare* pool into 3 pruned
    # types sharing mass 5/9 -> per-type floor ln((5/9)/3)
    out1 = {
        r["doc_id"]: r["mean_nll"]
        for r in unigram_logprob_score(df, min_df=2, max_vocab=1).collect()
    }
    loov1 = math.log(5 / 9 / 3)
    assert out1[2] == pytest.approx(round(-loov1, 6), abs=1e-6)
    assert out1[0] == pytest.approx(round(-(2 * la + 2 * loov1) / 4, 6), abs=1e-6)


def test_pii_scrub_ten_digit_phone_forms(spark):
    """10-digit phones redact WHOLE (no dangling '555-' remnant from a
    7-digit partial match): parenthesized, dashed, dotted, +1-prefixed."""
    from gordo_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "call (555) 123-4567 now",
                    "call 555-123-4567 now",
                    "call 555.123.4567 now",
                    "call +1 555-123-4567 now",
                    "local 555-0147 still works",
                ],
            }
        )
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    for i in range(5):
        assert rows[i]["n_phone"] == 1, rows[i]["text"]
        assert "<PHONE>" in rows[i]["text"]
        assert "555" not in rows[i]["text"], rows[i]["text"]  # no remnant


def test_bigram_short_docs_emit_no_row(spark):
    """Docs under two words contribute no bigram and no output row — a
    degenerate (word, NULL) pair would inflate its history count
    corpus-wide."""
    from gordo_spark.operators.text import bigram_logprob_score

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b", "solo", ""]})
    )
    out = {r["doc_id"]: r["mean_nll2"] for r in bigram_logprob_score(df).collect()}
    assert set(out) == {0}
    # p(b|a) = 1/1 -> mean_nll2 = 0 exactly (no NULL-pair pollution)
    assert out[0] == pytest.approx(0.0, abs=1e-9)


def test_minhash_jaccard_estimate_matches_component_agreement(spark):
    """Clones agree on every signature component (est 1.0); the estimate
    equals the hand-computed agreement fraction for any pair."""
    from gordo_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",  # clone
                    "completely different words in every position here now",
                ],
            }
        )
    )
    sigs = minhash_signatures(df, num_hashes=8)
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 0], "id_b": [1, 2]})
    )
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_jaccard_estimate(sigs, pairs, num_hashes=8).collect()
    }
    assert est[(0, 1)] == 1.0  # identical docs -> identical signatures
    # hand-compute agreement for the (0, 2) pair from the signatures
    s = {r["doc_id"]: [r[f"m{i}"] for i in range(8)] for r in sigs.collect()}
    agree = sum(a == b for a, b in zip(s[0], s[2])) / 8
    assert est[(0, 2)] == pytest.approx(round(agree, 6), abs=1e-9)


def test_ngram_novelty_orders_by_first_appearance(spark):
    from gordo_spark.operators.dedup import ngram_novelty

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "a b c d",    # all 2-grams first seen here
                    "a b c d",    # exact copy -> nothing novel
                    "a b x y",    # "a b" seen in doc 0; "b x","x y" novel
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novel_frac"])
        for r in ngram_novelty(df, n=2, hot_k=2).collect()
    }
    assert out[0] == (3, 3, 1.0)
    assert out[1] == (3, 0, 0.0)
    assert out[2] == (3, 2, pytest.approx(round(2 / 3, 6), abs=1e-9))


def test_token_entropy_extremes(spark):
    from gordo_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["x x x x", "a b c d"]}
        )
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["entropy"])
        for r in token_entropy(df).collect()
    }
    assert out[0] == (4, 0.0)  # single repeated token -> zero entropy
    assert out[1] == (4, pytest.approx(round(math.log(4), 6), abs=1e-9))


def test_doc_length_histogram_bins_and_fractions(spark):
    from gordo_spark.operators.text import doc_length_histogram

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["a b", "c d e", "f " * 33, "g " * 40],
            }
        )
    )
    rows = {
        r["bin_start"]: (r["n_docs"], r["frac"])
        for r in doc_length_histogram(df, bin_width=32).collect()
    }
    # "f " * 33 -> split gives 34 tokens (trailing ""? no: split on " " of
    # "f f ... f " ends with empty string token) — size() counts it; both
    # 33/34-token docs land in bin 32 either way, short docs in bin 0
    assert rows[0][0] == 2
    assert sum(n for n, _ in rows.values()) == 4
    assert sum(f for _, f in rows.values()) == pytest.approx(1.0, abs=1e-5)


def test_source_langmix_fractions(spark):
    from gordo_spark.operators.text import source_langmix

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(5),
                "source": ["web", "web", "web", "wiki", "wiki"],
                "lang": ["en", "en", "de", "en", "en"],
                "text": ["x"] * 5,
            }
        )
    )
    out = {
        (r["source"], r["lang"]): (r["n_docs"], r["frac"])
        for r in source_langmix(df).collect()
    }
    assert out[("web", "en")] == (2, pytest.approx(round(2 / 3, 6)))
    assert out[("web", "de")] == (1, pytest.approx(round(1 / 3, 6)))
    assert out[("wiki", "en")] == (2, 1.0)


def test_paragraph_dedup_planted(spark):
    from gordo_spark.operators.dedup import paragraph_dedup

    # doc 0 owns paragraphs A,B; doc 1 repeats B (dropped) around its own C;
    # doc 2 is entirely repeats and must vanish from the result
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "paras": [["A", "B"], ["B", "C", "B"], ["A", "B"]],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_clean"])
        for r in paragraph_dedup(df, F.col("paras"), out_col="text_clean").collect()
    }
    assert out[0] == (2, 2, "A B")
    assert out[1] == (3, 1, "C")  # both B occurrences lose to doc 0's
    assert 2 not in out


def test_word_blocks_segmenter(spark):
    from gordo_spark.operators.dedup import word_blocks

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e", ""]})
    )
    rows = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", word_blocks(F.col("text"), 2).alias("b")).collect()
    }
    assert rows[0] == ["a b", "c d", "e"]
    assert rows[1] == [""]  # empty text -> one empty block, never an empty array


def test_dsir_logweights_separates_target(spark):
    from gordo_spark.operators.importance import dsir_logweights

    # target docs share a distinctive vocabulary; raw docs don't
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [
                    "alpha beta alpha beta gamma",
                    "beta alpha gamma alpha beta",
                    "gamma alpha beta beta alpha",
                    "xray yankee zulu xray zulu",
                    "zulu xray yankee yankee zulu",
                    "alpha beta gamma xray zulu",  # mixed -> middling
                ],
                "grp": ["t", "t", "t", "r", "r", "r"],
            }
        )
    )
    out = (
        dsir_logweights(df, F.col("grp") == "t", buckets=512)
        .toPandas()
        .set_index("doc_id")["log_weight"]
    )
    target_min = out[[0, 1, 2]].min()
    assert target_min > out[5] > max(out[3], out[4])
    # single-word doc: one unigram feature, no padded bigram
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["solo"], "g": [True]}))
    n = dsir_logweights(one, F.col("g"), buckets=64).collect()[0]["n_feats"]
    assert n == 1


def test_mixture_weights_flatten(spark):
    from gordo_spark.operators.sampling import mixture_sample, mixture_weights

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(110),
                "source": ["big"] * 100 + ["small"] * 10,
            }
        )
    )
    w = {r["source"]: r for r in mixture_weights(df, "source", alpha=0.5).collect()}
    # alpha<1 up-weights the small stratum relative to natural proportions
    assert w["small"]["weight"] > 10 / 110
    assert w["big"]["weight"] < 100 / 110
    assert abs(w["small"]["weight"] + w["big"]["weight"] - 1.0) < 1e-9
    # rate solves the expected budget, capped at 1
    assert 0 < w["big"]["rate"] <= 1.0 and 0 < w["small"]["rate"] <= 1.0
    out = mixture_sample(df, "source", "doc_id", alpha=0.5)
    # deterministic: same sample twice
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b and len(a) > 0


def test_distributed_ntile_matches_sql_ntile(spark):
    from gordo_spark.operators.ranking import distributed_ntile

    # ties at bucket boundaries + a partition smaller than k
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(13),
                "g": ["a"] * 11 + ["b"] * 2,
                "v": [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 9.0, 9.0],
            }
        )
    )
    got = {
        r["doc_id"]: r["tile"]
        for r in distributed_ntile(df, 3, "v", ("g",), "doc_id").collect()
    }
    df.createOrReplaceTempView("nt")
    exp = {
        r["doc_id"]: r["tile"]
        for r in spark.sql(
            "SELECT doc_id, ntile(3) OVER (PARTITION BY g ORDER BY v, doc_id) AS tile FROM nt"
        ).collect()
    }
    assert got == exp


def test_perplexity_buckets_thirds(spark):
    from gordo_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(9),
                "lang": ["en"] * 9,
                "mean_nll": [float(i) for i in range(9)],
            }
        )
    )
    out = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(df).collect()}
    assert [out[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_semdedup_prunes_copies(spark, embs):
    from gordo_spark.operators.similarity import semdedup

    dup = embs.unionByName(embs.withColumn("vec_id", F.col("vec_id") + 100000))
    out = semdedup(dup, threshold=0.9, n_cells=8).toPandas().set_index("vec_id")
    # every exact copy has an earlier identical twin in its cell -> pruned
    copies = out.loc[out.index >= 100000]
    assert not copies["keep"].any()
    # the copy shares its original's cell (identical vector, same argmax)
    orig = out.loc[out.index < 100000]
    assert (copies["cell"].to_numpy() == orig.loc[copies.index - 100000, "cell"].to_numpy()).all()
    # originals are mostly kept (natural near-dups at >=0.9 are rare)
    assert orig["keep"].mean() > 0.5


def test_gopher_rules_panel(spark):
    from gordo_spark.operators.text import gopher_rules

    long_good = " ".join(["the", "data", "table", "scan"] * 20)  # 80 words
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    long_good,                              # passes everything
                    "too short but the a of",               # fails min_words
                    " ".join(["####"] * 60),                # symbols + no alpha + no stopwords
                    " ".join(["the", "a"] + ["x"] * 78),    # mean word len < 3
                ],
            }
        )
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[0]["keep"]
    assert not out[1]["ok_words"] and not out[1]["keep"]
    assert not out[2]["ok_symbols"] and not out[2]["ok_alpha"] and not out[2]["ok_stopwords"]
    assert out[3]["ok_words"] and not out[3]["ok_word_len"] and not out[3]["keep"]


def test_recall_at_k(spark):
    from gordo_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        pd.DataFrame({"query_id": [0] * 3 + [1] * 3, "neighbor_id": [10, 11, 12, 20, 21, 22]})
    )
    approx = spark.createDataFrame(
        pd.DataFrame({"query_id": [0] * 3 + [2] * 1, "neighbor_id": [10, 11, 99, 5]})
    )
    out = {r["query_id"]: (r["n_hit"], r["recall"]) for r in recall_at_k(approx, exact, k=3).collect()}
    assert out[0] == (2, pytest.approx(round(2 / 3, 6)))
    assert out[1] == (0, 0.0)  # query with zero approx hits still reported
    assert 2 not in out  # approx-only queries don't appear (no exact truth)


def test_pca_matches_numpy(spark):
    from gordo_spark.operators.similarity import pca_fit, pca_transform

    rng = np.random.RandomState(3)
    # anisotropic cloud: variance concentrated in two known directions
    base = rng.randn(300, 2) * np.array([5.0, 2.0])
    mix = rng.randn(2, 6)
    X = base @ mix + 0.01 * rng.randn(300, 6)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(300), "embedding": [r.tolist() for r in X]})
    ).repartition(5)
    mean, comps, ratios = pca_fit(df, k=3)
    # numpy reference
    Xc = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc / len(X))
    order = np.argsort(evals)[::-1][:3]
    ref = evecs[:, order].T
    ref = ref * np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])[:, None]
    assert np.allclose(mean, X.mean(axis=0), atol=1e-8)
    assert np.allclose(comps, ref, atol=1e-6)
    assert ratios[0] > ratios[1] > ratios[2]
    assert ratios[0] + ratios[1] > 0.99  # two planted directions dominate
    # projection parity
    out = pca_transform(df, mean, comps).orderBy("vec_id").toPandas()
    P = np.stack(out["pca"].to_numpy())
    assert np.allclose(P, (X - X.mean(axis=0)) @ ref.T, atol=1e-6)


def test_winnowing_guarantee(spark):
    from gordo_spark.operators.dedup import winnow_fingerprints

    # two docs share a 10-word run; winnowing with k=5, w=4 guarantees a
    # shared fingerprint for any common run of >= w+k-1 = 8 words
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "one two " + shared + " three four",
                    "five six seven " + shared,
                    "totally different words with no overlap at all here now",
                ],
            }
        )
    )
    out = winnow_fingerprints(df, k=5, w=4).toPandas()
    fps = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    assert fps[0] & fps[1], "shared run must share a fingerprint"
    # the disjoint doc shares no fingerprint with either document
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    # selection is sparse: far fewer fingerprints than grams
    n_grams_doc0 = len(df.collect()[0]["text"].split()) - 4
    assert len(out[out.doc_id == 0]) < n_grams_doc0


def test_winnow_copy_pairs_finds_shared_passage(spark):
    from gordo_spark.operators.dedup import winnow_copy_pairs

    passage = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "intro words here " + passage,
                    passage + " totally different tail content follows now",
                    "unrelated document with its own completely private words",
                ],
            }
        )
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_copy_pairs(df, min_shared=2, max_df=10).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2  # long shared passage
    assert all(2 not in p for p in pairs)  # private doc pairs with nobody


def test_decontaminate_bloom_no_false_negatives(spark):
    from gordo_spark.operators.dedup import decontaminate_bloom

    bench_text = " ".join(f"b{i}" for i in range(30))
    df_bench = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [bench_text]}))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    bench_text,  # verbatim leak: every shingle must flag
                    " ".join(f"c{i}" for i in range(30)),  # clean
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["flagged_frac"])
        for r in decontaminate_bloom(corpus, df_bench, bits=1 << 16).collect()
    }
    # Bloom filters never miss: the verbatim copy flags at 1.0
    assert out[1][0] == out[1][1] and out[1][2] == 1.0
    # FPR at this load (~28 shingles in 65536 bits) is ~0 for the clean doc
    assert out[2][1] == 0


def test_shard_manifest_detects_corruption(spark):
    from gordo_spark.operators.sampling import shard_manifest

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "shard": ["a", "a", "a", "b", "b", "b"],
                "text": [f"text {i}" for i in range(6)],
            }
        )
    )
    base = {r["shard"]: r.asDict() for r in shard_manifest(df, "shard", "doc_id").collect()}
    # same rows reshuffled -> identical manifest (order-insensitive checksum)
    re = {
        r["shard"]: r.asDict()
        for r in shard_manifest(df.repartition(5), "shard", "doc_id").collect()
    }
    assert base == re
    # one flipped byte moves the checksum but not the counts
    df2 = df.withColumn(
        "text", F.when(F.col("doc_id") == 0, F.lit("text X")).otherwise(F.col("text"))
    )
    mut = {r["shard"]: r.asDict() for r in shard_manifest(df2, "shard", "doc_id").collect()}
    assert mut["a"]["n_rows"] == base["a"]["n_rows"]
    assert mut["a"]["checksum"] != base["a"]["checksum"]
    assert mut["b"] == base["b"]


def test_incremental_dedup(spark):
    from gordo_spark.operators.dedup import incremental_dedup

    existing = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["old one", "old two"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 13],
                "text": ["old one", "brand new", "brand new", "also new"],
            }
        )
    )
    out = {r["doc_id"]: r["n_dups"] for r in incremental_dedup(new, existing, ["text"]).collect()}
    assert 10 not in out          # already landed -> dropped
    assert out[11] == 2 and 12 not in out  # within-batch dup collapses to min id
    assert out[13] == 1


def test_char_ngram_lang_id_separable(spark):
    from gordo_spark.operators.text import char_ngram_lang_id, char_ngram_lang_profiles

    # two "languages" with disjoint character inventories
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "lang": ["aa", "aa", "aa", "zz", "zz", "zz"],
                "text": [
                    "abc abd abe abf",
                    "abd abc abg abh",
                    "abe abf abc abd",
                    "xyz xyw xyv xyu",
                    "xyw xyz xyt xys",
                    "xyv xyu xyz xyw",
                ],
            }
        )
    )
    profiles = char_ngram_lang_profiles(df, top_k=50)
    out = {r["doc_id"]: r["lang_pred"] for r in char_ngram_lang_id(df, profiles).collect()}
    assert all(out[i] == "aa" for i in range(3))
    assert all(out[i] == "zz" for i in range(3, 6))


def test_curation_verdict_conjunction(spark):
    from gordo_spark.operators.curation import curation_verdict

    good = " ".join(["the", "data", "table", "scan", "row", "merge"] * 15)
    repetitive = " ".join(["the", "data", "loop"] * 30)  # rules pass, dup high
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "lang": ["en"] * 3,
                "text": [good, repetitive, "too short the a"],
            }
        )
    )
    out = {r["doc_id"]: r.asDict() for r in curation_verdict(df, max_dup_frac=0.3).collect()}
    assert not out[1]["keep"] and out[1]["keep_rules"]  # killed by repetition alone
    assert not out[2]["keep_rules"] and not out[2]["keep"]  # killed by rules
    # the clean doc survives unless it landed in the perplexity tail
    assert out[0]["keep"] == (out[0]["bucket"] != "tail" and out[0]["dup_ngram_frac"] <= 0.3)


def test_hard_negatives_excludes_same_label(spark, embs):
    from gordo_spark.operators.similarity import hard_negatives

    q = embs.filter(F.col("vec_id") < 5)
    out = hard_negatives(embs, k=3, queries=q).toPandas()
    labels = {r["vec_id"]: r["label"] for r in embs.select("vec_id", "label").collect()}
    for _, row in out.iterrows():
        assert labels[row["query_id"]] != labels[row["neighbor_id"]]
    assert set(out.groupby("query_id").size()) == {3}


def test_component_size_histogram(spark):
    from gordo_spark.operators.dedup import component_size_histogram

    comp = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2, 3, 4, 5, 6, 7], "component": [1, 1, 1, 4, 4, 6, 7]}
        )
    )
    out = {r["cluster_size"]: r["n_clusters"] for r in component_size_histogram(comp).collect()}
    assert out == {3: 1, 2: 1, 1: 2}


def test_bpe_train_matches_reference(spark):
    from gordo_spark.operators.bpe import bpe_train, bpe_train_reference

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide lowest",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts})).repartition(3)
    got = bpe_train(df, n_merges=6)
    ref = bpe_train_reference(texts, n_merges=6)
    assert got == ref
    # merges are (str, str, freq) and frequencies are non-increasing only
    # when ties don't reorder; at least the first merge is the true max
    assert got[0][2] == max(m[2] for m in got)


def test_bm25_ranks_denser_matches_higher(spark):
    from gordo_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "spark spark spark filler filler",           # dense match
                    "spark filler filler filler filler",        # sparse match
                    "filler filler filler filler filler",       # no match
                    "spark spark " + "pad " * 200,              # long doc penalized
                ],
            }
        )
    )
    out = bm25_topk(df, "spark", k=10).toPandas()
    assert list(out["doc_id"])[:2] == [0, 3] or list(out["doc_id"])[0] == 0
    assert 2 not in set(out["doc_id"])  # zero-match docs never appear
    scores = out.set_index("doc_id")["score"]
    assert scores[0] > scores[1] > 0  # tf monotone
    assert scores[1] > scores[3] or scores[0] > scores[3]  # length normalization bites


def test_heavy_hitters_guarantee(spark):
    from gordo_spark.operators.sketches import heavy_hitters
    from gordo_spark.operators.text import tokens

    docs = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "hot")        # ~50% of the stream
        .when(F.col("id") % 3 == 0, "warm")        # ~17%
        .otherwise(F.concat(F.lit("cold"), F.col("id")))  # long tail
        .alias("term")
    ).repartition(8)
    out = heavy_hitters(docs, "term", k=10, candidates=40).toPandas()
    got = out.set_index("value")["est_count"]
    exact = {r["term"]: r["n"] for r in docs.groupBy("term").agg(F.count("*").alias("n")).collect()}
    # every term above n/(candidates+1) must be present
    n = sum(exact.values())
    for t, c in exact.items():
        if c > n / 41:
            assert t in got.index, t
    # estimates never exceed true counts and the hot item dominates
    for t in got.index:
        assert got[t] <= exact[t]
    assert got.index[0] == "hot"


def test_unigram_oov_floor_scores_gibberish_worse(spark):
    from gordo_spark.operators.text import unigram_logprob_score

    normal = "the data table scan row merge the data table scan"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(12),
                "text": [normal] * 10
                + [
                    "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10",  # all-OOV gibberish
                    normal,
                ],
            }
        )
    )
    out = unigram_logprob_score(df, min_df=2).toPandas().set_index("doc_id")["mean_nll"]
    # per-type OOV floor: never-seen junk must score WORSE (higher nll)
    # than typical text — the mass-only floor inverted this
    assert out[10] > out[0]


def test_curation_verdict_covers_tokenless_docs(spark):
    from gordo_spark.operators.curation import curation_verdict

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "lang": ["en", "en"],
                "text": ["", "the data row scan " * 15],
            }
        )
    )
    out = {r["doc_id"]: r.asDict() for r in curation_verdict(df).collect()}
    # the empty doc gets an explicit keep=False verdict, never vanishes
    assert 0 in out and out[0]["keep"] is False


def test_count_min_sketch_guarantees(spark, docs):
    """CMS point estimates never undercount, and overcounts are bounded
    by collisions (loose bound: est - true <= N/width * depth-safety)."""
    from gordo_spark.operators.sketches import cms_estimate, count_min_sketch

    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    n_total = toks.count()
    sk = count_min_sketch(toks, "w", width=256, depth=4)
    truth = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    words = sorted(truth)[:10] + ["zzz_never_seen"]
    est = {r["value"]: r["est_count"] for r in cms_estimate(sk, words, width=256, depth=4).collect()}
    for w in words:
        t = truth.get(w, 0)
        assert est[w] >= t, (w, est[w], t)
        # classical bound e*N/width holds in expectation per row; min over
        # 4 independent rows makes a gross violation astronomically unlikely
        assert est[w] - t <= 3 * n_total / 256 + 1, (w, est[w], t)
    # the sketch table is exactly mergeable state: depth x width cells max
    assert sk.count() <= 4 * 256


def test_trigram_backoff_score_math(spark):
    """Hand-computed stupid-backoff values: an attested trigram scores
    c3/h2; a pruned one backs off to 0.4*c2/h1, then to 0.4^2*c1/N."""
    import math

    from gordo_spark.operators.text import trigram_backoff_score

    # corpus: "a b c" x2 (trigram 'a b c' count 2 -> kept at min_count=2)
    # plus "x b c" (trigram count 1 -> pruned; bigram 'b c' count 3 kept)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c", "a b c", "x b c"]})
    )
    out = {r["doc_id"]: r["mean_nll3"] for r in trigram_backoff_score(df).collect()}
    # doc 0/1: S(c|a b) = c3/h2 = 2/2 = 1 -> nll 0
    assert out[0] == pytest.approx(0.0, abs=1e-6)
    # doc 2: trigram 'x b c' pruned -> 0.4 * c2('b c')/h1('b') = 0.4 * 3/3
    assert out[2] == pytest.approx(-math.log(0.4), abs=1e-6)

    # unigram fallback: a doc whose trigram AND bigram are unique
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": ["a b c", "a b c", "p q c"]}
        )
    )
    out2 = {r["doc_id"]: r["mean_nll3"] for r in trigram_backoff_score(df2).collect()}
    # 'p q c': trigram pruned, bigram 'q c' count 1 pruned ->
    # 0.4^2 * c1('c')/N = 0.16 * 3/9
    assert out2[2] == pytest.approx(-math.log(0.4 * 0.4 * 3 / 9), abs=1e-6)


def test_strip_boilerplate_removes_every_occurrence(spark):
    from gordo_spark.operators.dedup import strip_boilerplate, word_blocks

    banner = "accept all cookies to continue reading this fine website today ok now"  # 12 words
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    banner + " unique words of document zero only here today now one two three",
                    banner + " different body for document one with its own twelve words here yes",
                    "a fully unique document with no boilerplate at all in it today",
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_clean"])
        for r in strip_boilerplate(df, word_blocks(F.col("text"), 12), 2).collect()
    }
    # the banner block is in 2 docs -> removed from BOTH (no survivor)
    assert banner not in out[0][2] and banner not in out[1][2]
    assert out[0][1] == out[0][0] - 1 and out[1][1] == out[1][0] - 1
    assert out[2] == (1, 1, df.collect()[2]["text"]) or out[2][2].startswith("a fully unique")
    # all-boilerplate doc comes back EMPTY, not missing
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [banner, banner]})
    )
    out2 = {r["doc_id"]: r for r in strip_boilerplate(df2, word_blocks(F.col("text"), 12), 2).collect()}
    assert len(out2) == 2
    assert out2[0]["n_kept"] == 0 and out2[0]["text_clean"] == ""


def test_pq_encode_matches_numpy(spark, embs):
    """pq_train + pq_encode == a pure-numpy PQ pipeline on the collected
    data (deterministic sample + init), and distortion shrinks as k
    grows."""
    import numpy as np

    from gordo_spark.operators.similarity import (
        _lloyds_np, pq_distortion, pq_encode, pq_train,
    )

    small = embs.filter(F.col("vec_id") < 200)
    books = pq_train(small, m=4, k=8, iters=6, sample_n=128)
    assert books.shape == (4, 8, 16)

    rows = small.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    # numpy replica: same sample (first 128 by id), same subspace Lloyd's
    books_np = np.stack(
        [_lloyds_np(X[:128, s * 16:(s + 1) * 16], 8, 6) for s in range(4)]
    )
    assert np.allclose(books, books_np)

    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(small, books).collect()}
    for s in range(4):
        sub = X[:, s * 16:(s + 1) * 16]
        d2 = (
            np.einsum("ij,ij->i", sub, sub)[:, None]
            - 2.0 * sub @ books[s].T
            + np.einsum("kd,kd->k", books[s], books[s])[None, :]
        )
        want = np.argmin(d2, axis=1)
        for i, vid in enumerate(ids):
            assert got[vid][s] == want[i], (vid, s)

    d8 = pq_distortion(small, books)
    d32 = pq_distortion(small, pq_train(small, m=4, k=32, iters=6, sample_n=128))
    assert d32 < d8  # bigger codebooks reconstruct better


def test_pq_adc_search_parity_and_recall(spark, embs):
    """Spark ADC top-k == a numpy ADC replica EXACTLY (same LUT math,
    same tie order), and recall beats the random-candidate baseline by a
    wide margin (these synthetic embeddings are near-random, so exact
    top-1-in-top-5 recall is intrinsically ~0.5 for PQ; random would be
    5/300)."""
    import numpy as np

    from gordo_spark.operators.similarity import pq_adc_topk, pq_encode, pq_train

    base = embs.filter(F.col("vec_id") < 300)
    queries = embs.filter(F.col("vec_id") < 5)
    books = pq_train(base, m=4, k=16, iters=8, sample_n=300)
    codes = pq_encode(base, books)
    got = pq_adc_topk(codes, queries, books, k=5).toPandas()
    assert set(got.groupby("query_id").size()) == {5}

    rows = base.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    m, kk, dsub = books.shape
    # numpy ADC replica
    cm = np.stack(
        [
            np.argmin(
                np.einsum("ij,ij->i", X[:, s*dsub:(s+1)*dsub], X[:, s*dsub:(s+1)*dsub])[:, None]
                - 2.0 * X[:, s*dsub:(s+1)*dsub] @ books[s].T
                + np.einsum("kd,kd->k", books[s], books[s])[None, :],
                axis=1,
            )
            for s in range(m)
        ]
    ).T
    hit = 0
    for q in range(5):
        qv = X[ids == q][0]
        lut = np.stack(
            [
                qv[s*dsub:(s+1)*dsub] @ qv[s*dsub:(s+1)*dsub]
                - 2.0 * books[s] @ qv[s*dsub:(s+1)*dsub]
                + np.einsum("kd,kd->k", books[s], books[s])
                for s in range(m)
            ]
        )
        dist = lut[np.arange(m)[None, :], cm].sum(axis=1)
        mask = ids != q
        order = np.lexsort((ids[mask], dist[mask]))[:5]
        want_ids = ids[mask][order]
        want_d = np.round(dist[mask][order], 6)
        sub = got[got.query_id == q].sort_values("rank")
        assert list(sub.neighbor_id) == list(want_ids), q
        assert np.allclose(sub.adc_dist.to_numpy(), want_d, atol=1e-6), q

        d2 = np.einsum("ij,ij->i", X, X) - 2.0 * (X @ qv) + qv @ qv
        d2[ids == q] = np.inf
        hit += ids[np.argmin(d2)] in set(sub.neighbor_id)
    assert hit >= 2  # far above the 5/300 random baseline


def test_ivf_pq_index_pruned_and_numpy_parity(spark, sf_dir, tmp_path):
    """IVF-PQ: the probe scan carries a cell PartitionFilter, ADC results
    equal a numpy residual-PQ replica exactly, and recall beats the
    random baseline (near-random synthetic embeddings cap it ~0.5)."""
    import contextlib
    import io as _io

    from gordo_spark.operators.similarity import (
        _lloyds_np, ivf_pq_probe, ivf_pq_write,
    )
    from gordo_spark.sources.io import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 5)
    path = f"{tmp_path}/ivfpq"
    n_cells, m, k, iters, sample_n, n_probe = 8, 4, 16, 8, 4096, 3
    ivf_pq_write(embs, path, n_cells=n_cells, m=m, k=k, iters=iters, sample_n=sample_n)

    probed = ivf_pq_probe(spark, path, queries, kq=5, n_probe=n_probe)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]
    got = probed.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    # ---- numpy replica of the whole index + probe
    rows = embs.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    d = X.shape[1]; dsub = d // m
    C = _lloyds_np(X[:sample_n], n_cells, iters)  # Lloyd-refined quantizer
    Csq = np.einsum("ij,ij->i", C, C)
    cell_of = np.argmin(np.einsum("ij,ij->i", X, X)[:, None] - 2.0 * (X @ C.T) + Csq[None, :], axis=1)
    S = X[:sample_n]
    R = S - C[cell_of[:sample_n]]
    books = np.stack([_lloyds_np(R[:, s*dsub:(s+1)*dsub], k, iters) for s in range(m)])
    Bsq = np.einsum("mkd,mkd->mk", books, books)
    Rall = X - C[cell_of]
    codes = np.stack(
        [np.argmin(Bsq[s][None, :] - 2.0 * (Rall[:, s*dsub:(s+1)*dsub] @ books[s].T), axis=1) for s in range(m)]
    ).T
    hit = 0
    for q in range(5):
        qv = X[ids == q][0]
        d2c = np.einsum("ij,ij->i", C, C) - 2.0 * (C @ qv) + qv @ qv
        probe_cells = np.argsort(d2c, kind="stable")[:n_probe]
        cand = np.isin(cell_of, probe_cells) & (ids != q)
        lut = {}
        for c in probe_cells:
            qr = qv - C[c]
            lut[c] = np.stack([qr[s*dsub:(s+1)*dsub] @ qr[s*dsub:(s+1)*dsub]
                               - 2.0 * books[s] @ qr[s*dsub:(s+1)*dsub] + Bsq[s] for s in range(m)])
        dist = np.array([
            lut[cell_of[i]][np.arange(m), codes[i]].sum() for i in np.where(cand)[0]
        ])
        cid = ids[cand]
        order = np.lexsort((cid, dist))[:5]
        sub = got[got.query_id == q].sort_values("rank")
        assert list(sub.neighbor_id) == list(cid[order]), q
        np.testing.assert_allclose(sub.adc_dist, np.round(dist[order], 6), atol=1e-6)

        d2 = np.einsum("ij,ij->i", X, X) - 2.0 * (X @ qv) + qv @ qv
        d2[ids == q] = np.inf
        hit += ids[np.argmin(d2)] in set(sub.neighbor_id)
    assert hit >= 2  # probe fan-out + PQ loss; far above 5/500 random


def test_bpe_encode_matches_reference_and_training(spark, docs):
    """bpe_encode == the pure-Python apply on every doc, and replaying
    the learned merges over the training corpus actually uses them (the
    top merge's fused symbol appears in the token stream)."""
    from gordo_spark.operators.bpe import (
        bpe_encode, bpe_encode_reference, bpe_train,
    )

    small = docs.limit(60).select("doc_id", "text")
    merges = bpe_train(small, n_merges=12)
    assert len(merges) == 12
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], list(r["tokens"]))
        for r in bpe_encode(small, merges).collect()
    }
    rows = small.orderBy("doc_id").collect()
    exp = bpe_encode_reference([r["text"] for r in rows], merges)
    for r, e in zip(rows, exp):
        nw, nt, toks = got[r["doc_id"]]
        assert toks == e, r["doc_id"]
        assert nt == len(e)
        assert nw == len([w for w in r["text"].split(" ") if w])
    fused = merges[0][0] + merges[0][1]
    assert any(fused in toks for _, _, toks in got.values())
    # encoding never splits beyond chars+end-marks: token count bounded
    for r in rows:
        nw, nt, _ = got[r["doc_id"]]
        assert nw <= nt <= len(r["text"].replace(" ", "")) + nw


def test_partial_distinct_sketches_merge_incrementally(spark, docs):
    """Per-source HLL blobs union to the corpus-wide distinct estimate
    without rescanning data; adding a NEW source's blob updates the
    total from the blob table alone — the incremental-uniques lake
    pattern."""
    from gordo_spark.operators.sketches import (
        merged_distinct_estimate, partial_distinct_sketches,
    )

    toks = docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
    exact = toks.select("w").distinct().count()
    blobs = partial_distinct_sketches(toks, "w", group_by=("source",))
    assert blobs.count() == toks.select("source").distinct().count()
    est = merged_distinct_estimate(blobs).collect()[0]["n_distinct"]
    assert abs(est - exact) <= max(0.05 * exact, 3)

    # incremental: a new source arrives; only ITS rows are sketched, the
    # union runs over blobs only
    new = spark.createDataFrame(
        pd.DataFrame({"source": ["fresh"] * 3, "w": ["zzz1", "zzz2", "zzz3"]})
    )
    blobs2 = blobs.unionByName(partial_distinct_sketches(new, "w", ("source",)))
    est2 = merged_distinct_estimate(blobs2).collect()[0]["n_distinct"]
    exact2 = toks.select("w").unionByName(new.select("w")).distinct().count()
    assert abs(est2 - exact2) <= max(0.05 * exact2, 3)
    assert est2 > est  # the three novel tokens moved the estimate


def test_subsequence_topk_finds_planted_pattern(spark):
    """A scaled+shifted copy of the query pattern is the exact top-1
    (z-norm distance ~0 — shift/scale invariance), and distances match a
    numpy z-normalized euclidean replica."""
    import numpy as np

    from gordo_spark.operators.similarity import subsequence_topk

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01")
    q = [0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, -1.0]
    rows = []
    for tag in ("a", "b"):
        vals = list(rng.uniform(-1, 1, 60))
        if tag == "b":
            # plant 100 + 7*q at offset 20: same shape, new scale/shift
            for i, v in enumerate(q):
                vals[20 + i] = 100.0 + 7.0 * v
        for i, v in enumerate(vals):
            rows.append((tag, (base + pd.Timedelta(hours=i)).to_pydatetime(), float(v)))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    got = subsequence_topk(df, q, k=5).toPandas()
    top = got.iloc[0]
    assert top.tag == "b"
    assert top.window_end == base + pd.Timedelta(hours=27)  # window end = offset 20+8-1
    assert top.znorm_dist == pytest.approx(0.0, abs=1e-6)

    # numpy replica over all windows of tag 'a'
    qa = np.asarray(q); qz = (qa - qa.mean()) / qa.std()
    va = np.array([r[2] for r in rows if r[0] == "a"])
    w = len(q)
    dists = {}
    for e in range(w - 1, len(va)):
        win = va[e - w + 1 : e + 1]
        s = win.std()
        if s <= 1e-9:
            continue
        z = (win - win.mean()) / s
        dists[e] = float(np.sqrt(((z - qz) ** 2).sum()))
    for _, r in got[got.tag == "a"].iterrows():
        e = int((r.window_end - base) / pd.Timedelta(hours=1))
        assert r.znorm_dist == pytest.approx(dists[e], abs=1e-5)


def test_check_constraints_plants_and_plan(spark):
    """Planted violations are counted per check; all row-local checks
    share ONE aggregation over one scan (adding a check adds a counter,
    not a job); unknown kinds raise."""
    from gordo_spark.operators.quality_checks import check_constraints

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 2, 3, 4],
                "v": [5.0, None, 60.0, 10.0, 20.0],
                "cat": ["a", "b", "zz", "a", "b"],
            }
        )
    )
    ref = spark.createDataFrame(pd.DataFrame({"rk": [1, 2, 3]}))
    out = check_constraints(
        df,
        [
            {"check": "not_null", "col": "v"},
            {"check": "in_range", "col": "v", "min": 0, "max": 50},
            {"check": "in_set", "col": "cat", "values": ["a", "b"]},
            {"check": "unique", "cols": ["k"]},
            {"check": "foreign_key", "col": "k", "ref": ref, "ref_col": "rk"},
            {"check": "expression", "name": "v_odd", "expr": "v < 15 OR v IS NULL"},
        ],
    ).collect()
    by = {r["check"]: (r["n_violations"], r["passed"]) for r in out}
    assert by["not_null(v)"] == (1, False)
    assert by["in_range(v,0,50)"] == (2, False)      # null + 60
    assert by["in_set(cat)"] == (1, False)
    assert by["unique(k)"] == (2, False)             # both rows of k=2
    assert by["foreign_key(k->rk)"] == (1, False)    # k=4
    assert by["v_odd"] == (2, False)                 # 60 and 20
    assert [r["check_id"] for r in out] == [0, 1, 2, 3, 4, 5]

    # row-local checks: ONE scan in the optimized plan
    rl = check_constraints(
        df,
        [
            {"check": "not_null", "col": "v"},
            {"check": "in_range", "col": "v", "min": 0, "max": 50},
            {"check": "in_set", "col": "cat", "values": ["a", "b"]},
        ],
    )
    plan = rl._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1

    with pytest.raises(ValueError):
        check_constraints(df, [{"check": "nope"}])


def test_check_constraints_null_semantics(spark):
    """The documented NULL table (module docstring): NULL is a violation
    for not_null / in_range / in_set / expression (gate posture — a
    deliberate deviation from deequ's completeness/compliance split),
    NULL keys group as duplicates for unique, and NULL fks are SKIPPED
    by foreign_key."""
    from gordo_spark.operators.quality_checks import check_constraints

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [None, None, 1.0],
                "v": [None, 5.0, 5.0],
                "cat": [None, "a", "a"],
            }
        )
    )
    ref = spark.createDataFrame(pd.DataFrame({"rk": [99.0]}))
    out = check_constraints(
        df,
        [
            {"check": "not_null", "col": "v"},
            {"check": "in_range", "col": "v", "min": 0, "max": 50},
            {"check": "in_set", "col": "cat", "values": ["a"]},
            # NULL-valued predicate (v > 1 with v NULL) is a violation
            {"check": "expression", "name": "v_gt1", "expr": "v > 1"},
            {"check": "unique", "cols": ["k"]},
            {"check": "foreign_key", "col": "k", "ref": ref, "ref_col": "rk"},
        ],
    ).collect()
    by = {r["check"]: r["n_violations"] for r in out}
    assert by["not_null(v)"] == 1
    assert by["in_range(v,0,50)"] == 1          # the NULL row
    assert by["in_set(cat)"] == 1               # the NULL row
    assert by["v_gt1"] == 1                     # NULL predicate counted
    assert by["unique(k)"] == 2                 # two NULL-keyed rows group
    assert by["foreign_key(k->rk)"] == 1        # k=1 orphan; NULLs skipped


def test_duplicate_spans_finds_planted_run(spark):
    from gordo_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(15))  # 15-token duplicated run
    boiler = " ".join(f"b{i % 8}" for i in range(8))  # ubiquitous 8-gram
    rows = [
        (1, "x0 x1 x2 " + shared + " x3 x4"),
        (2, "y0 " + shared + " y1 y2 y3 y4 y5"),
        (3, "unique tokens only here nothing shared at all " + boiler),
    ] + [(10 + i, boiler + f" filler{i} pad pad2 pad3 pad4 pad5 pad6 pad7") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, k=8, min_len=12, max_df=16).collect()
    # the planted run: doc 1 pos 3, doc 2 pos 1, 15 tokens
    planted = [r for r in out if r["doc_a"] == 1 and r["doc_b"] == 2]
    assert len(planted) == 1
    r = planted[0]
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (3, 1, 15)
    # the boilerplate 8-gram appears in 21 docs (> max_df occurrences) -> dropped
    assert not any(r["doc_a"] >= 3 or r["doc_b"] >= 3 for r in out)


def test_duplicate_spans_merges_islands_not_gaps(spark):
    from gordo_spark.operators.dedup import duplicate_spans

    run = " ".join(f"t{i}" for i in range(12))
    # same 12-token run twice in doc 2, separated by noise: two spans
    df = spark.createDataFrame(
        [(1, run + " gapA gapB"), (2, run + " zz " + run)],
        "doc_id long, text string",
    )
    out = duplicate_spans(df, k=8, min_len=12, max_df=16).collect()
    spans = sorted((r["start_a"], r["start_b"], r["span_tokens"]) for r in out)
    assert spans == [(0, 0, 12), (0, 13, 12)]


def test_pmi_bigrams_math(spark):
    from gordo_spark.operators.text import pmi_bigrams

    # 6x "a b" + 5x "c d": N=11, pmi(a,b)=ln(6*11/(6*6)), pmi(c,d)=ln(5*11/(5*5))
    rows = [(i, "a b") for i in range(6)] + [(10 + i, "c d") for i in range(5)]
    out = pmi_bigrams(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_count=5,
        topk=20,
    ).collect()
    got = {(r["w1"], r["w2"]): (r["n"], r["pmi"]) for r in out}
    assert got[("a", "b")][0] == 6
    assert got[("a", "b")][1] == pytest.approx(math.log(11 / 6), abs=1e-6)
    assert got[("c", "d")][1] == pytest.approx(math.log(11 / 5), abs=1e-6)
    # ordering: highest pmi first
    assert out[0]["w1"] == "c"


def test_quantize_embeddings_roundtrip(spark):
    from gordo_spark.operators.similarity import quantize_embeddings

    # dim0 spans [0, 255] on-grid -> exact codes, zero error
    # dim1 constant -> span 0 -> code 0, zero error
    rows = [(i, [float(i * 51), 7.0]) for i in range(6)]
    out = quantize_embeddings(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ).collect()
    for r in sorted(out, key=lambda r: r["vec_id"]):
        assert r["codes"][0] == r["vec_id"] * 51
        assert r["codes"][1] == 0
        assert r["mse"] == pytest.approx(0.0, abs=1e-12)


def test_quantize_embeddings_bounds_and_mse(spark, embs):
    from gordo_spark.operators.similarity import quantize_embeddings

    rows = quantize_embeddings(embs).collect()
    assert all(0 <= c <= 255 for r in rows for c in r["codes"])
    # quantization error bounded by (span/255/2)^2 per dim
    V = np.array(
        [r["embedding"] for r in embs.orderBy("vec_id").collect()], dtype=np.float64
    )
    span = V.max(axis=0) - V.min(axis=0)
    bound = float(np.mean((span / 255.0 / 2.0) ** 2)) * 1.0000001
    assert all(r["mse"] <= bound for r in rows)


def test_pca_sample_fit_matches_numpy(spark, embs):
    from gordo_spark.operators.similarity import pca_np, pca_sample_fit, pca_transform

    mean, comps, ratios = pca_sample_fit(embs, k=4, sample_n=128)
    rows = embs.orderBy("vec_id").limit(128).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m2, c2, r2 = pca_np(X, 4)
    assert np.array_equal(mean, m2) and np.array_equal(comps, c2)
    # projection parity vs numpy on the full table
    out = pca_transform(embs, mean, comps).orderBy("vec_id").collect()
    V = np.array(
        [r["embedding"] for r in embs.orderBy("vec_id").collect()], dtype=np.float64
    )
    P = (V - mean) @ comps.T
    got = np.array([r["pca"] for r in out])
    assert np.allclose(got, P, atol=1e-9)


def test_logreg_sample_apply_parity(spark, docs):
    """Sample-trained weights + distributed sigmoid == numpy end-to-end."""
    import __spark_entry__ as entry

    from contracts.rounds5to8_a import _logreg_features

    feats = _logreg_features(docs)
    sample = (
        feats.orderBy("doc_id").limit(64).select("f_chars", "f_words", "f_uniq", "label").collect()
    )
    from gordo_spark.ml.logreg import LogisticModel, numpy_irls

    X = np.array([[r["f_chars"], r["f_words"], r["f_uniq"]] for r in sample])
    y = np.array([float(r["label"]) for r in sample])
    w = numpy_irls(X, y)
    model = LogisticModel(["f_chars", "f_words", "f_uniq"], "label")
    model.coef_ = w
    got = {
        r["doc_id"]: r["score"]
        for r in model.score(feats).select("doc_id", "score").collect()
    }
    pdf = feats.toPandas().sort_values("doc_id")
    Z = w[0] + pdf[["f_chars", "f_words", "f_uniq"]].to_numpy() @ w[1:]
    want = 1.0 / (1.0 + np.exp(-Z))
    assert np.allclose([got[i] for i in pdf["doc_id"]], want, atol=1e-12)


def test_feature_hash_embed_matches_hand_hash(spark):
    import hashlib

    from gordo_spark.operators.text import feature_hash_embed

    rows = [(1, "alpha beta alpha"), (2, "")]
    out = {
        r["doc_id"]: r
        for r in feature_hash_embed(
            spark.createDataFrame(rows, "doc_id long, text string"), dim=8
        ).collect()
    }

    def hand(text):
        v = [0.0] * 8
        for t in text.split(" "):
            h = hashlib.md5(t.encode()).hexdigest()
            slot = int(h[:8], 16) % 8
            sign = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
            v[slot] += sign
        n = math.sqrt(sum(x * x for x in v))
        return [x / n if n > 0 else 0.0 for x in v]

    for doc_id, text in rows:
        want = hand(text)
        got = [out[doc_id][f"h{j}"] for j in range(8)]
        assert got == pytest.approx(want, abs=1e-12)
    # unit norm for the non-degenerate doc
    assert sum(out[1][f"h{j}"] ** 2 for j in range(8)) == pytest.approx(1.0)


def test_merge_term_stats_equals_full_recompute(spark, docs):
    from gordo_spark.operators.text import merge_term_stats, term_stats

    landed = term_stats(docs.filter(F.col("doc_id") % 3 != 0), top_k=None)
    delta = term_stats(docs.filter(F.col("doc_id") % 3 == 0), top_k=None)
    merged = (
        merge_term_stats(landed, delta)
        .toPandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    full = (
        term_stats(docs, top_k=None)
        .toPandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, full)


def test_strip_duplicate_spans_cuts_younger_doc_only(spark):
    from gordo_spark.operators.dedup import duplicate_spans, strip_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, "a0 a1 " + shared + " a2"),
            (2, "b0 " + shared + " b1 b2"),
            (3, "untouched doc stays byte identical"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(df, k=8, min_len=12, max_df=16)
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, spans).collect()}
    # older doc (1) keeps its text; younger doc (2) loses the span
    assert out[1]["text_clean"] == "a0 a1 " + shared + " a2"
    assert out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "b0 b1 b2"
    assert out[2]["n_removed"] == 12
    assert out[3]["text_clean"] == "untouched doc stays byte identical"


def test_strip_duplicate_spans_full_strip_yields_empty(spark):
    from gordo_spark.operators.dedup import duplicate_spans, strip_duplicate_spans

    run = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame([(1, run), (2, run)], "doc_id long, text string")
    spans = duplicate_spans(df, k=8, min_len=12, max_df=16)
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, spans).collect()}
    assert out[1]["text_clean"] == run and out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "" and out[2]["n_removed"] == 12
