"""Similarity search over embedding columns (array<float>).

Extensions beyond the reference surface for training-data pipelines:

- cosine_topk      — exact brute-force top-k neighbors (broadcast queries)
- lsh_ann_topk     — random-hyperplane LSH bucketing, search within bucket
                     (the 100 TB path: candidate set shrinks ~2^bits-fold)

All vector math is JVM-side higher-order functions (zip_with/aggregate) in
double precision — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` is expected small (it is broadcast); ``vectors`` can be the
    full 100 TB corpus — the plan is a broadcast nested-loop with a
    per-query-partition top-k (window row_number), no shuffle of the corpus.
    Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplanes(dim: int, bits: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (portable LCG, no numpy RNG
    state dependence) for sign-LSH."""
    state = seed
    planes = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit_j = 1 iff dot(v, plane_j) > 0."""
    out = F.lit(0)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        out = out + F.when(dot(vec_col, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold (exact).

    This exact form is the oracle/correctness path. At 100 TB scale the
    all-pairs product is replaced by the sign-LSH candidate join
    (``lsh_ann_topk``'s bucketing) followed by this same exact cosine
    verify on the candidate set only — identical output for any pair the
    bucketing recalls; the exact verify makes precision 1.0.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    Deterministic engine-portable variant: the coarse quantizer's centroids
    are the first ``n_cells`` corpus vectors by id (no RNG, so the DuckDB
    oracle reproduces it exactly). Every corpus vector is assigned to its
    nearest centroid by cosine; each query probes its ``n_probe`` nearest
    cells and ranks only vectors in those cells.

    Scale posture: centroids are tiny and broadcast twice (assignment +
    probe); the corpus never shuffles — at 100 TB the corpus would be
    *written* partitioned by ``cell`` so a probe is a partition-pruned scan
    of n_probe/n_cells of the data. A trained k-means quantizer drops in by
    replacing the ``cents`` frame; the plan shape is unchanged.
    """
    cents = F.broadcast(
        vectors.orderBy(id_col).limit(n_cells).select(
            F.col(id_col).alias("cell"), _as_double(F.col(vec_col)).alias("cv")
        )
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv")
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.desc("_csim"), F.asc("cell")
    )
    assigned = (
        v.crossJoin(cents)
        .withColumn("_csim", cosine(F.col("nv"), F.col("cv")))
        .withColumn("_r", F.row_number().over(w_assign))
        .filter(F.col("_r") == 1)
        .select("neighbor_id", "nv", "cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("_csim"), F.asc("cell"))
    probes = (
        q.crossJoin(cents)
        .withColumn("_csim", cosine(F.col("qv"), F.col("cv")))
        .withColumn("_r", F.row_number().over(w_probe))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cosine_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH — each of ``tables``
    independent hash tables buckets by ``bits`` hyperplane signs; candidates
    are the union of same-bucket matches across tables (classic recall
    amplification: miss prob (1-p^bits)^tables). At scale, write the corpus
    bucketed/partitioned by (table, bucket) so probes are partition-pruned
    scans; candidate set shrinks ~2^bits-fold per table."""
    dim = len(vectors.select(vec_col).first()[0])
    all_planes = [hyperplanes(dim, bits, seed=7 + 1000 * t) for t in range(tables)]

    def bucketed(df, idname, vecname):
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket(F.col(vecname), all_planes[t]).alias("bkt"),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            idname, vecname, F.explode(buckets).alias("tb")
        ).select(idname, vecname, "tb.tbl", "tb.bkt")

    v = bucketed(
        vectors.select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv")
        ),
        "neighbor_id",
        "nv",
    )
    q = bucketed(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ),
        "query_id",
        "qv",
    )
    scored = (
        v.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cosine_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
