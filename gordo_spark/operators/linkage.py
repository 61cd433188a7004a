"""Entity resolution / record linkage primitives.

The reference normalizes tag identities against build metadata
(``gordo/utils.py:15-50`` ``normalize_sensor_tags``, and the server's
tag-name reconciliation in ``gordo/server/properties.py:62-104``) — an
EXACT-match linkage. At corpus scale the same problem reappears fuzzy:
the same real-world entity spelled slightly differently across sources.
The standard shape is blocking + in-block pairwise comparison, which is
what :func:`blocked_pairs` implements.

Scale posture: the naive pairwise space is |N|^2 — never materialized.
Blocking keys bound every comparison group (choose keys so the largest
block fits comfortably in a task; skewed blocks can be salted upstream),
the in-block self-join is an equi-join Catalyst shuffles on the block
key, and the ``id_a < id_b`` canonicalization halves the candidate set
before the edit-distance filter runs row-locally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround

__all__ = ["blocked_pairs", "fs_scores"]


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_dist: int = 1,
) -> DataFrame:
    """Candidate duplicate-entity pairs: records sharing every blocking
    key whose names are within ``max_dist`` Levenshtein edits.

    Output ``(id_a, id_b, name_a, name_b, dist)`` with ``id_a < id_b``
    (each unordered pair once). Identical-name pairs are included
    (``dist = 0``) — exact duplicates are linkage's first-class catch.

    Levenshtein runs JVM-side (builtin ``levenshtein`` expression, no
    Python), and ONLY on in-block pairs: cost is sum over blocks of
    ``|block|^2``, not ``|N|^2`` — the blocking keys are the knob that
    keeps that sum linear-ish at 100 TB. Two row-local prunes shrink
    the expensive part further: a length-difference filter (an edit
    distance is at least ``|len_a - len_b|``, and the lengths ride the
    join for free) discards most pairs before any DP runs, and the
    surviving pairs use the THRESHOLDED ``levenshtein(a, b, k)`` form —
    the banded O(k·n) DP with early exit, not the full O(n·m) table
    (2.85 -> 1.84 s steady on the sf0.1 customer contract).
    """
    k = int(max_dist)
    bcols = list(block_cols)
    a = df.select(
        *[F.col(c) for c in bcols],
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.length(name_col).alias("_la"),
    )
    b = df.select(
        *[F.col(c) for c in bcols],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.length(name_col).alias("_lb"),
    )
    pairs = a.join(b, bcols).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("_la") - F.col("_lb")) <= k)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b", k).alias("dist"),
    ).filter(F.col("dist") >= 0)


def fs_scores(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    field_cols: Sequence[str],
    m: float = 0.95,
) -> DataFrame:
    """Fellegi-Sunter match weights for candidate pairs: per comparison
    field, agreement contributes ``log2(m / u)`` and disagreement
    ``log2((1-m) / (1-u))``; the pair's score is the sum — the
    probabilistic-linkage standard (Fellegi & Sunter 1969) that turns
    blocking candidates into a ranked match/possible/non-match triage.

    ``u`` (the chance two UNRELATED records agree on the field) is
    estimated from the data itself: ``sum_v n_v (n_v - 1) / (N (N-1))``
    over the field's value histogram — ONE pass over the records table
    for ALL fields (each row explodes into ``(field, value)`` entries,
    one hash aggregation builds every histogram at once, a pivot folds
    the per-field scalars into one broadcast 1-row frame), not one
    groupBy per field: at 100 TB, F comparison fields must not mean F
    corpus scans for fit-time scalars. Estimated ``u`` is clamped into
    ``[1e-9, 1 - 1e-9]`` (standard Fellegi-Sunter practice): an
    all-unique field gives u = 0 and an all-constant field u = 1,
    either of which would otherwise send a log weight to NULL and
    silently null the whole pair score. The clamp never moves a
    non-degenerate estimate (the smallest nonzero u is 2/(N(N-1))).
    ``m`` (agreement chance among true matches) is the caller's prior
    (labeled data is what refines it; 0.95 default). NULL field values
    count as disagreement on both sides of a pair (u estimation
    likewise counts NULL as matching nothing).

    Scale shape: two id-keyed equi-joins hang the field vectors on the
    pair endpoints (unique ids — no skew), the per-field scalars ride
    a broadcast, scoring is row-local arithmetic. Output: ``(id_a,
    id_b, n_agree, score)``.
    """
    fields = list(field_cols)
    # single pass for every field's u: explode each row into
    # (field, value-as-string) entries (NULL values kept so the total N
    # rides the same aggregation), one hash agg -> per-(field, value)
    # counts, a second tiny agg -> per-field (N, sum n_v(n_v-1)), then
    # pivot the F scalars into one 1-row broadcast frame
    entries = records.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("_f"),
                        F.col(f).cast("string").alias("_v"),
                    )
                    for f in fields
                ]
            )
        ).alias("_e")
    ).select("_e._f", "_e._v")
    hist = entries.groupBy("_f", "_v").agg(F.count(F.lit(1)).alias("_c"))
    per_field = hist.groupBy("_f").agg(
        F.sum("_c").alias("_n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_v").isNotNull(), F.col("_c") * (F.col("_c") - 1)
                )
            ),
            F.lit(0),
        ).alias("_pairs"),
    )
    eps = 1e-9
    u_raw = F.col("_pairs") / (F.col("_n") * (F.col("_n") - F.lit(1.0)))
    u_clamped = F.greatest(F.least(u_raw, F.lit(1.0 - eps)), F.lit(eps))
    one = (
        per_field.groupBy()
        .pivot("_f", fields)
        .agg(F.first(u_clamped))
        .select(*[F.col(f).alias(f"_u_{f}") for f in fields])
    )
    a = records.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f).alias(f"_a_{f}") for f in fields],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"_b_{f}") for f in fields],
    )
    joined = (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .crossJoin(F.broadcast(one))
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    agree = {
        f: F.when(
            F.col(f"_a_{f}").isNotNull()
            & F.col(f"_b_{f}").isNotNull()
            & (F.col(f"_a_{f}") == F.col(f"_b_{f}")),
            1,
        ).otherwise(0)
        for f in fields
    }
    mm = F.lit(float(m))
    score = None
    for f in fields:
        u = F.col(f"_u_{f}")
        w = F.when(
            agree[f] == 1, log2(mm / u)
        ).otherwise(log2((F.lit(1.0) - mm) / (F.lit(1.0) - u)))
        score = w if score is None else score + w
    n_agree = None
    for f in fields:
        n_agree = agree[f] if n_agree is None else n_agree + agree[f]
    return joined.select(
        "id_a",
        "id_b",
        n_agree.alias("n_agree"),
        qround(score, 6).alias("score"),
    )
