"""M3/M4/M7 — cross-validation splits as time filters.

Reference semantics: default CV is sklearn ``TimeSeriesSplit(n_splits=3)``
(gordo/builder/build_model.py:256-261 in /root/reference); the KFold variant
is ``KFold(n_splits=5, shuffle=True, random_state=0)``
(gordo/machine/model/anomaly/diff.py:566-623).

Spark shape: a fold is a *predicate*, not a materialized slice — each fold's
train/test DataFrames are lazy filters over one cached aligned frame, so N
folds share one scan. TimeSeriesSplit reproduces sklearn's exact index
arithmetic.

Shuffled KFold membership (default) reproduces sklearn
``KFold(n_splits, shuffle=True, random_state=seed)`` EXACTLY: sklearn
shuffles ``arange(n)`` with the seeded Mersenne RNG and deals consecutive
chunks as test folds — the identical permutation comes from
``np.random.RandomState(seed).permutation(n)`` on the driver (one machine's
aligned frame is bounded, ~50k rows/year @10min, so the n-length fold map
is a broadcast-joinable driver artifact — the same boundary the reference
crosses by materializing the whole frame in memory). ``membership="modulo"``
(``row_number % k``) remains as the engine-portable fallback that a SQL
oracle can reproduce (used by the m4 contract query).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _with_rn(df: DataFrame, ts_col: str) -> DataFrame:
    w = Window.partitionBy().orderBy(ts_col)
    return df.withColumn("_rn", F.row_number().over(w) - 1)


def timeseries_split(
    df: DataFrame, n_splits: int = 3, ts_col: str = "ts"
) -> list[tuple[DataFrame, DataFrame]]:
    """sklearn TimeSeriesSplit parity: test_size = n // (n_splits+1);
    fold i trains on rows [0, n - (n_splits - i)*test_size)."""
    n = df.count()
    test_size = n // (n_splits + 1)
    if test_size < 1:
        raise ValueError(f"too few rows ({n}) for {n_splits} splits")
    rn = _with_rn(df, ts_col)
    folds = []
    for i in range(n_splits):
        train_end = n - (n_splits - i) * test_size
        train = rn.filter(F.col("_rn") < train_end).drop("_rn")
        test = rn.filter(
            (F.col("_rn") >= train_end) & (F.col("_rn") < train_end + test_size)
        ).drop("_rn")
        folds.append((train, test))
    return folds


def sklearn_kfold_membership(
    n: int, n_splits: int = 5, seed: int = 0
) -> np.ndarray:
    """Fold id per row index, bit-equal to sklearn
    ``KFold(n_splits, shuffle=True, random_state=seed)``
    (/root/reference/gordo/machine/model/anomaly/diff.py:566-575 pins
    ``KFold(5, shuffle=True, random_state=0)``): shuffle ``arange(n)`` with
    the seeded RNG, deal consecutive chunks (first ``n % k`` folds one
    larger) as test folds."""
    perm = np.random.RandomState(seed).permutation(n)
    sizes = np.full(n_splits, n // n_splits, dtype=np.int64)
    sizes[: n % n_splits] += 1
    fold_of = np.empty(n, dtype=np.int64)
    cur = 0
    for f, size in enumerate(sizes):
        fold_of[perm[cur : cur + size]] = f
        cur += size
    return fold_of


def fold_column(
    df: DataFrame,
    n_splits: int = 5,
    ts_col: str = "ts",
    membership: str = "shuffle",
    seed: int = 0,
    col: str = "_fold",
) -> DataFrame:
    """Append a fold-membership column.

    ``membership="shuffle"``: sklearn-faithful seeded permutation (driver
    computes the n-row (rn, fold) map, broadcast-joined in — frames are
    bounded per machine). ``membership="modulo"``: ``row_number % k``,
    engine-portable (SQL-oracle-reproducible)."""
    rn = _with_rn(df, ts_col)
    if membership == "modulo":
        return rn.withColumn(col, (F.col("_rn") % n_splits)).drop("_rn")
    if membership != "shuffle":
        raise ValueError(f"unknown membership {membership!r} (shuffle|modulo)")
    n = df.count()
    fold_of = sklearn_kfold_membership(n, n_splits, seed)
    mapping = df.sparkSession.createDataFrame(
        [(int(i), int(f)) for i, f in enumerate(fold_of)],
        schema="_rn bigint, _fold_m int",
    )
    return (
        rn.join(F.broadcast(mapping), "_rn")
        .withColumn(col, F.col("_fold_m"))
        .drop("_rn", "_fold_m")
    )


def kfold_split(
    df: DataFrame,
    n_splits: int = 5,
    ts_col: str = "ts",
    membership: str = "shuffle",
    seed: int = 0,
) -> list[tuple[DataFrame, DataFrame]]:
    """Shuffled k-fold (sklearn-faithful by default; see fold_column)."""
    withf = fold_column(df, n_splits, ts_col, membership, seed)
    folds = []
    for i in range(n_splits):
        test = withf.filter(F.col("_fold") == i).drop("_fold")
        train = withf.filter(F.col("_fold") != i).drop("_fold")
        folds.append((train, test))
    return folds


def split_metadata(
    df: DataFrame, n_splits: int = 3, ts_col: str = "ts"
) -> list[dict]:
    """M7 — fold train/test start/end/count (driver-side summary)."""
    out = []
    for i, (train, test) in enumerate(timeseries_split(df, n_splits, ts_col)):
        tr = train.agg(
            F.min(ts_col).alias("s"), F.max(ts_col).alias("e"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        te = test.agg(
            F.min(ts_col).alias("s"), F.max(ts_col).alias("e"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        out.append(
            {
                "fold": i,
                "train_start": tr["s"], "train_end": tr["e"], "train_count": tr["n"],
                "test_start": te["s"], "test_end": te["e"], "test_count": te["n"],
            }
        )
    return out
