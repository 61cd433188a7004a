"""M3/M4/M7 — cross-validation splits as time filters.

Reference semantics: default CV is sklearn ``TimeSeriesSplit(n_splits=3)``
(gordo/builder/build_model.py:256-261 in /root/reference); the KFold variant
is ``KFold(n_splits=5, shuffle=True, random_state=0)``
(gordo/machine/model/anomaly/diff.py:566-623).

Spark shape: a fold is a *predicate*, not a materialized slice — each fold's
train/test DataFrames are lazy filters over one cached aligned frame, so N
folds share one scan. TimeSeriesSplit reproduces sklearn's exact index
arithmetic; for the shuffled KFold we use ``row_number % k`` (deterministic,
engine-portable) instead of an RNG permutation — sklearn's Mersenne shuffle
is not reproducible in SQL and the reference pins seed=0 only for
repeatability, not for specific membership.
"""

from __future__ import annotations

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


def kfold_split(
    df: DataFrame, n_splits: int = 5, ts_col: str = "ts"
) -> list[tuple[DataFrame, DataFrame]]:
    """Deterministic k-fold: fold = row_number % k (see module docstring)."""
    rn = _with_rn(df, ts_col)
    folds = []
    for i in range(n_splits):
        test = rn.filter(F.col("_rn") % n_splits == i).drop("_rn")
        train = rn.filter(F.col("_rn") % n_splits != i).drop("_rn")
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
