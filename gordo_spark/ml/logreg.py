"""Distributed logistic regression via per-iteration sufficient stats.

The model-based quality filter of LLM data pipelines (GPT-3 appendix A,
LLaMA, PaLM all train a linear classifier over cheap text features /
hashed n-grams to score documents against a high-quality reference) —
expressed Spark-first: each IRLS (Newton) iteration is ONE distributed
aggregation of the (d+1)x(d+1) weighted Gram matrix and gradient; the
driver solves the d+1 system (same driver/executor boundary as
``LinearModel``'s OLS sufficient stats, ml/models.py:93 — fit-time
scalars only, never data). d is the feature count (tens), so the
per-iteration collect is d^2 floats regardless of corpus size; with
fixed ``iters`` the whole fit is ``iters`` scans, each map-side
combined.

Scoring is a pure row-local sigmoid projection — no shuffle, no UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from gordo_spark.functions.rounding import qround


def _sigmoid_col(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


class LogisticModel:
    """L2-regularized binary logistic regression, full-batch IRLS.

    Deterministic given the data and ``iters`` (no RNG, no sampling;
    float summation order across partitions is the only variance, and
    the pytest pins the result against a pure-numpy IRLS at 1e-8).
    """

    def __init__(
        self,
        feature_cols: list[str],
        label_col: str,
        iters: int = 8,
        l2: float = 1e-6,
    ):
        self.feature_cols = list(feature_cols)
        self.label_col = label_col
        self.iters = int(iters)
        self.l2 = float(l2)
        self.coef_: np.ndarray | None = None  # [intercept, *features]

    def _z(self, w: np.ndarray) -> Column:
        z = F.lit(float(w[0]))
        for i, c in enumerate(self.feature_cols):
            z = z + F.lit(float(w[i + 1])) * F.col(c).cast("double")
        return z

    def fit(self, df: DataFrame) -> "LogisticModel":
        d = len(self.feature_cols) + 1
        w = np.zeros(d)
        # project to the d+1 numeric columns and persist: every IRLS
        # iteration re-aggregates the SAME narrow frame, so at any scale
        # the right plan is one materialization + iters re-reads, not
        # iters re-scans of the source (columns pruned before caching)
        # a single null feature/label row would null every F.sum and
        # surface as an opaque linalg failure — drop them here and fail
        # loudly if nothing survives
        df = df.select(
            *[F.col(c).cast("double").alias(c) for c in self.feature_cols],
            F.col(self.label_col).cast("double").alias(self.label_col),
        ).na.drop().persist()
        if df.isEmpty():
            df.unpersist()
            raise ValueError(
                "LogisticModel.fit: no rows with non-null features/label "
                f"(features={self.feature_cols}, label={self.label_col!r})"
            )
        terms = [F.lit(1.0)] + [
            F.col(c).cast("double") for c in self.feature_cols
        ]
        y = F.col(self.label_col).cast("double")
        for _ in range(self.iters):
            p = _sigmoid_col(self._z(w))
            wt = p * (F.lit(1.0) - p)
            aggs = []
            for i in range(d):
                for j in range(i, d):
                    aggs.append(
                        F.sum(wt * terms[i] * terms[j]).alias(f"_h_{i}_{j}")
                    )
            for i in range(d):
                aggs.append(F.sum((y - p) * terms[i]).alias(f"_g_{i}"))
            row = df.agg(*aggs).collect()[0]
            H = np.zeros((d, d))
            for i in range(d):
                for j in range(i, d):
                    H[i, j] = H[j, i] = row[f"_h_{i}_{j}"]
            g = np.array([row[f"_g_{i}"] for i in range(d)]) - self.l2 * w
            w = w + np.linalg.solve(H + self.l2 * np.eye(d), g)
        df.unpersist()
        self.coef_ = w
        return self

    def score(self, df: DataFrame, out_col: str = "score") -> DataFrame:
        """Append the quality probability — row-local, shuffle-free."""
        if self.coef_ is None:
            raise ValueError("fit first")
        return df.withColumn(out_col, _sigmoid_col(self._z(self.coef_)))

    def fit_gd_exact(
        self, df: DataFrame, lr: float = 0.05, gd_iters: int = 6
    ) -> "LogisticModel":
        """ENGINE-EXACT fit: fixed-iteration full-batch gradient descent
        with quantized per-row probabilities and exact scaled-integer
        gradient sums — every weight lands on the 1e-9 grid after every
        update, so the fit (and everything scored with it) is
        bit-identical on any engine, partitioning, or retry order, and
        the whole training loop unrolls into a SQL oracle (the
        kmeans_fit_exact / NumpyAutoEncoder discipline). IRLS
        (:meth:`fit`) stays the statistical-quality path — Newton steps
        need a driver-side matrix solve no SQL engine reproduces;
        GD trades convergence speed for a closed algebraic form.

        Per iteration (ONE distributed aggregation, map-side combined):
        ``p = qround(sigmoid(z), 6)`` per row (the quantization caps the
        cross-libm ``exp`` ulp exposure at ~1e-10/row), gradient
        component sums over ``qfloor((y - p) * x_i, 12)`` as exact
        decimals, then the driver applies
        ``w_i <- qround(w_i + lr * (g_i / 1e12 / n), 9)``. No L2 term
        (a regularizer is a statistical knob; the exact path keeps the
        recipe minimal and mirrored).
        """
        from gordo_spark.functions.rounding import qfloor

        d = len(self.feature_cols) + 1
        w = [0.0] * d
        df = df.select(
            *[F.col(c).cast("double").alias(c) for c in self.feature_cols],
            F.col(self.label_col).cast("double").alias(self.label_col),
        ).na.drop().persist()
        terms = [F.lit(1.0)] + [
            F.col(c).cast("double") for c in self.feature_cols
        ]
        y = F.col(self.label_col).cast("double")
        import math

        # n rides along with the FIRST gradient aggregation (one job
        # materializes the cache, counts the surviving rows, and sums the
        # w=0 gradients) instead of separate isEmpty + count actions —
        # 3 driver jobs collapsed into 1; the empty-input guard fires off
        # the same count before any weight is updated
        n: int | None = None
        for _ in range(int(gd_iters)):
            p = qround(_sigmoid_col(self._z(np.array(w))), 6)
            aggs = [
                F.sum(qfloor((y - p) * terms[i], 12).cast("decimal(38,0)"))
                .cast("double")
                .alias(f"_g_{i}")
                for i in range(d)
            ]
            if n is None:
                aggs.append(F.count(F.lit(1)).alias("_n"))
            row = df.agg(*aggs).collect()[0]
            if n is None:
                n = int(row["_n"])
                if n == 0:
                    df.unpersist()
                    raise ValueError(
                        "LogisticModel.fit_gd_exact: no rows with non-null "
                        f"features/label (features={self.feature_cols}, "
                        f"label={self.label_col!r})"
                    )
            for i in range(d):
                g_mean = (float(row[f"_g_{i}"]) / 1e12) / n
                # driver-side qround(.., 9): same IEEE op sequence as the
                # SQL mirror's floor(x*1e9 + 0.5)/1e9
                w[i] = (
                    math.floor((w[i] + float(lr) * g_mean) * 1e9 + 0.5)
                    / 1e9
                )
        df.unpersist()
        self.coef_ = np.array(w)
        return self


def numpy_irls(
    X: np.ndarray, y: np.ndarray, iters: int = 8, l2: float = 1e-6
) -> np.ndarray:
    """Reference single-node IRLS (same math, same iteration count) —
    the parity oracle for ``LogisticModel.fit``."""
    Xb = np.hstack([np.ones((len(X), 1)), np.asarray(X, dtype=np.float64)])
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-Xb @ w))
        wt = p * (1.0 - p)
        H = (Xb * wt[:, None]).T @ Xb + l2 * np.eye(Xb.shape[1])
        g = Xb.T @ (y - p) - l2 * w
        w = w + np.linalg.solve(H, g)
    return w


def calibration_bins(
    scored: "DataFrame",
    score_col: str = "score",
    label_col: str = "label",
    bins: int = 10,
):
    """Reliability-diagram buckets for a probabilistic classifier:
    equal-width score bins, per-bin count, mean predicted probability,
    and observed positive rate — the calibration readout that decides
    whether a quality classifier's 0.9 means 90% (and whether its
    threshold can be trusted as a sampling probability, the DSIR /
    curation_verdict use).

    Fixed-width binning (floor(score * bins), top edge clamped), the
    deterministic convention shared with psi_drift / tag_mutual_info —
    ntile's tie order is engine-dependent. ONE map-side-combinable hash
    aggregation on <= ``bins`` keys; at any corpus size this is a scan
    plus a constant-size exchange. Output: ``(bin, n, mean_score,
    frac_positive, gap)`` where gap = mean_score - frac_positive (per-
    bin calibration error; weight by n for ECE).
    """
    from pyspark.sql import functions as F

    b = F.least(
        F.lit(int(bins) - 1), F.floor(F.col(score_col) * int(bins))
    ).cast("int")
    out = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        qround(F.avg(score_col), 6).alias("mean_score"),
        qround(F.avg(F.col(label_col).cast("double")), 6).alias(
            "frac_positive"
        ),
    )
    return out.select(
        "bin",
        "n",
        "mean_score",
        "frac_positive",
        qround(F.col("mean_score") - F.col("frac_positive"), 6).alias("gap"),
    )
