"""Stateful streaming smoothing — the W3 EWMA as a keyed streaming operator.

The reference's EWMA (pandas ``ewm(span=w).mean()``,
gordo/machine/model/anomaly/diff.py:307-308 in /root/reference) is
recursive over unbounded history, so the streaming form needs per-key state
(SURVEY.md §2.10). ``applyInPandasWithState`` keyed by (machine/tag) holds
the two scalars of the adjust=True recurrence:

    num_t = x_t + (1 - alpha) * num_{t-1}
    den_t = 1  + (1 - alpha) * den_{t-1}
    ewma_t = num_t / den_t          (alpha = 2 / (span + 1))

which reproduces pandas' weighted form exactly — state is O(1) per key no
matter how long the stream runs.

Ordering: rows are sorted by ts *within* each micro-batch; cross-batch
order is the source's responsibility (file/kafka sources with a watermarked
upstream resample deliver buckets in order once windows close). This is the
same contract the offline operator places on its partition sort.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, LongType, StructField, StructType,
    TimestampType, StringType,
)


def ewma_stream(
    stream: DataFrame,
    span: int = 144,
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exact streaming EWMA per key; emits (key, ts, value, smooth_value)."""
    alpha = 2.0 / (span + 1.0)
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("smooth_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("num", DoubleType()), StructField("den", DoubleType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        num, den = state.get if state.exists else (0.0, 0.0)
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        smooth = []
        decay = 1.0 - alpha
        for x in rows[value_col]:
            if pd.isna(x):
                # pandas ignore_na=False: a missing position still decays
                # the weights (ratio unchanged), no observation added
                num, den = decay * num, decay * den
                smooth.append(num / den if den > 0 else float("nan"))
                continue
            num = float(x) + decay * num
            den = 1.0 + decay * den
            smooth.append(num / den)
        state.update((num, den))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: rows[ts_col].values,
                value_col: rows[value_col].values,
                "smooth_value": smooth,
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_stream_multi(
    stream: DataFrame,
    value_cols: Sequence[str],
    span: int = 144,
    key_col: str = "machine",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful EWMA over MANY columns at once — the streaming form of the
    offline anomaly block's ``smooth_*`` columns (W5): one state entry per
    key holds the (num, den) pair for every smoothed column. Emits the
    input columns plus ``smooth_<col>`` for each."""
    alpha = 2.0 / (span + 1.0)
    decay = 1.0 - alpha
    cols = list(value_cols)
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            *[StructField(c, DoubleType()) for c in cols],
            *[StructField(f"smooth_{c}", DoubleType()) for c in cols],
        ]
    )
    state_schema = StructType(
        [
            StructField("num", ArrayType(DoubleType())),
            StructField("den", ArrayType(DoubleType())),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            num, den = [list(a) for a in state.get]
        else:
            num, den = [0.0] * len(cols), [0.0] * len(cols)
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        smooth: dict[str, list] = {c: [] for c in cols}
        for _, row in rows.iterrows():
            for i, c in enumerate(cols):
                x = row[c]
                if pd.isna(x):
                    num[i], den[i] = decay * num[i], decay * den[i]
                else:
                    num[i] = float(x) + decay * num[i]
                    den[i] = 1.0 + decay * den[i]
                smooth[c].append(num[i] / den[i] if den[i] > 0 else float("nan"))
        state.update((num, den))
        out = {key_col: key[0], ts_col: rows[ts_col].values}
        for c in cols:
            out[c] = rows[c].values
            out[f"smooth_{c}"] = smooth[c]
        yield pd.DataFrame(out)

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def holt_stream(
    stream: DataFrame,
    alpha: float = 0.2,
    beta: float = 0.1,
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming Holt double-exponential smoothing — the stateful form
    of ``operators.smoothing.holt`` (level + trend + one-step
    forecast): per-key state is the two scalars (l, b) of the
    recurrence

        l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}      (l_1=x_1, b_1=0)

    so state is O(1) per key for an unbounded stream, exactly like
    :func:`ewma_stream`, with the same within-batch-sort /
    in-order-source ordering contract. stream==batch parity is pinned
    in tests/test_streaming.py."""
    a, b = float(alpha), float(beta)
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("l", DoubleType()), StructField("b", DoubleType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lev, tr = state.get
            started = True
        else:
            lev, tr, started = 0.0, 0.0, False
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        levels, trends = [], []
        for x in rows[value_col]:
            # NaN coasts: emit NaN, state untouched (batch-operator parity)
            if pd.isna(x):
                levels.append(float("nan"))
                trends.append(float("nan"))
                continue
            x = float(x)
            if not started:
                lev, tr, started = x, 0.0, True
            else:
                prev = lev
                lev = a * x + (1.0 - a) * (lev + tr)
                tr = b * (lev - prev) + (1.0 - b) * tr
            levels.append(lev)
            trends.append(tr)
        if started:
            # an all-NaN first batch must NOT seed state with the 0.0
            # placeholders — leave state absent until a real sample lands
            state.update((lev, tr))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: rows[ts_col].values,
                value_col: rows[value_col].values,
                "level": levels,
                "trend": trends,
                "forecast": [l + t for l, t in zip(levels, trends)],
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def transitions_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Streaming form of ``operators.ranges.event_transitions``'s pair
    stream: per-user state is ONE string (the last event type), so each
    arriving event emits its (prev_type, next_type) pair and replaces
    the state — O(1) per key for an unbounded stream. Rows are ordered
    by (ts, order_col) within each micro-batch (the tie key makes
    same-timestamp events deterministic, matching the batch window);
    cross-batch order is the source's responsibility, as for
    :func:`ewma_stream`. Downstream aggregation to the transition
    matrix is an ordinary streaming groupBy or the batch operator over
    the landed pair stream — stream==batch parity is pinned in
    tests/test_streaming.py."""
    out_schema = StructType(
        [
            StructField(user_col, stream.schema[user_col].dataType),
            StructField(ts_col, TimestampType()),
            StructField("prev_type", StringType()),
            StructField("next_type", StringType()),
        ]
    )
    state_schema = StructType([StructField("last_type", StringType())])

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (None,)
        rows = pd.concat(list(pdfs)).sort_values([ts_col, order_col])
        prevs, nexts, tss = [], [], []
        for ts, t in zip(rows[ts_col], rows[type_col]):
            if last is not None:
                prevs.append(last)
                nexts.append(t)
                tss.append(ts)
            last = t
        state.update((last,))
        yield pd.DataFrame(
            {
                user_col: key[0],
                ts_col: pd.Series(tss, dtype="datetime64[ns]"),
                "prev_type": pd.Series(prevs, dtype="object"),
                "next_type": pd.Series(nexts, dtype="object"),
            }
        )

    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def counter_rate_stream(
    stream: DataFrame,
    bucket_seconds: int,
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-sample counter increments with reset handling —
    the stateful half of ``operators/tsa.counter_rate``. Emits one row
    per sample ``(key, bucket_ts, inc, is_reset)``; summing ``inc`` per
    (key, bucket) reproduces the batch operator's ``increase`` exactly,
    INCLUDING deltas whose two samples arrive in different micro-batches
    (the part a stateless windowed agg cannot compute: an increment is
    order-dependent, not algebraic).

    State per key is two scalars ``(last_t, last_v)`` — O(1) regardless
    of rate, the same posture as ``ewma_stream``. Matching the batch
    semantics, a delta only counts when both samples fall in the SAME
    bucket (the first sample of a bucket contributes 0), and in-batch
    rows sort by ``(t, value)`` — the batch operator's total order.
    """
    b = int(bucket_seconds)
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("bucket_ts", TimestampType()),
            StructField("inc", DoubleType()),
            StructField("is_reset", BooleanType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_t", LongType()), StructField("last_v", DoubleType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_t, last_v = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs))
        rows["_t"] = (rows[ts_col].astype("int64") // 1_000_000_000).astype("int64")
        rows = rows.sort_values(["_t", value_col])
        incs, resets, buckets = [], [], []
        for t, v in zip(rows["_t"], rows[value_col]):
            v = float(v)
            same_bucket = last_t is not None and (last_t // b) == (t // b)
            if same_bucket and v >= last_v:
                incs.append(v - last_v)
                resets.append(False)
            elif same_bucket:
                incs.append(v)
                resets.append(True)
            else:
                incs.append(0.0)
                resets.append(False)
            buckets.append(pd.Timestamp((t // b) * b, unit="s"))
            last_t, last_v = int(t), v
        state.update((last_t, last_v))
        yield pd.DataFrame(
            {
                key_col: key[0],
                "bucket_ts": buckets,
                "inc": incs,
                "is_reset": resets,
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def holt_winters_stream(
    stream: DataFrame,
    period: int,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming Holt-Winters additive smoothing — the stateful form of
    ``operators.smoothing.holt_winters``: per-key state is (level,
    trend, the ``period``-slot seasonal vector, and the warmup buffer
    of the first season's samples) — O(period) per key for an
    unbounded stream, the seasonal extension of :func:`holt_stream`'s
    O(1) scalars. Initialization, warmup-NULL emission, and NaN
    coasting (state untouched, seasonal window rotated to keep phase)
    match the batch operator exactly; stream==batch parity is pinned
    in tests/test_streaming.py. Same within-batch-sort / in-order-
    source ordering contract as ewma/holt streams.
    """
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    a, b, g = float(alpha), float(beta), float(gamma)
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )
    # state: started flag rides implicitly on the buffer length — once
    # len(buf) == m the recursion is live and (l, b, s) are meaningful
    state_schema = StructType(
        [
            StructField("l", DoubleType()),
            StructField("b", DoubleType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("buf", ArrayType(DoubleType())),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lev, tr, s, buf = state.get
            s = list(s) if s is not None else None
            buf = list(buf) if buf is not None else []
        else:
            lev, tr, s, buf = 0.0, 0.0, None, []
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        levels, trends, seas, fcs = [], [], [], []
        nan = float("nan")
        for x in rows[value_col]:
            if s is None:
                # warmup: buffer the first season (NaN inside the first
                # season aborts nothing — it just extends the wait,
                # matching the batch operator's all-or-nothing seed)
                if pd.isna(x):
                    levels.append(nan); trends.append(nan)
                    seas.append(nan); fcs.append(nan)
                    continue
                buf.append(float(x))
                levels.append(nan); trends.append(nan)
                seas.append(nan); fcs.append(nan)
                if len(buf) == m:
                    lev = sum(buf) / m
                    tr = 0.0
                    s = [v - lev for v in buf]
                continue
            if pd.isna(x):
                s.append(s.pop(0))  # coast: rotate to keep phase
                levels.append(nan); trends.append(nan)
                seas.append(nan); fcs.append(nan)
                continue
            x = float(x)
            s_old = s.pop(0)
            prev = lev
            lev = a * (x - s_old) + (1.0 - a) * (lev + tr)
            tr = b * (lev - prev) + (1.0 - b) * tr
            s_new = g * (x - lev) + (1.0 - g) * s_old
            s.append(s_new)
            levels.append(lev); trends.append(tr)
            seas.append(s_new); fcs.append(lev + tr + s[0])
        state.update((lev, tr, s, buf))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: rows[ts_col].values,
                value_col: rows[value_col].values,
                "level": levels,
                "trend": trends,
                "seasonal": seas,
                "forecast": fcs,
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def control_rules_stream(
    stream: DataFrame,
    reference: dict[str, tuple[float, float]],
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming Western-Electric control rules per key — the live SPC
    monitor companion to the batch ``tsa.control_rules``: center/sigma
    come from a FIXED training reference (``{key: (mu, sd)}``, the
    stream_psi_monitor convention — a stream has no final stats), and
    the run rules evaluate over the last 8 physical observations held
    in bounded state (7 trailing z values + the current row — EXACTLY
    the batch operator's rowsBetween frames, NaN standing in for the
    batch's NULL z so physical row positions line up). Rule decisions
    on 6dp-rounded z (the batch convention). stream == batch pinned in
    tests when the reference equals the batch stats.

    State per key: 7 doubles, constant at any ingest rate.
    """
    import math

    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("z", DoubleType()),
            StructField("r1_beyond_3s", BooleanType()),
            StructField("r2_2of3_2s", BooleanType()),
            StructField("r3_4of5_1s", BooleanType()),
            StructField("r4_8_run", BooleanType()),
            StructField("any_signal", BooleanType()),
        ]
    )
    state_schema = StructType(
        [StructField("tail", ArrayType(DoubleType()))]
    )
    ref = {str(k): (float(m), float(s)) for k, (m, s) in reference.items()}

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (tail,) = state.get if state.exists else ([],)
        tail = list(tail)
        mu, sd = ref.get(str(key[0]), (float("nan"), 0.0))
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        out = {c: [] for c in ("z", "r1", "r2", "r3", "r4")}
        for x in rows[value_col]:
            if sd > 0 and x is not None and not pd.isna(x):
                # floor-quantizer, NOT round(): mirrors functions/rounding
                # .qround so stream == batch holds bit-exactly at .5e-6 ties
                z = math.floor((float(x) - mu) / sd * 1e6 + 0.5) / 1e6
            else:
                z = float("nan")
            frame = tail + [z]

            def cnt(w, pred):
                vals = [v for v in frame[-w:] if not math.isnan(v)]
                return len(vals), sum(1 for v in vals if pred(v))

            has = not math.isnan(z)
            n3u = cnt(3, lambda v: v > 2); n3d = cnt(3, lambda v: v < -2)
            n5u = cnt(5, lambda v: v > 1); n5d = cnt(5, lambda v: v < -1)
            n8u = cnt(8, lambda v: v > 0); n8d = cnt(8, lambda v: v < 0)
            c3 = len([v for v in frame[-3:] if not math.isnan(v)])
            c5 = len([v for v in frame[-5:] if not math.isnan(v)])
            c8 = len([v for v in frame[-8:] if not math.isnan(v)])
            r1 = has and abs(z) > 3
            r2 = has and (n3u[1] >= 2 or n3d[1] >= 2) and c3 >= 3
            r3 = has and (n5u[1] >= 4 or n5d[1] >= 4) and c5 >= 5
            r4 = has and (n8u[1] >= 8 or n8d[1] >= 8) and c8 >= 8
            out["z"].append(z if has else None)
            out["r1"].append(r1); out["r2"].append(r2)
            out["r3"].append(r3); out["r4"].append(r4)
            tail = frame[-7:]
        state.update((tail,))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: rows[ts_col].values,
                value_col: rows[value_col].values,
                "z": out["z"],
                "r1_beyond_3s": out["r1"],
                "r2_2of3_2s": out["r2"],
                "r3_4of5_1s": out["r3"],
                "r4_8_run": out["r4"],
                "any_signal": [
                    a or b or c or d
                    for a, b, c, d in zip(
                        out["r1"], out["r2"], out["r3"], out["r4"]
                    )
                ],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kalman_stream(
    stream: DataFrame,
    q: float = 0.01,
    r: float = 1.0,
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming local-level Kalman filter — the stateful form of
    ``operators.smoothing.kalman_level``: per-key state is the two
    scalars (x, P) of

        P_pred = P + q;  K = P_pred / (P_pred + r)
        x <- x + K (z - x);  P <- (1 - K) P_pred     (x_1=z_1, P_1=r)

    O(1) state per key on an unbounded stream, same within-batch-sort /
    in-order-source contract as ewma/holt streams. NaN observations
    coast with WIDENING uncertainty (P += q, no update) exactly like
    the batch operator, so a sensor gap raises the next real sample's
    gain in both paths identically. stream==batch parity pinned in
    tests/test_streaming.py."""
    qv, rv = float(q), float(r)
    if qv < 0 or rv <= 0:
        raise ValueError("need q >= 0 and r > 0")
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("level", DoubleType()),
            StructField("gain", DoubleType()),
            StructField("p", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("x", DoubleType()), StructField("p", DoubleType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            x, p = state.get
            started = True
        else:
            x, p, started = 0.0, 0.0, False
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        levels, gains, ps = [], [], []
        for z in rows[value_col]:
            if pd.isna(z):
                if started:
                    p = p + qv  # uncertainty accrues through the gap
                levels.append(float("nan"))
                gains.append(float("nan"))
                ps.append(float("nan"))
                continue
            z = float(z)
            if not started:
                x, p, started = z, rv, True
                levels.append(x)
                gains.append(1.0)
                ps.append(p)
                continue
            p_pred = p + qv
            k = p_pred / (p_pred + rv)
            x = x + k * (z - x)
            p = (1.0 - k) * p_pred
            levels.append(x)
            gains.append(k)
            ps.append(p)
        if started:
            state.update((x, p))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: rows[ts_col].values,
                value_col: rows[value_col].values,
                "level": levels,
                "gain": gains,
                "p": ps,
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def flatline_stream(
    stream: DataFrame,
    min_len: int = 6,
    precision: int = 6,
    key_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """LIVE stuck-sensor detector — the streaming twin of
    ``operators/tsa.flatline_runs``: per tag, the length of the current
    constant-at-``precision`` run, emitted per bucket with a ``stuck``
    flag once it reaches ``min_len``. The batch operator finds yesterday's
    dead transmitter; this one pages within ``min_len`` buckets of the
    freeze — the alert a reference deployment would want from its
    streaming scorer, not its nightly build.

    State per tag: THREE scalars (current quantized value, run length,
    run start epoch) — fleet-width-bounded, volume-independent.
    Quantization uses the floor-quantizer (functions/rounding mirror) so
    stream == batch holds exactly. Buckets assumed nondecreasing per key
    across micro-batches (the stateful family's stated convention).
    Output: ``(tag, ts, value, run_len, stuck)``.
    """
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("run_len", LongType()),
            StructField("stuck", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("q", DoubleType()),
            StructField("n", LongType()),
            StructField("start", DoubleType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        q, n, start = state.get if state.exists else (None, 0, None)
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        lens, stucks = [], []
        for t, v in zip(rows[ts_col], rows[value_col]):
            if v is None or pd.isna(v):
                lens.append(None)
                stucks.append(None)
                continue
            vq = math.floor(float(v) * (10 ** precision) + 0.5) / (
                10 ** precision
            )
            if q is not None and vq == q:
                n += 1
            else:
                q, n, start = vq, 1, pd.Timestamp(t).timestamp()
            lens.append(n)
            stucks.append(n >= min_len)
        state.update((q, n, start))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: rows[ts_col].values,
                value_col: rows[value_col].values,
                "run_len": pd.array(lens, dtype="Int64"),
                "stuck": pd.array(stucks, dtype="boolean"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
