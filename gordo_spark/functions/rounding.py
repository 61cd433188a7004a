"""Tie-safe decimal quantization — the engine's ONE rounding convention.

Why not ``F.round``: Spark's ROUND on doubles goes through the value's
SHORTEST DECIMAL representation (``BigDecimal.valueOf`` / HALF_UP), while
DuckDB (and C++/numpy engines generally) round the BINARY value. The two
agree except when the input sits exactly on (or within an ulp of) a
``.5 * 10^-scale`` boundary — then the decision is engine-dependent. With
float aggregation feeding the round, such boundaries are ulp-rare; but the
round-9 exact-integer resample puts every cell value ON the 1e-6 grid, and
any small-denominator combination of grid values (a 6-cell rolling mean
ties 1 time in 6; an even-window median every other step) lands EXACTLY on
the boundary — the cross-engine flip stops being rare and becomes
structural. (Observed: round-8's sf0.1 gate had exactly one such flip from
summation order; quantized inputs without this module produced dozens at
sf0.01.)

The fix is to stop asking engines to agree on decimal-string rounding and
quantize with PURE IEEE-754 arithmetic instead::

    qround(x, s) = floor(x * 10^s + 0.5) / 10^s

Multiply, add, floor, divide are each correctly-rounded / exact in every
IEEE engine, so the SAME expression text yields the BIT-IDENTICAL double
in Spark, DuckDB, numpy, or anything else — including at exact ties
(floor needs no tie rule). Semantics: round-half-toward-+infinity (ties at
negative values go UP, where HALF_UP goes away from zero) — a documented,
deliberate divergence; determinism across engines is worth more than the
sign convention at a 5e-7 tie.

``qround_sql`` emits the mirror SQL for oracles; keep the operand order
identical to the column form (x * scale + 0.5, one floor, one divide) —
the bit-identity argument is about the exact op sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["qfloor", "qround", "qround_sql"]


# Literal Column cache: plan BUILD cost discipline. Every Column operator
# is a py4j round-trip (~0.3 ms); qround is called hundreds of times while
# composing a deep plan (the m6 column block), so re-minting the same
# literals per call turned plan construction into seconds of socket
# chatter. Columns are immutable expression handles — reuse is free.
_LITS: dict[float, Column] = {}


def _lit(x: float) -> Column:
    got = _LITS.get(x)
    if got is None:
        got = _LITS[x] = F.lit(x)
    return got


_TP_STATE: dict[str, object] = {}


def _contains_window(c: Column) -> bool:
    """O(1)-ish window detection: convert the Column's node to a Catalyst
    expression JVM-side and test the precomputed ``TreePattern.
    WINDOW_EXPRESSION`` bitset — 3 py4j round-trips, NO tree
    serialization to Python (the per-call ``toString`` inspection that
    made m6-scale plan builds O(n^2) in round 10). Any failure —
    Connect mode, missing internals on a future Spark — returns True,
    which routes to the bind-once HOF form: always correct, never the
    window-slot regression."""
    if not _TP_STATE:
        try:
            from pyspark.sql import SparkSession

            jvm = SparkSession.getActiveSession()._jvm
            conv = getattr(
                getattr(
                    jvm,
                    "org.apache.spark.sql.classic."
                    "ColumnNodeToExpressionConverter$",
                ),
                "MODULE$",
            )
            wp = getattr(
                getattr(
                    jvm, "org.apache.spark.sql.catalyst.trees.TreePattern$"
                ),
                "MODULE$",
            ).WINDOW_EXPRESSION()
            _TP_STATE["conv"], _TP_STATE["wp"] = conv, wp
        except Exception:
            _TP_STATE["conv"] = _TP_STATE["wp"] = None
    conv, wp = _TP_STATE["conv"], _TP_STATE["wp"]
    if conv is None:
        return True
    try:
        return bool(conv.apply(c._jc.node()).containsPattern(wp))
    except Exception:
        return True


def _guarded_floor(c: Column, p: float) -> Column:
    """``floor(c*p + 0.5)`` with the 2^52 identity guard, in one of two
    bit-identical expression forms picked by the OPERAND's shape:

    - plain operands get the DIRECT 3-reference form — whole-stage
      codegen's subexpression elimination evaluates the shared ``y``
      once, and staying inside codegen matters: higher-order functions
      are CodegenFallback, so wrapping a regex-heavy projection in the
      HOF form pushed the WHOLE Project out of codegen (measured 1.25x
      on auc_quality's quality_expr scoring — the round-10 regression
      this split fixes);
    - operands CONTAINING A WINDOW EXPRESSION get the bind-once HOF
      form — ``c`` bound into a 1-element array, the guard running on
      the lambda variable — because Catalyst extracts each textual
      window occurrence into its OWN ``_weN`` slot (no dedup), so the
      direct form multiplied window work 3x (the round-9 regression:
      rolling_zscore at 22 slots / 2.3x wall).

    Detection is :func:`_contains_window` (JVM bitset, no tree
    serialization); both forms run the same IEEE op sequence
    (multiply, add, abs-compare, floor), so outputs are bit-identical
    and oracle gates see no difference."""
    if _contains_window(c):
        def _body(t: Column) -> Column:
            y = t * _lit(p) + _lit(0.5)
            return F.when(
                F.abs(y) < _lit(2.0**52), F.floor(y).cast("double")
            ).otherwise(y)

        return F.get(F.transform(F.array(c), _body), 0)
    y = c * _lit(p) + _lit(0.5)
    return F.when(
        F.abs(y) < _lit(2.0**52), F.floor(y).cast("double")
    ).otherwise(y)


def qround(col: Column | str, scale: int = 0) -> Column:
    """Drop-in for ``F.round(col, scale)`` with tie-safe, engine-portable
    semantics (see module docstring). Output is always DOUBLE.

    Spark's ``floor`` returns LONG, so a naive ``floor(x*p + 0.5)``
    overflows past 2^63. Doubles at magnitude >= 2^52 are already
    integral (ulp >= 1), where ``floor`` is the identity — so the branch
    below IS DuckDB's double-floor, bit for bit, at every magnitude, and
    NULL/NaN/inf all fall through the comparison into the identity arm
    exactly as they propagate through a native floor.

    Form selection is per-operand (see :func:`_guarded_floor`): the
    bind-once HOF form for window-bearing operands (Catalyst gives each
    textual window occurrence its own ``_weN`` slot — the direct form
    was the round-9 2.3x rolling_zscore regression), the direct
    codegen form for everything else (HOFs are CodegenFallback; binding
    unconditionally pushed regex-heavy projections out of whole-stage
    codegen — the round-10 1.25x auc_quality regression). Detection is
    a JVM TreePattern bitset test, NOT the per-call O(tree) toString
    inspection that round 10 rightly rejected as O(n^2) on m6-scale
    plan builds. Identical IEEE op sequence either way — bit-identical
    outputs.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    p = float(10 ** int(scale))
    return _guarded_floor(c, p) / _lit(p)


def qfloor(col: Column | str, scale: int = 0) -> Column:
    """The scaled-integer HALF of :func:`qround`: ``floor(x * 10^s + 0.5)``
    with the same 2^52 magnitude guard, returned as DOUBLE (integral below
    2^52; identity above, where the double is already integral). Use this —
    never a bare ``F.floor`` — wherever a value is quantized onto a scaled
    integer grid for exact summation/percentiles: Spark's ``floor(double)``
    returns LONG and saturates past 2^63 (|v| >~ 9.2e12 at scale 6) while
    DuckDB's floor stays double, so the bare pattern breaks cross-engine
    bit-identity exactly at the magnitudes where it matters least but
    diverges loudest. Callers needing exact decimal summation cast the
    result to ``decimal(38,0)`` (exact for integral doubles < 1e38).
    Bind-once form unconditionally, same rationale as :func:`qround`.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    p = float(10 ** int(scale))
    return _guarded_floor(c, p)


def qround_sql(expr: str, scale: int = 0) -> str:
    """The DuckDB/ANSI mirror of :func:`qround` — same op sequence, so the
    oracle computes the bit-identical double (DuckDB's floor is
    double->double, i.e. exactly the identity-above-2^52 branch)."""
    p = float(10 ** int(scale))
    return f"floor(({expr}) * {p:.1f} + 0.5) / {p:.1f}"
