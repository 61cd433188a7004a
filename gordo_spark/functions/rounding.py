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


def _guarded_floor(c: Column, p: float) -> Column:
    """``floor(c*p + 0.5)`` with the 2^52 identity guard, referencing
    ``c`` exactly ONCE: ``c`` is bound into a 1-element array and the
    3-reference guard runs on the lambda variable (a cheap attribute),
    so expensive operands — window aggregates especially — are evaluated
    once regardless of how many times the guard mentions them. Inside
    the lambda the scaled operand ``y`` is built ONCE and referenced by
    handle — same expression tree, a third of the py4j build calls."""

    def _body(t: Column) -> Column:
        y = t * _lit(p) + _lit(0.5)
        return F.when(
            F.abs(y) < _lit(2.0**52), F.floor(y).cast("double")
        ).otherwise(y)

    return F.get(F.transform(F.array(c), _body), 0)


def qround(col: Column | str, scale: int = 0) -> Column:
    """Drop-in for ``F.round(col, scale)`` with tie-safe, engine-portable
    semantics (see module docstring). Output is always DOUBLE.

    Spark's ``floor`` returns LONG, so a naive ``floor(x*p + 0.5)``
    overflows past 2^63. Doubles at magnitude >= 2^52 are already
    integral (ulp >= 1), where ``floor`` is the identity — so the branch
    below IS DuckDB's double-floor, bit for bit, at every magnitude, and
    NULL/NaN/inf all fall through the comparison into the identity arm
    exactly as they propagate through a native floor.

    ALWAYS the bind-once form (see :func:`_guarded_floor`): the guard
    mentions its operand three times, and Catalyst extracts each textual
    occurrence of a window expression into its OWN ``_weN`` slot — no
    dedup — so the naive form evaluated window aggregates 3x and nested
    quantized expressions compounded it (rolling_zscore: 22 slots for 3
    distinct window functions, 2.3x wall — the round-9 bench regression).
    Binding unconditionally beats detecting: tree inspection costs a
    py4j round-trip + an O(tree) serialization PER CALL, which turned
    deeply-nested plans (the m6 column block) into O(n^2) plan builds;
    the HOF's runtime cost on plain scalars is ~11 ns/value (measured
    0.38 s vs 0.15 s per 20M rows), noise against any real projection.
    Identical IEEE op sequence either way — bit-identical outputs.
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
