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


def _contains_window(c: Column) -> bool:
    """True when the column's expression tree contains a window function.

    Why it matters: the guarded floor references its operand three times
    (guard, floor arm, identity arm). Catalyst's ExtractWindowExpressions
    extracts each textual OCCURRENCE of a window expression into its own
    ``_weN`` slot — no dedup — so wrapping a window aggregate in the naive
    3-reference form multiplies window evaluation 3x, and NESTED quantized
    expressions compound it (observed: rolling_zscore built 22 window
    slots for 3 distinct window functions; 2.3x wall). Detection is a
    plan-build-time string check; on Connect-style columns without a JVM
    handle we conservatively return True (bind-once is always correct,
    just ~10 ns/value slower on cheap scalars)."""
    try:
        return "windowspecdefinition" in c._jc.expr().toString().lower()
    except Exception:
        return True


def _guarded_floor(c: Column, p: float) -> Column:
    """``floor(c*p + 0.5)`` with the 2^52 identity guard, referencing
    ``c`` exactly ONCE: ``c`` is bound into a 1-element array and the
    3-reference guard runs on the lambda variable (a cheap attribute),
    so expensive operands — window aggregates especially — are evaluated
    once regardless of how many times the guard mentions them."""
    bound = F.transform(
        F.array(c),
        lambda t: F.when(
            F.abs(t * F.lit(p) + F.lit(0.5)) < F.lit(2.0**52),
            F.floor(t * F.lit(p) + F.lit(0.5)).cast("double"),
        ).otherwise(t * F.lit(p) + F.lit(0.5)),
    )
    return F.get(bound, 0)


def qround(col: Column | str, scale: int = 0) -> Column:
    """Drop-in for ``F.round(col, scale)`` with tie-safe, engine-portable
    semantics (see module docstring). Output is always DOUBLE.

    Spark's ``floor`` returns LONG, so a naive ``floor(x*p + 0.5)``
    overflows past 2^63. Doubles at magnitude >= 2^52 are already
    integral (ulp >= 1), where ``floor`` is the identity — so the branch
    below IS DuckDB's double-floor, bit for bit, at every magnitude, and
    NULL/NaN/inf all fall through the comparison into the identity arm
    exactly as they propagate through a native floor.

    Window-bearing operands take the bind-once form (see
    :func:`_contains_window`); plain scalars keep the direct 3-reference
    form, which whole-stage codegen handles fine. Both compute the
    identical IEEE op sequence — bit-identical outputs.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    p = float(10 ** int(scale))
    if _contains_window(c):
        return _guarded_floor(c, p) / F.lit(p)
    y = c * F.lit(p) + F.lit(0.5)
    fl = F.when(
        F.abs(y) < F.lit(2.0**52), F.floor(y).cast("double")
    ).otherwise(y)
    return fl / F.lit(p)


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
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    p = float(10 ** int(scale))
    if _contains_window(c):
        return _guarded_floor(c, p)
    y = c * F.lit(p) + F.lit(0.5)
    return F.when(
        F.abs(y) < F.lit(2.0**52), F.floor(y).cast("double")
    ).otherwise(y)


def qround_sql(expr: str, scale: int = 0) -> str:
    """The DuckDB/ANSI mirror of :func:`qround` — same op sequence, so the
    oracle computes the bit-identical double (DuckDB's floor is
    double->double, i.e. exactly the identity-above-2^52 branch)."""
    p = float(10 ** int(scale))
    return f"floor(({expr}) * {p:.1f} + 0.5) / {p:.1f}"
