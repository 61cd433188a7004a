"""Expression-inlining barrier (optimization guide §1.2 step 2 / §7.2).

Catalyst freely substitutes projection aliases into consumers: a filter
above a projection is pushed below it with the alias's full expression
tree inlined into the condition, and adjacent projections collapse the
same way when the optimizer judges it safe. For a CHEAP expression that
is the right call — but when the alias holds an expensive row-local
tree (regexp scans, tokenizations, md5 lanes), inlining re-evaluates it
once per consuming site per row (measured: the quality-score AUC family
ran every regexp/tokenize 4x per document because the score column was
re-inlined into the round-filter-histogram pipeline).

:func:`pinned` wraps a column in a VALUE-IDENTITY expression that is
nondeterministic to the optimizer, which blocks both alias substitution
(predicate pushdown through the projection) and projection collapse, so
the expensive tree is evaluated exactly once in the projection that
names it. The wrapper is ``shuffle(array(c))[0]``: a one-element array
has exactly one permutation, so the value, type, and nullability are
preserved bit-for-bit (verified incl. -0.0 and NULL), and ``shuffle``
is codegen-compatible, so the projection stays inside whole-stage
codegen.

Use surgically: a pinned column also stops LEGITIMATE pushdown (e.g. a
selective filter that could have reached the parquet scan), so only pin
expressions that are (a) expensive per row and (b) consumed by an
operator that would otherwise duplicate them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["pinned"]


def pinned(c: Column) -> Column:
    """``c``, bit-identically, wrapped so Catalyst will not inline the
    expression into consumers (see module docstring)."""
    return F.shuffle(F.array(c)).getItem(0)
