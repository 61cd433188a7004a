"""row_filter DSL -> Spark SQL boolean expression.

gordo-core's ``row_filter`` is a pandas-``query``-like boolean expression
over tag columns, e.g. ``"`TAG-A` > 0.5 & `TAG-B` < 2"`` (config surface:
reference tests/gordo/workflow/test_config_elements.py:155-156). Grammar
actually used: comparisons (< <= > >= == !=), logical ``& | ~``, parens,
numeric literals, backtick-quoted or bare identifiers.

Spark SQL shares almost all of this (including backtick quoting); the only
rewrites needed are the logical operators, since ``& |`` are *bitwise* in
Spark SQL and ``~`` is bitwise NOT. We tokenize (respecting string literals
and backtick identifiers) and rewrite ``&``->AND, ``|``->OR, ``~``->NOT,
``==``->``=``.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""
    `[^`]*`                |  # backtick identifier (may contain spaces)
    '(?:[^'\\]|\\.)*'      |  # single-quoted string
    "(?:[^"\\]|\\.)*"      |  # double-quoted string
    ==|!=|<=|>=|<|>|=      |
    [&|~()]                |
    [^`'"&|~()\s]+         |  # bare identifier / number / keyword
    \s+
    """,
    re.VERBOSE,
)

_REWRITE = {"&": "AND", "|": "OR", "~": "NOT", "==": "="}


def row_filter_to_sql(row_filter: str) -> str:
    """Rewrite a pandas-query-style predicate into a Spark/ANSI SQL one.

    Output is canonically single-spaced (whitespace inside backtick
    identifiers and string literals is preserved — it is part of the token).

    >>> row_filter_to_sql("`tag a` > 0.5 & ~(`b` == 2) | c != 3")
    '`tag a` > 0.5 AND NOT ( `b` = 2 ) OR c != 3'
    """
    out: list[str] = []
    pos = 0
    for m in _TOKEN.finditer(row_filter):
        if m.start() != pos:
            raise ValueError(f"cannot tokenize row_filter at offset {pos}: {row_filter!r}")
        pos = m.end()
        tok = m.group(0)
        if tok.strip() == "":
            continue
        out.append(_REWRITE.get(tok, tok))
    if pos != len(row_filter):
        raise ValueError(f"cannot tokenize row_filter at offset {pos}: {row_filter!r}")
    return " ".join(out)
