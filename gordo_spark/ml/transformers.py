"""FunctionTransformer parity — named user functions plugged into model
pipelines as pure column expressions.

Reference: ``gordo.machine.model.transformer_funcs.general`` exposes
functions ``f(X, **kwargs)`` (the shipped one is ``multiply_by``) that YAML
configs reference by import path inside sklearn FunctionTransformers
(gordo/machine/model/transformer_funcs/general.py:1-26 in /root/reference).

Here a transformer is a name in a registry mapping to a column-expression
factory — applied via ``select`` so it stays inside whole-stage codegen,
never a Python UDF. Register custom ones with ``@register_transformer``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_TRANSFORMER_REGISTRY: dict[str, object] = {}


def register_transformer(name: str):
    def deco(fn):
        _TRANSFORMER_REGISTRY[name] = fn
        return fn

    return deco


@register_transformer("multiply_by")
def multiply_by(col: Column, factor: float) -> Column:
    """The reference's shipped example: X * factor."""
    return col * F.lit(float(factor))


@register_transformer("add_constant")
def add_constant(col: Column, constant: float) -> Column:
    return col + F.lit(float(constant))


@register_transformer("clip")
def clip(col: Column, lo: float | None = None, hi: float | None = None) -> Column:
    out = col
    if lo is not None:
        out = F.greatest(out, F.lit(float(lo)))
    if hi is not None:
        out = F.least(out, F.lit(float(hi)))
    return out


@register_transformer("log1p")
def log1p(col: Column) -> Column:
    return F.log1p(col)


class FunctionTransformerExpr:
    """Apply a registered function to every value column (ts passthrough)."""

    def __init__(self, func: str, **kwargs):
        if func.rsplit(".", 1)[-1] not in _TRANSFORMER_REGISTRY:
            raise ValueError(f"unknown transformer func {func!r}")
        self.func = func.rsplit(".", 1)[-1]
        self.kwargs = kwargs

    def transform(
        self, df: DataFrame, cols: Sequence[str] | None = None, ts_col: str = "ts"
    ) -> DataFrame:
        fn = _TRANSFORMER_REGISTRY[self.func]
        targets = list(cols) if cols else [c for c in df.columns if c != ts_col]
        exprs = [
            fn(F.col("`" + c + "`"), **self.kwargs).alias(c) if c in targets else F.col("`" + c + "`")
            for c in df.columns
        ]
        return df.select(*exprs)

    def into_definition(self) -> dict:
        return {"kind": "FunctionTransformerExpr", "func": self.func, **self.kwargs}
