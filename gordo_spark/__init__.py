"""gordo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of equinor/gordo (reference studied read-only at
/root/reference; see SURVEY.md).

Design stance (SURVEY.md §7): machines are rows of a config table; each
machine's "query" is a deterministic DataFrame DAG::

    scan -> resample -> interpolate -> pivot-align -> filter -> (X, y)
         -> fit/score -> anomaly select -> sink

Everything is declared with the DataFrame API so Catalyst handles predicate
pushdown, column pruning and join planning. Python UDFs appear only where
Spark genuinely lacks the semantics (exact pandas EWMA, per-machine model
fit), always Arrow-batched via applyInPandas.
"""

from gordo_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
