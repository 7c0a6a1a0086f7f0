"""gem_data_wrangle_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the operator semantics of the
``ABuller123/GEM_data_wrangle`` reference (R/dplyr ETL over Global
Energy Monitor power-plant trackers) as idiomatic, lazily-planned
Spark DataFrame operators, extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns) and a Structured Streaming surface.

Design rules (enforced throughout):
  * DataFrame / Column expressions only — no RDDs, no driver-side
    ``collect()`` inside any operator.
  * Pure-Column builders so Catalyst can push down / prune / reorder.
  * Python UDFs only where built-ins genuinely cannot express the
    semantics, and then always Arrow-batched (``mapInPandas``).
  * Every operator documents the reference behaviour it re-expresses
    with a ``/root/reference`` file:line citation.
"""

from gem_data_wrangle_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
