"""fxspark — a PySpark-native analytics engine.

A typed, composable library of Spark DataFrame operators re-expressing every
capability of the reference FX-rate pipeline (``rentedninja/FX-Data-Pipeline``,
see SURVEY.md) Spark-first, plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (100 TB scale):

- Everything is a declarative DataFrame plan: Catalyst gets predicate pushdown,
  column pruning, join reordering; AQE picks broadcast vs shuffle joins and
  handles skew at runtime.
- No driver-side loops over data; no ``collect()`` except bounded reports.
- Python UDFs only where built-ins genuinely can't express the semantics, and
  then always Arrow-batched (pandas UDF / mapInPandas), never per-row.
"""

from fxspark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
