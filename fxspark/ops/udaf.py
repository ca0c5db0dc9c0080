"""Custom aggregate surface: Arrow-batched grouped-agg pandas UDAFs.

The reference has no UDF/UDAF capability at all (SURVEY.md §2.5) — everything
is MySQL built-ins. This module is the engine's answer for aggregates Spark
lacks natively: a grouped-agg ``pandas_udf`` receives each group's columns as
pandas Series over Arrow (no per-row Python) and returns one scalar.

When to use which custom-Python tier:
- scalar elementwise → scalar pandas UDF (``similarity.ivf_assign``'s
  nearest-cell map);
- per-group one-scalar aggregate → THIS module (composes inside a normal
  ``groupBy().agg()`` next to JVM aggregates, partial aggregation NOT
  available — the whole group ships to one task, so keep group cardinality
  high and group size moderate);
- per-group frame→frame → ``applyInPandas`` (``dedup.cosine_pairs_blocked``);
- per-group streaming state → ``applyInPandasWithState``
  (``streaming.stateful``).

Determinism: every UDAF here is insensitive to the (arbitrary) row order
Spark delivers — ``value_range`` uses order-free min/max; ``lower_median``
re-sorts with a total order (value, id) before indexing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import PandasUDFType, pandas_udf


def _range(v) -> float:
    return float(v.max() - v.min())


def _lower_median(v, ids) -> float:
    import numpy as np

    vals = v.to_numpy()
    order = np.lexsort((ids.to_numpy(), vals))  # total order: (value, id)
    return float(vals[order[(len(vals) - 1) // 2]])


def _count(v) -> int:
    return len(v)


# The UDF wrappers are built lazily (inside the accessors, with DataType
# objects rather than DDL strings): a module-level pandas_udf would re-run
# on import inside executor python workers, where no SparkContext exists to
# parse a DDL returnType (SESSION_OR_CONTEXT_NOT_EXISTS).


def range_agg(value_col: str) -> Column:
    """max-min spread of a group as a grouped-agg pandas UDAF."""
    from pyspark.sql.types import DoubleType

    return pandas_udf(_range, DoubleType(), PandasUDFType.GROUPED_AGG)(
        F.col(value_col)
    )


def lower_median_agg(value_col: str, tiebreak_col: str) -> Column:
    """The element at rank ⌊(n-1)/2⌋ under the total order
    (value, tiebreak) — an exact, deterministic median-by-rank (always an
    actual element, no interpolation), reproducible in ANSI SQL via
    row_number, unlike interpolated medians of unordered doubles."""
    from pyspark.sql.types import DoubleType

    return pandas_udf(_lower_median, DoubleType(), PandasUDFType.GROUPED_AGG)(
        F.col(value_col), F.col(tiebreak_col)
    )


def count_agg(col: Column) -> Column:
    """Group size as a pandas UDAF — Spark disallows mixing grouped-agg
    pandas UDFs with JVM aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT), so a UDAF count rides along."""
    from pyspark.sql.types import LongType

    return pandas_udf(_count, LongType(), PandasUDFType.GROUPED_AGG)(col)
