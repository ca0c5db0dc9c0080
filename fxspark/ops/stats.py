"""Grouped statistical model fits — closed-form estimators as pure
aggregations.

The reference has no modelling surface at all (its analytics stop at the
latest-vs-previous percentage change, ``Fx_1min.py:208-216``); a
training-data warehouse wants at least the classic closed-form fits that
need ONE aggregation pass: per-key ordinary least squares (trend of a
metric over time), which is five sufficient statistics (n, Σx, Σy, Σxy,
Σx²) and a map-side-combinable groupBy.

Scale notes
-----------
- ``grouped_ols`` is a single partial-aggregated ``groupBy`` — the same
  topology as any sum/count rollup: one shuffle on the key, O(1) state
  per key per partition.  No windows, no self-joins, nothing quadratic.
- Determinism: Σ of doubles is order-dependent in the last ulp, so every
  sum is decimal-exact (cast to DECIMAL before SUM) and the final slope /
  intercept arithmetic is plain IEEE double on those exact sums —
  bit-stable under any partitioning, hence oracle-hashable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    keys: str | Sequence[str],
    x: Column,
    y: Column,
    y_scale: int = 6,
) -> DataFrame:
    """Per-key OLS fit ``y ~ slope * x + intercept``.

    ``x`` must be numerically exact (an integer-valued column, e.g. epoch
    seconds relative to a fixed origin); ``y`` may be a double — it (and
    the per-row ``x*y`` product) is cast to an exact DECIMAL of scale
    ``y_scale`` before summation (a straight cast, NOT ``round()``:
    engines disagree on double rounding in the last ulp, but decimal
    casts of the identical IEEE value agree).

    Returns one row per key: ``n_obs``, ``slope``, ``intercept`` (both
    raw doubles — callers round for display/hashing).  Keys with fewer
    than 2 distinct ``x`` values get NULL slope/intercept (vertical or
    degenerate fits), not a division blow-up.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    xl = x.cast("long")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(xl.cast("decimal(38,0)")).cast("double").alias("_sx"),
        F.sum(y.cast(f"decimal(38,{y_scale})")).cast("double").alias("_sy"),
        F.sum((xl.cast("double") * y).cast("decimal(38,6)"))
        .cast("double")
        .alias("_sxy"),
        F.sum((xl * xl).cast("decimal(38,0)")).cast("double").alias("_sxx"),
    )
    n = F.col("n_obs").cast("double")
    det = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        det > 0.0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / det,
    )
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    return agg.select(
        *keys,
        "n_obs",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )
