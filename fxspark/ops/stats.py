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
        F.sum((xl.cast("double") * y).cast(f"decimal(38,{y_scale})"))
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


def grouped_mad(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    k: float = 1.4826,
) -> DataFrame:
    """Per-key robust location/scale: median and MAD (median absolute
    deviation, scaled by ``k`` ≈ 1.4826 so it estimates σ under
    normality) — the heavy-tail-safe alternative to the mean/stddev
    moments ``user_value_outliers`` uses. A single wild value moves the
    mean and explodes the stddev (masking the very outlier being hunted);
    the median/MAD pair has a 50% breakdown point, which is why curation
    pipelines gate on robust z-scores.

    Plan shape: two grouped ``percentile`` aggregations on the SAME key
    partitioning (medians aren't algebraic, so two passes is the exact
    price; the approximate single-pass path is ``approx_percentile`` with
    a mergeable sketch). The deviation join is key-colocated with the
    first aggregate's shuffle. Returns ``(keys..., n_obs, median, mad)``
    with ``mad`` already k-scaled.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    med = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.percentile(F.col(value_col), F.lit(0.5)).alias("median"),
    )
    dev = df.join(med, keys).select(
        *keys, F.abs(F.col(value_col) - F.col("median")).alias("_ad")
    )
    mad = dev.groupBy(*keys).agg(
        (F.percentile(F.col("_ad"), F.lit(0.5)) * F.lit(k)).alias("mad")
    )
    return med.join(mad, keys).select(*keys, "n_obs", "median", "mad")


def robust_outliers(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Rows whose robust z-score ``|x − median| / MAD`` exceeds
    ``threshold`` (3.5 is the classic Iglewicz-Hoaglin cut) — the
    outlier filter that still works when the outliers themselves have
    corrupted the moments. Keys with MAD = 0 (over half the values
    identical) flag any deviation at all, the conventional degenerate-case
    rule. Stats broadcast back; the scan is map-side after one stats
    pass."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    stats = grouped_mad(df, keys, value_col)
    rz = F.when(
        F.col("mad") > 0.0,
        F.abs(F.col(value_col) - F.col("median")) / F.col("mad"),
    ).otherwise(
        F.when(
            F.abs(F.col(value_col) - F.col("median")) > 0.0, F.lit(float("inf"))
        ).otherwise(F.lit(0.0))
    )
    return (
        df.join(F.broadcast(stats), keys)
        .withColumn("robust_z", rz)
        .filter(F.col("robust_z") > threshold)
    )
