"""Join helpers (SURVEY.md §2.3 Q7-Q12, §2.5 gaps).

The reference's joins are pair-keyed equi-joins against tiny derived tables
(110 keys — ``/root/reference/Fx_1min.py:180-189,214-216``); Spark-side those
are broadcast-hash joins.  This module adds the join shapes the reference
lacks (semi/anti) as explicit operators, with broadcast control.

Scale notes: ``broadcast()`` a side only when it's genuinely small (dims,
grouped-max of a low-cardinality key); otherwise let AQE decide — it converts
to broadcast at runtime when the built side is under the threshold, and splits
skewed partitions on shuffle joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Fact-to-dimension equi-join with an explicit broadcast hint on the dim
    side — the reference's 110-key pair-universe join shape
    (``Fx_1min.py:181-189``)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that survives a hot key: the skewed side gets a random salt
    in [0, salt), the other side is replicated ``salt``× with every salt
    value, and the join runs on (key, salt) — one hot key now spreads over
    ``salt`` shuffle partitions instead of melting one executor.

    Use when AQE's skew-join split isn't available (e.g. the skew is in an
    aggregation input, or the join is below AQE's split thresholds but above
    one task's memory). Cost: ``salt``× replication of the small side — keep
    that side shuffle-light. Result is row-identical to a plain join.
    """
    s = skewed.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return s.join(o, on=[on, "_salt"], how=how).drop("_salt")


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase count for skewed group keys: pre-aggregate on (key, salt)
    (spreads the hot key), then combine partials. Row-identical to
    ``groupBy(key).count()``; the partial shuffle is bounded by
    ``distinct_keys × salt`` rows regardless of skew.

    (For built-in aggregates Spark's map-side partial aggregation already
    does this implicitly — the operator exists for the shapes where partial
    aggregation is disabled or the combine is custom.)
    """
    return (
        df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("long").alias("n"))
    )
