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
