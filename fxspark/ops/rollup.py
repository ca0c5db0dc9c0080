"""Incremental rollup maintenance: merge partial aggregates instead of
rescanning history.

The reference recomputes its analysis over the full store every tick
(``/root/reference/Fx_1min.py:147-217`` runs against the whole table each
minute); at 100 TB the viable shape is a maintained rollup — keep per-key
partial aggregates, merge each micro-batch's partials into them, and answer
queries from the rollup. This module implements the merge algebra for the
decomposable aggregates (count, sum, min, max — and mean as sum/count at
read time): ``rollup_table(batch) ⊕ rollup_table(batch₂) ≡
rollup_table(batch ∪ batch₂)``, which is the associativity property the
tests pin. Non-decomposable aggregates (exact median, distinct) need
sketches (see ``events_kmv_distinct``) or a re-scan tier.

Scale shape: the stored rollup is keys-sized, not events-sized; each tick
shuffles only the BATCH (partial-agg map-side first), then a keyed merge
join against the rollup — the same partition-pruned discipline as
``sink.upsert_partitioned`` applies when the rollup is date-partitioned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_FNS = {
    "cnt": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "sum": lambda a, b: (
        F.coalesce(a, F.lit(0).cast("decimal(38,6)"))
        + F.coalesce(b, F.lit(0).cast("decimal(38,6)"))
    ),
    "min": F.least,  # least/greatest skip NULLs — absent-side neutral
    "max": F.greatest,
}


def rollup_table(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per-key partial aggregate of one batch: ``(keys…, cnt, sum, min,
    max)``. The sum is decimal-exact so merge order never changes a bit of
    the stored state (double sums would drift per merge schedule)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    )


def merge_rollup(
    existing: DataFrame | None, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Merge two rollup states (full-outer on keys, per-measure merge fn).
    Associative and commutative by construction — the property that makes
    maintained aggregates correct under any batch arrival order."""
    if existing is None:
        return incoming
    keys = list(keys)
    e = existing.select(
        *keys, *[F.col(m).alias(f"_e_{m}") for m in MERGE_FNS]
    )
    i = incoming.select(
        *keys, *[F.col(m).alias(f"_i_{m}") for m in MERGE_FNS]
    )
    merged = e.join(i, keys, "full_outer")
    return merged.select(
        *keys,
        *[
            fn(F.col(f"_e_{m}"), F.col(f"_i_{m}")).alias(m)
            for m, fn in MERGE_FNS.items()
        ],
    )


def rollup_read(rollup: DataFrame) -> DataFrame:
    """Read-time derived measures: mean from the exact sum/count pair."""
    return rollup.withColumn(
        "mean", (F.col("sum") / F.col("cnt")).cast("double")
    )
