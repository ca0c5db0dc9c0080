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


# ---------------------------------------------------------------------------
# Maintained regression: OLS sufficient statistics are decomposable, so a
# per-key trend fit can be kept incrementally like any count/sum rollup —
# merge the batch's five moments into the stored state, fit at read time.
# The reference recomputes its whole-store analysis every tick; this is the
# shape that replaces a full-history rescan for model fits at 100 TB.
# ---------------------------------------------------------------------------

_OLS_MOMENTS = ("n_obs", "sx", "sy", "sxy", "sxx")


def ols_rollup_table(df: DataFrame, keys, x, y, y_scale: int = 6) -> DataFrame:
    """Per-key partial OLS state of one batch: the same five exact-decimal
    sufficient statistics ``ops.stats.grouped_ols`` aggregates at the same
    ``y_scale``, kept AS DECIMALS (not doubles) so merges are associative
    to the bit and the maintained fit matches the from-scratch fit at ANY
    scale, not just the default."""
    xl = x.cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(xl.cast("decimal(38,0)")).alias("sx"),
        F.sum(y.cast(f"decimal(38,{y_scale})")).alias("sy"),
        F.sum((xl.cast("double") * y).cast(f"decimal(38,{y_scale})"))
        .alias("sxy"),
        F.sum((xl * xl).cast("decimal(38,0)")).alias("sxx"),
    )


def merge_ols_rollup(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: Sequence[str],
    y_scale: int = 6,
) -> DataFrame:
    """Merge two OLS states: union + keyed hash re-aggregation (sum of
    every moment — exact decimals, so associative/commutative: batch
    arrival order cannot change a bit of the stored state).

    Union+groupBy rather than a keyed full-outer join: GROUP BY collects
    NULL keys into ONE group exactly like the batch-local rollup did, so
    the maintained view keeps GROUP BY semantics under NULL keys — the
    previous null-unsafe join left one never-merged NULL-key state per
    batch (round-16 ``sf_nullkeys`` sweep), and a join of two frames
    derived from the same source also trips Spark's ambiguous-self-join
    analysis. Same single shuffle, plus map-side partial aggregation the
    join never had.

    NULL moments merge like SQL ``SUM``: NULL inputs are skipped, and a
    group whose moment is NULL in EVERY contributing state stays NULL —
    which is exactly what the from-scratch GROUP BY over the union of the
    batches produces (``ols_rollup_table``'s ``sum(value)`` is NULL for an
    all-NULL-value group), so maintained ≡ rebuilt holds bit-for-bit even
    there. This intentionally differs from the pre-round-16 full-outer
    form, which coalesced absent sides to zero: coalescing would turn an
    all-NULL ``sy`` into 0 in the maintained view while the from-scratch
    GROUP BY keeps NULL (round-16 ADVICE; pinned in
    ``tests/test_ops.py::test_merge_ols_rollup_null_moments``)."""
    if existing is None:
        return incoming
    types = {
        "n_obs": "long",
        "sx": "decimal(38,0)",
        "sy": f"decimal(38,{y_scale})",
        "sxy": f"decimal(38,{y_scale})",
        "sxx": "decimal(38,0)",
    }
    merged = existing.select(*keys, *_OLS_MOMENTS).unionByName(
        incoming.select(*keys, *_OLS_MOMENTS)
    )
    return merged.groupBy(*keys).agg(
        *[
            F.sum(c).cast(types[c]).alias(c)
            for c in _OLS_MOMENTS
        ]
    )


def ols_rollup_read(rollup: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fit from the maintained state — identical arithmetic to
    ``ops.stats.grouped_ols``'s read side (decimal state → double once,
    then the closed-form slope/intercept), so the maintained fit equals
    the from-scratch fit bit-for-bit."""
    n = F.col("n_obs").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    det = n * sxx - sx * sx
    slope = F.when(det > 0.0, (n * sxy - sx * sy) / det)
    return rollup.select(
        *keys,
        "n_obs",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )
