"""Change-data-capture operators: SCD Type-2 interval builds and keyed
snapshot diffs.

The reference's store is overwrite-only (``update_exchange_rates.py``
truncates and reloads; ``Fx_1min.py`` upserts latest-wins) — history is
lost every tick. A warehouse serving training-data pipelines needs the
opposite: versioned dimensions (which state was true WHEN) and explicit
change sets between snapshots (what a tick actually did). Both are pure
window/join compositions — no state store, no driver loops.

Scale notes
-----------
- ``scd2_intervals`` is two window passes partitioned by the entity key:
  one shuffle on the key, each partition processed streaming by the window
  operator. Key cardinality is the parallelism unit — users/currency pairs
  are near-unique domains, no skew.
- ``snapshot_diff`` is one full-outer hash join on the key plus a map-side
  classification — the minimal possible topology for a diff; at 100 TB
  both sides bucket/co-partition on the key so the join is shuffle-free
  when the snapshots share a layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(attrs: Sequence[str], w: Window) -> Column:
    """True on rows whose attribute tuple differs from the previous row's
    (null-safe: NULL -> value and value -> NULL both count as changes)."""
    cur = F.struct(*[F.col(a) for a in attrs])
    prev = F.lag(cur).over(w)
    return prev.isNull() | ~cur.eqNullSafe(prev)


def scd2_intervals(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    attrs: Sequence[str],
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change log.

    Collapses consecutive rows with identical ``attrs`` (no-op updates),
    then assigns each surviving version its validity interval:
    ``valid_from`` = its own event time, ``valid_to`` = the next version's
    event time (NULL for the current version), ``is_current`` flag.

    ``order`` must make the log deterministic per key (include a unique
    tiebreaker alongside the timestamp). Rows with a NULL in any ``order``
    column are unplaceable on the version timeline and are dropped by
    contract (engines disagree on default NULL placement).
    """
    for c in order:
        df = df.filter(F.col(c).isNotNull())
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    versions = df.withColumn("_chg", _changed(attrs, w)).filter(F.col("_chg"))
    w2 = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    return (
        versions.withColumn("valid_from", F.col(order[0]))
        .withColumn("valid_to", F.lead(F.col(order[0])).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, *attrs, "valid_from", "valid_to", "is_current")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots: ``insert`` (new only),
    ``delete`` (old only), ``update`` (both, any ``compare`` column
    differs null-safely). Unchanged keys are dropped — the output IS the
    change set a downstream incremental consumer applies.

    Output columns: key, change_type, old_<c>/new_<c> per compare column.

    NULL keys follow SQL equi-join semantics (D27): the full-outer join
    never matches them, so an old NULL-key state reads as ``delete`` and
    a new one as ``insert`` — classification runs on PRESENCE FLAGS
    (``_in_old``/``_in_new``), never on ``key IS NULL``, which would
    mislabel exactly those rows (round-16 ``sf_nullkeys`` sweep pinned
    the oracle's key-probing form doing so).
    """
    o = old.select(
        F.col(key), *[F.col(c).alias(f"old_{c}") for c in compare]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        F.col(key), *[F.col(c).alias(f"new_{c}") for c in compare]
    ).withColumn("_in_new", F.lit(True))
    joined = o.join(n, key, "full_outer")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            key,
            "change_type",
            *[f"old_{c}" for c in compare],
            *[f"new_{c}" for c in compare],
        )
    )
