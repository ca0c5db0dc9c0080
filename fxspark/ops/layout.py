"""Data-layout operators: multi-dimensional clustering for scan pruning.

A 100 TB table is pruned, not scanned: single-column range partitioning
prunes one predicate dimension, and ``compact`` (sink.py) fixes file sizes —
but queries that filter on TWO columns (user AND time, key AND value) need
the lakehouse Z-ORDER primitive: sort the data by the Morton interleave of
both columns' bits so every file's min/max footer bounds BOTH dimensions at
once. This module declares the z-value as pure integer arithmetic (floor-div
/ mod — no engine bit intrinsics), so any SQL engine reproduces it
bit-for-bit and the layout decision itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative ints, ``bits`` bits
    each: bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Unrolled floor-div/mod arithmetic (2·bits terms) — stays inside
    whole-stage codegen as one long expression; no UDF, no shuffle."""
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.floor(a / F.lit(2**i)).cast("long") % 2) * F.lit(2 ** (2 * i))
            + (F.floor(b / F.lit(2**i)).cast("long") % 2)
            * F.lit(2 ** (2 * i + 1))
        )
    return z


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical z-value as engine-neutral SQL (DuckDB oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((CAST(floor(({a}) / {2**i}.0) AS BIGINT) % 2) * {2 ** (2 * i)})")
        terms.append(f"((CAST(floor(({b}) / {2**i}.0) AS BIGINT) % 2) * {2 ** (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    a_col: Column,
    b_col: Column,
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Re-layout a frame in Z-order: range-partition then sort by the
    Morton value of two clustering columns — the OPTIMIZE ZORDER BY
    primitive. Written out, every file's (min, max) footer then bounds both
    dimensions, so a scan with a predicate on EITHER column prunes files.
    One range exchange (sampled split points) + per-partition sort; at
    100 TB this is the standard one-shuffle re-clustering pass."""
    z = zvalue(a_col, b_col, bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
    )


def largest_remainder_quota(
    df: DataFrame,
    keys: list[str],
    frac: float,
    scale: int = 6,
) -> DataFrame:
    """Exact proportional allocation (largest-remainder / Hamilton method):
    split a GLOBAL budget of ``round(frac * N)`` rows across the ``keys``
    strata so every stratum gets ``floor(frac * n_s)`` and the leftover
    seats go to the largest fractional remainders — the allocation a
    stratified train/dev split needs when per-stratum rounding must still
    hit the corpus-level budget EXACTLY (independent per-stratum rounding
    drifts by up to #strata/2 rows, which breaks fixed-size eval sets).

    Plan: one partial-combined count rollup (corpus-sized scan, strata-
    sized result), a broadcast scalar for the global budget, and ONE rank
    window over the STRATA table (domain-sized, orders below the corpus —
    the same collapse as the skew report). All arithmetic is integer /
    exact-decimal: frac is applied as a DECIMAL product, so both engines
    floor identical values and the allocation is hash-exact, never a
    float-boundary coin flip. Returns ``(keys…, n_rows, quota)`` with
    ``sum(quota) = round(frac * N)`` by construction (pinned by test).
    """
    from pyspark.sql import Window

    dfrac = F.lit(frac).cast(f"decimal(18,{scale})")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("_n"),
    ).select(
        "_n",
        F.floor(F.col("_n") * dfrac + F.lit(0.5).cast("decimal(2,1)"))
        .cast("long")
        .alias("_budget"),
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        *keys,
        "n_rows",
        F.floor(F.col("n_rows") * dfrac).cast("long").alias("_base"),
        (
            (F.col("n_rows") * dfrac)
            - F.floor(F.col("n_rows") * dfrac).cast(f"decimal(38,{scale})")
        ).alias("_rem"),
        "_budget",
    )
    # leftover seats = budget - sum(base); stratum gets +1 iff its remainder
    # rank is within the leftover count
    w = Window.orderBy(F.desc("_rem"), *[F.col(k) for k in keys])
    totals = scored.agg(F.sum("_base").alias("_sumbase"))
    ranked = scored.crossJoin(F.broadcast(totals)).withColumn(
        "_rk", F.row_number().over(w)
    )
    return ranked.select(
        *keys,
        "n_rows",
        (
            F.col("_base")
            + F.when(
                F.col("_rk") <= (F.col("_budget") - F.col("_sumbase")),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("quota"),
    )
