"""As-of / point-in-time operators (SURVEY.md §2.3 Q6-Q9).

The reference's "PreviousRates" CTE finds, per pair, the event **strictly
before** the per-pair max event at/under a cutoff — i.e. the *second-latest*
event at-or-before the cutoff.  It does this with a self-join to a grouped max
plus a correlated scalar subquery (``/root/reference/Fx_1min.py:180-196``).
Spark-first we emit the already-decorrelated window form: filter to the cutoff,
rank descending, take rank ``n``.

``asof_join`` generalizes the pattern into a keyed backward as-of join (the
operator TimescaleDB/kdb call "asof"): for each left row, the latest right row
with ``right.on <= left.on`` per key.

Scale notes (100 TB):

- ``nth_before_cutoff``: the cutoff filter is pushed to the scan (partition /
  row-group pruning on the time column), then one shuffle on the key.
- ``asof_join`` uses the union+window formulation: ONE shuffle of
  (key, time)-sorted union instead of a join + per-key subquery; no broadcast
  needed, skew handled by AQE. This is the standard distributed as-of plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nth_before_cutoff(
    df: DataFrame,
    keys: Sequence[str] | str,
    order_by: Sequence[str] | str,
    cutoff: Column,
    cutoff_col: str | None = None,
    n: int = 2,
) -> DataFrame:
    """Rank-``n`` most-recent row per key among rows at/before ``cutoff``.

    ``n=2`` replicates the reference's second-latest-before-cutoff semantics
    exactly (``Fx_1min.py:190-196``); ``n=1`` is a plain as-of lookup.
    ``cutoff_col`` defaults to the first ``order_by`` column. NULL order
    coordinates are dropped per the unified rank-op contract
    (``ops.latest.drop_null_order``) — the cutoff predicate already
    excludes a NULL ``cutoff_col`` (NULL <= x is never TRUE), so the
    explicit drop only adds the remaining order columns.
    """
    from fxspark.ops.latest import drop_null_order

    order = [order_by] if isinstance(order_by, str) else list(order_by)
    cutoff_col = cutoff_col or order[0]
    filtered = drop_null_order(df, order).filter(F.col(cutoff_col) <= cutoff)
    w = Window.partitionBy(
        *([keys] if isinstance(keys, str) else list(keys))
    ).orderBy(*[F.col(c).desc() for c in order])
    return (
        filtered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == n)
        .drop("_rn")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    tolerance_s: int,
    keys: Sequence[str] | str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval range join: all (left, right) pairs with
    ``|left.left_on − right.right_on| <= tolerance_s`` seconds (optionally
    also equal on ``keys``).

    A naive theta-join is a cross product; instead both sides are bucketed
    into ``tolerance_s``-wide time bins and each left row equi-joins its own
    and the two adjacent bins (any in-tolerance pair is at most one bin
    apart), then the exact predicate filters. Shuffle cost is ~3× the data
    on the bin key — linear, never quadratic; this is the standard
    distributed range-join rewrite (Spark's own storage-partitioned range
    join does the same under the hood).

    NULL time coordinates self-exclude (consistent with the unified
    rank-op contract, ``ops.latest.drop_null_order``): a NULL ``on`` yields
    a NULL bin, the bin equi-join is null-unsafe, and only in-tolerance
    PAIRS are returned — so NULL-time rows on either side simply produce
    no pairs.
    """
    keys = [] if keys is None else [keys] if isinstance(keys, str) else list(keys)
    # Integer floor-division (`div`) for bin assignment: double division +
    # cast('long') truncates toward zero, which mis-bins negative (pre-1970)
    # micros and can land a quotient within a ULP of an integer one bin off —
    # worst case an in-tolerance pair two bins apart escapes the ±1 candidate
    # join. `div` floors exactly for all 64-bit timestamps.
    tol_us = tolerance_s * 1_000_000
    lbin = F.expr(
        f"if(unix_micros(`{left_on}`) >= 0, unix_micros(`{left_on}`) div {tol_us},"
        f" -(((-unix_micros(`{left_on}`)) + {tol_us} - 1) div {tol_us}))"
    )
    rbin = F.expr(
        f"if(unix_micros(`{right_on}`) >= 0, unix_micros(`{right_on}`) div {tol_us},"
        f" -(((-unix_micros(`{right_on}`)) + {tol_us} - 1) div {tol_us}))"
    )

    l = left.select(
        "*", F.explode(F.array(lbin - 1, lbin, lbin + 1)).alias("_bin")
    )
    rename = {c: f"{c}{suffix}" for c in right.columns if c in left.columns and c not in keys}
    r = right.select(
        *[F.col(c).alias(rename.get(c, c)) for c in right.columns],
        rbin.alias("_bin"),
    )
    r_on = rename.get(right_on, right_on)
    joined = l.join(r, on=keys + ["_bin"]).filter(
        F.abs(F.unix_micros(F.col(left_on)) - F.unix_micros(F.col(r_on)))
        <= tolerance_s * 1_000_000
    )
    return joined.drop("_bin")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] | str,
    on: str,
    right_payload: Sequence[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    right_tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """As-of join (``pandas.merge_asof`` semantics, distributed).

    ``direction='backward'`` (default): latest right row with
    ``right.on <= left.on`` per key. ``direction='forward'``: earliest
    right row with ``right.on >= left.on`` (equal times match in both).

    Implemented as tagged union + ``last``/``first(..., ignorenulls)`` over
    a (key, time)-ordered running window — a single sort-shuffle, linear in
    input size, regardless of how many left rows map to each right row.

    ``tolerance``: optional max staleness interval; matches further than
    ``tolerance`` from ``left.on`` (older for backward, newer for forward)
    are nulled out.

    ``right_tiebreak``: optional right-side columns appended to the window
    ordering so EQUAL-``on`` right rows resolve deterministically (backward
    picks the tiebreak-largest, forward the smallest). Without it, equal
    times fall back to sort-order arbitrariness — fine when ``on`` is
    unique per key, required when it isn't.

    Rows whose as-of coordinate ``on`` is NULL are dropped from BOTH sides
    per the unified rank-op contract (``ops.latest.drop_null_order``): a
    right row with no time can never be "the latest at-or-before", and a
    left row with no time has no as-of point — keeping either would rank
    NULLs by dialect-specific placement (sqlfuzz D8).

    NULL ``keys`` follow SQL equi-join semantics (null-unsafe): a RIGHT
    row with a NULL key can anchor nothing and is dropped; a LEFT row with
    a NULL key stays, unmatched. Spelled because the union + keyed-window
    plan would otherwise GROUP all NULL keys into one partition and match
    NULL-key lefts to NULL-key rights — exactly what ``ON l.k = r.k``
    never does (round-16 ``sf_nullkeys`` sweep, 4 registry hits).
    """
    from fxspark.ops.latest import drop_null_order

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    backward = direction == "backward"
    keys = [keys] if isinstance(keys, str) else list(keys)
    left = drop_null_order(left, on)
    right = drop_null_order(right, on)
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in keys and c != on]
    left_cols = left.columns

    # side ordering makes equal-time right rows visible to the left row's
    # frame: right before left for the backward running frame, after it for
    # the forward one
    r_side, l_side = (1, 2) if backward else (2, 1)
    tiebreaks = list(right_tiebreak or [])
    r = right.select(
        *keys,
        F.col(on).alias("_t"),
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("_rpay"),
        F.lit(r_side).alias("_side"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreaks)],
    )
    l = left.select(
        "*",
        F.col(on).alias("_t"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.lit(l_side).alias("_side"),
        *[
            F.lit(None).cast(r.schema[f"_tb_{i}"].dataType).alias(f"_tb_{i}")
            for i in range(len(tiebreaks))
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    base = Window.partitionBy(*keys).orderBy(
        "_t", "_side", *[f"_tb_{i}" for i in range(len(tiebreaks))]
    )
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    matched = unioned.withColumn("_asof", pick("_rpay"))
    if tolerance is not None:
        unioned = unioned.withColumn(
            "_rt", F.when(F.col("_side") == r_side, F.col("_t"))
        )
        matched = unioned.withColumn("_asof", pick("_rpay")).withColumn(
            "_asof_t", pick("_rt")
        )
        in_band = (
            F.col("_asof_t") >= F.col("_t") - tolerance
            if backward
            else F.col("_asof_t") <= F.col("_t") + tolerance
        )
        matched = matched.withColumn(
            "_asof", F.when(in_band, F.col("_asof"))
        )
    out = matched.filter(F.col("_side") == l_side).select(
        *left_cols,
        *[
            F.col(f"_asof.{c}").alias(c if c not in left_cols else f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return out


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] | str,
    on: str,
    right_payload: Sequence[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_near",
    right_tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Nearest-in-time join: for each left row, the right row (same key)
    whose ``on`` is CLOSEST in either direction, optionally within
    ``tolerance`` — ``pandas.merge_asof(direction='nearest')``,
    distributed. Generalizes the reference's latest-before lookup
    (``/root/reference/Fx_1min.py:159-188``) to bidirectional proximity.

    Single-pass: tagged union of both sides, ONE (key, time) sort-shuffle,
    then BOTH directional candidates from the same ordered window — the
    backward match via ``last(..., ignorenulls)`` over the preceding frame,
    the forward match via ``first(..., ignorenulls)`` over the following
    frame. No second sort, no join-back; cost is identical to one as-of
    join. The winner is picked per row by absolute time distance; an exact
    tie (including equal-time matches, which surface through the backward
    frame at distance 0) prefers the BACKWARD match — stated so an oracle
    can replay it. ``right_tiebreak`` columns resolve equal-``on`` right
    rows deterministically (backward picks tiebreak-largest, forward the
    smallest — :func:`asof_join` semantics).

    Returns left columns + ``right_payload`` (renamed ``{c}{suffix}`` on
    collision) + ``{on}{suffix}`` = matched right timestamp (null when no
    match is in band).

    Rows with NULL ``on`` are dropped from BOTH sides (the unified rank-op
    contract, ``ops.latest.drop_null_order``). Right side: they carry a
    non-null payload but a null matched-time, so the two ``last()`` scans
    over the backward frame could pick DIFFERENT rows (payload from the
    null-time row, ``_rt`` from an earlier real one) — and null ``_t`` rows
    would sort first in the shared window anyway (ADVICE r6). Left side: a
    row with no time has no proximity to anything.

    NULL ``keys``: SQL equi-join semantics (null-unsafe) — a NULL-key
    right row anchors nothing (dropped), a NULL-key left row stays
    unmatched; see :func:`asof_join` (round-16 ``sf_nullkeys`` sweep).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in keys and c != on]
    left_cols = left.columns
    tiebreaks = list(right_tiebreak or [])

    left = left.filter(F.col(on).isNotNull())
    right = right.filter(F.col(on).isNotNull())
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    r = right.select(
        *keys,
        F.col(on).alias("_t"),
        F.struct(
            *[F.col(c).alias(c) for c in right_payload]
        ).alias("_rpay"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreaks)],
    )
    l = left.select(
        "*",
        F.col(on).alias("_t"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.lit(2).alias("_side"),
        *[
            F.lit(None).cast(r.schema[f"_tb_{i}"].dataType).alias(f"_tb_{i}")
            for i in range(len(tiebreaks))
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_rt", F.when(F.col("_side") == 1, F.col("_t"))
    )

    base = Window.partitionBy(*keys).orderBy(
        "_t", "_side", *[f"_tb_{i}" for i in range(len(tiebreaks))]
    )
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    m = (
        unioned.withColumn("_bpay", F.last("_rpay", ignorenulls=True).over(wb))
        .withColumn("_bt", F.last("_rt", ignorenulls=True).over(wb))
        .withColumn("_fpay", F.first("_rpay", ignorenulls=True).over(wf))
        .withColumn("_ft", F.first("_rt", ignorenulls=True).over(wf))
        .filter(F.col("_side") == 2)
    )
    if tolerance is not None:
        m = m.withColumn(
            "_bt", F.when(F.col("_bt") >= F.col("_t") - tolerance, F.col("_bt"))
        ).withColumn(
            "_ft", F.when(F.col("_ft") <= F.col("_t") + tolerance, F.col("_ft"))
        )
    # exact integer micros: a double cast of epoch-with-micros rounds in
    # the last ulp and could flip a near-tie between directions
    d_b = F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_bt"))
    d_f = F.unix_micros(F.col("_ft")) - F.unix_micros(F.col("_t"))
    m = m.withColumn(
        "_use_b",
        F.when(F.col("_bt").isNull(), F.lit(False))
        .when(F.col("_ft").isNull(), F.col("_bt").isNotNull())
        .otherwise(d_b <= d_f),  # exact tie -> backward
    )
    chosen = F.when(F.col("_use_b"), F.col("_bpay")).otherwise(
        F.when(F.col("_ft").isNotNull(), F.col("_fpay"))
    )
    return m.select(
        *left_cols,
        *[
            chosen.getField(c).alias(
                c if c not in left_cols else f"{c}{suffix}"
            )
            for c in right_payload
        ],
        F.when(F.col("_use_b"), F.col("_bt"))
        .otherwise(F.col("_ft"))
        .alias(f"{on}{suffix}"),
    )
