"""Incremental view maintenance for JOIN views — the delta algebra.

``ops/rollup`` maintains AGGREGATE views by merging partial states; this
module maintains a JOIN view under insert batches on BOTH sides. For an
equi-join view ``V = L ⋈ R`` receiving inserts ``ΔL`` and ``ΔR`` in the
same tick, the classic delta rule is

    ΔV = (ΔL ⋈ R_old)  ∪  (L_old ⋈ ΔR)  ∪  (ΔL ⋈ ΔR)

— three keyed joins whose inputs are (batch × old-state) and
(batch × batch), never (state × state): the full re-join the reference
effectively performs every tick (``/root/reference/Fx_1min.py:147-217``
re-reads the whole store) is replaced by work proportional to the batch.
At 100 TB the old-state sides stay partitioned/bucketed on the join key,
so each delta term is a co-located join against a batch-sized probe.

The three terms are disjoint BY CONSTRUCTION (old×old pairs are already
in V; each new pair has exactly one of: new left only, new right only,
both new), so the union needs no dedup — which is also what makes the
delta hash-verifiable against a from-scratch join of the full inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERM_COL = "delta_term"


def delta_join(
    l_old: DataFrame,
    r_old: DataFrame,
    l_delta: DataFrame,
    r_delta: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """The insert-delta of the inner equi-join view on ``keys``: the three
    disjoint terms tagged in ``delta_term`` ('new_left', 'new_right',
    'both_new'). Append the result to the stored view and fold the deltas
    into the stored sides to complete the tick."""
    keys = list(keys)
    t1 = l_delta.join(r_old, keys).withColumn(
        TERM_COL, F.lit("new_left")
    )
    t2 = l_old.join(r_delta, keys).withColumn(
        TERM_COL, F.lit("new_right")
    )
    t3 = l_delta.join(r_delta, keys).withColumn(
        TERM_COL, F.lit("both_new")
    )
    return t1.unionByName(t2).unionByName(t3)


def delta_agg(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    sign_col: str | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Z-set (signed multiset) maintenance of a grouped SUM/COUNT view:
    fold a batch of inserts (+1) and retractions (−1) into the stored
    per-key state without re-reading the base table — the aggregate-side
    complement of :func:`delta_join`, and the general form of the
    reference's per-tick ``ON DUPLICATE KEY UPDATE`` accumulation
    (``/root/reference/Fx_1min.py:106-109``).

    ``state`` holds one row per key with ``count_col`` and one running sum
    per ``sum_cols`` entry (pass an empty frame with that schema to
    bootstrap). ``delta`` holds raw rows; ``sign_col`` (±1 long) marks
    retractions, absent = all inserts. Sums are maintained in
    DECIMAL(38,6) so maintained-vs-recomputed equality is exact, not
    approximate — the same declared-exactness contract as
    ``ops/rollup.ols_rollup_*``. Keys whose maintained count reaches 0
    are dropped (true Z-set semantics: fully-retracted groups vanish,
    matching a from-scratch recompute).

    CALLER OBLIGATION: retractions must mirror previously-inserted rows
    (same key AND same values). A retraction batch that zeroes a key's
    count while leaving residual sums is state corruption that this fold
    cannot detect — the key is dropped, sums and all (ADVICE r6). Replay
    twins pin the honest path by hashing maintained-vs-scratch equality.

    Both the fold-in agg and the merge are partial-aggregated map-side and
    shuffle once on ``keys``; at 100 TB the stored state stays bucketed on
    ``keys`` so the merge is a co-located join of batch-sized deltas.
    """
    keys = list(keys)
    sign = (
        F.col(sign_col).cast("long") if sign_col else F.lit(1).cast("long")
    )
    folded = delta.groupBy(*keys).agg(
        F.sum(sign).alias(count_col),
        *[
            F.sum(sign.cast("decimal(38,6)") * F.col(c).cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias(c)
            for c in sum_cols
        ],
    )
    merged = (
        state.select(
            *keys,
            F.col(count_col).cast("long").alias(count_col),
            *[F.col(c).cast("decimal(38,6)").alias(c) for c in sum_cols],
        )
        .unionByName(folded)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            *[
                F.sum(F.col(c)).cast("decimal(38,6)").alias(c)
                for c in sum_cols
            ],
        )
    )
    return merged.filter(F.col(count_col) != 0)


def topk_retraction(
    ticks: Sequence[tuple[DataFrame, DataFrame | None]],
    key_col: str,
    value_col: str,
    k: int = 10,
    buffer_mult: int = 4,
    alive_at=None,
) -> DataFrame:
    """Maintained TOP-K under inserts AND retractions — the view-
    maintenance problem ``delta_agg`` cannot solve (top-k is not an
    abelian fold: a delete inside the current top-k pulls in an element
    the maintained state no longer holds). The classic answer is a
    BOUNDED BUFFER with a declared rebuild rule:

    - keep the top ``B = buffer_mult·k`` alive rows by
      ``(value DESC, key ASC)``;
    - per tick, ``buffer = topB((buffer − deletes) ∪ inserts)`` — work
      O(|batch| + B) per tick, never a rescan of the base;
    - SOUNDNESS BOUND: each delete that HITS the buffer permanently
      consumes one of the B − k spare slots — a promoted replacement
      may be a row the buffer never saw, so the spares do NOT
      replenish on later ticks (a per-tick check would let two ticks
      of B−k hits each silently corrupt the view while individually
      "within bound"). The bound is therefore CUMULATIVE: after m
      total buffer hits since the last rebuild, only the buffer's
      top (B − m) prefix is guaranteed, and the emitted top-k stays
      exact while m ≤ B − k. The op counts hits per tick (a B-sized
      broadcast semi-join), accumulates them, and when the running
      total crosses the bound REBUILDS the buffer from the full alive
      set via ``alive_at(tick)`` (resetting the counter) — the
      declared fallback that keeps the output exact instead of
      silently wrong. ``alive_at(i)`` should return the alive set
      AFTER tick i's inserts and deletes; the rebuild path composes
      the tick's deltas idempotently on top, so a start-of-tick
      convention also yields the correct post-tick buffer.

    ``ticks`` is a sequence of ``(inserts, deletes)`` frames
    (``deletes`` key-only or None); returns the union of per-tick
    emissions ``(tick, rk, key, value)``. The per-tick rank window runs
    over ≤ k rows per tick — bounded grain."""
    from pyspark.sql import Window

    b = buffer_mult * k
    order = [F.col(value_col).desc(), F.col(key_col).asc()]
    buffer: DataFrame | None = None
    outs = []
    cum_hits = 0  # buffer deletions since the last rebuild/bootstrap
    for i, (ins, dels) in enumerate(ticks):
        ins = ins.select(key_col, value_col)
        if buffer is None:
            cand = ins
        elif dels is None:
            cand = buffer.unionByName(ins)
        else:
            dkeys = dels.select(key_col)
            n_hit = buffer.join(F.broadcast(dkeys), key_col).count()
            cum_hits += n_hit
            if cum_hits > b - k:
                if alive_at is None:
                    raise ValueError(
                        f"tick {i}: {cum_hits} cumulative buffer deletions "
                        f"since the last rebuild exceed the B-k={b - k} "
                        "soundness bound and no alive_at rebuild source "
                        "was provided"
                    )
                # alive_at(i) must return the alive set AFTER tick i's
                # inserts and deletes are applied. Compose the tick's
                # deltas defensively anyway so a caller supplying
                # start-of-tick state gets the identical result: drop the
                # tick's delete keys AND any rows carrying the tick's
                # insert keys, then add the inserts — idempotent under
                # either convention (each anti-join is a no-op when the
                # delta was already applied, and the union then restores
                # exactly the tick's insert rows).
                ikeys = ins.select(key_col)
                cand = (
                    alive_at(i)
                    .select(key_col, value_col)
                    .join(F.broadcast(dkeys), key_col, "left_anti")
                    .join(F.broadcast(ikeys), key_col, "left_anti")
                    .unionByName(ins)
                )
                cum_hits = 0
            else:
                cand = buffer.join(
                    F.broadcast(dkeys), key_col, "left_anti"
                ).unionByName(ins)
        buffer = cand.orderBy(*order).limit(b).localCheckpoint(eager=False)
        # Re-sort before the k-cut: limit over a checkpointed frame does
        # not contractually preserve the pre-checkpoint sort, and the
        # re-sort is O(B) — free at buffer grain.
        outs.append(
            buffer.orderBy(*order).limit(k).withColumn("tick", F.lit(i))
        )
    emitted = outs[0]
    for o in outs[1:]:
        emitted = emitted.unionByName(o)
    w = Window.partitionBy("tick").orderBy(*order)
    return emitted.select(
        "tick",
        F.row_number().over(w).alias("rk"),
        key_col,
        value_col,
    )
