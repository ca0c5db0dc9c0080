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
