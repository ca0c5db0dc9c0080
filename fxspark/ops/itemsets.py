"""Frequent-itemset mining (Apriori) as candidate-bounded DataFrame joins.

Market-basket completeness beyond ``basket_brand_lift``'s single-pair
metrics: support-thresholded itemsets of size 2 and 3, mined with the
Apriori monotonicity prune (every subset of a frequent set is frequent) so
candidate generation never enumerates the unpruned cross product.

The reference has no itemset surface; this is part of the engine's
"what a warehouse user expects" analytics tier (SURVEY.md §6 extensions).

Scale notes
-----------
- Every per-basket enumeration joins basket-grain frames co-located on the
  basket key — pair/triple fan-out is ``C(b, 2)`` / ``C(b, 3)`` per basket
  of b DISTINCT frequent items, never corpus². Items failing the size-1
  support cut are dropped BEFORE any pair exists (the classic prune).
- Frequent-pair and frequent-item sets broadcast (they are bounded above
  by ``|baskets| / min_support`` — the support threshold itself caps how
  many sets can be frequent).
- The support threshold is RELATIVE (a fraction of basket count, applied
  as exact integer ceil arithmetic) so the same query is non-degenerate at
  every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_support(baskets: DataFrame, basket_col: str, rel_ppm: int):
    """Scalar frame: n_baskets and the absolute support floor
    ``ceil(n * rel_ppm / 1e6)`` in exact integer arithmetic.
    Materialized: every broadcast of this one-row frame (item cut, pair
    cut, triple cut) would otherwise re-run the full distinct+count
    scan of the basket source."""
    return (
        baskets.select(basket_col)
        .distinct()
        .agg(F.count(F.lit(1)).alias("_nb"))
        .select(
            "_nb",
            F.expr(f"(_nb * {rel_ppm} + 999999) div 1000000").alias(
                "_minsup"
            ),
        )
        .localCheckpoint(eager=False)
    )


def _basket_pairs(
    baskets: DataFrame, basket_col: str, item_col: str, sup: DataFrame
):
    """Basket-grain ordered pairs over size-1-frequent items (the Apriori
    item prune applied before any pair exists)."""
    items = baskets.select(basket_col, item_col).distinct()
    f1 = (
        items.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .crossJoin(F.broadcast(sup))
        .filter(F.col("_c") >= F.col("_minsup"))
        .select(item_col)
    )
    pruned = items.join(F.broadcast(f1), item_col)
    a = pruned.select(basket_col, F.col(item_col).alias("i1"))
    b = pruned.select(basket_col, F.col(item_col).alias("i2"))
    return a.join(b, basket_col).filter(F.col("i1") < F.col("i2"))


def _pair_counts(pairs: DataFrame, sup: DataFrame) -> DataFrame:
    return (
        pairs.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("support"))
        .crossJoin(F.broadcast(sup))
        .filter(F.col("support") >= F.col("_minsup"))
        .select("i1", "i2", "support")
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    rel_support_ppm: int,
) -> DataFrame:
    """Item pairs co-occurring in at least ``rel_support_ppm`` millionths
    of all baskets. Returns ``(i1, i2, support)`` with ``i1 < i2``."""
    sup = _min_support(baskets, basket_col, rel_support_ppm)
    return _pair_counts(
        _basket_pairs(baskets, basket_col, item_col, sup), sup
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    rel_support_ppm: int,
) -> DataFrame:
    """Item triples co-occurring in at least ``rel_support_ppm`` millionths
    of all baskets, mined Apriori-style: basket-grain pairs are first
    filtered to FREQUENT pairs (broadcast semi-join), candidates join two
    frequent pairs sharing their smallest item — (i1,i2)+(i1,i3), i2<i3 —
    and the third edge (i2,i3) is checked against the frequent-pair set
    before counting. Monotonicity makes the prune lossless, so the result
    equals the brute triple enumeration with a HAVING clause.

    ONE basket-grain pair enumeration feeds both the frequent-pair counts
    and the candidate stage (measured ~4.2 → ~3.0 s warm at sf0.1 vs the
    naive recompute), and the pair frame is lazily localCheckpointed:
    without it the multi-consumer lineage (pairs → f2, pairs → bp →
    cand twice) compounds to 68 base-table scans in the executed plan —
    fatal at cluster scale — while the materialization A/B-measures
    neutral locally (4.0 s both ways at sf0.1, bench regime).
    localCheckpoint, not persist — persist's CacheManager registration
    makes rebuilt identical queries serve cached results (benchmark
    corruption + session-lifetime accumulation; see graph.py for the
    measured A/B). Materializing the LARGER frames is a different
    story: the distinct item frame (≈6.3 s vs 3.0 s) and the
    basket-grain bp frame (6.0 s vs 4.0 s) both A/B-measured WORSE —
    materializing basket-grain rows costs more than recomputing them
    from the checkpointed pairs.

    Returns ``(i1, i2, i3, support)`` with ``i1 < i2 < i3``.
    """
    sup = _min_support(baskets, basket_col, rel_support_ppm)
    pairs = _basket_pairs(baskets, basket_col, item_col, sup).localCheckpoint(eager=False)
    f2 = _pair_counts(pairs, sup)
    bp = pairs.join(
        F.broadcast(f2.select("i1", "i2")), ["i1", "i2"], "left_semi"
    )
    cand = (
        bp.join(
            bp.select(
                basket_col, "i1", F.col("i2").alias("i3")
            ),
            [basket_col, "i1"],
        )
        .filter(F.col("i2") < F.col("i3"))
        .join(
            F.broadcast(
                f2.select(
                    F.col("i1").alias("i2"), F.col("i2").alias("i3")
                )
            ),
            ["i2", "i3"],
            "left_semi",
        )
    )
    return (
        cand.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .crossJoin(F.broadcast(sup))
        .filter(F.col("support") >= F.col("_minsup"))
        .select("i1", "i2", "i3", "support")
    )
