"""Probabilistic record linkage — Fellegi-Sunter match scoring over
blocked candidate pairs.

The classic entity-resolution decision model (Fellegi & Sunter 1969, the
foundation of Splink/dedupe-style systems): each compared field carries
declared probabilities ``m`` (agreement given a true match) and ``u``
(agreement given a non-match); a pair's evidence is the sum of per-field
log-likelihood-ratio weights, thresholded into match / possible / no-match.

Division of labor with the dedup family: the MinHash/SimHash/edit-distance
blockers (``ops/dedup``) GENERATE bounded candidate pairs; this module
SCORES them. Scoring is pure map-side arithmetic over the pair frame — no
shuffle beyond what the blocker already did, so linkage at 100 TB costs
whatever candidate generation costs.

Determinism: the log weights are computed DRIVER-SIDE in Python from the
declared (m, u) and injected as double literals — engines disagree in the
last ulp of ``log`` (libm vs JVM), but identical literals sum identically,
which is what will let an oracle twin replay the scores bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """Agreement / disagreement log2-likelihood-ratio weights for one field
    with declared P(agree | match) = m and P(agree | non-match) = u."""
    if not (0.0 < u < m < 1.0):
        raise ValueError(f"need 0 < u < m < 1, got m={m}, u={u}")
    return (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))


def fs_score_pairs(
    pairs: DataFrame,
    fields: dict[str, tuple[float, float]],
    upper: float,
    lower: float,
    agreement: dict[str, Column] | None = None,
) -> DataFrame:
    """Score candidate pairs: per field, add the agreement weight when the
    field's agreement predicate holds, the disagreement weight otherwise
    (NULL on either side counts as disagreement — absence is evidence
    against, the conservative convention).

    ``fields`` maps a field name to its declared ``(m, u)``;
    by default field ``f`` agrees when ``<f>_a`` null-safe-equals ``<f>_b``
    on the pair frame — pass ``agreement[f]`` to override with a fuzzy
    predicate (e.g. an edit-distance bound from the blocker).

    Adds ``match_weight`` (double) and ``decision``
    ('match' | 'possible' | 'no_match') via the two declared thresholds.
    """
    score: Column = F.lit(0.0)
    for f, (m, u) in fields.items():
        agree_w, disagree_w = fs_weights(m, u)
        pred = (
            agreement[f]
            if agreement is not None and f in agreement
            else F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b"))
            & F.col(f"{f}_a").isNotNull()
        )
        score = score + F.when(pred, F.lit(agree_w)).otherwise(
            F.lit(disagree_w)
        )
    return pairs.withColumn("match_weight", score).withColumn(
        "decision",
        F.when(F.col("match_weight") >= upper, F.lit("match"))
        .when(F.col("match_weight") <= lower, F.lit("no_match"))
        .otherwise(F.lit("possible")),
    )
