"""Privacy-shaped aggregates: k-anonymity auditing lives in
``ops/checks.k_anonymity``; this module holds the differential-privacy
MECHANISM shape — Laplace-noised counts — with the engine's declared-
randomness discipline.

A real DP release draws Laplace noise from a secret, non-replayable RNG;
that exact property makes it impossible to differentially verify. This
operator separates the two concerns: the mechanism (sensitivity-1 count +
Laplace(1/epsilon) noise via inverse-CDF) is implemented for real, but the
uniform draw comes from a DECLARED md5 hash of the group key, so the whole
release replays bit-for-bit in any engine. Swapping the declared hash for
a secret per-release seed (one line — the ``seed`` argument) restores the
privacy property without touching the plan; the tests pin the mechanism's
algebra (noise distribution shape, epsilon scaling), which is the part a
pipeline can get wrong.

Scale: one partial-aggregated groupBy plus map-side noise arithmetic —
DP release of a 100 TB table costs exactly what the count rollup costs.

Reference: the reference pipeline has no privacy surface at all (SURVEY.md
§2 — raw rates go straight to MySQL); this is net-new warehouse capability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def declared_uniform(col: Column, seed: str = "") -> Column:
    """Uniform-(0,1) draw from the declared md5 family (first 60 bits /
    2^60) of ``seed || col`` — the same engine-portable randomness the KMV
    and sampling operators use."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(2**60))
    )


def laplace_noise(uniform: Column, scale: Column) -> Column:
    """Inverse-CDF Laplace(0, scale) from a uniform draw: with
    ``u = uniform - 0.5``, noise = ``-scale * sign(u) * ln(1 - 2|u|)``.
    The log goes through a DECIMAL(38,9) cast before any further
    arithmetic so both engines propagate the identical value (libm vs JVM
    log differ in the last ulp); the argument is floored at 1e-12 so a
    pathological all-zero hash cannot produce -inf."""
    u = uniform - F.lit(0.5)
    g = F.greatest(
        F.lit(1.0) - F.lit(2.0) * F.abs(u), F.lit(1e-12)
    )
    ln_g = F.log(g).cast("decimal(38,9)").cast("double")
    return -scale * F.signum(u) * ln_g


def dp_counts(
    df: DataFrame,
    keys: str | Sequence[str],
    epsilon: float,
    seed: str = "",
) -> DataFrame:
    """Per-key counts released through the Laplace mechanism at privacy
    budget ``epsilon`` (sensitivity 1 — one row added or removed moves any
    count by at most 1, so scale = 1/epsilon). Returns ``(keys…, n_true,
    noisy_count)``; production callers drop ``n_true`` and supply a secret
    ``seed`` — it is kept here because the whole point of the declared
    variant is auditability of the mechanism itself."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_true"))
    key_str = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    noise = laplace_noise(
        declared_uniform(key_str, seed), F.lit(1.0 / epsilon)
    )
    return agg.withColumn(
        "noisy_count",
        F.round(F.col("n_true").cast("double") + noise, 6),
    )
