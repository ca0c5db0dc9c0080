"""Streaming-sketch operators: bounded-memory passes over unbounded key
domains.

The reference delegates all aggregation to MySQL (full hash tables); at
100 TB a full hash agg over an open key domain (tokens, URLs, user ids) can
exceed executor memory. The classic fix is a two-pass scheme:

1. **Candidate pass** — a per-partition Misra-Gries summary (bounded
   ``capacity`` counters, the decrement trick) run as an Arrow-batched
   ``mapInPandas``. MG guarantees every item with partition-local frequency
   > n_p/capacity survives, so the union of partition survivors is a
   SUPERSET of every item with global frequency > N/capacity (pigeonhole).
2. **Exact pass** — re-scan, keep only candidate keys (broadcast semi
   join), exact partial-combine count, global top-k.

When the true k-th frequency exceeds N/capacity the result is EXACT — the
standard production topology (the sketch bounds memory; the second scan
restores exactness), which is why the query layer can oracle-check it
against a plain ``GROUP BY / ORDER BY / LIMIT``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int = 512
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter candidates.

    Returns ``(key, lower_bound)`` — the surviving counters of each
    partition's MG summary (lower_bound is the residual counter value, a
    valid lower bound on partition-local frequency). Memory is O(capacity)
    per task regardless of distinct-key cardinality; input rows stream
    through Arrow batches without materializing the partition.

    The output ``key`` keeps the INPUT column's type (numeric ids stay
    numeric), so the exact second pass joins without a cross-type compare.
    """
    key_type = df.schema[key_col].dataType.simpleString()

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, cnt in pdf["key"].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < capacity:
                    counters[key] = int(cnt)
                else:
                    # decrement-all by the min of (incoming, current floor):
                    # batch-sized generalization of the classic -1 step
                    dec = min(int(cnt), min(counters.values()))
                    counters = {
                        k: v - dec for k, v in counters.items() if v > dec
                    }
                    rem = int(cnt) - dec
                    if rem > 0 and len(counters) < capacity:
                        counters[key] = rem
        yield pd.DataFrame(
            {
                # object dtype: Arrow casts to the declared key type; a
                # default numeric dtype would mangle e.g. string keys
                "key": pd.Series(list(counters), dtype=object),
                "lower_bound": pd.Series(
                    list(counters.values()), dtype="int64"
                ),
            }
        )

    return df.select(F.col(key_col).alias("key")).mapInPandas(
        mg, f"key {key_type}, lower_bound long"
    )


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int = 20, capacity: int = 512
) -> DataFrame:
    """Exact top-k keys by frequency via the two-pass sketch topology.

    Pass 1 (``misra_gries_candidates``) bounds memory; pass 2 counts only
    candidate keys exactly (broadcast left-semi join — the corpus never
    shuffles on the open key domain, only on the bounded candidate set) and
    takes the global top-k with a deterministic ``(count desc, key asc)``
    tiebreak. Exact whenever the k-th frequency > N/capacity; callers size
    ``capacity`` to make that hold (a 512-counter summary covers any key
    with > 0.2% mass)."""
    cands = misra_gries_candidates(df, key_col, capacity).select("key").distinct()
    counted = (
        df.select(F.col(key_col).alias("key"))
        .join(F.broadcast(cands), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counted.orderBy(F.col("cnt").desc(), F.col("key")).limit(k)


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 20,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic weight-proportional top-k sample: priority sampling
    (Duffield-Lund-Thorup, JACM 2007). Each item gets priority ``w / u``
    with ``u`` uniform on (0, 1]; the k highest priorities are the sample
    (inclusion probability increases with weight; the scheme admits
    unbiased subset-sum estimators via the (k+1)-th priority threshold).

    Randomness is DECLARED, not opaque: ``u = (md5_60(key) mod B + 1)/B``
    (first 60 md5 bits, the repo's cross-engine hash family) — reproducible
    across runs, partitionings, and engines (the oracle replays the same
    integers), the same discipline as the KMV and MinHash sketches.
    ``w / u`` is a single IEEE division of exactly-represented values, so
    priorities are bit-identical everywhere; no transcendentals (the
    exponential-race formulation needs ``log``, whose last ulp is
    libm-dependent).

    Plan: map-side priority projection + TakeOrderedAndProject — no global
    sort, no shuffle beyond the top-k reduction. O(k) driver memory.
    """
    from fxspark.ops.dedup import base_hash

    u = (
        F.pmod(
            base_hash(F.col(key_col).cast("string"), "md5_60"), F.lit(buckets)
        )
        + 1
    ) / F.lit(float(buckets))
    pr = F.col(weight_col).cast("double") / u
    return (
        df.withColumn("_pr", pr)
        .orderBy(F.col("_pr").desc(), F.col(key_col))
        .limit(k)
        .withColumn("priority", F.round(F.col("_pr"), 6))
        .drop("_pr")
    )


def bloom_membership_prefilter(
    corpus,
    bench,
    id_col: str,
    text_col: str,
    n: int = 4,
    m_bits: int = 1 << 20,
    k: int = 4,
):
    """Bloom-style membership prefilter for benchmark decontamination, with
    DECLARED hashing so the candidate set (false positives included) is
    bit-reproducible by any engine.

    Each n-gram maps to ``k`` bit positions by double hashing (Kirsch-
    Mitzenmacher): ``pos_i = (h1 + i*h2) mod m`` with ``h1, h2`` carved from
    the 60-bit md5 hash (``h2`` forced odd so the stride cycles the
    power-of-two ring). The benchmark side becomes a deduplicated set of
    int positions — ~8 bytes per gram-position regardless of gram length,
    the compact broadcast object a 100 TB sweep wants (the corpus side
    never shuffles; membership is a map-side broadcast join on ints). A
    gram is bloom-POSITIVE iff all ``k`` of its positions are present —
    exactly a Bloom filter's semantics, so genuine overlaps are never
    missed and the false-positive rate is the classic ``(1-e^{-kn/m})^k``.

    Emits per corpus doc: ``n_candidate_grams`` (bloom-positive) and
    ``n_exact_grams`` (verified against the real gram set) — candidates
    minus exact IS the realized false-positive count, so the prefilter's
    precision is observable in the result.
    """
    from pyspark.sql import functions as F

    from fxspark.ops.dedup import base_hash, shingles

    mask = m_bits - 1

    def positions(col):
        h = base_hash(col, "md5_60")
        h1 = h.bitwiseAND(F.lit(mask))
        h2 = (
            F.shiftright(h, 20).bitwiseAND(F.lit(mask)).bitwiseOR(F.lit(1))
        )
        return [
            (h1 + F.lit(i) * h2).bitwiseAND(F.lit(mask)) for i in range(k)
        ]

    bench_grams = (
        bench.select(F.explode(shingles(F.col(text_col), n)).alias("_g"))
        .distinct()
    )
    bench_pos = (
        bench_grams.select(
            F.explode(F.array(*positions(F.col("_g")))).alias("_p")
        ).distinct()
    )
    tr = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), n)).alias("_g"),
    )
    probe = tr.select(
        "_id", "_g", F.explode(F.array(*positions(F.col("_g")))).alias("_p")
    )
    cand = (
        probe.join(F.broadcast(bench_pos), "_p")
        .groupBy("_id", "_g")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_candidate_grams"))
    )
    exact = (
        tr.join(F.broadcast(bench_grams), "_g", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_exact_grams"))
    )
    return (
        cand.join(exact, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_candidate_grams",
            F.coalesce(F.col("n_exact_grams"), F.lit(0)).alias(
                "n_exact_grams"
            ),
        )
    )
