"""Single-pass data-quality checks via the Observation API.

The reference validates nothing at ingest (SURVEY.md §5 — no assertions
anywhere); its only guard is the DB schema. A 100 TB pipeline can't afford
validation re-scans either, so these checks ride the SAME action that
materializes the batch: ``df.observe`` attaches aggregate metrics to the
plan, computed by the running job at zero extra passes — the Spark-first
replacement for "write, then SELECT count(*) to check".

Usage::

    checked, obs = observe_checks(df, key=["ccy_couple", "date"],
                                  not_null=["rate"],
                                  ranges={"rate": (0, 1e6)})
    checked.write...            # any action
    violations = obs.get        # dict of metric -> count

``check_report`` turns the observed dict into (constraint, violations) rows.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class ContractViolation(ValueError):
    """An input-contract breach (e.g. a key declared unique has duplicate
    rows). Raised by :func:`assert_unique` so that queries whose
    DETERMINISM rests on a FIXTURES.md data contract fail TYPED instead of
    silently returning entity-miscounted answers — the failure mode the
    round-14 ``sf_dups`` probe measured (12 registry queries, and the
    kmeans duplicate-id collapse before it was fixed)."""


def key_violations(df: DataFrame, keys: Sequence[str] | str) -> DataFrame:
    """The duplicated key tuples of ``df``: ``keys + dup_count`` rows for
    every key appearing more than once. Lazy and cheap — ONE hash
    aggregate with map-side partial combine (the same shape as any
    grouped count), no window, no sort; at 100 TB it shuffles one row
    per distinct key."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def assert_unique(
    df: DataFrame,
    keys: Sequence[str] | str,
    *,
    sample: int = 5,
    context: str | None = None,
) -> DataFrame:
    """Runtime gate for a declared-unique key: returns ``df`` unchanged if
    ``keys`` is unique, else raises :class:`ContractViolation` naming up
    to ``sample`` offending key tuples. The check is one bounded action
    (``limit(sample)`` collect over :func:`key_violations` — never an
    unbounded pull); it costs one extra job, so hot paths gate it behind
    :func:`require_unique` instead of calling this unconditionally."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    bad = key_violations(df, keys).limit(sample).collect()
    if bad:
        where = f" in {context}" if context else ""
        shown = ", ".join(
            "(" + ", ".join(f"{k}={r[k]!r}" for k in keys)
            + f") ×{r['dup_count']}"
            for r in bad
        )
        raise ContractViolation(
            f"key {keys} declared unique{where} has duplicate rows: "
            f"{shown}{' …' if len(bad) == sample else ''}"
        )
    return df


def quarantine_duplicates(
    df: DataFrame, keys: Sequence[str] | str
) -> tuple[DataFrame, DataFrame]:
    """Quarantine split for a declared-unique key: ``(clean, quarantined)``
    where ``quarantined`` holds EVERY row of every key that appears more
    than once (resolution policy — e.g. last-writer-wins — belongs to
    ``ops.latest.dedup_latest``, not here) plus a ``quarantine_reason``
    column, mirroring the ingest quarantine contract
    (``fxspark/ingest.py``). One shuffle on ``keys`` (a window count), no
    collect — the distributed sibling of :func:`assert_unique` for
    pipelines that want to keep flowing on the clean subset."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    from pyspark.sql import Window

    n = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    marked = df.withColumn("_keycnt", n)
    clean = marked.filter(F.col("_keycnt") == 1).drop("_keycnt")
    quarantined = (
        marked.filter(F.col("_keycnt") > 1)
        .drop("_keycnt")
        .withColumn(
            "quarantine_reason",
            F.lit("duplicate key (" + ", ".join(keys) + ")"),
        )
    )
    return clean, quarantined


def contracts_enforced() -> bool:
    """True when runtime input-contract validation is switched on via
    ``FXSPARK_VALIDATE_CONTRACTS=1``. Default OFF: the driver testdata
    honors the declared contracts (FIXTURES.md), and an extra gate job
    per query is exactly the validation re-scan this module's header
    says a 100 TB pipeline can't afford on every run. Probe runs (the
    ``sf_dups`` class) flip it on to turn silent wrong answers into
    :class:`ContractViolation`."""
    return os.environ.get("FXSPARK_VALIDATE_CONTRACTS", "") == "1"


def require_unique(
    df: DataFrame,
    keys: Sequence[str] | str,
    context: str | None = None,
) -> DataFrame:
    """Declare-and-optionally-enforce a unique-key PRECONDITION: identity
    (zero cost, not even a plan node) unless :func:`contracts_enforced`,
    then :func:`assert_unique`. Call sites are the registry queries whose
    determinism the round-14 ``sf_dups`` probe showed resting on
    FIXTURES.md key uniqueness (entity-keyed dedup/ANN, as-of enrich,
    id-tied argmax)."""
    if not contracts_enforced():
        return df
    return assert_unique(df, keys, context=context)


def observe_checks(
    df: DataFrame,
    key: Sequence[str] | None = None,
    not_null: Sequence[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    name: str = "checks",
) -> tuple[DataFrame, Observation]:
    """Attach constraint metrics to ``df``'s next action.

    - ``rows``: total rows seen.
    - ``null__c``: NULL count per ``not_null`` column.
    - ``range__c``: out-of-[lo, hi] count per ``ranges`` entry.
    - ``dupkey_extra_approx``: rows minus approx-distinct ``key`` tuples
      (≈0 ⇔ key unique). Exact DISTINCT aggregates are rejected inside
      observed metrics (INVALID_OBSERVED_METRICS), so this is the HLL++
      estimate (rsd 1%) — 0 is exact for small cardinalities (sparse HLL),
      and a materially positive value always means real duplicates at a
      magnitude the 1% error can't fake.

    Returns the observed frame (use IT, not the input, in the downstream
    action) and the Observation handle.
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in not_null or ():
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null__{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        bad = ~F.col(c).between(lo, hi) | F.col(c).isNull()
        metrics.append(F.sum(bad.cast("long")).alias(f"range__{c}"))
    if key:
        metrics.append(
            (F.count(F.lit(1))
             - F.approx_count_distinct(F.struct(*[F.col(k) for k in key]), 0.01))
            .alias("dupkey_extra_approx")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def check_report(observed: dict) -> list[tuple[str, int]]:
    """(constraint, violation_count) rows from an Observation result, total
    row count first, constraints sorted for stable output."""
    rows = [("rows", observed["rows"])]
    rows += sorted((k, v) for k, v in observed.items() if k != "rows")
    return rows


def profile_table(df: DataFrame, kmv_k: int = 256) -> DataFrame:
    """Generic column profiler: one row per column with null count, a KMV
    distinct ESTIMATE (declared md5 randomness — the ``events_kmv_distinct``
    family, so the approximate number is itself reproducible), and
    min/max/mean for numeric columns — the schema-discovery report a
    warehouse runs before designing partitioning or joins on an unknown
    100 TB table.

    Plan shape: TWO jobs regardless of column count. Job 1 computes every
    column's null/min/max/mean counters simultaneously in one partial/final
    hash agg (no per-column re-scan). Job 2 melts the table map-side into
    (column, hash) pairs and takes each column's k smallest hashes with a
    TWO-PHASE rank: first the k smallest DISTINCT hashes per (column, input
    partition) — a window whose partition count scales with the data, each
    sorting only one scan-partition's worth of one column — then the final
    per-column rank over the <= k x numPartitions survivors.  A single
    window partitioned only by column would funnel every distinct value of
    a high-cardinality column (a unique id) through one task; the local
    phase bounds the global phase's input to k per contributing partition.
    Output is columns-sized. Strings profile as null/distinct only;
    numerics add range and a decimal-exact mean.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    numeric = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, NumericType)
    }
    for f in df.schema.fields:
        c = f.name
        # count(when), not sum(cast): an EMPTY table must profile to
        # n_null = 0, not SUM's NULL (which crashed the int() below —
        # round-14 sf_empty registry sweep); identical on non-empty input.
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_null_{c}")
        )
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
            aggs.append(
                (
                    F.sum(F.col(c).cast("decimal(38,6)")).cast("double")
                    / F.count(c)
                ).alias(f"_mean_{c}")
            )
    stats = df.agg(*aggs).collect()[0]  # one row: bounded by column count
    n_rows = int(stats["_n_rows"])

    # one map-side melt -> per-column k-smallest declared-hash fractions
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f.name).alias("column"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.col(f.name).cast("string")), 1, 15
                                ),
                                16,
                                10,
                            ).cast("long")
                            / F.lit(float(2**60))
                        ).alias("h"),
                    )
                    for f in df.schema.fields
                ]
            )
        ).alias("_p")
    ).select("_p.column", "_p.h").filter(F.col("h").isNotNull())
    # phase 1: k smallest distinct hashes per (column, scan partition) —
    # dense_rank counts distinct h, so duplicates of a kept value survive
    # here and collapse in the map-side combine of the distinct below
    w_local = Window.partitionBy("column", "_pid").orderBy("h")
    local = (
        pairs.withColumn("_pid", F.spark_partition_id())
        .withColumn("_dr", F.dense_rank().over(w_local))
        .filter(F.col("_dr") <= kmv_k)
        .select("column", "h")
        .distinct()
    )
    # phase 2: final rank over <= k * numPartitions survivors per column
    w = Window.partitionBy("column").orderBy("h")
    kmin = (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= kmv_k)
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("_seen"), F.max("h").alias("_kth"))
        .collect()
    )
    ests = {
        r["column"]: (
            int(r["_seen"])
            if r["_seen"] < kmv_k
            else int(round((kmv_k - 1) / r["_kth"]))
        )
        for r in kmin
    }

    spark = df.sparkSession
    rows = []
    for f in df.schema.fields:
        c = f.name
        num = c in numeric
        rows.append(
            {
                "column": c,
                "dtype": f.dataType.simpleString(),
                "n_rows": n_rows,
                "n_null": int(stats[f"_null_{c}"]),
                "est_distinct": ests.get(c, 0),
                "min_val": (
                    float(stats[f"_min_{c}"])
                    if num and stats[f"_min_{c}"] is not None
                    else None
                ),
                "max_val": (
                    float(stats[f"_max_{c}"])
                    if num and stats[f"_max_{c}"] is not None
                    else None
                ),
                "mean_val": (
                    float(stats[f"_mean_{c}"])
                    if num and stats[f"_mean_{c}"] is not None
                    else None
                ),
            }
        )
    return spark.createDataFrame(
        rows,
        "column string, dtype string, n_rows long, n_null long, "
        "est_distinct long, min_val double, max_val double, mean_val double",
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit: the quasi-identifier combinations whose
    equivalence class holds FEWER than ``k`` rows — each such combo is a
    re-identification risk (an attacker who knows those attributes pins a
    person to under k candidates). Returns one row per risky combo:
    ``(quasi_cols…, n_rows)``, empty ⇔ the table is k-anonymous under the
    declared quasi-identifiers.

    One partial-aggregated groupBy + a HAVING filter — auditing a 100 TB
    release costs a count rollup; the output is bounded by the number of
    SMALL classes, which is the long tail the release must suppress or
    generalize anyway. Complements ``observe_checks`` (which rides the
    write) as the pre-release privacy gate.
    """
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )
