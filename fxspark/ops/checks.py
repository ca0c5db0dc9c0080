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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


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
