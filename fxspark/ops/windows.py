"""Recency / time-window operators (SURVEY.md §2.3 Q2-Q3, §2.4 O2).

The reference defines "active" rows as those ingested within 30 s of the global
max ingestion time — ``timestamp >= (SELECT MAX(timestamp) FROM t) - INTERVAL
30 SECOND`` (``/root/reference/Fx_1min.py:149-157``).

Scale notes: the global max is a full-column aggregate, but with partial
(map-side) aggregation it ships ONE value per partition; the subsequent filter
is then evaluated scan-side. On a time-partitioned table the max can prune to
the newest partitions only. The broadcast of the 1-row aggregate replaces the
scalar subquery; Catalyst plans the same thing for the SQL form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def active_window(df: DataFrame, ts_col: str, horizon: Column) -> DataFrame:
    """Rows with ``ts_col`` within ``horizon`` of the global max ``ts_col``.

    ``horizon`` is an interval column, e.g. ``F.expr("INTERVAL 30 SECONDS")``
    (the reference's literal at ``Fx_1min.py:156``).
    """
    max_ts = df.agg(F.max(ts_col).alias("_max_ts"))
    return (
        df.join(F.broadcast(max_ts))
        .filter(F.col(ts_col) >= F.col("_max_ts") - horizon)
        .drop("_max_ts")
    )


def time_bucket(col: Column, unit: str) -> Column:
    """Truncate a timestamp to a bucket (``date_trunc``) — the hypertable
    rollup primitive; combine with ``groupBy`` for time-series rollups."""
    return F.date_trunc(unit, col)


def sessionize(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    gap: Column,
) -> DataFrame:
    """Gap-based session assignment (the batch analog of streaming session
    windows): a new session starts when the time since the previous event of
    the same key exceeds ``gap``.

    Adds ``session_id`` (0-based per key). Single shuffle+sort on the key;
    the two stacked windows share one exchange/sort (same partitioning).
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_new_sess", is_new).withColumn(
        "session_id",
        F.sum("_new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    ).drop("_new_sess")


def keyed_ewma(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
):
    """Per-key exponentially-weighted moving average as a DECLARED
    sequential fold: collect the key's values in event order, seed with the
    first, fold ``ewma = α·x + (1−α)·ewma`` — the batch twin of
    ``streaming.stateful.stateful_pair_stats``'s state recurrence
    (parity-pinned by test), and the pattern for any order-dependent
    per-key recurrence Spark's frame-based windows can't express.

    Scale shape: one shuffle on the key; per-key state materializes as an
    in-row array, so this holds while a single key's history fits a row
    (~millions of events) — beyond that, the streaming operator IS the
    scale path (state store, incremental). Sequential fold order makes the
    result exactly reproducible by any engine folding the same order
    (DuckDB ``list_reduce``)."""
    ordered = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(value_col)))
    )
    vals = F.transform(ordered, lambda s: s[value_col].cast("double"))
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_total"),
        fold.alias("_ewma"),
        F.element_at(vals, -1).alias("last_value"),
    ).select(
        key_col, "n_total", F.col("_ewma").alias("ewma"), "last_value"
    )
