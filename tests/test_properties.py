"""Hypothesis property tests over generated frames (SURVEY.md §5).

Each property is an algebraic invariant the operators must hold for ANY
input, not just the fixtures: upsert idempotence/commutativity-of-rerun,
agg-vs-window latest agreement, and dedup count conservation. Examples are
deliberately few (Spark round-trips are ~1s each); the value is the
generated edge cases — duplicate keys, ties, single-row groups.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from fxspark.ops.latest import dedup_latest, latest_per_key_agg, latest_per_key_window
from fxspark.sink import insert_absent, upsert

# (key, order, value) triples: tiny key pool forces collisions; order ties
# are possible and must not break determinism of keyed results.
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1,
    max_size=12,
)

SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, o=o, v=v, uid=i) for i, (k, o, v) in enumerate(rows)]
    )


@given(rows=rows_strategy)
@SETTINGS
def test_upsert_idempotent_fixpoint(spark, rows):
    """upsert(upsert(x), x) == upsert(x): re-delivering the same batch can
    never change the store (the reference's ON DUPLICATE KEY semantics)."""
    df = _df(spark, rows)
    once = upsert(None, df, keys=["k", "o"], order_by=["uid"])
    twice = upsert(once, df, keys=["k", "o"], order_by=["uid"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=rows_strategy)
@SETTINGS
def test_upsert_keeps_exactly_one_row_per_key(spark, rows):
    df = _df(spark, rows)
    out = upsert(None, df, keys=["k", "o"], order_by=["uid"]).collect()
    keys = [(r["k"], r["o"]) for r in out]
    assert len(keys) == len(set(keys))
    assert set(keys) == {(k, o) for k, o, _ in rows}


@given(rows=rows_strategy)
@SETTINGS
def test_insert_absent_never_overwrites(spark, rows):
    """insert-if-absent: once a key is in the store, later batches can never
    change its row (v1 duplicate-swallow semantics)."""
    df = _df(spark, rows)
    store = insert_absent(None, df, keys=["k", "o"])
    shifted = df.withColumn("v", df["v"] + 1)
    after = insert_absent(store, shifted, keys=["k", "o"])
    assert sorted(map(tuple, store.collect())) == sorted(map(tuple, after.collect()))


@given(rows=rows_strategy)
@SETTINGS
def test_latest_agg_equals_window_property(spark, rows):
    """max_by-aggregate and row_number-window forms of latest-per-key must
    agree on every input (same total order (o, uid))."""
    df = _df(spark, rows)
    a = latest_per_key_agg(df, "k", ["o", "uid"], payload=["v"])
    w = latest_per_key_window(df, "k", ["o", "uid"]).select("k", "v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, w.collect()))


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_latest_conserves_distinct_keys(spark, rows):
    df = _df(spark, rows)
    out = dedup_latest(df, ["k"], ["o", "uid"])
    assert out.count() == len({k for k, _, _ in rows})
