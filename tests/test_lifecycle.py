"""Unit tests for the warehouse-lifecycle operators (round 5): SCD2,
snapshot diff, funnel, priority sampling, PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_scd2_collapses_noop_changes_and_builds_intervals(spark):
    from fxspark.ops.cdc import scd2_intervals

    rows = [
        # user 1: A, A (no-op), B, B (no-op), A  -> 3 versions
        (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "B"), (1, 5, "A"),
        # user 2: single state -> 1 current version
        (2, 1, "X"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, state string")
    out = scd2_intervals(df, "user_id", ["ts"], ["state"]).collect()
    u1 = sorted(
        [r for r in out if r.user_id == 1], key=lambda r: r.valid_from
    )
    assert [(r.state, r.valid_from, r.valid_to) for r in u1] == [
        ("A", 1, 3), ("B", 3, 5), ("A", 5, None),
    ]
    assert [r.is_current for r in u1] == [False, False, True]
    (u2,) = [r for r in out if r.user_id == 2]
    assert (u2.state, u2.valid_to, u2.is_current) == ("X", None, True)


def test_scd2_null_attr_transitions_are_changes(spark):
    from fxspark.ops.cdc import scd2_intervals

    rows = [(1, 1, "A"), (1, 2, None), (1, 3, None), (1, 4, "A")]
    df = spark.createDataFrame(rows, "k long, ts long, v string")
    out = sorted(
        scd2_intervals(df, "k", ["ts"], ["v"]).collect(),
        key=lambda r: r.valid_from,
    )
    # NULL -> value and value -> NULL are version changes; NULL -> NULL not.
    assert [(r.v, r.valid_from) for r in out] == [
        ("A", 1), (None, 2), ("A", 4),
    ]


def test_snapshot_diff_classifies_all_change_types(spark):
    from fxspark.ops.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k long, v double",
    )
    new = spark.createDataFrame(
        [(2, 21.0), (3, None), (4, 40.0), (5, 50.0)],
        "k long, v double",
    )
    out = {r.k: r for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert out[1].change_type == "delete"
    assert out[2].change_type == "update"
    assert (out[2].old_v, out[2].new_v) == (20.0, 21.0)
    assert out[5].change_type == "insert"
    # unchanged keys (3: NULL==NULL null-safely; 4: equal) are dropped
    assert 3 not in out and 4 not in out


def test_funnel_requires_strict_stage_order(spark):
    from fxspark.ops.windows import funnel_stages

    rows = [
        # user 1 completes the funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        # user 2: click BEFORE first view -> funnel stops at view
        (2, 20, "click"), (2, 30, "view"),
        # user 3: reaches click, never buys
        (3, 10, "view"), (3, 15, "click"),
        # user 4 never views -> not in output
        (4, 10, "buy"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, stage string")
    out = {
        r.u: r
        for r in funnel_stages(
            df, "u", "ts", "stage", ["view", "click", "buy"]
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1].t_view, out[1].t_click, out[1].t_buy) == (10, 20, 30)
    assert (out[2].t_view, out[2].t_click) == (30, None)
    assert (out[3].t_click, out[3].t_buy) == (15, None)


def test_priority_sample_is_deterministic_and_weight_biased(spark):
    from fxspark.ops.sketch import weighted_priority_sample

    df = spark.createDataFrame(
        [(i, 1 if i < 90 else 1000) for i in range(100)], "k long, w long"
    )
    a = weighted_priority_sample(df, "k", "w", k=10).collect()
    b = weighted_priority_sample(
        df.repartition(7), "k", "w", k=10
    ).collect()
    assert [r.k for r in a] == [r.k for r in b]  # partitioning-independent
    heavy = sum(1 for r in a if r.w == 1000)
    assert heavy >= 8  # 10 items with 1000x weight dominate the sample


def test_pagerank_matches_uniform_star_closed_form(spark):
    from fxspark.ops.graph import pagerank

    # star: every leaf points at the hub, hub points at leaf 1
    edges = spark.createDataFrame(
        [("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("hub", "l1")],
        "src string, dst string",
    )
    ranks = {
        r.node: r.rank for r in pagerank(edges, n_iter=20).collect()
    }
    assert ranks["hub"] == max(ranks.values())
    assert ranks["l2"] == pytest.approx(ranks["l3"])  # symmetric leaves
    # leaf 1 gets the hub's mass on top of teleport
    assert ranks["l1"] > ranks["l2"]
    # total mass = teleport mass + damped in-flow; with no dangling nodes
    # (every node here has an out-edge) the sum stays 1
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_weighted_split_proportional(spark):
    from fxspark.ops.graph import pagerank

    # a splits 3:1 between b and c; b and c return to a
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    ranks = {
        r.node: r.rank
        for r in pagerank(edges, weight="w", n_iter=30).collect()
    }
    # in steady state b's damped in-flow is 3x c's
    t = 0.15 / 3
    assert (ranks["b"] - t) / (ranks["c"] - t) == pytest.approx(3.0, rel=1e-3)


def test_bloom_prefilter_no_false_negatives(spark):
    from fxspark.ops.sketch import bloom_membership_prefilter

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta zeta"),   # shares 1 4-gram
            (2, "totally unrelated words here now"),
            (3, "alpha beta gamma delta epsilon extra"),  # shares 2
        ],
        "id long, text string",
    )
    out = {
        r.id: r
        for r in bloom_membership_prefilter(
            corpus, bench, "id", "text", n=4
        ).collect()
    }
    # every true overlap is bloom-positive (no false negatives)...
    assert out[1].n_exact_grams == 1 and out[1].n_candidate_grams >= 1
    assert out[3].n_exact_grams == 2 and out[3].n_candidate_grams >= 2
    # ...and candidates never undercount the exact set
    for r in out.values():
        assert r.n_candidate_grams >= r.n_exact_grams


def test_peak_concurrency_sweep_line(spark, sf_dir):
    import fxspark.queries as Q

    out = {
        r.day.date().isoformat(): r.peak_concurrent
        for r in Q.QUERIES["peak_concurrent_users"](spark, sf_dir).collect()
    }
    # peak is at least 1 on any day with events and never exceeds the
    # number of users active that day
    from fxspark.session import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    dau = {
        r.d.isoformat(): r.n
        for r in events.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(dau)
    for d, peak in out.items():
        assert 1 <= peak <= dau[d]
