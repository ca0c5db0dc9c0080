"""Property tests: the as-of join family vs pandas.merge_asof.

pandas' ``merge_asof`` is an independent reference implementation of the
same point-in-time semantics (backward / forward / nearest); these
properties drive generated keyed time-series through both and require
row-identical matches — covering duplicate timestamps on the LEFT side,
empty right groups, and out-of-band tolerances that hand-written examples
miss. (Right-side duplicate timestamps are excluded: with ties pandas
keeps input order while the distributed form needs an explicit
``right_tiebreak`` — that contract is pinned separately in
``test_round6_wave3.py``.)
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# keyed event times: tiny key pool, second-granularity offsets
_BASE = pd.Timestamp("2024-01-01 00:00:00")

left_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=120),
    ),
    min_size=1,
    max_size=8,
)
# distinct right offsets per key are enforced in the test body
right_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=120),
    ),
    min_size=1,
    max_size=8,
)


def _frames(spark, left_rows, right_rows):
    right_rows = list({(k, t) for k, t in right_rows})  # unique right times
    lpd = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [_BASE + pd.Timedelta(seconds=t) for _, t in left_rows],
            "lid": range(len(left_rows)),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": [k for k, _ in right_rows],
            "ts": [_BASE + pd.Timedelta(seconds=t) for _, t in right_rows],
            "v": [t for _, t in right_rows],
        }
    )
    l = spark.createDataFrame(lpd)
    r = spark.createDataFrame(rpd)
    return lpd, rpd, l, r


def _pandas_asof(lpd, rpd, direction, tol_s=None):
    out = pd.merge_asof(
        lpd.sort_values(["ts", "lid"]),
        rpd.sort_values("ts"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol_s) if tol_s is not None else None,
    )
    return {int(row.lid): row.v for row in out.itertuples()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=left_strategy, right=right_strategy)
def test_asof_backward_forward_match_pandas(spark, left, right):
    from fxspark.ops.asof import asof_join

    lpd, rpd, l, r = _frames(spark, left, right)
    for direction in ("backward", "forward"):
        got = {
            row["lid"]: row["v"]
            for row in asof_join(
                l, r, "k", "ts", right_payload=["v"], direction=direction
            ).collect()
        }
        want = _pandas_asof(lpd, rpd, direction)
        norm = lambda d: {  # noqa: E731
            k: (None if pd.isna(v) else int(v)) for k, v in d.items()
        }
        assert norm(got) == norm(want), direction


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=left_strategy, right=right_strategy, tol=st.integers(1, 40))
def test_nearest_join_matches_pandas(spark, left, right, tol):
    from fxspark.ops.asof import nearest_join

    lpd, rpd, l, r = _frames(spark, left, right)
    got = {
        row["lid"]: row["v"]
        for row in nearest_join(
            l, r, "k", "ts",
            right_payload=["v"],
            tolerance=F.expr(f"INTERVAL {tol} SECONDS"),
        ).collect()
    }
    want = _pandas_asof(lpd, rpd, "nearest", tol_s=tol)
    norm = lambda d: {  # noqa: E731
        k: (None if pd.isna(v) else int(v)) for k, v in d.items()
    }
    assert norm(got) == norm(want)


# ---------------------------------------------------------------------------
# Z-set maintenance property: maintained state == from-scratch recompute
# ---------------------------------------------------------------------------

zset_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(base=zset_strategy, ins=zset_strategy)
def test_delta_agg_equals_recompute_under_random_batches(spark, base, ins):
    """For ANY base multiset and ANY insert batch that also retracts a
    prefix of the base rows, folding the signed delta into the maintained
    state must equal a from-scratch aggregate over the net row set."""
    from pyspark.sql import functions as F

    from fxspark.ops.ivm import delta_agg

    bpd = pd.DataFrame(base, columns=["k", "v"]).astype({"v": "float64"})
    ipd = pd.DataFrame(ins, columns=["k", "v"]).astype({"v": "float64"})
    # retract the first half of the base rows
    rpd = bpd.iloc[: len(bpd) // 2]
    bdf = spark.createDataFrame(bpd)
    state = bdf.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("v"),
    )
    delta_pd = pd.concat(
        [ipd.assign(sign=1), rpd.assign(sign=-1)], ignore_index=True
    )
    delta = spark.createDataFrame(delta_pd)
    got = {
        r["k"]: (r["n_rows"], float(r["v"]))
        for r in delta_agg(state, delta, ["k"], ["v"], sign_col="sign").collect()
    }
    net = pd.concat([bpd.iloc[len(bpd) // 2 :], ipd], ignore_index=True)
    want = {
        k: (int(g["v"].count()), float(g["v"].sum()))
        for k, g in net.groupby("k")
        if len(g) > 0
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=0.0, max_value=1000.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=2,
        max_size=40,
    )
)
def test_histogram_quantile_within_one_bin_of_exact(spark, vals):
    """The 64-bin histogram quantile estimate must land within one bin
    width ABOVE the exact quantile (it returns the upper edge of the
    crossing bin) for any value distribution."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(v),) for v in vals], "value double"
    )
    mn, mx = min(vals), max(vals)
    width = (mx - mn) / 64
    if width <= 0:
        return  # degenerate: all values equal, bin arithmetic undefined
    stats = df.agg(
        F.min("value").alias("mn"),
        ((F.max("value") - F.min("value")) / 64).alias("width"),
    )
    binned = df.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.lit(63),
            F.floor((F.col("value") - F.col("mn")) / F.col("width")),
        )
        .cast("int")
        .alias("bin")
    )
    bc = (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin")
        .collect()
    )
    n = len(vals)
    ordered = sorted(vals)
    for q100 in (50, 90):
        cum = 0
        crossing = None
        for r in bc:
            cum += r["cnt"]
            if cum * 100 >= q100 * n:
                crossing = r["bin"]
                break
        est = mn + (crossing + 1) * width
        # the sketch estimates the RANK-based quantile (smallest v with
        # cdf >= q): that order statistic must lie inside the crossing bin
        k = -(-q100 * n // 100)  # ceil(q*n)
        v_k = ordered[int(k) - 1]
        assert mn + crossing * width - 1e-9 <= v_k <= est + 1e-9, (
            q100, crossing, v_k, est, width,
        )
