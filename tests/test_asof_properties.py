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
