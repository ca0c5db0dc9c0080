"""Round-5 second-wave operators: grouped OLS, CUSUM closed form,
grid interpolation — each pinned against an independent reference
implementation (numpy / naive recurrence / hand interpolation)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_grouped_ols_matches_numpy(spark):
    rows = []
    rng = np.random.RandomState(7)
    for k in range(5):
        xs = np.sort(rng.randint(0, 1_000_000, size=40))
        ys = 0.5 * k * xs / 86400.0 + 10 * k + rng.randn(40)
        rows += [(k, int(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "k int, x long, y double")

    from fxspark.ops.stats import grouped_ols

    got = {
        r["k"]: r
        for r in grouped_ols(df, "k", F.col("x"), F.col("y")).collect()
    }
    for k in range(5):
        xs = np.array([x for kk, x, _ in rows if kk == k], dtype=np.float64)
        ys = np.array([y for kk, _, y in rows if kk == k], dtype=np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[k]["n_obs"] == 40
        assert got[k]["slope"] == pytest.approx(slope, rel=1e-6)
        assert got[k]["intercept"] == pytest.approx(intercept, rel=1e-5)


def test_grouped_ols_degenerate_key_is_null_not_crash(spark):
    # one observation, and a key whose x values are all identical:
    # det == 0 in both cases -> NULL fit, no division error
    df = spark.createDataFrame(
        [(1, 5, 2.0), (2, 7, 1.0), (2, 7, 3.0)], "k int, x long, y double"
    )
    from fxspark.ops.stats import grouped_ols

    got = {
        r["k"]: r
        for r in grouped_ols(df, "k", F.col("x"), F.col("y")).collect()
    }
    assert got[1]["slope"] is None and got[1]["intercept"] is None
    assert got[2]["slope"] is None and got[2]["intercept"] is None


def _naive_cusum(vals, target, slack):
    s, out = 0.0, []
    for v in vals:
        s = max(0.0, s + (v - target - slack))
        out.append(s)
    return out


def test_keyed_cusum_equals_naive_recurrence(spark):
    rng = np.random.RandomState(3)
    rows = []
    series = {}
    for k in range(4):
        vals = list(np.round(rng.randn(120) + (0.3 if k % 2 else 0.0), 4))
        series[k] = vals
        rows += [(k, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, i int, v double")

    from fxspark.ops.windows import keyed_cusum

    got = (
        keyed_cusum(
            df,
            keys="k",
            order=["i"],
            value_col="v",
            target=F.lit(0.0),
            slack=0.1,
            threshold=2.0,
        )
        .orderBy("k", "i")
        .collect()
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r["k"], []).append(r)
    for k, vals in series.items():
        ref = _naive_cusum(vals, 0.0, 0.1)
        assert len(by_key[k]) == len(vals)
        for r, want in zip(by_key[k], ref):
            assert r["cusum"] == pytest.approx(want, abs=1e-9)
            assert r["alert"] == (r["cusum"] > 2.0)


def test_grid_interpolate_linear_and_exact_hits(spark):
    # key 1: obs at t=10 (v=1.0) and t=70 (v=7.0), grid step 30
    #   -> grid points 30 (v=3.0) and 60 (v=6.0); t=0/90 outside span
    # key 2: obs exactly ON a grid point -> observed value, not interp
    df = spark.createDataFrame(
        [
            (1, 10, 1.0),
            (1, 70, 7.0),
            (2, 30, 5.0),
            (2, 90, 11.0),
        ],
        "k int, sec long, v double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")

    from fxspark.ops.windows import grid_interpolate

    got = {
        (r["k"], r["grid_ts"].timestamp()): r["value"]
        for r in grid_interpolate(df, "k", "ts", "v", 30).collect()
    }
    assert got[(1, 30.0)] == pytest.approx(3.0)
    assert got[(1, 60.0)] == pytest.approx(6.0)
    assert got[(2, 30.0)] == pytest.approx(5.0)  # exact hit -> observed
    assert got[(2, 60.0)] == pytest.approx(8.0)
    assert got[(2, 90.0)] == pytest.approx(11.0)  # exact hit at right edge
    assert (1, 0.0) not in got and (1, 90.0) not in got


def test_grid_interpolate_monotone_between_obs(spark):
    # interpolated values always lie between neighbouring observations
    rng = np.random.RandomState(11)
    secs = np.sort(rng.choice(np.arange(0, 5000), size=60, replace=False))
    vals = np.round(rng.rand(60) * 100, 3)
    df = spark.createDataFrame(
        [(1, int(s), float(v)) for s, v in zip(secs, vals)],
        "k int, sec long, v double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")

    from fxspark.ops.windows import grid_interpolate

    rows = grid_interpolate(df, "k", "ts", "v", 60).collect()
    assert rows, "grid should be non-empty"
    obs = list(zip(secs.tolist(), vals.tolist()))
    for r in rows:
        t = r["grid_ts"].timestamp()
        lo = max((o for o in obs if o[0] <= t), key=lambda o: o[0])
        hi = min((o for o in obs if o[0] >= t), key=lambda o: o[0])
        lo_v, hi_v = sorted((lo[1], hi[1]))
        assert lo_v - 1e-9 <= r["value"] <= hi_v + 1e-9
        if hi[0] > lo[0]:
            frac = (t - lo[0]) / (hi[0] - lo[0])
            want = lo[1] + (hi[1] - lo[1]) * frac
            assert r["value"] == pytest.approx(want, abs=1e-9)


def test_skyline2d_matches_bruteforce(spark):
    rng = np.random.RandomState(5)
    pts = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.randint(0, 500, 300), rng.randint(0, 500, 300)))]
    # inject exact ties on both axes
    pts += [(1000, pts[0][1], pts[0][2]), (1001, 0, 0), (1002, 0, 0)]
    df = spark.createDataFrame(pts, "id long, x long, y long")

    from fxspark.ops.skyline import skyline2d

    got = {r["id"] for r in skyline2d(df, "x", "y", n_buckets=8).collect()}
    want = set()
    for i, x, y in pts:
        dominated = any(
            bx <= x and by >= y and (bx < x or by > y) for _, bx, by in pts
        )
        if not dominated:
            want.add(i)
    assert got == want and want


def test_skyline2d_single_bucket_degenerate(spark):
    # all x identical -> one bucket; only max-y rows survive (ties together)
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 9), (3, 10, 9)], "id long, x long, y long"
    )
    from fxspark.ops.skyline import skyline2d

    got = {r["id"] for r in skyline2d(df, "x", "y").collect()}
    assert got == {2, 3}


def test_hashed_features_fixed_width_and_signed(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "z z z"), (3, "")], "doc_id long, text string"
    )
    from fxspark.ops.text import hashed_features

    rows = hashed_features(df, "doc_id", "text", n_buckets=8).collect()
    assert all(0 <= r["bucket"] < 8 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: one token 3x -> single bucket, |weight| == 3
    (r2,) = by_doc[2]
    assert abs(r2["weight"]) == 3
    # doc 1: a(3) and b(2) — either separate buckets (|3|,|2|) or a
    # collision (|3±2|); total signed mass is conserved either way
    assert sum(abs(r["weight"]) for r in by_doc[1]) in (1, 5)


def test_kmeans_lloyd_matches_numpy(spark):
    rng = np.random.RandomState(2)
    vecs = rng.randn(200, 8).round(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    seed = vecs[:4]
    cent0 = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(seed)],
        "cell int, cv array<double>",
    )
    from fxspark.ops.similarity import kmeans_lloyd

    got = {
        r["cell"]: r
        for r in kmeans_lloyd(df, "vec_id", "embedding", cent0, iters=3)
        .collect()
    }

    # reference Lloyd's in numpy (same seed, same tie rule)
    cents = seed.astype(np.float64)
    for _ in range(3):
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes lowest index on ties
        cents = np.stack(
            [vecs[assign == c].mean(axis=0) for c in range(len(seed))]
        )
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    for c in range(len(seed)):
        n = int((assign == c).sum())
        assert got[c]["n_vecs"] == n
        inertia = float(d2[assign == c, c].sum())
        assert got[c]["inertia"] == pytest.approx(inertia, rel=1e-6)
        l2 = float(np.sqrt((cents[c] ** 2).sum()))
        assert got[c]["centroid_l2"] == pytest.approx(l2, rel=1e-6)


def test_maintained_ols_equals_from_scratch(spark):
    """Incremental OLS: merging per-batch sufficient-statistic states (in
    any order) then fitting must equal grouped_ols over the union —
    bit-for-bit, since the state is exact decimal."""
    rng = np.random.RandomState(13)
    batches = []
    for b in range(3):
        rows = [
            (k, int(x), float(y))
            for k in range(4)
            for x, y in zip(
                rng.randint(0, 100000, 25),
                np.round(rng.randn(25) * 5 + k, 4),
            )
        ]
        batches.append(
            spark.createDataFrame(rows, "k int, x long, y double")
        )

    from fxspark.ops.rollup import (
        merge_ols_rollup,
        ols_rollup_read,
        ols_rollup_table,
    )
    from fxspark.ops.stats import grouped_ols

    # forward order and reverse order must agree (associativity)
    state_fwd = None
    for b in batches:
        state_fwd = merge_ols_rollup(
            state_fwd, ols_rollup_table(b, ["k"], F.col("x"), F.col("y")), ["k"]
        )
    state_rev = None
    for b in reversed(batches):
        state_rev = merge_ols_rollup(
            state_rev, ols_rollup_table(b, ["k"], F.col("x"), F.col("y")), ["k"]
        )

    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    want = {
        r["k"]: r for r in grouped_ols(union, "k", F.col("x"), F.col("y")).collect()
    }
    for state in (state_fwd, state_rev):
        got = {
            r["k"]: r for r in ols_rollup_read(state, ["k"]).collect()
        }
        for k in range(4):
            assert got[k]["n_obs"] == want[k]["n_obs"]
            assert got[k]["slope"] == want[k]["slope"]  # exact, not approx
            assert got[k]["intercept"] == want[k]["intercept"]


def test_profile_table_against_duckdb(spark, sf_dir):
    import duckdb

    from fxspark.ops.checks import profile_table
    from fxspark.session import load_table

    events = load_table(spark, sf_dir, "events")
    prof = {r["column"]: r for r in profile_table(events, kmv_k=64).collect()}

    con = duckdb.connect()
    ref = con.execute(
        f"""SELECT count(*) AS n, count(DISTINCT user_id) AS du,
                  count(DISTINCT event_type) AS dt,
                  min(value) AS mn, max(value) AS mx, avg(value) AS mean
           FROM '{sf_dir}/events.parquet'"""
    ).fetchone()
    n, du, dt, mn, mx, mean = ref

    assert prof["value"]["n_rows"] == n
    assert prof["value"]["n_null"] == 0
    assert prof["value"]["min_val"] == pytest.approx(mn)
    assert prof["value"]["max_val"] == pytest.approx(mx)
    assert prof["value"]["mean_val"] == pytest.approx(mean, rel=1e-9)
    # below-k column: exact distinct, no estimation error
    assert prof["event_type"]["est_distinct"] == dt
    # above-k column: KMV estimate within 35% at k=64
    assert abs(prof["user_id"]["est_distinct"] - du) / du < 0.35
    # string column has no numeric stats
    assert prof["event_type"]["mean_val"] is None


def test_attribute_conversions_last_touch(spark):
    from pyspark.sql import functions as F

    from fxspark.ops.windows import attribute_conversions

    rows = [
        # user 1: click@10, view@50, purchase@60 -> credited to view@50
        (1, 10, "click", 0.0), (1, 50, "view", 0.0), (1, 60, "purchase", 9.0),
        # user 1: second purchase@200, last touch view@50 is 150s back ->
        # outside the 100s lookback -> organic (NULL)
        (1, 200, "purchase", 5.0),
        # user 2: touch AFTER the conversion must not attribute
        (2, 80, "purchase", 3.0), (2, 90, "click", 0.0),
        # user 3: touch exactly AT the conversion time attributes (<=)
        (3, 40, "click", 0.0), (3, 40, "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        [(u, ts, t, v) for u, ts, t, v in rows],
        "user_id long, sec long, event_type string, value double",
    ).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"),
        "event_type", "value",
    )
    out = {
        (r["user_id"], r["conversion_ts"].timestamp()): r
        for r in attribute_conversions(
            df, "user_id", "ts", "event_type",
            conversion_type="purchase",
            touch_types=["click", "view"],
            lookback=F.expr("INTERVAL 100 SECONDS"),
            value_col="value",
        ).collect()
    }
    assert out[(1, 60.0)]["touch_type"] == "view"
    assert out[(1, 60.0)]["touch_ts"].timestamp() == 50.0
    assert out[(1, 60.0)]["conversion_value"] == 9.0
    assert out[(1, 200.0)]["touch_type"] is None  # organic: beyond lookback
    assert out[(2, 80.0)]["touch_type"] is None   # later touch never counts
    assert out[(3, 40.0)]["touch_type"] == "click"  # equal-time matches


def test_fs_linkage_scores_hand_computed(spark):
    import math

    from fxspark.ops.linkage import fs_score_pairs, fs_weights

    # name: strong field (m=.9, u=.1); city: weak field (m=.8, u=.4)
    aw_n, dw_n = fs_weights(0.9, 0.1)
    aw_c, dw_c = fs_weights(0.8, 0.4)
    assert aw_n == pytest.approx(math.log2(9))
    assert dw_n == pytest.approx(math.log2(0.1 / 0.9))

    pairs = spark.createDataFrame(
        [
            (1, "ann", "ann", "oslo", "oslo"),     # agree+agree
            (2, "ann", "anna", "oslo", "oslo"),    # disagree+agree
            (3, "ann", "bob", "rome", "oslo"),     # disagree+disagree
            (4, None, None, "oslo", "oslo"),       # NULL pair = disagreement
        ],
        "pid long, name_a string, name_b string, city_a string, city_b string",
    )
    out = {
        r["pid"]: r
        for r in fs_score_pairs(
            pairs,
            {"name": (0.9, 0.1), "city": (0.8, 0.4)},
            upper=3.0,
            lower=-3.0,
        ).collect()
    }
    assert out[1]["match_weight"] == pytest.approx(aw_n + aw_c)
    assert out[1]["decision"] == "match"
    assert out[2]["match_weight"] == pytest.approx(dw_n + aw_c)
    assert out[2]["decision"] == "possible"
    assert out[3]["match_weight"] == pytest.approx(dw_n + dw_c)
    assert out[3]["decision"] == "no_match"
    # NULLs are evidence against, not silently equal
    assert out[4]["match_weight"] == pytest.approx(dw_n + aw_c)


def test_fs_weights_rejects_degenerate_probs(spark):
    from fxspark.ops.linkage import fs_weights

    with pytest.raises(ValueError):
        fs_weights(0.5, 0.5)
    with pytest.raises(ValueError):
        fs_weights(0.2, 0.8)


def test_grouped_mad_matches_numpy(spark):
    rng = np.random.RandomState(21)
    data = {
        1: np.round(rng.randn(101) * 3 + 10, 4),       # odd n
        2: np.round(rng.exponential(5, 100), 4),       # even n, heavy tail
    }
    rows = [(k, float(v)) for k, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "k int, v double")

    from fxspark.ops.stats import grouped_mad

    got = {r["k"]: r for r in grouped_mad(df, "k", "v").collect()}
    for k, vs in data.items():
        med = float(np.median(vs))
        mad = float(np.median(np.abs(vs - med))) * 1.4826
        assert got[k]["n_obs"] == len(vs)
        assert got[k]["median"] == pytest.approx(med, rel=1e-9)
        assert got[k]["mad"] == pytest.approx(mad, rel=1e-9)


def test_robust_outliers_survive_corrupted_moments(spark):
    # 30 values near 10 plus three ~1e6 spikes: classic stddev inflation —
    # with k spikes the spike z-score is bounded near sqrt(n/k) ≈ 3.3, so a
    # z gate at 3.5 MISSES every spike (the outliers corrupt the very
    # moments hunting them); the robust gate must catch exactly the three.
    spikes = [1e6, 9.9e5, 1.01e6]
    vals = [10.0 + 0.1 * i for i in range(30)] + spikes
    df = spark.createDataFrame([(1, v) for v in vals], "k int, v double")

    import statistics as st

    mu, sd = st.mean(vals), st.stdev(vals)
    assert all(abs(v - mu) / sd < 3.5 for v in spikes)  # z-gate blind

    from fxspark.ops.stats import robust_outliers

    got = sorted(
        r["v"] for r in robust_outliers(df, "k", "v", threshold=3.5).collect()
    )
    assert got == sorted(spikes)


def test_robust_outliers_zero_mad_degenerate(spark):
    # >50% identical values -> MAD 0 -> any deviation flags, ties don't
    df = spark.createDataFrame(
        [(1, 5.0)] * 6 + [(1, 7.0)], "k int, v double"
    )
    from fxspark.ops.stats import robust_outliers

    got = [r["v"] for r in robust_outliers(df, "k", "v").collect()]
    assert got == [7.0]


def test_zipf_fit_recovers_planted_exponent(spark):
    # plant an exact Zipf corpus: term i (1-based) appears round(1000/i)
    # times -> ln(freq) ~ ln(1000) - 1.0 * ln(rank); the fit must recover
    # slope ~ -1 (rounding of counts perturbs it slightly)
    words = []
    for i in range(1, 60):
        words += [f"w{i:03d}"] * max(round(1000 / i), 2)
    import random

    rng = random.Random(4)
    rng.shuffle(words)
    docs = [" ".join(words[i::10]) for i in range(10)]
    df = spark.createDataFrame([(d,) for d in docs], "text string")

    from fxspark.ops.text import zipf_fit

    row = zipf_fit(df, "text").collect()[0]
    assert row["n_terms"] == 59
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.05)

    # numpy reference on the same frequency table
    import numpy as np

    freqs = sorted(
        (max(round(1000 / i), 2) for i in range(1, 60)), reverse=True
    )
    xs = np.log(np.arange(1, 60, dtype=float))
    ys = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-4)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-4)


def test_attribution_equal_time_touches_deterministic(spark):
    # two touches at the SAME second as each other: the higher event_id
    # must win, every run
    from pyspark.sql import functions as F

    from fxspark.ops.windows import attribute_conversions

    df = spark.createDataFrame(
        [
            (1, 30, "click", 100), (1, 30, "view", 101),
            (1, 40, "purchase", 102),
        ],
        "user_id long, sec long, event_type string, event_id long",
    ).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"),
        "event_type", "event_id",
    )
    for _ in range(3):
        (r,) = attribute_conversions(
            df.repartition(7), "user_id", "ts", "event_type",
            conversion_type="purchase",
            touch_types=["click", "view"],
            lookback=F.expr("INTERVAL 60 SECONDS"),
            tiebreak_col="event_id",
        ).collect()
        assert r["touch_type"] == "view"  # event_id 101 > 100


def test_attribute_linear_splits_credit(spark):
    from pyspark.sql import functions as F

    from fxspark.ops.windows import attribute_linear

    df = spark.createDataFrame(
        [
            # conversion 103 has touches at 10 and 40 within 60s -> 0.5 each
            (1, 100, 10, "click", 0.0),
            (1, 101, 40, "view", 0.0),
            (1, 103, 60, "purchase", 8.0),
            # touch at 200 is AFTER conversion -> excluded
            (1, 104, 200, "click", 0.0),
            # user 2: organic conversion -> no rows
            (2, 105, 50, "purchase", 3.0),
        ],
        "user_id long, event_id long, sec long, event_type string, value double",
    ).select(
        "user_id", "event_id", F.timestamp_seconds("sec").alias("ts"),
        "event_type", "value",
    )
    rows = attribute_linear(
        df, "user_id", "event_id", "ts", "event_type",
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_s=60,
        value_col="value",
    ).collect()
    assert len(rows) == 2
    by_touch = {r["touch_id"]: r for r in rows}
    assert set(by_touch) == {100, 101}
    for r in rows:
        assert r["conversion_id"] == 103
        assert r["credit"] == pytest.approx(0.5)
        assert r["attributed_value"] == pytest.approx(4.0)
