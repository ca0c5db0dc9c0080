"""Round-9 operator properties: Hilbert layout, rank statistics,
inequality index. The sf0.01 DuckDB differential is the correctness
gate; these pin the MATHEMATICAL properties the oracles can't express
(curve adjacency, known-answer statistics on constructed inputs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _xy2d(order: int, x: int, y: int) -> int:
    """Canonical Hilbert xy→d walk (public algorithm), the reference the
    Spark chain and the SQL CTE generator must both reproduce."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = order - 1 - x
                y = order - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_spark_matches_reference_and_is_adjacent(spark):
    from fxspark.ops.layout import hilbert_layout_index

    order = 8  # bits=3 → full 8×8 grid is cheap and exhaustive
    grid = spark.createDataFrame(
        [(x, y) for x in range(order) for y in range(order)], "x long, y long"
    )
    out = hilbert_layout_index(grid, F.col("x"), F.col("y"), "hd", bits=3)
    rows = {(r.x, r.y): r.hd for r in out.collect()}
    # exact match with the canonical walk, cell by cell
    for (x, y), hd in rows.items():
        assert hd == _xy2d(order, x, y), (x, y, hd)
    # bijection onto [0, 64)
    assert sorted(rows.values()) == list(range(order * order))
    # the Hilbert property: consecutive addresses are grid NEIGHBORS
    byd = sorted(rows.items(), key=lambda kv: kv[1])
    for ((x1, y1), _), ((x2, y2), _) in zip(byd, byd[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_sql_ctes_match_spark(spark):
    import duckdb

    from fxspark.ops.layout import hilbert_sql_ctes

    con = duckdb.connect()
    ctes, fin = hilbert_sql_ctes(
        "(SELECT a, b FROM grid)", "a", "b", bits=4
    )
    con.execute(
        "CREATE TABLE grid AS SELECT x.range AS a, y.range AS b"
        " FROM range(16) x, range(16) y"
    )
    got = {
        (a, b): hd
        for a, b, hd in con.execute(
            f"WITH {ctes} SELECT a, b, hd FROM {fin}"
        ).fetchall()
    }
    assert all(hd == _xy2d(16, a, b) for (a, b), hd in got.items())


def test_mann_whitney_separated_groups_auc_one(spark):
    from fxspark.ops.stats import mann_whitney_u

    # treatment strictly above control → U = n1·n2, AUC = 1
    rows = [("k", float(v), v >= 10) for v in range(20)]
    df = spark.createDataFrame(rows, "k string, v double, t boolean")
    r = mann_whitney_u(df, "k", F.col("v"), F.col("t")).collect()[0]
    assert r.n_treat == 10 and r.n_ctrl == 10
    assert r.u_stat == 100.0 and r.auc == 1.0


def test_mann_whitney_all_ties_auc_half(spark):
    from fxspark.ops.stats import mann_whitney_u

    rows = [("k", 1.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, v double, t boolean")
    r = mann_whitney_u(df, "k", F.col("v"), F.col("t")).collect()[0]
    assert r.auc == pytest.approx(0.5)
    assert r.z_stat is None  # tie-corrected variance is 0 → no z


def test_ks_two_sample_identical_and_disjoint(spark):
    from fxspark.ops.stats import ks_two_sample

    same = [("k", float(v % 5), v % 2 == 0) for v in range(20)]
    df = spark.createDataFrame(same, "k string, v double, t boolean")
    assert ks_two_sample(df, "k", F.col("v"), F.col("t")).collect()[
        0
    ].ks_d == pytest.approx(0.0)

    disj = [("k", float(v), v >= 10) for v in range(20)]
    df = spark.createDataFrame(disj, "k string, v double, t boolean")
    assert ks_two_sample(df, "k", F.col("v"), F.col("t")).collect()[
        0
    ].ks_d == pytest.approx(1.0)


def test_spearman_monotone_and_reversed(spark):
    from fxspark.ops.stats import spearman_rho

    rows = [("k", float(i), float(i * i)) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    assert spearman_rho(df, "k", F.col("x"), F.col("y")).collect()[
        0
    ].rho == pytest.approx(1.0)

    rows = [("k", float(i), float(-i)) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    assert spearman_rho(df, "k", F.col("x"), F.col("y")).collect()[
        0
    ].rho == pytest.approx(-1.0)

    const = [("k", 1.0, float(i)) for i in range(5)]
    df = spark.createDataFrame(const, "k string, x double, y double")
    assert spearman_rho(df, "k", F.col("x"), F.col("y")).collect()[0].rho is None


def test_theil_uniform_zero_and_concentrated(spark):
    from fxspark.ops.stats import theil_index

    rows = [("k", 7.0)] * 10
    df = spark.createDataFrame(rows, "k string, v double")
    assert theil_index(df, "k", F.col("v")).collect()[0].theil_t == pytest.approx(
        0.0
    )

    # one entity holds everything (others filtered as non-positive):
    # with n=1 positive value Theil is 0 by definition; instead pin a
    # known two-point value: x = [1, 3], μ=2 → T = (0.5·ln0.5 + 1.5·ln1.5)/2
    rows = [("k", 1.0), ("k", 3.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    want = (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2
    assert theil_index(df, "k", F.col("v")).collect()[0].theil_t == pytest.approx(
        want, abs=1e-9
    )


def test_topk_retraction_rebuild_path(spark):
    """Force the B−k soundness bound to trip: tick 1 deletes ALL of the
    buffer, so the op must rebuild from the alive set — and still match
    the from-scratch top-k."""
    from pyspark.sql import functions as F  # noqa: F811

    from fxspark.ops.ivm import topk_retraction

    k, mult = 2, 2  # B=4, bound B−k=2
    t0 = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "id long, v double"
    )
    # delete the top 5 (ids 0..4 have the highest values) → 4 buffer hits > 2
    dels = spark.createDataFrame([(i,) for i in range(5)], "id long")
    t1 = spark.createDataFrame([(100, 1.0)], "id long, v double")

    def alive_at(i):
        assert i == 1  # rebuild must be requested for tick 1 only
        return spark.createDataFrame(
            [(i, float(100 - i)) for i in range(5, 10)] + [(100, 1.0)],
            "id long, v double",
        )

    out = topk_retraction(
        [(t0, None), (t1, dels)], "id", "v", k=k, buffer_mult=mult,
        alive_at=alive_at,
    )
    rows = {(r.tick, r.rk): (r.id, r.v) for r in out.collect()}
    assert rows[(0, 1)] == (0, 100.0) and rows[(0, 2)] == (1, 99.0)
    # after deleting ids 0-4, the true top-2 is ids 5, 6
    assert rows[(1, 1)] == (5, 95.0) and rows[(1, 2)] == (6, 94.0)


def test_topk_retraction_raises_without_rebuild_source(spark):
    from fxspark.ops.ivm import topk_retraction

    t0 = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(6)], "id long, v double"
    )
    dels = spark.createDataFrame([(i,) for i in range(5)], "id long")
    t1 = spark.createDataFrame([(100, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="soundness bound"):
        topk_retraction(
            [(t0, None), (t1, dels)], "id", "v", k=2, buffer_mult=2
        ).collect()


def test_mann_whitney_matches_bruteforce_pairs(spark):
    """AUC from the rank machinery must equal the brute-force pair count
    (#[t > c] + 0.5·#[t = c]) / (n1·n2) on generated tie-heavy inputs —
    the definition the tie-group/avg-rank algebra is standing in for."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fxspark.ops.stats import mann_whitney_u

    strat = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # tiny value pool → ties
            st.booleans(),
        ),
        min_size=2,
        max_size=14,
    ).filter(
        lambda rows: any(t for _, t in rows) and any(not t for _, t in rows)
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=strat)
    def check(rows):
        df = spark.createDataFrame(
            [("k", float(v), t) for v, t in rows],
            "k string, v double, t boolean",
        )
        r = mann_whitney_u(df, "k", F.col("v"), F.col("t")).collect()[0]
        treat = [v for v, t in rows if t]
        ctrl = [v for v, t in rows if not t]
        wins = sum(1 for a in treat for b in ctrl if a > b)
        ties = sum(1 for a in treat for b in ctrl if a == b)
        want_u = wins + 0.5 * ties
        assert r.u_stat == pytest.approx(want_u, abs=1e-9)
        assert r.auc == pytest.approx(
            want_u / (len(treat) * len(ctrl)), abs=1e-12
        )

    check()


def test_ks_matches_bruteforce_cdf_gap(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fxspark.ops.stats import ks_two_sample

    strat = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.booleans(),
        ),
        min_size=2,
        max_size=14,
    ).filter(
        lambda rows: any(t for _, t in rows) and any(not t for _, t in rows)
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=strat)
    def check(rows):
        df = spark.createDataFrame(
            [("k", float(v), t) for v, t in rows],
            "k string, v double, t boolean",
        )
        r = ks_two_sample(df, "k", F.col("v"), F.col("t")).collect()[0]
        treat = sorted(v for v, t in rows if t)
        ctrl = sorted(v for v, t in rows if not t)
        want = max(
            abs(
                sum(1 for a in treat if a <= x) / len(treat)
                - sum(1 for b in ctrl if b <= x) / len(ctrl)
            )
            for x in {v for v, _ in rows}
        )
        assert r.ks_d == pytest.approx(want, abs=1e-12)

    check()


def test_isotonic_minimax_identity_pools_violators():
    """The minimax closed form used by order_value_isotonic_calibration
    (iso_i = max_{j<=i} min_{k>=i} weighted-avg(y, j..k)) must equal
    classic PAVA on a constructed NON-monotone curve — the fixture's
    curve is already monotone, so the pooling regime is pinned here."""
    import duckdb

    bins = [  # (bin, n, npos) with two violations (bins 2 and 4 dip)
        (0, 10, 1),
        (1, 10, 4),
        (2, 10, 2),
        (3, 10, 6),
        (4, 10, 3),
        (5, 10, 9),
    ]

    def pava(ws, ys):
        # classic pool-adjacent-violators, weighted L2
        blocks = [[w, w * y] for w, y in zip(ws, ys)]  # [weight, weight*mean]
        out = []
        for b in blocks:
            out.append(b)
            while len(out) > 1 and out[-2][1] / out[-2][0] > out[-1][1] / out[-1][0]:
                w2, s2 = out.pop()
                out[-1][0] += w2
                out[-1][1] += s2
        fit = []
        for w, sgm in out:
            fit += [sgm / w] * int(round(w / 10))
        return fit

    want = pava([n for _, n, _ in bins], [p / n for _, n, p in bins])

    con = duckdb.connect()
    con.execute("CREATE TABLE b (bin INT, n BIGINT, npos BIGINT)")
    con.executemany("INSERT INTO b VALUES (?, ?, ?)", bins)
    got = con.execute("""
      WITH iv AS (
        SELECT j.bin AS j, k.bin AS k,
               CAST(sum(l.npos) AS DOUBLE) / CAST(sum(l.n) AS DOUBLE) AS av
        FROM b j JOIN b k ON j.bin <= k.bin
        JOIN b l ON l.bin BETWEEN j.bin AND k.bin
        GROUP BY 1, 2
      ), mn AS (
        SELECT i.bin AS bin, iv.j, min(iv.av) AS m
        FROM b i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
        GROUP BY 1, 2
      )
      SELECT bin, max(m) AS iso FROM mn GROUP BY bin ORDER BY bin
    """).fetchall()
    for (bin_, iso), w in zip(got, want):
        assert iso == pytest.approx(w, abs=1e-12), (bin_, iso, w)
    # and the result is monotone
    vals = [iso for _, iso in got]
    assert all(a <= b for a, b in zip(vals, vals[1:]))


def test_topk_retraction_cumulative_bound(spark):
    """The soundness bound must accumulate across ticks (code-review
    finding): two ticks of B−k hits each are individually 'within
    bound' but consume 2(B−k) spares — without the cumulative rule the
    tick-2 emission would be the two low-value leftovers instead of
    the true survivors {4, 5}."""
    from fxspark.ops.ivm import topk_retraction

    k, mult = 2, 2  # B=4, bound B−k=2
    t0 = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "id long, v double"
    )
    # tick 1: delete {0,1} (2 buffer hits), insert two low rows
    d1 = spark.createDataFrame([(0,), (1,)], "id long")
    i1 = spark.createDataFrame([(100, 1.0), (101, 0.5)], "id long, v double")
    # tick 2: delete {2,3} (2 more hits -> cumulative 4 > 2 -> rebuild)
    d2 = spark.createDataFrame([(2,), (3,)], "id long")
    i2 = spark.createDataFrame([(102, 0.25)], "id long, v double")

    rebuilds = []

    def alive_at(i):
        rebuilds.append(i)
        alive = [(j, float(100 - j)) for j in range(4, 10)] + [
            (100, 1.0),
            (101, 0.5),
            (102, 0.25),
        ]
        return spark.createDataFrame(alive, "id long, v double")

    out = topk_retraction(
        [(t0, None), (i1, d1), (i2, d2)], "id", "v", k=k, buffer_mult=mult,
        alive_at=alive_at,
    )
    rows = {(r.tick, r.rk): (r.id, r.v) for r in out.collect()}
    assert rebuilds == [2]  # tick 1 within cumulative bound, tick 2 rebuilds
    assert rows[(1, 1)] == (2, 98.0) and rows[(1, 2)] == (3, 97.0)
    # the from-scratch top-2 after deleting 0..3 — reachable only via
    # the rebuild (ids 4, 5 were evicted from the B=4 buffer at tick 0)
    assert rows[(2, 1)] == (4, 96.0) and rows[(2, 2)] == (5, 95.0)
