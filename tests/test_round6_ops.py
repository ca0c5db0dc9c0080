"""Round-6 second-wave operators: privacy (DP counts, k-anonymity),
largest-remainder allocation, first-touch attribution, join-delta IVM."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _u(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / float(2**60)


def test_dp_counts_mechanism_matches_inverse_cdf(spark):
    """The released count must equal n + Laplace(1/eps) noise computed from
    the DECLARED uniform draw of the key string — recomputed here in pure
    Python from the same md5 definition."""
    from fxspark.ops.privacy import dp_counts

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3, "k string"
    )
    out = {
        r["k"]: r for r in dp_counts(df, "k", epsilon=0.5).collect()
    }
    for k, n in (("a", 7), ("b", 3)):
        u = _u(k) - 0.5
        g = max(1.0 - 2.0 * abs(u), 1e-12)
        # the log is decimal(38,9)-quantized in the engine; mirror that
        ln_g = float(
            math.floor(math.log(g) * 1e9 + 0.5) / 1e9
            if math.log(g) >= 0
            else -math.floor(-math.log(g) * 1e9 + 0.5) / 1e9
        )
        noise = -(1.0 / 0.5) * math.copysign(1.0, u) * ln_g
        assert out[k]["n_true"] == n
        assert out[k]["noisy_count"] == pytest.approx(
            round(n + noise, 6), abs=2e-6
        )


def test_dp_counts_epsilon_scales_noise(spark):
    """Same keys, double epsilon => exactly half the noise magnitude
    (inverse-CDF is linear in the scale)."""
    from fxspark.ops.privacy import dp_counts

    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 9, "k string")
    lo = {r["k"]: r["noisy_count"] - r["n_true"]
          for r in dp_counts(df, "k", epsilon=1.0).collect()}
    hi = {r["k"]: r["noisy_count"] - r["n_true"]
          for r in dp_counts(df, "k", epsilon=2.0).collect()}
    for k in lo:
        assert lo[k] == pytest.approx(2.0 * hi[k], abs=2e-6)


def test_k_anonymity_flags_small_classes_only(spark):
    from fxspark.ops.checks import k_anonymity

    rows = [("m", 30)] * 5 + [("m", 40)] * 2 + [("f", 30)] * 1
    df = spark.createDataFrame(rows, "sex string, age int")
    risky = {
        (r["sex"], r["age"]): r["n_rows"]
        for r in k_anonymity(df, ["sex", "age"], k=5).collect()
    }
    assert risky == {("m", 40): 2, ("f", 30): 1}
    assert k_anonymity(df, ["sex"], k=3).count() == 1  # ('f',) has 1 < 3


@pytest.mark.parametrize(
    "sizes,frac",
    [
        ([7, 7, 7], 0.5),          # remainders tie -> key order breaks
        ([1, 2, 3, 4, 95], 0.8),
        ([10], 0.3),
        ([3, 3, 3, 1], 0.25),
    ],
)
def test_largest_remainder_hits_global_budget_exactly(spark, sizes, frac):
    from fxspark.ops.layout import largest_remainder_quota

    rows = [(f"s{i}",) for i, n in enumerate(sizes) for _ in range(n)]
    df = spark.createDataFrame(rows, "stratum string")
    out = largest_remainder_quota(df, ["stratum"], frac)
    got = {r["stratum"]: (r["n_rows"], r["quota"]) for r in out.collect()}
    n = sum(sizes)
    budget = math.floor(n * frac + 0.5)
    assert sum(q for _, q in got.values()) == budget
    for i, sz in enumerate(sizes):
        nr, q = got[f"s{i}"]
        assert nr == sz
        # every stratum within 1 seat of exact proportionality
        assert math.floor(sz * frac) <= q <= math.floor(sz * frac) + 1


def test_first_touch_earliest_in_window_and_organic_null(spark):
    from fxspark.ops.windows import attribute_first_touch

    rows = [
        # uid, id, ts, type, value
        (1, 1, "2024-01-01 10:00:00", "click", 0.0),
        (1, 2, "2024-01-01 10:30:00", "view", 0.0),
        (1, 3, "2024-01-01 11:00:00", "purchase", 5.0),   # window [10:00, 11:00] -> first = click@10:00 (boundary inclusive)
        (2, 4, "2024-01-01 09:00:00", "click", 0.0),
        (2, 5, "2024-01-01 11:00:00", "purchase", 7.0),   # click 2h before: outside 1h -> organic
        (3, 6, "2024-01-01 10:00:00", "click", 0.0),
        (3, 7, "2024-01-01 10:00:00", "view", 0.0),       # equal ts: smaller id (6, click) wins
        (3, 8, "2024-01-01 10:10:00", "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["conversion_id"]: r
        for r in attribute_first_touch(
            df, "user_id", "event_id", "ts", "event_type",
            "purchase", ["click", "view"], 3600, value_col="value",
        ).collect()
    }
    assert len(out) == 3
    assert str(out[3]["touch_ts"]) == "2024-01-01 10:00:00"
    assert out[3]["touch_type"] == "click"
    assert out[5]["touch_ts"] is None and out[5]["touch_type"] is None
    assert out[8]["touch_type"] == "click"  # id 6 beats id 7 at equal ts


def test_delta_join_equals_from_scratch_join(spark):
    """V_old ∪ ΔV must equal the join of the unioned inputs, and the three
    delta terms must be disjoint (no dedup needed by construction)."""
    from fxspark.ops.ivm import delta_join

    l_old = spark.createDataFrame(
        [(1, "l1"), (2, "l2"), (3, "l3")], "k long, lv string"
    )
    r_old = spark.createDataFrame(
        [(1, "r1"), (2, "r2"), (9, "r9")], "k long, rv string"
    )
    l_new = spark.createDataFrame([(2, "l2b"), (9, "l9")], "k long, lv string")
    r_new = spark.createDataFrame([(1, "r1b"), (9, "r9b")], "k long, rv string")

    delta = delta_join(l_old, r_old, l_new, r_new, ["k"])
    v_old = l_old.join(r_old, ["k"])
    v_new_scratch = (
        l_old.unionByName(l_new).join(r_old.unionByName(r_new), ["k"])
    )
    maintained = v_old.unionByName(
        delta.drop("delta_term")
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, v_new_scratch.collect())
    )
    # disjoint terms: total delta rows == distinct delta rows
    assert delta.count() == delta.distinct().count()


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference single-node BPE (Sennrich-style) for the parity test."""
    state = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f
                )
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, c))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def test_bpe_train_matches_reference_scan(spark):
    from fxspark.ops.bpe import bpe_train

    docs = [
        "low low low lower lowest",
        "newer newer new newest",
        "low newer wider",
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    freqs: dict[str, int] = {}
    for t in docs:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    assert bpe_train(df, "text", 6) == _ref_bpe(freqs, 6)


def test_bpe_merge_fold_handles_overlaps(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] (leftmost
    non-overlapping), and a merged symbol must immediately be usable by a
    LATER merge but never re-trigger the same one."""
    from pyspark.sql import functions as F

    from fxspark.ops.bpe import _apply_merge

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b", "a", "a"],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(
            _apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert got == [["aa", "aa"], ["aa", "a"], ["b", "aa"]]


def test_bpe_early_stop_when_no_pairs(spark):
    from fxspark.ops.bpe import bpe_train

    df = spark.createDataFrame([("a b c",)], "text string")
    # single-char words have no adjacent pairs at all
    assert bpe_train(df, "text", 5) == []
