"""Gate for the curated-operator composition fuzzer (``fxspark/opsfuzz.py``).

The sqlfuzz module covers the raw-SQL surface; this suite covers the
DataFrame operator API with generated 2-4-op chains checked against
generated DuckDB oracles (determinism rules O1-O6 in the module
docstring). Seed 14 is the documented default corpus; the alt-seed is
derived from the default corpus's repr, so the sampled surface drifts
whenever the generator changes.
"""

from __future__ import annotations

import zlib

import pytest

from fxspark.opsfuzz import (
    DEFAULT_N,
    DEFAULT_SEED,
    generate,
    oracle_sql,
    run_composition,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    from tests.oracle_diff import duck_connect

    return duck_connect(sf_dir)


def test_generator_is_pure_and_prefix_stable():
    a = generate(DEFAULT_SEED, DEFAULT_N)
    b = generate(DEFAULT_SEED, DEFAULT_N)
    assert [(c.name, c.table, repr(c.stages), repr(c.pct)) for c in a] == [
        (c.name, c.table, repr(c.stages), repr(c.pct)) for c in b
    ]
    # prefix stability: a shorter corpus is a prefix of the longer one
    short = generate(DEFAULT_SEED, 10)
    assert [c.name for c in short] == [c.name for c in a[:10]]
    # the corpus exercises every op (incl. the round-15 O10 stateful
    # family) and the pct template
    ops = {s.op for c in a for s in c.stages}
    assert ops == {"dedup", "latest_w", "ksmall", "nth_cutoff", "gmax",
                   "sessionize", "cusum", "ewma"}
    assert any(c.pct for c in a)
    # the O7 as-of template covers BOTH directions across the corpus
    dirs = {c.asof["direction"] for c in a if c.asof}
    assert dirs == {"backward", "forward"}


def test_default_corpus_matches_oracle(spark, sf_dir, duck):
    """The full default corpus (>=100 compositions — the round-14 verdict
    bar) runs on both engines and matches under the driver comparator."""
    comps = generate(DEFAULT_SEED, DEFAULT_N)
    assert len(comps) >= 100
    bad = []
    for comp in comps:
        res = run_composition(spark, duck, sf_dir, comp)
        if not res["ok"]:
            bad.append((comp.name, {k: res[k] for k in
                                    ("rows_spark", "rows_oracle")}))
    assert not bad, bad


def test_alt_seed_sample_matches(spark, sf_dir, duck):
    """A 16-composition sample at a corpus-derived alt seed: re-derives
    whenever the generator changes, so new grammar is never only tested
    at the seed it was developed against."""
    alt = zlib.crc32(
        repr([c.name for c in generate(DEFAULT_SEED, DEFAULT_N)]).encode()
    ) % 100_000
    for comp in generate(alt, 16):
        res = run_composition(spark, duck, sf_dir, comp)
        assert res["ok"], (comp.name, res)


def test_composition_plans_respect_global_bans(spark, sf_dir):
    """The registry's absolute plan bans hold for generated op chains too:
    no CartesianProduct and no row-at-a-time Python eval in any of the 120
    composition physical plans — the ops compose into pure JVM window/agg
    pipelines regardless of parameter choices."""
    from fxspark.opsfuzz import _spark_frame

    for comp in generate(DEFAULT_SEED, DEFAULT_N):
        df = _spark_frame(spark, sf_dir, comp)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for bad in ("CartesianProduct", "BatchEvalPython"):
            assert bad not in plan, (comp.name, bad)


def test_comparator_negative_control(spark, sf_dir, duck):
    """Non-vacuity: tampering with a composition's oracle must FAIL the
    compare (rank bound off by one ⇒ row-count drift)."""
    comp = next(c for c in generate(DEFAULT_SEED, DEFAULT_N)
                if any(s.op == "latest_w" and s.n > 1 for s in c.stages))
    sql = oracle_sql(comp)
    stage = next(s for s in comp.stages if s.op == "latest_w" and s.n > 1)
    tampered = sql.replace(f"_rn <= {stage.n}", f"_rn <= {stage.n - 1}", 1)
    assert tampered != sql
    from tests.oracle_diff import compare

    from fxspark.opsfuzz import _spark_frame

    sdf = _spark_frame(spark, sf_dir, comp).toPandas()
    assert compare(sdf, duck.execute(sql).fetchdf())["ok"]
    assert not compare(sdf, duck.execute(tampered).fetchdf())["ok"]
