"""Gate for the stream≡batch equivalence fuzzer (rule O11,
``fxspark/streamfuzz.py``).

The full 120-composition corpus runs out-of-band per round (two SFs + the
degenerate fixtures — the CLI reproduces any run); the in-suite gate runs
a prefix of the default corpus through REAL micro-batch replay so the
property stays continuously verified without dominating suite time
(each composition spins an actual Structured Streaming query).
"""

from __future__ import annotations

from fxspark.streamfuzz import DEFAULT_N, DEFAULT_SEED, generate, run_composition

GATE_N = 20  # prefix of the default corpus (generator is prefix-stable)


def test_generator_is_pure_and_prefix_stable():
    a = generate(DEFAULT_SEED, DEFAULT_N)
    b = generate(DEFAULT_SEED, DEFAULT_N)
    assert [
        (c.name, c.table, c.keys, c.order, c.value, c.n_splits, c.arrival)
        for c in a
    ] == [
        (c.name, c.table, c.keys, c.order, c.value, c.n_splits, c.arrival)
        for c in b
    ]
    short = generate(DEFAULT_SEED, GATE_N)
    assert [c.name for c in short] == [c.name for c in a[:GATE_N]]
    # the corpus exercises both templates, every table, and every split
    # count / a non-identity arrival order (the order-independence probe)
    assert {c.template for c in a} == {"upsert_lww", "rollup_merge"}
    assert {c.table for c in a} == {"events", "orders", "lineitem", "documents"}
    assert {c.n_splits for c in a} == {2, 3, 5}
    assert any(c.arrival != sorted(c.arrival) for c in a)


def test_default_corpus_prefix_stream_equals_batch(spark, sf_dir):
    comps = generate(DEFAULT_SEED, GATE_N)
    # the prefix must cover both templates to gate anything
    assert {c.template for c in comps} == {"upsert_lww", "rollup_merge"}
    bad = []
    for comp in comps:
        res = run_composition(spark, sf_dir, comp)
        if not res["ok"]:
            bad.append((comp.name, res))
    assert not bad, f"stream/batch divergence: {bad}"
