"""Input-contract validation ops (round-15 verdict item 3).

The round-14 ``sf_dups`` probe showed 12 registry queries whose determinism
legitimately rests on FIXTURES.md key uniqueness — and that the failure
mode is SILENT wrong answers (the kmeans duplicate-id collapse was a real
bug of this class). ``ops.checks`` now converts the class into typed
failures: ``assert_unique`` (bounded gate action), ``key_violations`` /
``quarantine_duplicates`` (lazy distributed forms), and ``require_unique``
(the env-gated precondition hook wired into the 12 queries — identity by
default, because an extra gate job per query is exactly the validation
re-scan a 100 TB pipeline can't afford on every run).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from fxspark.ops.checks import (
    ContractViolation,
    assert_unique,
    key_violations,
    quarantine_duplicates,
    require_unique,
)


@pytest.fixture()
def dup_frame(spark):
    return spark.createDataFrame(
        [
            Row(k=1, g="a", v=10),
            Row(k=2, g="a", v=20),
            Row(k=2, g="b", v=21),  # dup on k, unique on (k, g)
            Row(k=3, g="c", v=30),
        ]
    )


def test_key_violations_lists_only_dups(dup_frame):
    got = {(r["k"], r["dup_count"]) for r in key_violations(dup_frame, "k").collect()}
    assert got == {(2, 2)}
    assert key_violations(dup_frame, ["k", "g"]).count() == 0


def test_assert_unique_passes_and_raises(dup_frame):
    assert assert_unique(dup_frame, ["k", "g"]) is dup_frame
    with pytest.raises(ContractViolation) as ei:
        assert_unique(dup_frame, "k", context="unit-test")
    msg = str(ei.value)
    assert "unit-test" in msg and "k=2" in msg and "×2" in msg


def test_quarantine_duplicates_split(dup_frame):
    clean, quarantined = quarantine_duplicates(dup_frame, "k")
    assert sorted(r["k"] for r in clean.collect()) == [1, 3]
    q = quarantined.collect()
    assert sorted(r["k"] for r in q) == [2, 2]  # ALL rows of the dup key
    assert all(r["quarantine_reason"] == "duplicate key (k)" for r in q)
    # lossless split
    assert clean.count() + quarantined.count() == dup_frame.count()


def test_require_unique_is_identity_by_default(dup_frame, monkeypatch):
    monkeypatch.delenv("FXSPARK_VALIDATE_CONTRACTS", raising=False)
    # zero cost: not even a new plan node — the SAME DataFrame object
    assert require_unique(dup_frame, "k") is dup_frame


def test_require_unique_enforces_when_enabled(dup_frame, monkeypatch):
    monkeypatch.setenv("FXSPARK_VALIDATE_CONTRACTS", "1")
    with pytest.raises(ContractViolation):
        require_unique(dup_frame, "k", context="gate")
    assert require_unique(dup_frame, ["k", "g"]) is dup_frame


@pytest.fixture(scope="module")
def dups_dir(tmp_path_factory, sf_dir):
    """A miniature sf_dups fixture: the tables the wired queries read,
    each concatenated with itself (every 'unique' id collides)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    out = tmp_path_factory.mktemp("sf_dups")
    for t in ("documents", "embeddings", "orders", "events", "customer"):
        tab = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(
            pa.concat_tables([tab, tab]),
            str(out / f"{t}.parquet"),
            version="2.6",
        )
    return str(out)


def test_sf_dups_probe_raises_typed_not_wrong(spark, dups_dir, monkeypatch):
    """THE round-15 done-criterion: on duplicate-key input the wired
    boundary queries fail with ContractViolation naming the query —
    instead of the silent entity-miscounted answers the r14 probe
    measured."""
    from fxspark.queries import QUERIES

    monkeypatch.setenv("FXSPARK_VALIDATE_CONTRACTS", "1")
    for name in ("doc_jaccard_pairs", "embedding_knn_join",
                 "waiting_suppliers", "stream_cusum_replay"):
        with pytest.raises(ContractViolation, match=name):
            # the gate runs inside the query builder (a bounded action),
            # so the raise happens before any result is produced
            QUERIES[name](spark, dups_dir)


def test_wired_queries_unchanged_on_valid_input(spark, sf_dir, monkeypatch):
    """With contracts enforced, VALID input passes the gate and produces
    the same result as the default path (the gate is read-only)."""
    from fxspark.queries import QUERIES

    monkeypatch.delenv("FXSPARK_VALIDATE_CONTRACTS", raising=False)
    base = QUERIES["embedding_knn_join"](spark, sf_dir).collect()
    monkeypatch.setenv("FXSPARK_VALIDATE_CONTRACTS", "1")
    gated = QUERIES["embedding_knn_join"](spark, sf_dir).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, gated))
