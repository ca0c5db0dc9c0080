"""Degenerate-document regression: empty / whitespace-only / single-token
docs must not crash the bigram-based queries and must agree with the oracle.

Round-4's ``sequence(1, size(t) - 1)`` bigram generator descended ([1, 0])
for size < 2 and threw (INVALID_PARAMETER_VALUE.START / index OOB) — the
exact rows a quality/repetition filter most needs to score.  These tests
run the three affected registry queries on a corpus that is MOSTLY junk
and hash-compare against their DuckDB oracles.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from fxspark.queries import ORACLE, QUERIES
from fxspark.session import TABLES
from tests.oracle_diff import compare, diff_report, duck_connect, run_oracle

SF_DIR = os.environ.get("FXSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

DEGENERATE_QUERIES = [
    "doc_bigram_logprob",
    "doc_quality_logistic",
    "doc_repetition_stats",
    "doc_importance_weights",  # no doc from the target sources at all
    "doc_token_budget_select",
    "token_bpe_pair_counts",  # single-char words contribute no pairs
]


@pytest.fixture(scope="module")
def junk_sf_dir(tmp_path_factory):
    """An sf_dir whose documents table is dominated by degenerate rows."""
    d = tmp_path_factory.mktemp("junk_sf")
    for t in TABLES:
        if t == "documents":
            continue
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    texts = [
        "",  # empty
        "   ",  # whitespace-only
        "solo",  # single token
        " edge ",  # single token with padding
        "two tokens",  # minimal bigram case
        "a a a a",  # pure repetition
        "the quick brown fox jumps over the lazy dog",
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["junk"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("name", DEGENERATE_QUERIES)
def test_degenerate_docs_match_oracle(spark, junk_sf_dir, name):
    got = QUERIES[name](spark, junk_sf_dir).toPandas()
    con = duck_connect(junk_sf_dir)
    want = run_oracle(con, ORACLE[name])
    res = compare(got, want)
    assert res["ok"], diff_report(name, res)


def test_quality_logistic_scores_every_junk_row(spark, junk_sf_dir):
    # a quality gate must emit a verdict for ALL docs, junk included
    out = QUERIES["doc_quality_logistic"](spark, junk_sf_dir).toPandas()
    assert len(out) == 7
    assert out["quality_prob"].notna().all()
