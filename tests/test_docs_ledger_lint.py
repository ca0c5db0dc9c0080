"""Mechanical ledger/docs completeness lint (round-17 verdict item 2).

The D-rule range strings in README / the verify skill drifted from
DIALECT.md's actual ledger in BOTH of the two rounds that grew the ledger
("D1–D22" survived into a tree whose ledger ended at D27, and the fixture
list in the verify recipe lagged the builder registry twice). Prose that
enumerates a registry is a cache; this lint makes the caches validated:

1. DIALECT.md's ledger must define contiguous rule ids D1..Dmax / O1..Omax
   (a gap means a row was dropped or a rule number typo'd).
2. Every rule token (``D<n>`` / ``O<n>``, optional pin-suffix letter) that
   appears in the fuzzer modules, DIALECT.md, README.md, or the verify
   skill must be a DEFINED rule — no citation of a rule that doesn't
   exist.
3. Every RANGE string ``D1-D<n>`` / ``O1-O<n>`` (either dash) in README /
   the verify skill must end at the CURRENT ledger maximum — the exact
   drift class that recurred. Range syntax is therefore RESERVED for
   describing the full ledger; a doc describing a subset (one fuzzer's
   rules) must name it without first-to-N range syntax.
4. Every fixture axis in ``tools/degenerate_fixtures.AXES`` (the single
   source of truth for which degenerate fixtures exist) must be named in
   README.md and in the verify skill's sweep step, and conversely every
   ``sf_<word>`` fixture token in those docs must be a registered axis or
   a scale-variant (``sf_<axis>01`` — the sf0.1-derived builds of
   ``tools/scale_sweep.py``) or driver data (``sf0.001`` etc. don't match
   the token pattern).
"""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


def _read(rel: str) -> str:
    with open(os.path.join(REPO, rel), encoding="utf-8") as f:
        return f.read()


def _ledger_ids() -> tuple[set[int], set[int]]:
    """Rule ids DEFINED by DIALECT.md — the first cell of a table row."""
    d_ids, o_ids = set(), set()
    for line in _read("DIALECT.md").splitlines():
        m = re.match(r"\|\s*([DO])(\d+)\s*\|", line)
        if m:
            (d_ids if m.group(1) == "D" else o_ids).add(int(m.group(2)))
    return d_ids, o_ids


DOC_FILES = ("README.md", ".claude/skills/verify/SKILL.md")
RULE_FILES = (
    "fxspark/sqlfuzz.py",
    "fxspark/opsfuzz.py",
    "fxspark/streamfuzz.py",
    "DIALECT.md",
)


def test_ledger_is_contiguous():
    d_ids, o_ids = _ledger_ids()
    assert d_ids == set(range(1, max(d_ids) + 1)), (
        f"DIALECT.md D-rules have gaps: missing "
        f"{set(range(1, max(d_ids) + 1)) - d_ids}"
    )
    assert o_ids == set(range(1, max(o_ids) + 1)), (
        f"DIALECT.md O-rules have gaps: missing "
        f"{set(range(1, max(o_ids) + 1)) - o_ids}"
    )


def test_every_cited_rule_exists():
    d_ids, o_ids = _ledger_ids()
    pat = re.compile(r"\b([DO])(\d{1,2})[a-z]?\b")
    bad = []
    for rel in RULE_FILES + DOC_FILES:
        for m in pat.finditer(_read(rel)):
            n = int(m.group(2))
            if n not in (d_ids if m.group(1) == "D" else o_ids):
                bad.append(f"{rel}: {m.group(0)}")
    assert not bad, f"citations of undefined rules: {bad}"


def test_range_strings_are_current():
    d_ids, o_ids = _ledger_ids()
    want = {"D": max(d_ids), "O": max(o_ids)}
    pat = re.compile(r"\b([DO])1[–-]\1?(\d{1,2})\b")
    bad = []
    for rel in DOC_FILES:
        for m in pat.finditer(_read(rel)):
            if int(m.group(2)) != want[m.group(1)]:
                bad.append(
                    f"{rel}: '{m.group(0)}' but ledger max is "
                    f"{m.group(1)}{want[m.group(1)]}"
                )
    assert not bad, f"stale rule-range strings: {bad}"


def _axes() -> set[str]:
    spec = importlib.util.spec_from_file_location(
        "degenerate_fixtures",
        os.path.join(REPO, "tools", "degenerate_fixtures.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.AXES)


def test_docs_list_every_fixture_axis():
    axes = _axes()
    for rel in DOC_FILES:
        text = _read(rel)
        missing = [a for a in axes if f"`{a}`" not in text]
        assert not missing, f"{rel} does not name fixture axes {missing}"


def test_no_doc_cites_an_unregistered_fixture():
    axes = _axes()
    pat = re.compile(r"`(sf_[a-z]+(01)?)`")
    bad = []
    for rel in DOC_FILES:
        for m in pat.finditer(_read(rel)):
            base = m.group(1)[:-2] if m.group(2) else m.group(1)
            if base not in axes:
                bad.append(f"{rel}: {m.group(1)}")
    assert not bad, f"docs cite fixtures with no registered builder: {bad}"


def test_d22_round_sites_registered():
    """Every oracle that still contains a ``round(`` output site must be
    enumerated in DIALECT.md's D22 appendix with the classification the
    live scan produces — registering a new query (or editing an oracle)
    with an unclassified ROUND output fails here until the appendix row
    is added/updated (regenerate with ``python tools/round_audit.py``)."""
    spec = importlib.util.spec_from_file_location(
        "round_audit", os.path.join(REPO, "tools", "round_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    live = mod.audit()

    committed: dict[str, dict[str, int]] = {}
    in_appendix = False
    for line in _read("DIALECT.md").splitlines():
        if line.startswith("## D22 appendix"):
            in_appendix = True
            continue
        if in_appendix:
            m = re.match(r"\|\s*(\w+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|", line)
            if m and m.group(1) != "query":
                committed[m.group(1)] = {
                    "irrational": int(m.group(2)),
                    "empirical": int(m.group(3)),
                }
    assert committed, "D22 appendix table not found in DIALECT.md"
    assert live == committed, (
        "D22 appendix out of date. "
        f"missing={sorted(set(live) - set(committed))} "
        f"stale={sorted(set(committed) - set(live))} "
        f"changed={sorted(n for n in set(live) & set(committed) if live[n] != committed[n])}"
    )
