"""The sf0.1-SCALE registry sweep, as a committed one-command gate
(round-17 verdict item 1; the r15/r16 sweeps that found D20/D22 and two
D8-family oracle bugs ran ad-hoc and left no reproducible artifact).

What it does: builds the two sf0.1-derived hot-key fixtures —
``sf_skew01`` (Zipf(1.2) keys) and ``sf_onekey01`` (all rows one key) —
from ``$FXSPARK_SCALE_SRC`` (default ``/root/testdata/sf0.1``; 100k
events / 600k lineitem / 5k documents: 10× the correctness gate) and runs
the FULL driver-contract registry differential on each, minus the
enumerated ``SCALE_EXCLUSIONS`` below.

Exclusion policy (each entry carries its measurement): a query stays in
the recurring gate unless its sf0.1 ORACLE blows a 360 s budget; the
round-17 probe ran every r15-excluded name (up to 900 s, phases timed
separately) rather than inheriting the old name-regex, and MOST of the
31 turned out to run in seconds and are now INCLUDED — one slow-but-
finite oracle (doc_jaccard_pairs, 679 s) was VERIFIED MATCH once and
then excluded on cost; two exceeded 900 s outright. The survivors are quadratic
PAIR-ENUMERATION oracles: DuckDB must materialize O(n²) shingle/edit
pairs where the engine's own plan is inverted-index / LSH-bounded — the
cost gap IS the operator's reason to exist, so at 10× scale the oracle
(not the engine) is the bottleneck. Their correctness is still pinned at
gate scale (sf0.01, every round) and their SCALE behavior is covered by
the cost notes + plan lints.

CLI: ``python tools/scale_sweep.py [--fixture sf_skew01|sf_onekey01]``
— builds fixtures under ``$FXSPARK_SCALE_BASE`` (default
``/tmp/fxspark_scale01``), sweeps, prints per-query lines and a summary,
writes ``/tmp/scale_sweep.json``, exits non-zero on any failure.
Pytest gate: ``FXSPARK_SCALE_SWEEP=1 python -m pytest
tests/test_scale_sweep.py`` (env-gated: the sweep takes tens of minutes,
so it is a per-round ritual, not a default-suite member).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_BASE = "/tmp/fxspark_scale01"
FIXTURES = ("sf_skew01", "sf_onekey01")

# name -> justification. Every entry measured by the round-17 probe, which
# ran ALL 31 r15-regex-excluded queries at sf0.1 solo with phased timeouts:
# 28 of them MATCH in single-digit seconds (worst oracle 86 s,
# key_edit_near_dup) and are now swept; only these three remain excluded.
# All three ENGINE plans finish in <20 s at sf0.1 — the bottleneck is the
# DuckDB oracle's O(n²) shingle-pair enumeration (12.5M doc pairs with
# list_intersect), i.e. exactly the cost the engine's inverted-index /
# prefix-filter plans exist to avoid. Their correctness stays pinned every
# round at sf0.01 (gate + all fixture sweeps).
SCALE_EXCLUSIONS: dict[str, str] = {
    "doc_jaccard_pairs": (
        "quadratic pair-enumeration oracle: at sf0.1 (solo run) DuckDB "
        "takes 679 s vs the engine's 14.5 s — VERIFIED MATCH once in the "
        "round-17 probe, excluded from the recurring gate on cost alone"
    ),
    "doc_dedup_purge": (
        "quadratic pair-enumeration + purge oracle: at sf0.1 (solo run) "
        "DuckDB exceeds the 900 s budget vs the engine's 19.5 s; the "
        "sf0.01 gate + fixture sweeps pin it every round"
    ),
    "doc_dup_clusters": (
        "quadratic pair-enumeration + iterative-clustering oracle: at "
        "sf0.1 (solo run) DuckDB exceeds the 900 s budget vs the "
        "engine's 16.0 s; the sf0.01 gate + fixture sweeps pin it every "
        "round"
    ),
}


def build_fixtures(src: str | None = None, base: str | None = None) -> dict:
    """Build the sf0.1-derived scale fixtures; returns {name: dir}."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "degenerate_fixtures",
        os.path.join(REPO, "tools", "degenerate_fixtures.py"),
    )
    degf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(degf)

    src = src or os.environ.get("FXSPARK_SCALE_SRC", DEFAULT_SRC)
    base = base or os.environ.get("FXSPARK_SCALE_BASE", DEFAULT_BASE)
    return {
        "sf_skew01": degf.build_skew(src, os.path.join(base, "sf_skew01")),
        "sf_onekey01": degf.build_onekey(src, os.path.join(base, "sf_onekey01")),
    }


def included_names() -> list[str]:
    from fxspark.queries import QUERIES

    missing = sorted(set(SCALE_EXCLUSIONS) - set(QUERIES))
    if missing:
        raise ValueError(f"SCALE_EXCLUSIONS not in registry: {missing}")
    return sorted(n for n in QUERIES if n not in SCALE_EXCLUSIONS)


def sweep_scale(spark, fixture_dir: str, verbose: bool = True):
    """Full registry differential minus SCALE_EXCLUSIONS on one fixture."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "degenerate_sweep",
        os.path.join(REPO, "tools", "degenerate_sweep.py"),
    )
    degs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(degs)
    return degs.sweep(spark, fixture_dir, names=included_names(),
                      verbose=verbose)


def main() -> None:  # pragma: no cover — manual/per-round runner
    import argparse
    import json

    from fxspark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", choices=FIXTURES, default=None,
                    help="sweep only one fixture (default: both)")
    args = ap.parse_args()

    dirs = build_fixtures()
    spark = get_spark("scale-sweep")
    report = {}
    rc = 0
    for name in ([args.fixture] if args.fixture else FIXTURES):
        ok, fails = sweep_scale(spark, dirs[name])
        report[name] = {
            "ok": len(ok),
            "total": len(ok) + len(fails),
            "fails": fails,
        }
        print(f"{name}: {len(ok)}/{len(ok) + len(fails)} ok; "
              f"fails={sorted(fails)}")
        if fails:
            rc = 1
    report["excluded"] = SCALE_EXCLUSIONS
    with open("/tmp/scale_sweep.json", "w") as f:
        json.dump(report, f, indent=1)
    sys.exit(rc)


if __name__ == "__main__":  # pragma: no cover
    main()
