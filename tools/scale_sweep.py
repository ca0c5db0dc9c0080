"""The sf0.1-SCALE registry sweep, as a committed one-command gate
(round-17 verdict item 1; the r15/r16 sweeps that found D20/D22 and two
D8-family oracle bugs ran ad-hoc and left no reproducible artifact).

What it does: builds the two sf0.1-derived hot-key fixtures —
``sf_skew01`` (Zipf(1.2) keys) and ``sf_onekey01`` (all rows one key) —
from ``$FXSPARK_SCALE_SRC`` (default ``/root/testdata/sf0.1``; 100k
events / 600k lineitem / 5k documents: 10× the correctness gate) and runs
the FULL driver-contract registry differential on each, minus the
enumerated ``SCALE_EXCLUSIONS`` below.

Exclusion policy (each entry carries its measurement): a query is
excluded ONLY if its probe at sf0.1 could not finish Spark+oracle inside
a 360 s budget (``NOTES_r17`` — the probe ran every r15-excluded name
rather than inheriting the old name-regex, and MOST of the 31 turned out
to run in seconds and are now INCLUDED). The survivors are quadratic
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

# name -> justification. Every entry measured by the round-17 probe
# (360 s Spark+oracle budget per query at sf0.1; times in NOTES_r17).
SCALE_EXCLUSIONS: dict[str, str] = {}  # finalized from /tmp/probe_excluded.json


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
