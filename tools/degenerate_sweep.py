"""Run the FULL driver-contract registry differential on a degenerate fixture.

CLI: ``python tools/degenerate_sweep.py <fixture_dir> [name_filter]``

Runs every ``__spark_entry__.queries()`` entry against ``<fixture_dir>`` and
compares oracled queries to DuckDB under the driver-style comparator
(``tests/oracle_diff.compare`` — stricter than the gate: full-precision value
equality). Non-oracled queries get the driver's weaker rows-only check (must
execute without error). Prints one line per query and a final summary line
``<ok>/<n> ok; fails=[...]``; exit 1 on any failure.

Used standalone while triaging, and by ``tests/test_degenerate_registry.py``
as the round-14 degenerate-input gate (verdict item 1).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def rebake_adaptive_oracles(fixture_dir: str) -> dict:
    """Re-derive the DATA-ADAPTIVE oracles for ``fixture_dir``.

    Three registry oracles bake codebook literals at import time from
    ``FXSPARK_ORACLE_SF_DIR`` (the driver's gate dir), while their Spark
    queries train on the RUNTIME ``sf_dir`` — the two agree exactly where
    the driver actually runs, but on any OTHER fixture the import-baked
    literals describe the wrong corpus. The builders read the env var at
    call time, so pointing it at the fixture and calling them again yields
    the fixture's own oracle (None ⇒ no codebook expressible, e.g. the
    empty corpus — caller degrades to a rows-only check)."""
    from fxspark import queries as q

    prev = os.environ.get("FXSPARK_ORACLE_SF_DIR")
    os.environ["FXSPARK_ORACLE_SF_DIR"] = fixture_dir
    try:
        return {
            "embedding_ivf_topk": q._ivf_oracle(),
            "embedding_semantic_dedup": q._semantic_dedup_oracle(),
            "embedding_kmeans_iters": q._kmeans_oracle(),
        }
    finally:
        if prev is None:
            del os.environ["FXSPARK_ORACLE_SF_DIR"]
        else:
            os.environ["FXSPARK_ORACLE_SF_DIR"] = prev


def sweep(spark, fixture_dir: str, names=None, verbose: bool = True):
    """Return (ok_names, fail_map name→reason). ``names=None`` = full
    registry. Data-adaptive oracles are re-baked for the fixture (see
    rebake_adaptive_oracles); a re-baked None degrades that query to the
    rows-only check."""
    from fxspark.queries import ORACLE, QUERIES
    from tests.oracle_diff import compare, duck_connect

    ORACLE = dict(ORACLE)
    for name, sql in rebake_adaptive_oracles(fixture_dir).items():
        if sql is None:
            ORACLE.pop(name, None)
        else:
            ORACLE[name] = sql

    con = duck_connect(fixture_dir)
    todo = list(QUERIES) if names is None else list(names)
    ok, fails = [], {}
    for name in sorted(todo):
        try:
            sdf = QUERIES[name](spark, fixture_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — record and continue
            fails[name] = f"SPARK-ERROR {type(ex).__name__}: {ex!r:.300}"
            if verbose:
                print(f"{name}: {fails[name]}", flush=True)
            continue
        if name not in ORACLE:
            ok.append(name)
            if verbose:
                print(f"{name}: rows-only ({len(sdf)})", flush=True)
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            fails[name] = f"ORACLE-ERROR {type(ex).__name__}: {ex!r:.300}"
            if verbose:
                print(f"{name}: {fails[name]}", flush=True)
            continue
        res = compare(sdf, odf)
        if res["ok"]:
            ok.append(name)
            if verbose:
                print(f"{name}: OK ({len(sdf)})", flush=True)
        else:
            detail = {k: res[k] for k in
                      ("rows_spark", "rows_oracle", "cols_match")}
            if res.get("first_diff"):
                detail["first_diff"] = res["first_diff"]
            fails[name] = f"MISMATCH {detail}"
            if verbose:
                print(f"{name}: {fails[name]}", flush=True)
    return ok, fails


def main() -> None:  # pragma: no cover — manual runner
    from fxspark.session import get_spark

    fixture = sys.argv[1]
    names = sys.argv[2:] or None
    spark = get_spark("degenerate-sweep")
    ok, fails = sweep(spark, fixture, names)
    n = len(ok) + len(fails)
    print(f"\n{len(ok)}/{n} ok; fails={sorted(fails)}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":  # pragma: no cover
    main()
