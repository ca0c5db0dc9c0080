"""Mechanized recompute audit over the whole registry.

For every registered query, record the base-table scan count of the OUTER
executed plan PLUS every pre-materialization plan (by intercepting
``localCheckpoint`` on the concrete DataFrame class), then rank queries by
total scans. This is the analysis-pass twin of the CI lints in
``tests/test_plan_lint.py``:

- the GLOBAL scan budget bounds recomputed scans in the outer plan;
- the INNER-scan lint bounds scans hidden inside checkpointed subtrees
  for five representative checkpoint-heavy queries;
- THIS TOOL sweeps both measures across all 249 queries at sf0.01 so a
  round's materialization audit starts from data, not from grepping for
  ``localCheckpoint`` sites (round-11 run: top totals were the
  allowlisted tick-replay harness at 26, apriori's documented inner-8 —
  A/B-measured cheaper than materializing the basket-grain frames — and
  single digits everywhere else; table in NOTES_r11.md).

Usage:
    python tools/audit_scans.py [sf_dir]   # default /root/testdata/sf0.01

Prints the top-25 by total scans and writes the full JSON next to it as
``/tmp/audit_scans.json``.
"""

from __future__ import annotations

import json
import re
import sys


SCAN_RE = re.compile(r"\bFileScan \w+\b|\bBatchScan\b")


def count_scans(plan: str) -> int:
    return len(SCAN_RE.findall(plan))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    try:  # PySpark >= 4.0 moved the concrete class under .classic
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover — pre-4.0 fallback
        from pyspark.sql import DataFrame

    from fxspark.queries import QUERIES
    from fxspark.session import get_spark

    spark = get_spark()
    recorded: list[int] = []
    orig = DataFrame.localCheckpoint

    def rec(self, eager=True):
        plan = self._jdf.queryExecution().executedPlan().toString()
        recorded.append(count_scans(plan))
        return orig(self, eager=eager)

    DataFrame.localCheckpoint = rec
    out: dict[str, dict] = {}
    try:
        for name, fn in QUERIES.items():
            recorded.clear()
            try:
                df = fn(spark, sf)
                outer = count_scans(
                    df._jdf.queryExecution().executedPlan().toString()
                )
                inner = list(recorded)
                out[name] = {
                    "outer": outer,
                    "inner": inner,
                    "total": outer + sum(inner),
                }
            except Exception as ex:  # noqa: BLE001 — audit keeps sweeping
                out[name] = {"err": str(ex)[:120]}
    finally:
        DataFrame.localCheckpoint = orig

    with open("/tmp/audit_scans.json", "w") as fh:
        json.dump(out, fh, indent=1)
    rows = sorted(
        ((v.get("total", 0), k, v) for k, v in out.items()), reverse=True
    )
    for total, name, v in rows[:25]:
        print(
            f"{total:3d} total  outer={v.get('outer')} "
            f"inner={v.get('inner')}  {name}"
        )
    errs = {k: v["err"] for k, v in out.items() if "err" in v}
    if errs:
        print(f"ERRORS: {errs}")


if __name__ == "__main__":
    main()
