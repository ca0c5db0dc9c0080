"""D22 ROUND-site audit (round-17 verdict item 7).

Rule D22 (DIALECT.md): ``ROUND(double, d)`` splits across engines on exact
10^-d halves (Spark BigDecimal HALF_UP vs DuckDB scaled-double
ties-to-even). Two disciplines already removed the PROVEN-divergent sites
(raw emission; ``floor(x*10^d + 0.5)/10^d`` declared-grain rounding) — by
construction neither leaves a ``round(`` call behind, so every REMAINING
``round(`` in an oracle's output expressions is a site that must be
classified:

- ``irrational``: the rounded expression chains through ``ln``/``exp``/
  ``sqrt``/``log``/``pow`` — its value cannot be an exact decimal half
  (transcendental/algebraic-irrational outputs; D15's correctly-rounded
  clearance), so the tie never occurs and both engines agree.
- ``empirical``: rational arithmetic (count quotients, decimal-sum
  quotients, fixed-point scalings) that CAN in principle land on a half.
  These are sweep-cleared, not proven: green on the sf0.01 gate, all nine
  degenerate fixtures, and the sf0.1 scale sweeps — and any data regime
  that ever produces a tie will surface as a sweep failure, at which point
  the site moves to one of the two removal disciplines (that is exactly
  how the five r15 D22 sites were found and fixed).

This module recomputes the classification from the LIVE registry (SQL
comments stripped — several oracles mention ``ROUND`` in prose) and
``tests/test_docs_ledger_lint.py::test_d22_round_sites_registered`` diffs
it against the committed appendix table in DIALECT.md, so registering a
new query with an unclassified ``round(`` output fails the suite.

CLI: ``python tools/round_audit.py`` prints the appendix table rows.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_IRRATIONAL = re.compile(r"\b(ln|log|log2|log10|exp|sqrt|pow|power)\s*\(")


def _strip_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def _round_exprs(sql: str) -> list[str]:
    """Every balanced ``round(...)`` expression in output position."""
    sql = _strip_comments(sql)
    out = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        depth, j = 0, m.end() - 1
        while j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        out.append(sql[m.start(): j + 1])
    return out


def audit() -> dict[str, dict[str, int]]:
    """name -> {"irrational": n, "empirical": n} for every oracle whose
    SQL still contains a ``round(`` output site."""
    os.environ.setdefault("FXSPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    from fxspark.queries import ORACLE

    result: dict[str, dict[str, int]] = {}
    for name in sorted(ORACLE):
        counts = {"irrational": 0, "empirical": 0}
        for expr in _round_exprs(ORACLE[name]):
            if _IRRATIONAL.search(expr):
                counts["irrational"] += 1
            else:
                counts["empirical"] += 1
        if counts["irrational"] or counts["empirical"]:
            result[name] = counts
    return result


def table_rows() -> list[str]:
    return [
        f"| {name} | {c['irrational']} | {c['empirical']} |"
        for name, c in audit().items()
    ]


if __name__ == "__main__":  # pragma: no cover — manual generator
    for row in table_rows():
        print(row)
