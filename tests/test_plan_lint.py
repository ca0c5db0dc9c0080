"""Global plan lint: invariants every registered query's PHYSICAL plan must
hold, checked wholesale rather than per-query. These are the two absolute
bans the 100 TB design rests on — individual topology assertions live in
test_plans.py; this guarantees no future registration quietly violates the
floor rules.

- No ``CartesianProduct`` anywhere: every cross join in the surface must be
  a broadcast of a provably tiny frame (scalar aggregates, codebooks, bucket
  seeds), which Spark plans as BroadcastNestedLoopJoin — an unbounded
  cartesian is always a bug.
- No ``BatchEvalPython`` (row-at-a-time Python UDF): Python is allowed only
  behind Arrow (``ArrowEvalPython`` / mapInPandas / grouped-agg pandas),
  never per-row.
"""

from __future__ import annotations

from fxspark.queries import QUERIES

BANNED = ("CartesianProduct", "BatchEvalPython")


def test_every_query_plan_respects_global_bans(spark, sf_dir):
    violations: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [t for t in BANNED if t in plan]
        if hits:
            violations[name] = hits
    assert not violations, violations
