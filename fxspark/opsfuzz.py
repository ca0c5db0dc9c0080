"""Seeded differential fuzzer for the CURATED OPERATOR API (``fxspark.ops``).

``fxspark/sqlfuzz.py`` covers the raw-SQL migration surface; this module
covers its sibling, the DataFrame operator API — ``dedup_latest``,
``latest_per_key_window``, ``nth_before_cutoff``, ``k_smallest_per_key``,
``grouped_max``, ``pct_change`` — which until round 14 was exercised only by
FIXED registry queries. A seeded composer chains 2-4 ops over the star
schema with randomized keys / order columns / cutoffs / rank parameters, and
every composition is checked against a GENERATED DuckDB oracle: the composer
emits, alongside the op chain, a CTE pipeline whose stage ``i`` is the
documented SQL contract of op ``i`` — so a composition failure localizes to
the first op whose implementation drifts from its contract (the
parameter-boundary bugs fixed registry queries never vary into: composite
keys, rank n past the group size, value-column orderings, cutoffs that empty
a key).

Determinism contract (the ``sqlfuzz`` D-rule discipline, rules O1-O9;
consolidated table with per-rule pins: ``DIALECT.md``):

  O1  Every ORDER-BY spec is made TOTAL by appending the base table's
      unique key columns — window ``row_number``/``max_by``-struct ranks
      are then deterministic under any partitioning in both engines.
  O2  Key, order, and cutoff columns come from a frozen pool of columns
      that are never NULL in the driver testdata (no NULL-ordering
      divergence — sqlfuzz D8 — and ``max_by`` NULL handling never
      engages there); NULL-bearing fixtures engage rule O8.
  O3  The only aggregates are MAX / MIN / COUNT (``grouped_max``) — exact
      at any parallelism; float SUM/AVG stay on the sqlfuzz side where
      the exact-decimal discipline (D2/D3) handles them.
  O4  Cutoff literals are whole-second timestamps from the frozen pools
      (sqlfuzz D7 discipline; the tables' timestamp columns are
      microsecond-precision parquet, identical in both readers).
  O5  Every stage preserves its input columns (terminal ``grouped_max``
      excepted), so any op can legally follow any other; the composer
      tracks the schema and the oracle projects the same names.
  O6  ``pct_change`` appears only in the dedicated two-branch template
      (latest vs rank-2 join — the reference's flagship shape) with its
      documented try_divide NULL-on-zero-base semantics mirrored by
      DuckDB's native x/0 → NULL.
  O7  ``asof_join`` (both directions) is checked against DuckDB's native
      ASOF LEFT JOIN with the RIGHT side pre-deduplicated to one row per
      (key, on) — DuckDB's asof picks an arbitrary row among equal
      timestamps, the op resolves them via ``right_tiebreak``; unique
      (key, on) right rows make both engines' choice the same row by
      construction.
  O8  UNIFIED NULL-ORDER CONTRACT (round 15, ``ops.latest
      .drop_null_order``): EVERY rank op — ``dedup_latest``,
      ``latest_per_key_window``, ``nth_before_cutoff``,
      ``k_smallest_per_key``, and ``asof_join`` on its ``on``
      coordinate — DROPS rows with a NULL in any order column, and the
      generated oracle wraps each stage's input in the same
      ``IS NOT NULL`` filter. Historically this was two rules: O8
      (ksmall drops, since ADVICE r6) and O9 (the others KEPT
      NULL-ordered rows, so the oracle spelled Spark's default NULL
      placement — DESC NULLS LAST / ASC NULLS FIRST — found via the
      sf_mixed divergence where a NULL l_quantity won DuckDB's DESC
      rank). Round 15 unified the op family on the drop semantics (the
      r14 verdict's top ask), so the placement spelling is moot: no
      NULL ever reaches a rank op's ORDER BY.
  O9  RETIRED into O8 (round 15) — kept as a numbered tombstone so
      older notes' citations stay resolvable.
  O10 STATEFUL/WINDOW FAMILY (round 15 — the ops that took the most
      sf_mixed fixes, previously fuzz-uncovered): ``sessionize``
      (O10a: LAG + cumulated session-break flag, NULL session times
      dropped per the op contract, Spark's BIGINT session_id vs
      DuckDB's HUGEINT SUM spelled with a cast), ``keyed_cusum``
      (O10b: the running-sum-minus-low-water-mark closed form with the
      exact-DECIMAL(38,6) deviation and the convert-each-side-to-DOUBLE
      subtraction — byte-for-byte the ops/windows.keyed_cusum
      discipline proven by stream_cusum_replay/user_value_cusum), and
      ``keyed_ewma`` (O10c: DuckDB ``list_reduce`` replays the
      seed-with-first fold over the event-ordered list; alphas are
      DYADIC so the fold is identical IEEE arithmetic in both engines;
      ewma emitted RAW — ROUND(double, 6) splits on the exact 1e-6
      halves dyadic folds produce, rule D22). Time
      coordinates come from the O2/O4 pools (micros-precision parquet
      verified r14 — sessionize's ts-to-ts gap comparisons inherit that
      assumption, as the rank ops' ts orderings already do); every
      stage's oracle input carries the O8 NULL exclusions (order AND
      value for the recurrences — a NULL value is a skipped
      observation, the class-12 contract).

``generate(seed, n)`` is a pure function of its arguments; each composition
draws from ``random.Random(f"{seed}:{i}")`` (prefix-stable: adding templates
never reshuffles earlier compositions). A failing name embeds the seed.

Reference anchor: the chain shapes generalize the reference pipeline's op
sequence — dedup upsert (``Fx_1min.py:106-109``), latest per key
(``Fx_1min.py:169-172``), second-latest before a cutoff
(``Fx_1min.py:190-196``), pct-change projection (``Fx_1min.py:208``).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

__all__ = ["generate", "run_composition", "DEFAULT_SEED", "DEFAULT_N"]

DEFAULT_SEED = 14
DEFAULT_N = 120

# ---------------------------------------------------------------------------
# Frozen table metadata (non-nullable columns only — rule O2).
# ---------------------------------------------------------------------------
META = {
    "events": {
        "cols": ["event_id", "ts", "user_id", "event_type", "value"],
        "unique": ["event_id"],
        "keys": [["user_id"], ["event_type"], ["user_id", "event_type"]],
        "orders": [["ts"], ["value"], ["value", "ts"]],
        "cutoff": ("ts", ["2024-01-08 00:00:00", "2024-01-15 00:00:00",
                          "2024-01-22 00:00:00"]),
        "gmax": ["value", "ts"],
    },
    "orders": {
        "cols": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
        "unique": ["o_orderkey"],
        "keys": [["o_custkey"], ["o_orderstatus"],
                 ["o_orderpriority", "o_orderstatus"]],
        "orders": [["o_orderdate"], ["o_totalprice"],
                   ["o_totalprice", "o_orderdate"]],
        "cutoff": ("o_orderdate", ["1996-01-01 00:00:00",
                                   "1997-06-01 00:00:00",
                                   "1999-01-01 00:00:00"]),
        "gmax": ["o_totalprice", "o_orderdate"],
    },
    "lineitem": {
        "cols": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice", "l_returnflag",
                 "l_shipdate"],
        # sqlfuzz rule D18: (l_orderkey, l_linenumber) is NOT unique in the
        # driver testdata (1,401 dup pairs at sf0.001). The appended
        # tiebreak is the full FK quad — unique at sf0.01/sf0.1; its one
        # sf0.001 dup pair differs in every order-visible payload column
        # on the driver data (ranks stay total) and collapses to
        # projection-identical rows when the payload is nulled, so rank
        # winners are well-defined in every fixture regime.
        "unique": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        "keys": [["l_suppkey"], ["l_returnflag"], ["l_partkey"]],
        "orders": [["l_shipdate"], ["l_extendedprice"],
                   ["l_quantity", "l_shipdate"]],
        "cutoff": ("l_shipdate", ["1996-01-01 00:00:00",
                                  "1997-06-01 00:00:00",
                                  "1999-01-01 00:00:00"]),
        "gmax": ["l_extendedprice", "l_quantity"],
    },
    "documents": {
        "cols": ["doc_id", "lang", "source", "n_chars"],
        "unique": ["doc_id"],
        "keys": [["lang"], ["source"], ["lang", "source"]],
        "orders": [["n_chars"]],
        "cutoff": None,
        "gmax": ["n_chars"],
    },
}


@dataclass
class Stage:
    # dedup | latest_w | ksmall | nth_cutoff | gmax
    # | sessionize | cusum | ewma   (the O10 stateful/window family, r15)
    op: str
    keys: list
    order: list = field(default_factory=list)   # WITHOUT the unique suffix
    n: int = 1                    # rank bound; gap amount for sessionize
    cutoff: str | None = None     # cutoff literal; gap UNIT for sessionize
    cutoff_col: str | None = None  # cutoff col; session time col
    agg_col: str | None = None    # gmax agg; cusum/ewma value col
    params: dict | None = None    # cusum target/slack/threshold; ewma alpha


@dataclass
class Composition:
    name: str
    table: str
    stages: list
    pct: dict | None = None      # the O6 two-branch template, replaces stages
    asof: dict | None = None     # the O7 as-of-join template, replaces stages


def _chain(r: random.Random, table: str, depth: int) -> list[Stage]:
    m = META[table]
    stages: list[Stage] = []
    for pos in range(depth):
        ops = ["dedup", "latest_w", "ksmall"]
        if m["cutoff"] and pos == 0:
            ops.append("nth_cutoff")
        if pos == depth - 1 and pos > 0:
            ops.append("gmax")
        op = r.choice(ops)
        keys = r.choice(m["keys"])
        if op == "gmax":
            stages.append(Stage("gmax", keys, agg_col=r.choice(m["gmax"])))
            break
        order = r.choice(m["orders"])
        if op == "dedup":
            stages.append(Stage("dedup", keys, order))
        elif op == "latest_w":
            stages.append(Stage("latest_w", keys, order, n=r.choice([1, 2, 3])))
        elif op == "ksmall":
            stages.append(Stage("ksmall", keys, order, n=r.choice([2, 3, 5])))
        else:
            col, lits = m["cutoff"]
            # rank n=3 commonly exceeds a key's pre-cutoff row count —
            # the boundary the fixed registry queries never vary
            stages.append(Stage(
                "nth_cutoff", keys, order, n=r.choice([1, 2, 3]),
                cutoff=r.choice(lits), cutoff_col=col,
            ))
    return stages


def generate(seed: int = DEFAULT_SEED, n: int = DEFAULT_N) -> list[Composition]:
    """``n`` compositions, a prefix-stable pure function of ``(seed, n)``."""
    out = []
    for i in range(n):
        r = random.Random(f"{seed}:{i}")
        if i % 8 == 3:  # the O7 as-of-join template (events: type vs type)
            types = ["click", "error", "purchase", "signup", "view"]
            lt = r.choice(types)
            rt = r.choice([t for t in types if t != lt])
            out.append(Composition(
                name=f"op{seed}_{i:03d}_asof_join",
                table="events",
                stages=[],
                asof={
                    "keys": ["user_id"],
                    "left_type": lt,
                    "right_type": rt,
                    "direction": r.choice(["backward", "forward"]),
                },
            ))
            continue
        if i % 8 == 5:  # round-15: the O10 stateful/window family
            table = r.choice(["events", "orders"])
            m = META[table]
            if table == "events":
                tscol, unit, gaps, val = "ts", "SECOND", [1800, 3600, 7200], "value"
                targets, slacks, thrs = [40, 50, 60], [5, 10], [100, 120]
            else:
                tscol, unit, gaps, val = (
                    "o_orderdate", "DAY", [3, 7, 30], "o_totalprice")
                targets, slacks, thrs = [100000, 150000], [1000], [400000]
            stages = []
            if r.random() < 0.5:
                # a proven rank stage up front: the stateful op must
                # compose over transformed frames, not only raw tables
                pk, po = r.choice(m["keys"]), r.choice(m["orders"])
                stages.append(r.choice([
                    Stage("dedup", pk, po),
                    Stage("ksmall", pk, po, n=r.choice([3, 5])),
                ]))
            keys = r.choice(m["keys"])
            if r.random() < 0.5:
                stages.append(Stage(
                    "sessionize", keys, n=r.choice(gaps), cutoff=unit,
                    cutoff_col=tscol,
                ))
            else:
                stages.append(Stage(
                    "cusum", keys, [tscol], agg_col=val,
                    params={"target": r.choice(targets),
                            "slack": r.choice(slacks),
                            "threshold": r.choice(thrs)},
                ))
            tail = r.choice(["none", "ewma", "gmax"])
            if tail == "ewma":
                kk = r.choice([k for k in m["keys"] if len(k) == 1])
                stages.append(Stage(
                    "ewma", kk, [tscol], agg_col=val,
                    params={"alpha": r.choice([0.5, 0.25, 0.75])},
                ))
            elif tail == "gmax":
                stages.append(Stage("gmax", r.choice(m["keys"]),
                                    agg_col=r.choice(m["gmax"])))
            out.append(Composition(
                name=f"op{seed}_{i:03d}_" + "_".join(s.op for s in stages),
                table=table,
                stages=stages,
            ))
            continue
        if i % 8 == 7:  # every 8th: the O6 pct-change two-branch template
            table = r.choice(["events", "orders", "lineitem"])
            m = META[table]
            col, lits = m["cutoff"]
            # pct_change needs a NUMERIC value column — timestamps stay in
            # the gmax pool but are excluded here (cur - prev must divide)
            num = [c for c in m["gmax"] if c not in ("ts", "o_orderdate")]
            out.append(Composition(
                name=f"op{seed}_{i:03d}_pct_change",
                table=table,
                stages=[],
                pct={
                    "keys": r.choice(m["keys"]),
                    "val": r.choice(num),
                    "cutoff": r.choice(lits),
                    "cutoff_col": col,
                },
            ))
            continue
        table = r.choice(list(META))
        depth = r.choice([2, 2, 3, 3, 4])
        stages = _chain(r, table, depth)
        out.append(Composition(
            name=f"op{seed}_{i:03d}_" + "_".join(s.op for s in stages),
            table=table,
            stages=stages,
        ))
    return out


# ---------------------------------------------------------------------------
# Spark execution of a composition.
# ---------------------------------------------------------------------------
def _spark_frame(spark, sf_dir: str, comp: Composition):
    from pyspark.sql import functions as F

    from fxspark.ops.asof import nth_before_cutoff
    from fxspark.ops.change import pct_change
    from fxspark.ops.latest import (
        dedup_latest,
        grouped_max,
        k_smallest_per_key,
        latest_per_key_window,
    )
    from fxspark.session import load_table

    m = META[comp.table]
    df = load_table(spark, sf_dir, comp.table).select(*m["cols"])
    uniq = m["unique"]

    if comp.asof is not None:
        from fxspark.ops.asof import asof_join
        from fxspark.ops.latest import dedup_latest

        a = comp.asof
        keys = a["keys"]
        left = df.filter(F.col("event_type") == a["left_type"]).select(
            "event_id", *keys, "ts", "value"
        )
        # rule O7: one right row per (key, ts) — dedup by the unique
        # event_id so both engines' equal-timestamp choice is the same row
        right = dedup_latest(
            df.filter(F.col("event_type") == a["right_type"]).select(
                "event_id", *keys, "ts", "value"
            ),
            keys + ["ts"],
            ["event_id"],
        ).select(
            *keys, "ts",
            F.col("event_id").alias("r_event_id"),
            F.col("value").alias("r_value"),
        )
        return asof_join(
            left, right, keys, "ts",
            right_payload=["r_event_id", "r_value"],
            direction=a["direction"],
        )

    if comp.pct is not None:
        p = comp.pct
        order = [p["cutoff_col"]] + uniq
        cur = latest_per_key_window(df, p["keys"], order, n=1).select(
            *p["keys"], F.col(p["val"]).alias("cur")
        )
        prev = nth_before_cutoff(
            df, p["keys"], order,
            F.lit(p["cutoff"]).cast("timestamp"), n=2,
        ).select(*p["keys"], F.col(p["val"]).alias("prev"))
        return cur.join(prev, list(p["keys"]), "left").select(
            *p["keys"], "cur", "prev",
            pct_change(F.col("cur"), F.col("prev"), 4).alias("pct"),
        )

    for s in comp.stages:
        order = s.order + [c for c in uniq if c not in s.order]
        if s.op == "dedup":
            df = dedup_latest(df, s.keys, order)
        elif s.op == "latest_w":
            df = latest_per_key_window(df, s.keys, order, n=s.n)
        elif s.op == "ksmall":
            df = k_smallest_per_key(df, s.keys, order, k=s.n)
        elif s.op == "nth_cutoff":
            df = nth_before_cutoff(
                df, s.keys, order,
                F.lit(s.cutoff).cast("timestamp"),
                cutoff_col=s.cutoff_col, n=s.n,
            )
        elif s.op == "sessionize":
            from fxspark.ops.windows import sessionize

            df = sessionize(
                df, s.keys, s.cutoff_col,
                F.expr(f"INTERVAL {s.n} {s.cutoff}"),
                tiebreak=[c for c in uniq if c != s.cutoff_col],
            )
        elif s.op == "cusum":
            from fxspark.ops.windows import keyed_cusum

            p = s.params
            df = keyed_cusum(
                df, s.keys, order, s.agg_col,
                target=F.lit(float(p["target"])),
                slack=float(p["slack"]),
                threshold=float(p["threshold"]),
            )
        elif s.op == "ewma":
            from fxspark.ops.windows import keyed_ewma

            out = keyed_ewma(df, s.keys[0], order, s.agg_col,
                             alpha=s.params["alpha"])
            # RAW fold output (no round), like the registry twin: the
            # fold is bit-identical IEEE with dyadic alpha, while
            # ROUND(double, 6) splits on the exact 1e-6 halves dyadic
            # folds produce (rule D22 — round-15 sf0.1 skew probe)
            df = out.select(s.keys[0], "n_total", "ewma", "last_value")
        elif s.op == "gmax":
            df = grouped_max(df, s.keys, s.agg_col)
    return df


# ---------------------------------------------------------------------------
# Oracle SQL for the same composition (each stage = the op's documented
# SQL contract over the previous CTE).
# ---------------------------------------------------------------------------
def _nn(prev: str, order) -> str:
    # Rule O8 (unified round 15): every rank op drops NULL order
    # coordinates, so each rank stage's oracle input carries the same
    # exclusion. With it, no NULL ever reaches an ORDER BY and the two
    # engines' opposite default NULL placement (sqlfuzz D8) never engages.
    conds = " AND ".join(f"{c} IS NOT NULL" for c in order)
    return f"(SELECT * FROM {prev} WHERE {conds})"


def _rank_cte(prev: str, cols, keys, order_desc, order, pred: str) -> str:
    direction = "DESC" if order_desc else "ASC"
    ob = ", ".join(f"{c} {direction}" for c in order)
    return (
        f"SELECT {', '.join(cols)} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {', '.join(keys)} "
        f"ORDER BY {ob}) AS _rn FROM {prev}) WHERE {pred}"
    )


def oracle_sql(comp: Composition) -> str:
    m = META[comp.table]
    uniq = m["unique"]
    cols = list(m["cols"])
    base = f"s0 AS (SELECT {', '.join(cols)} FROM {comp.table})"
    ctes = [base]

    if comp.asof is not None:
        a = comp.asof
        keys = a["keys"]
        k = ", ".join(keys)
        op = "<=" if a["direction"] == "backward" else ">="
        # rule O8: asof_join drops NULL `on` rows on BOTH sides
        lf = (f"lf AS (SELECT event_id, {k}, ts, value FROM s0 "
              f"WHERE event_type = '{a['left_type']}' AND ts IS NOT NULL)")
        rf = (f"rf AS (SELECT {k}, ts, event_id AS r_event_id, "
              f"value AS r_value FROM ("
              f"SELECT *, row_number() OVER (PARTITION BY {k}, ts "
              f"ORDER BY event_id DESC) AS _rn FROM s0 "
              f"WHERE event_type = '{a['right_type']}' AND ts IS NOT NULL) "
              f"WHERE _rn = 1)")
        on = " AND ".join(f"lf.{c} = rf.{c}" for c in keys)
        return (
            f"WITH {', '.join(ctes + [lf, rf])} "
            f"SELECT lf.event_id, {', '.join('lf.' + c for c in keys)}, "
            f"lf.ts, lf.value, rf.r_event_id, rf.r_value "
            f"FROM lf ASOF LEFT JOIN rf ON {on} AND rf.ts {op} lf.ts"
        )

    if comp.pct is not None:
        p = comp.pct
        keys = p["keys"]
        order = [p["cutoff_col"]] + [c for c in uniq if c != p["cutoff_col"]]
        ob = ", ".join(f"{c} DESC" for c in order)
        cur = (
            f"cur AS (SELECT {', '.join(keys)}, {p['val']} AS cur FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY {', '.join(keys)} "
            f"ORDER BY {ob}) AS _rn FROM s0 "
            # rule O8: latest_per_key_window drops NULL order coordinates
            f"WHERE {p['cutoff_col']} IS NOT NULL) WHERE _rn = 1)"
        )
        prev = (
            f"prv AS (SELECT {', '.join(keys)}, {p['val']} AS prev FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY {', '.join(keys)} "
            f"ORDER BY {ob}) AS _rn FROM s0 "
            f"WHERE {p['cutoff_col']} <= TIMESTAMP '{p['cutoff']}') "
            f"WHERE _rn = 2)"
        )
        on = " AND ".join(f"cur.{k} = prv.{k}" for k in keys)
        sel_keys = ", ".join(f"cur.{k} AS {k}" for k in keys)
        return (
            f"WITH {', '.join(ctes + [cur, prev])} "
            f"SELECT {sel_keys}, cur.cur AS cur, prv.prev AS prev, "
            f"round((cur.cur - prv.prev) / prv.prev * 100, 4) AS pct "
            f"FROM cur LEFT JOIN prv ON {on}"
        )

    for idx, s in enumerate(comp.stages):
        prev = f"s{idx}"
        name = f"s{idx + 1}"
        order = s.order + [c for c in uniq if c not in s.order]
        if s.op == "dedup":
            body = _rank_cte(_nn(prev, order), cols, s.keys, True, order,
                             "_rn = 1")
        elif s.op == "latest_w":
            body = _rank_cte(_nn(prev, order), cols, s.keys, True, order,
                             f"_rn <= {s.n}")
        elif s.op == "ksmall":
            body = _rank_cte(_nn(prev, order), cols, s.keys, False, order,
                             f"_rn <= {s.n}")
        elif s.op == "nth_cutoff":
            nn = " AND ".join(f"{c} IS NOT NULL" for c in order)
            filt = (f"(SELECT * FROM {prev} WHERE {nn} "
                    f"AND {s.cutoff_col} <= TIMESTAMP '{s.cutoff}')")
            body = _rank_cte(filt, cols, s.keys, True, order,
                             f"_rn = {s.n}")
        elif s.op == "sessionize":
            # rule O10a: gap-session assignment — LAG + cumulated is_new,
            # NULL session times dropped (the op's contract), window
            # totalized by the unique key. Spark's SUM(int)-1 is BIGINT;
            # DuckDB's SUM(int) is HUGEINT, hence the cast.
            k = ", ".join(s.keys)
            tb = ", ".join(c for c in uniq if c != s.cutoff_col)
            ob = f"{s.cutoff_col}, {tb}" if tb else s.cutoff_col
            lagts = (f"LAG({s.cutoff_col}) OVER "
                     f"(PARTITION BY {k} ORDER BY {ob})")
            body = (
                f"SELECT {', '.join(cols)}, "
                f"CAST(SUM(_new) OVER (PARTITION BY {k} ORDER BY {ob} "
                f"ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id "
                f"FROM (SELECT *, CASE WHEN {lagts} IS NULL OR "
                f"{s.cutoff_col} > {lagts} + INTERVAL {s.n} {s.cutoff} "
                f"THEN 1 ELSE 0 END AS _new FROM (SELECT * FROM {prev} "
                f"WHERE {s.cutoff_col} IS NOT NULL))"
            )
            cols = cols + ["session_id"]
        elif s.op == "cusum":
            # rule O10b: the keyed_cusum closed form — running exact-
            # decimal sum minus its low-water-mark, both windows over the
            # totalized order; the DECIMAL(38,6)→DOUBLE conversion order
            # mirrors ops/windows.keyed_cusum exactly (the proven
            # stream_cusum_replay / user_value_cusum discipline).
            p = s.params
            k = ", ".join(s.keys)
            ob = ", ".join(order)
            w = (f"PARTITION BY {k} ORDER BY {ob} "
                 f"ROWS UNBOUNDED PRECEDING")
            nn = " AND ".join(
                f"{c} IS NOT NULL" for c in [*order, s.agg_col])
            e = (f"CAST({s.agg_col} - {float(p['target'])!r} - "
                 f"{float(p['slack'])!r} AS DECIMAL(38,6))")
            cus = (f"CAST(_cum AS DOUBLE) - "
                   f"CAST(LEAST(CAST(0 AS DECIMAL(38,6)), "
                   f"MIN(_cum) OVER ({w})) AS DOUBLE)")
            body = (
                f"SELECT {', '.join(cols)}, cusum, "
                f"cusum > {float(p['threshold'])!r} AS alert FROM ("
                f"SELECT *, {cus} AS cusum FROM ("
                f"SELECT *, SUM({e}) OVER ({w}) AS _cum "
                f"FROM (SELECT * FROM {prev} WHERE {nn})))"
            )
            cols = cols + ["cusum", "alert"]
        elif s.op == "ewma":
            # rule O10c: the declared sequential fold — DuckDB replays
            # keyed_ewma's seed-with-first recurrence via list_reduce over
            # the event-ordered value list (the user_value_ewma oracle
            # shape); dyadic alpha keeps the fold pure-IEEE-identical.
            a = s.params["alpha"]
            key = s.keys[0]
            ob = ", ".join(order)
            nn = " AND ".join(
                f"{c} IS NOT NULL" for c in [*order, s.agg_col])
            body = (
                f"SELECT {key}, CAST(len(vals) AS BIGINT) AS n_total, "
                f"list_reduce(vals, (acc, x) -> {a!r}*x + "
                f"{1.0 - a!r}*acc) AS ewma, vals[-1] AS last_value "
                f"FROM (SELECT {key}, array_agg(CAST({s.agg_col} AS DOUBLE) "
                f"ORDER BY {ob}) AS vals FROM {prev} "
                f"WHERE {nn} GROUP BY {key})"
            )
            cols = [key, "n_total", "ewma", "last_value"]
        elif s.op == "gmax":
            body = (
                f"SELECT {', '.join(s.keys)}, max({s.agg_col}) AS "
                f"max_{s.agg_col} FROM {prev} GROUP BY {', '.join(s.keys)}"
            )
            cols = list(s.keys) + [f"max_{s.agg_col}"]
        ctes.append(f"{name} AS ({body})")
    return f"WITH {', '.join(ctes)} SELECT * FROM s{len(comp.stages)}"


def run_composition(spark, con, sf_dir: str, comp: Composition) -> dict:
    """Execute one composition on both engines; driver-style compare."""
    from tests.oracle_diff import compare

    sdf = _spark_frame(spark, sf_dir, comp).toPandas()
    odf = con.execute(oracle_sql(comp)).fetchdf()
    return compare(sdf, odf)


def main() -> None:  # pragma: no cover — manual differential runner
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from fxspark.session import get_spark
    from tests.oracle_diff import diff_report, duck_connect

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_SEED
    n = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_N
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    spark = get_spark("opsfuzz")
    con = duck_connect(sf)
    bad = 0
    for comp in generate(seed, n):
        try:
            res = run_composition(spark, con, sf, comp)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"{comp.name}: ERROR {ex!r:.300}", flush=True)
            bad += 1
            continue
        print(diff_report(comp.name, res), flush=True)
        if not res["ok"]:
            print(f"  oracle: {oracle_sql(comp)}", flush=True)
            bad += 1
    print(f"\n{n - bad}/{n} match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":  # pragma: no cover
    main()
