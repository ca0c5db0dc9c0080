"""Seeded ad-hoc SQL differential fuzzer for the ``register_views`` surface.

The reference's users speak raw SQL first (``Fx_1min.py:147-217`` drives
MySQL with hand-written SELECTs); the engine's migration path for any query
NOT on the curated registry is ``fxspark.session.register_views`` +
``spark.sql``.  Until round 13 that surface had exactly one
oracle-differential twin (``RATE_CHANGE_SQL``).  This module closes the
evidence gap: a deterministic generator emits a few hundred SELECTs over the
star schema — joins, grouped aggregates with HAVING, window ranks, scalar /
EXISTS / IN subqueries, CASE buckets, set ops, ROLLUP — and each generated
string is executed VERBATIM by both Spark SQL (over the registered views)
and DuckDB (over the same parquet files), then compared with the same
order-insensitive canonicalization the driver's correctness gate uses
(``tests/oracle_diff.py``).

Determinism contract
--------------------
(Consolidated D+O rule table with per-rule pin tests: ``DIALECT.md`` at the
repo root; this docstring stays the full rationale for the D-rules.)

* ``generate(seed, n)`` is a pure function of its arguments: a
  ``random.Random(seed)`` drives every choice, so a failing query name
  (``fz{seed}_{i:03d}_{template}``) reproduces exactly from the seed.
* Every emitted query is ENGINE-DETERMINISTIC by construction — the same
  SQL string must denote one well-defined result set in both dialects, so
  the comparator can demand bit-equality (full-precision float repr), not
  tolerance.  The rules that buy that (each is a real Spark-vs-DuckDB
  divergence found while building the generator):

  D1  Integer ``SUM`` is always wrapped ``CAST(SUM(x) AS BIGINT)`` —
      DuckDB widens to HUGEINT (float64 via pandas), Spark stays BIGINT.
  D2  Floating-point ``SUM`` goes through the exact-decimal route
      ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`` — both engines sum
      decimals exactly, so partial-aggregation order (which differs and is
      nondeterministic in BOTH engines) cannot move the last ulp.  Same
      discipline as ``fxspark.queries.exact_sum``.
  D3  Averages are emitted as exact-sum / COUNT — ``AVG(double)`` is
      order-sensitive in the last ulp.
  D4  Every non-constant denominator is guarded with ``NULLIF(d, 0)``:
      on x/0 Spark's default ANSI mode RAISES while DuckDB yields NULL
      (rationale corrected round 14 and pinned by
      ``tests/test_degenerate_registry.py::
      test_ansi_divide_by_zero_divergence_pin``), so an unguarded
      division is a cross-engine divergence; the guard makes both
      engines produce NULL.
  D5  Window ``ORDER BY`` always ends in a unique key, and rank filters
      use ``RANK()`` (tie-complete) — ``ROW_NUMBER`` over a non-unique
      order is nondeterministic in any engine.
  D6  ``LIMIT`` only appears under a total order on a unique key.
  D7  ``events.ts`` may be parquet TIMESTAMP(NANOS): Spark then reads it
      at microsecond precision (``nanosAsLong`` + floor-div in
      ``load_table``) while DuckDB keeps nanos.  ``ts`` therefore appears
      only in predicates against whole-second literals (floor-truncation
      can never cross a whole-second boundary, so comparisons agree) and
      under ``date_trunc`` — never projected raw or min/max-aggregated.
      (Round-14 factual update: the CURRENT driver testdata stores ts as
      TIMESTAMP(MICROS) at all three SFs, where raw projection would be
      safe — the quarantine is KEPT because the corpus must stay valid
      for either physical type the ``load_table`` nanos path supports;
      the registry covers micros-ts projection, e.g. user_value_locf.)
      ``o_orderdate`` / ``l_shipdate`` are micros in the file and safe.
  D8  Default NULL ordering differs (Spark ASC=NULLS FIRST, DuckDB
      ASC=NULLS LAST), so a sort key that can be NULL always carries an
      EXPLICIT ``NULLS FIRST``/``NULLS LAST`` — both dialects accept the
      syntax and agree on its meaning.  (Wave 4 retired the original
      blanket restriction to non-nullable source columns: nullable
      computed sort keys — ``NULLIF``, guarded division — are now fuzzed
      under the explicit form, see ``t_order_nulls``/``t_coalesce_nullif``.
      Non-nullable source-column keys may still omit the clause.)
  D9  ROLLUP group keys are strings only — an integer group column that
      gains subtotal NULLs changes pandas dtype (int→float) differently
      per driver version; strings stay object-typed.
  D10 ``documents.text`` and ``events.props`` (free text / JSON) and
      ``embeddings.embedding`` (list column — breaks the row sort) are
      excluded from the fuzz surface; the curated registry covers them.
  D11 No ``DECIMAL`` value ever reaches the output schema (Spark surfaces
      ``Decimal`` objects, DuckDB float64) — every decimal aggregate is
      cast back to DOUBLE (D2) or BIGINT (D1).
  D12 DECLARED DIALECT DIFFERENCE (found by the rotating-seed fuzz run in
      round 13, minimized in ``tests/test_sql_fuzz.py::
      test_rollup_empty_input_divergence``): ``GROUP BY ROLLUP/CUBE``
      over an EMPTY input yields the grand-total grouping-set row in
      DuckDB (and PostgreSQL — the SQL-standard reading: the ``()``
      grouping set aggregates the empty input like a plain ungrouped
      aggregate) but ZERO rows in Spark.  The rollup template appends
      ``HAVING COUNT(*) > 0``, which is a no-op on every row a non-empty
      input can produce (all rollup subtotals aggregate ≥1 row) and
      filters exactly the divergent empty-input row.
  D13 DATE-typed OUTPUT columns are always projected through
      ``CAST(... AS STRING)`` (wave-4 probe: the VALUES agree, but pandas
      surfaces a Spark DATE as ``datetime.date`` and a DuckDB DATE as
      ``datetime64`` — a representation split the strict comparator
      cannot unify without weakening).  DATE values in predicates and
      GROUP BY keys are unrestricted.
  D14 ``EXTRACT`` fields are limited to YEAR/MONTH/DAY/QUARTER — a real
      dialect divergence found by the wave-4 probe: ``EXTRACT(DOW ...)``
      numbers Sunday 1 in Spark but 0 in DuckDB (ISO variants aren't
      portable either: Spark lacks ISODOW).
  D15 Transcendentals (``LN``/``EXP``/``POWER``) are excluded — the
      wave-5 probe caught ``LN(l_extendedprice)`` differing in the last
      ulp (10.681817898257751 vs 10.68181789825775): Spark evaluates via
      ``java.lang.Math``, DuckDB via C libm, and neither guarantees
      correctly-rounded results.  ``SQRT`` IS in the pool — IEEE 754
      requires sqrt to be correctly rounded, so both engines agree
      bit-for-bit (probed).  ``ROUND(x, d)`` for d in [-1, 2] probed
      identical over the full 600k-row sf0.1 lineitem.
  D16 Integer-typing splits (all found by the wave-5 probe): a DOUBLE
      cast to an integer type ROUNDS in DuckDB but TRUNCATES in Spark
      (``CAST(l_extendedprice AS BIGINT)``: 100047 vs 100046), so the
      fuzz surface never casts a non-integral double to an integer type;
      ``CEIL``/``FLOOR`` return BIGINT in Spark but DOUBLE in DuckDB and
      are always wrapped ``CAST(... AS DOUBLE)``; ``SIGN`` returns DOUBLE
      in Spark and an integer type in DuckDB and is wrapped
      ``CAST(... AS BIGINT)`` (exact: its range is {-1, 0, 1}).
  D17 Ordered string aggregation is NOT portable and is excluded:
      Spark 4 spells it ``LISTAGG/STRING_AGG(x, sep) WITHIN GROUP
      (ORDER BY y)`` while DuckDB only accepts the inline form
      ``STRING_AGG(x, sep ORDER BY y)`` — each engine rejects the
      other's syntax (probed both directions).  ``QUALIFY`` is DuckDB /
      Databricks syntax that OSS Spark 4 rejects; rank filters stay in
      the D5 subquery form.
  D18 The driver testdata's ``lineitem`` composite key
      ``(l_orderkey, l_linenumber)`` is NOT unique (measured: 1,401 dup
      pairs of 6,000 rows at sf0.001; no column set is unique at every
      SF), discovered when the wave-5 LAG/LEAD templates diverged.
      Consequence: on lineitem, an ORDER BY ending in the "unique" key
      does NOT totalize the order, so constructs whose OUTPUT
      distinguishes tie order are nondeterministic there.  The wave-5
      per-row window templates (offsets, ROWS frames, value functions,
      distribution ranks) and MAX_BY/MIN_BY therefore draw only from
      tables whose single-column key is verified unique at all three SFs
      (orders/events/customer/part/...).  The PRE-wave-5 lineitem shapes
      stay deterministic for structural reasons: RANK is tie-complete
      (D5), the default window frame is RANGE (tie-peers aggregate
      together), and projections that expose only the sort columns make
      tied rows indistinguishable, so any tie order yields the same
      output multiset.  (t_range_interval keeps lineitem: RANGE frames
      give tie-peers identical outputs, so intra-peer order is
      projection-invisible.)
  D19 ``split_part(NULL, sep, n)`` is NULL in Spark but ``''`` in DuckDB
      (found by the sf_nulls fixture run) — the fuzz surface feeds
      split_part through ``COALESCE(s, '')`` so both engines see a
      non-NULL operand; INSTR/LENGTH/UPPER/... propagate NULL
      identically and stay raw.
  D21 SEMI/ANTI join syntax split (wave-6 probe): both dialects parse
      the BARE ``SEMI JOIN`` / ``ANTI JOIN`` keywords, but the
      LEFT-prefixed spelling (``LEFT SEMI JOIN``) is Spark-only — DuckDB
      rejects it with a parser error. The corpus emits only the bare
      form. (D20, the seconds-truncating RANGE-frame hazard, is a
      registry-side rule — see DIALECT.md.)
  D23 MAX_BY/MIN_BY NULL-PAYLOAD split (round-16 sf_inulls run): Spark
      returns the (possibly NULL) payload carried by the extreme-key
      row; DuckDB's arg_max/arg_min SKIP rows whose payload is NULL and
      return the extreme among the rest. t_arg_minmax appends
      ``AND <payload> IS NOT NULL`` so both engines see the same
      observation set (the registry twin is the D23 row in DIALECT.md).
  D26 CONCAT NULL split (round-16 sf_inulls run): Spark ``CONCAT``
      propagates NULL (any NULL argument nullifies the result), DuckDB
      ``CONCAT`` SKIPS NULL arguments per the SQL-standard CONCAT. The
      corpus emits the ``||`` operator instead, which is NULL-propagating
      in BOTH dialects.

Literal pools are frozen constants drawn from the public testdata
generator's category values and value ranges (``TESTDATA.md``); they are
scale-factor-independent, so the same generated corpus is valid at any
``sf*`` directory.

Reference anchor: the generated shapes deliberately cover the §2 query
inventory the reference exercises — CTE-style projection chains, grouped
max, top-1-per-group, theta self-joins, CASE/pct scalars
(``update_exchange_rates.py:60-153``) — plus the star-schema joins any
SQL-first user would bring.
"""

from __future__ import annotations

import random

__all__ = ["generate", "TEMPLATES", "DEFAULT_SEED", "DEFAULT_N"]

DEFAULT_SEED = 13
DEFAULT_N = 240

# ---------------------------------------------------------------------------
# Schema model.  kind: i=integral, f=double, s=string, d=timestamp(us),
# T=timestamp(ns) (predicate/date_trunc only — rule D7).
# ---------------------------------------------------------------------------
COLS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "i", "r_name": "s"},
    "nation": {"n_nationkey": "i", "n_name": "s", "n_regionkey": "i"},
    "customer": {
        "c_custkey": "i", "c_name": "s", "c_nationkey": "i",
        "c_acctbal": "f", "c_mktsegment": "s",
    },
    "supplier": {
        "s_suppkey": "i", "s_name": "s", "s_nationkey": "i", "s_acctbal": "f",
    },
    "part": {
        "p_partkey": "i", "p_name": "s", "p_brand": "s", "p_type": "s",
        "p_size": "i", "p_retailprice": "f",
    },
    "orders": {
        "o_orderkey": "i", "o_custkey": "i", "o_orderstatus": "s",
        "o_totalprice": "f", "o_orderdate": "d", "o_orderpriority": "s",
    },
    "lineitem": {
        "l_orderkey": "i", "l_partkey": "i", "l_suppkey": "i",
        "l_linenumber": "i", "l_quantity": "f", "l_extendedprice": "f",
        "l_discount": "f", "l_tax": "f", "l_returnflag": "s",
        "l_linestatus": "s", "l_shipdate": "d",
    },
    "events": {
        "event_id": "i", "ts": "T", "user_id": "i", "event_type": "s",
        "value": "f",
    },
    "documents": {"doc_id": "i", "lang": "s", "source": "s", "n_chars": "i"},
    "embeddings": {"vec_id": "i", "label": "i"},
}

# Unique row key per table (composite for lineitem) — rules D5/D6.
UNIQUE: dict[str, list[str]] = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"], "events": ["event_id"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}

# FK edges (child col = parent col) — the star-schema join graph.
FKS: list[tuple[str, str, str, str]] = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]

# Frozen literal pools (TESTDATA.md generator output; SF-independent).
STR_LITS: dict[str, list[str]] = {
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "event_type": ["click", "error", "purchase", "signup", "view"],
    "lang": ["de", "en", "es", "fr", "zh"],
    "source": ["src1", "src5", "src12", "src19"],
    "p_brand": ["Brand#3", "Brand#13", "Brand#21", "Brand#25"],
    "p_type": ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}
NUM_LITS: dict[str, list] = {
    "c_acctbal": [0.0, 2500.0, 5000.0, 7500.0],
    "s_acctbal": [0.0, 2500.0, 5000.0, 7500.0],
    "p_size": [10, 20, 30, 40],
    "p_retailprice": [920.0, 950.0, 980.0],
    "o_totalprice": [50000.0, 100000.0, 200000.0],
    "l_quantity": [10.0, 25.0, 40.0],
    "l_extendedprice": [10000.0, 25000.0, 45000.0],
    "l_discount": [0.02, 0.05, 0.08],
    "l_tax": [0.02, 0.04, 0.06],
    "value": [5.0, 50.0, 150.0],
    "n_chars": [100, 200, 350, 450],
    "label": [2, 5, 8],
    "n_regionkey": [1, 2, 3],
    "c_nationkey": [5, 10, 15, 20],
    "s_nationkey": [5, 10, 15, 20],
    "l_linenumber": [2, 3, 4],
}
DATE_LITS: dict[str, list[str]] = {
    "o_orderdate": ["1996-01-01", "1997-06-01", "1999-01-01", "2000-06-01"],
    "l_shipdate": ["1996-01-01", "1997-06-01", "1999-01-01", "2000-06-01"],
    "ts": ["2024-01-08 00:00:00", "2024-01-15 00:00:00",
           "2024-01-22 00:00:00"],
}


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _cols_of(t: str, kinds: str) -> list[str]:
    return [c for c, k in COLS[t].items() if k in kinds]


# ---------------------------------------------------------------------------
# Expression builders.  ``a`` is the table alias prefix ("" or "t0.").
# ---------------------------------------------------------------------------
def _pred(r: random.Random, t: str, a: str = "") -> str:
    """One deterministic predicate on a column of ``t``."""
    kindpool = [c for c in COLS[t]
                if c in STR_LITS or c in NUM_LITS or c in DATE_LITS]
    c = r.choice(kindpool)
    col = a + c
    if c in STR_LITS:
        form = r.randrange(4)
        if form == 0:
            return f"{col} = {_q(r.choice(STR_LITS[c]))}"
        if form == 1:
            picks = r.sample(STR_LITS[c], min(2, len(STR_LITS[c])))
            return f"{col} IN ({', '.join(_q(p) for p in picks)})"
        if form == 2:
            return f"{col} <> {_q(r.choice(STR_LITS[c]))}"
        return f"{col} LIKE {_q(r.choice(STR_LITS[c])[:2] + '%')}"
    if c in DATE_LITS:
        lits = DATE_LITS[c]
        form = r.randrange(3)
        if form == 0:
            return f"{col} >= TIMESTAMP {_q(r.choice(lits))}"
        if form == 1:
            return f"{col} < TIMESTAMP {_q(r.choice(lits))}"
        lo, hi = sorted(r.sample(range(len(lits)), 2))
        return (f"{col} BETWEEN TIMESTAMP {_q(lits[lo])}"
                f" AND TIMESTAMP {_q(lits[hi])}")
    lit = r.choice(NUM_LITS[c])
    op = r.choice([">", ">=", "<", "<=", "="])
    if op == "=" and isinstance(lit, float):
        op = "<="  # float equality is a degenerate filter on continuous cols
    return f"{col} {op} {lit}"


def _where(r: random.Random, t: str, a: str = "", n: int | None = None) -> str:
    n = n if n is not None else r.randrange(1, 3)
    parts = [_pred(r, t, a) for _ in range(n)]
    return " AND ".join(dict.fromkeys(parts))  # dedup, keep order


def _sum_exact(col: str) -> str:
    """Rule D2: order-insensitive float sum via exact decimals."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(28,6))) AS DOUBLE)"


def _agg(r: random.Random, t: str, a: str, alias: str) -> str:
    """One aggregate expression honoring rules D1-D3, with alias."""
    fcols = _cols_of(t, "f")
    icols = _cols_of(t, "i")
    choices = ["count"]
    if fcols:
        choices += ["fsum", "fmin", "fmax", "favg"]
    if icols:
        choices += ["isum", "imin", "imax", "cntd"]
    kind = r.choice(choices)
    if kind == "count":
        return f"CAST(COUNT(*) AS BIGINT) AS {alias}"
    if kind == "cntd":
        c = a + r.choice(icols)
        return f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {alias}"
    if kind.startswith("f"):
        c = a + r.choice(fcols)
        if kind == "fsum":
            return f"{_sum_exact(c)} AS {alias}"
        if kind == "favg":
            return f"{_sum_exact(c)} / COUNT({c}) AS {alias}"
        return f"{kind[1:].upper()}({c}) AS {alias}"
    c = a + r.choice(icols)
    if kind == "isum":
        return f"CAST(SUM({c}) AS BIGINT) AS {alias}"
    return f"CAST({kind[1:].upper()}({c}) AS BIGINT) AS {alias}"


def _scalar(r: random.Random, t: str, a: str, alias: str) -> str:
    """A per-row scalar expression (same IEEE tree both engines)."""
    fcols = _cols_of(t, "f")
    scols = _cols_of(t, "s")
    icols = _cols_of(t, "i")
    forms = []
    if len(fcols) >= 2:
        forms.append("arith")
    if fcols:
        forms += ["case", "guard_div"]
    if scols:
        forms += ["strfun", "concat"]
    if icols:
        forms.append("mod")
    form = r.choice(forms)
    if form == "arith":
        x, y = r.sample(fcols, 2)
        op = r.choice(["+", "-", "*"])
        return f"({a}{x} {op} {a}{y}) AS {alias}"
    if form == "guard_div":
        x = r.choice(fcols)
        y = r.choice(fcols)
        return f"({a}{x} / NULLIF({a}{y}, 0.0)) AS {alias}"
    if form == "case":
        x = r.choice(fcols)
        lits = NUM_LITS.get(x, [1.0, 10.0])
        lo, hi = min(lits), max(lits)
        return (f"CASE WHEN {a}{x} < {lo} THEN 'lo' "
                f"WHEN {a}{x} < {hi} THEN 'mid' ELSE 'hi' END AS {alias}")
    if form == "strfun":
        s = r.choice(scols)
        fn = r.choice([f"UPPER({a}{s})", f"LOWER({a}{s})",
                       f"SUBSTR({a}{s}, 1, 3)",
                       f"CAST(LENGTH({a}{s}) AS BIGINT)"])
        return f"{fn} AS {alias}"
    if form == "concat":
        # D26: || is NULL-propagating in both dialects; CONCAT is not
        s = r.choice(scols)
        s2 = r.choice(scols)
        return f"({a}{s} || '-' || {a}{s2}) AS {alias}"
    x = r.choice(icols)
    return f"({a}{x} % {r.choice([7, 10, 13])}) AS {alias}"


def _join_chain(r: random.Random, depth: int) -> tuple[list[str], list[str]]:
    """Random FK walk: returns (tables, join conditions) with aliases t0..tn.

    t0 is a fact table; each hop follows a child→parent FK edge from any
    table already in the chain, so every join is a key-equality the
    optimizer can reorder/broadcast.
    """
    t0 = r.choice(["lineitem", "orders", "events", "customer"])
    tables = [t0]
    conds: list[str] = []
    for _ in range(depth):
        opts = [
            (i, ck, pt, pk)
            for i, ct in enumerate(tables)
            for (c, ck, pt, pk) in FKS
            if c == ct and pt not in tables
        ]
        if not opts:
            break
        i, ck, pt, pk = r.choice(opts)
        conds.append(f"t{i}.{ck} = t{len(tables)}.{pk}")
        tables.append(pt)
    return tables, conds


# ---------------------------------------------------------------------------
# Templates.  Each takes the seeded Random and returns one SQL string.
# ---------------------------------------------------------------------------
def t_filter_project(r: random.Random) -> str:
    t = r.choice(list(COLS))
    keys = ", ".join(UNIQUE[t])
    sc1 = _scalar(r, t, "", "c0")
    sc2 = _scalar(r, t, "", "c1")
    return (f"SELECT {keys}, {sc1}, {sc2} FROM {t} "
            f"WHERE {_where(r, t)}")


def t_group_agg(r: random.Random) -> str:
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    g = r.choice(_cols_of(t, "s"))
    a1 = _agg(r, t, "", "a0")
    a2 = _agg(r, t, "", "a1")
    having = f"COUNT(*) >= {r.choice([2, 5, 10])}"
    return (f"SELECT {g}, {a1}, {a2} FROM {t} WHERE {_where(r, t)} "
            f"GROUP BY {g} HAVING {having}")


def t_join_agg(r: random.Random) -> str:
    tables, conds = _join_chain(r, r.randrange(1, 4))
    if not conds:
        return t_group_agg(r)
    gi, gt = r.choice([(i, t) for i, t in enumerate(tables)
                       if _cols_of(t, "s")] or [(0, tables[0])])
    gcols = _cols_of(gt, "s")
    g = f"t{gi}." + (r.choice(gcols) if gcols else UNIQUE[gt][0])
    ai, at = r.choice(list(enumerate(tables)))
    a1 = _agg(r, at, f"t{ai}.", "a0")
    frm = " , ".join(f"{t} t{i}" for i, t in enumerate(tables))
    wi, wt = r.choice(list(enumerate(tables)))
    where = " AND ".join(conds + [_where(r, wt, f"t{wi}.", 1)])
    return (f"SELECT {g} AS g0, {a1} FROM {frm} WHERE {where} "
            f"GROUP BY {g}")


def t_explicit_join(r: random.Random) -> str:
    tables, conds = _join_chain(r, r.randrange(1, 3))
    if not conds:
        return t_group_agg(r)
    frm = f"{tables[0]} t0"
    for j in range(1, len(tables)):
        frm += f" JOIN {tables[j]} t{j} ON {conds[j - 1]}"
    gi, gt = r.choice([(i, t) for i, t in enumerate(tables)
                       if _cols_of(t, "s")] or [(0, tables[0])])
    gcols = _cols_of(gt, "s")
    g = f"t{gi}." + (r.choice(gcols) if gcols else UNIQUE[gt][0])
    a1 = _agg(r, tables[0], "t0.", "a0")
    a2 = _agg(r, tables[-1], f"t{len(tables) - 1}.", "a1")
    wi, wt = r.choice(list(enumerate(tables)))
    return (f"SELECT {g} AS g0, {a1}, {a2} FROM {frm} "
            f"WHERE {_where(r, wt, f't{wi}.', 1)} GROUP BY {g}")


def t_left_join(r: random.Random) -> str:
    child, ck, parent, pk = r.choice(
        [(c, ck, p, pk) for (c, ck, p, pk) in FKS
         if c in ("orders", "events", "lineitem")]
    )
    # parent LEFT JOIN child: unmatched parents produce NULL aggregates.
    fcols = _cols_of(child, "f")
    f = r.choice(fcols)
    pkey = UNIQUE[parent][0]
    return (
        f"SELECT t0.{pkey} AS g0, CAST(COUNT(t1.{ck}) AS BIGINT) AS a0, "
        f"COALESCE({_sum_exact('t1.' + f)}, 0.0) AS a1 "
        f"FROM {parent} t0 LEFT JOIN {child} t1 ON t0.{pk} = t1.{ck} "
        f"AND {_pred(r, child, 't1.')} "
        f"WHERE {_pred(r, parent, 't0.')} GROUP BY t0.{pkey}"
    )


def t_theta_join(r: random.Random) -> str:
    days = r.choice([30, 60, 90])
    return (
        "SELECT t1.l_returnflag AS g0, CAST(COUNT(*) AS BIGINT) AS a0, "
        f"{_sum_exact('t1.l_extendedprice')} AS a1 "
        "FROM orders t0 JOIN lineitem t1 ON t0.o_orderkey = t1.l_orderkey "
        f"AND t1.l_shipdate <= t0.o_orderdate + INTERVAL {days} DAY "
        f"WHERE {_pred(r, 'orders', 't0.')} GROUP BY t1.l_returnflag"
    )


def t_window_rank(r: random.Random) -> str:
    t = r.choice(["orders", "lineitem", "events", "customer", "part",
                  "documents"])
    scols = _cols_of(t, "s")
    g = r.choice(scols)
    x = r.choice(_cols_of(t, "f") or _cols_of(t, "i"))
    u = ", ".join(UNIQUE[t])
    k = r.choice([2, 3, 5])
    fn = r.choice(["RANK()", "DENSE_RANK()"])
    keys = ", ".join(UNIQUE[t])
    return (
        f"SELECT g0, {keys}, rk FROM ("
        f"SELECT {g} AS g0, {keys}, {fn} OVER "
        f"(PARTITION BY {g} ORDER BY {x} DESC, {u}) AS rk "
        f"FROM {t} WHERE {_where(r, t, '', 1)}) q WHERE rk <= {k}"
    )


def t_window_running(r: random.Random) -> str:
    # Running exact-decimal sum per order, frame defined by the unique
    # (l_orderkey, l_linenumber) order — rule D5.
    return (
        "SELECT l_orderkey, l_linenumber, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER "
        "(PARTITION BY l_orderkey ORDER BY l_linenumber) AS DOUBLE) AS c0 "
        f"FROM lineitem WHERE {_pred(r, 'lineitem')}"
    )


def t_scalar_subquery(r: random.Random) -> str:
    t = r.choice(["orders", "lineitem", "customer", "events", "part"])
    x = r.choice(_cols_of(t, "f"))
    keys = ", ".join(UNIQUE[t])
    return (
        f"SELECT {keys}, {x} FROM {t} WHERE {x} > "
        f"(SELECT {_sum_exact(x)} / COUNT(*) FROM {t}) "
        f"AND {_pred(r, t)}"
    )


def t_exists(r: random.Random) -> str:
    child, ck, parent, pk = r.choice(FKS)
    neg = r.choice(["EXISTS", "NOT EXISTS"])
    pcols = _cols_of(parent, "s") or [UNIQUE[parent][0]]
    g = r.choice(pcols)
    return (
        f"SELECT t0.{g} AS g0, CAST(COUNT(*) AS BIGINT) AS a0 "
        f"FROM {parent} t0 WHERE {neg} "
        f"(SELECT 1 FROM {child} t1 WHERE t1.{ck} = t0.{pk} "
        f"AND {_pred(r, child, 't1.')}) GROUP BY t0.{g}"
    )


def t_in_subquery(r: random.Random) -> str:
    child, ck, parent, pk = r.choice(FKS)
    ccols = _cols_of(child, "s") or [UNIQUE[child][0]]
    g = r.choice(ccols)
    return (
        f"SELECT {g} AS g0, CAST(COUNT(*) AS BIGINT) AS a0 FROM {child} "
        f"WHERE {ck} IN (SELECT {pk} FROM {parent} "
        f"WHERE {_pred(r, parent)}) GROUP BY {g}"
    )


def t_case_bucket(r: random.Random) -> str:
    t = r.choice(["orders", "lineitem", "customer", "events", "part",
                  "documents"])
    x = r.choice(_cols_of(t, "f") or _cols_of(t, "i"))
    lits = sorted(NUM_LITS.get(x, [10, 100]))
    lo, hi = lits[0], lits[-1]
    a1 = _agg(r, t, "", "a0")
    return (
        f"SELECT CASE WHEN {x} < {lo} THEN 'lo' WHEN {x} < {hi} "
        f"THEN 'mid' ELSE 'hi' END AS g0, {a1} FROM {t} "
        f"WHERE {_pred(r, t)} GROUP BY 1"
    )


def t_union(r: random.Random) -> str:
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    g = r.choice(_cols_of(t, "s"))
    p1, p2 = _pred(r, t), _pred(r, t)
    return (
        f"SELECT g0, CAST(COUNT(*) AS BIGINT) AS a0 FROM ("
        f"SELECT {g} AS g0 FROM {t} WHERE {p1} "
        f"UNION ALL SELECT {g} AS g0 FROM {t} WHERE {p2}) u GROUP BY g0"
    )


def t_rollup(r: random.Random) -> str:
    # Rule D9: string keys only.
    t = r.choice([x for x in COLS if len(_cols_of(x, "s")) >= 2])
    g1, g2 = r.sample(_cols_of(t, "s"), 2)
    a1 = _agg(r, t, "", "a0")
    # HAVING COUNT(*) > 0 is rule D12: it only ever filters the
    # empty-input grand-total row, where the engines genuinely disagree.
    return (
        f"SELECT {g1} AS g0, {g2} AS g1, {a1} FROM {t} "
        f"WHERE {_pred(r, t)} GROUP BY ROLLUP({g1}, {g2}) "
        f"HAVING COUNT(*) > 0"
    )


def t_distinct(r: random.Random) -> str:
    t = r.choice([x for x in COLS if len(_cols_of(x, "s")) >= 1])
    scols = _cols_of(t, "s")
    picks = r.sample(scols, min(2, len(scols)))
    sel = ", ".join(picks)
    return f"SELECT DISTINCT {sel} FROM {t} WHERE {_where(r, t, '', 1)}"


def t_order_limit(r: random.Random) -> str:
    t = r.choice(list(COLS))
    x = r.choice(_cols_of(t, "f") or _cols_of(t, "i"))
    u = ", ".join(UNIQUE[t])
    keys = ", ".join(UNIQUE[t])
    d = r.choice(["ASC", "DESC"])
    # Alias the sort column: when it IS the unique key the bare projection
    # would duplicate a name, which DuckDB auto-renames (col_1) and Spark
    # keeps — a schema mismatch in the comparator, not a value divergence.
    return (
        f"SELECT {keys}, {x} AS c0 FROM {t} WHERE {_pred(r, t)} "
        f"ORDER BY {x} {d}, {u} LIMIT {r.choice([20, 50, 100])}"
    )


def t_date_group(r: random.Random) -> str:
    t, dc = r.choice([("orders", "o_orderdate"), ("lineitem", "l_shipdate")])
    part = r.choice(["YEAR", "MONTH"])
    a1 = _agg(r, t, "", "a0")
    form = r.randrange(2)
    if form == 0:
        g = f"CAST(EXTRACT({part} FROM {dc}) AS BIGINT)"
    else:
        g = f"DATE_TRUNC('{part}', {dc})"
    return (f"SELECT {g} AS g0, {a1} FROM {t} WHERE {_pred(r, t)} "
            f"GROUP BY {g}")


def t_ts_trunc(r: random.Random) -> str:
    # events.ts under rule D7: predicate on whole-second literals,
    # projection only through date_trunc.
    unit = r.choice(["day", "hour"])
    return (
        f"SELECT DATE_TRUNC('{unit}', ts) AS g0, event_type AS g1, "
        f"CAST(COUNT(*) AS BIGINT) AS a0, {_sum_exact('value')} AS a1 "
        f"FROM events WHERE {_pred(r, 'events')} "
        f"GROUP BY DATE_TRUNC('{unit}', ts), event_type"
    )


def t_cte_chain(r: random.Random) -> str:
    # The reference's CTE-chaining shape (update_exchange_rates.py: a WITH
    # pipeline where each stage reads the previous) on the raw-SQL surface.
    t = r.choice(["orders", "lineitem", "events", "customer"])
    g = r.choice(_cols_of(t, "s"))
    f = r.choice(_cols_of(t, "f"))
    return (
        f"WITH base AS (SELECT {g} AS g0, {f} AS x FROM {t} "
        f"WHERE {_pred(r, t)}), "
        f"agg AS (SELECT g0, {_sum_exact('x')} AS sx, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY g0) "
        f"SELECT g0, sx, cnt, sx / cnt AS c0 FROM agg "
        f"WHERE cnt >= {r.choice([2, 5])}"
    )


def t_setop(r: random.Random) -> str:
    # INTERSECT / EXCEPT carry DISTINCT set semantics in both dialects.
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    g = r.choice(_cols_of(t, "s"))
    op = r.choice(["INTERSECT", "EXCEPT"])
    p1, p2 = _pred(r, t), _pred(r, t)
    return (
        f"SELECT {g} AS g0 FROM {t} WHERE {p1} "
        f"{op} SELECT {g} AS g0 FROM {t} WHERE {p2}"
    )


def t_second_latest(r: random.Random) -> str:
    # The reference flagship's decorrelated rank-2 (Q7-Q9: second-latest
    # rate before a cutoff) as ad-hoc SQL. Ordered on o_orderdate (micros
    # in the file — rule D7 keeps nanos ts out of ORDER BY: sub-microsecond
    # ordering would tiebreak differently per engine).
    cutoff = r.choice(DATE_LITS["o_orderdate"])
    rk = r.choice([2, 3])
    return (
        "SELECT g0, okey, od FROM ("
        "SELECT o_custkey AS g0, o_orderkey AS okey, o_orderdate AS od, "
        "RANK() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderkey) AS rk "
        f"FROM orders WHERE o_orderdate < TIMESTAMP {_q(cutoff)}) q "
        f"WHERE rk = {rk}"
    )


def t_grouped_max_cutoff(r: random.Random) -> str:
    # Reference Q6: grouped max under a cutoff predicate.
    t, dc, key = r.choice([("orders", "o_orderdate", "o_custkey"),
                           ("lineitem", "l_shipdate", "l_suppkey")])
    cutoff = r.choice(DATE_LITS[dc])
    return (
        f"SELECT {key} AS g0, MAX({dc}) AS m0, "
        f"CAST(COUNT(*) AS BIGINT) AS a0 FROM {t} "
        f"WHERE {dc} < TIMESTAMP {_q(cutoff)} GROUP BY {key}"
    )


def t_not_in(r: random.Random) -> str:
    # Anti-join via NOT IN: FK columns are non-null on both sides, so the
    # three-valued-logic trap (NOT IN over a NULL-bearing list is never
    # true) cannot fire and both engines agree.
    child, ck, parent, pk = r.choice(FKS)
    ccols = _cols_of(child, "s") or [UNIQUE[child][0]]
    g = r.choice(ccols)
    return (
        f"SELECT {g} AS g0, CAST(COUNT(*) AS BIGINT) AS a0 FROM {child} "
        f"WHERE {ck} NOT IN (SELECT {pk} FROM {parent} "
        f"WHERE {_pred(r, parent)}) GROUP BY {g}"
    )


def t_correlated_scalar(r: random.Random) -> str:
    # Correlated scalar COUNT subquery (the reference's per-pair lookup
    # shape before decorrelation).
    child, ck, parent, pk = r.choice(
        [(c, ck, p, pk) for (c, ck, p, pk) in FKS
         if p in ("customer", "part", "supplier", "nation")]
    )
    return (
        f"SELECT t0.{pk} AS g0, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {child} t1 "
        f"WHERE t1.{ck} = t0.{pk} AND {_pred(r, child, 't1.')}) AS a0 "
        f"FROM {parent} t0 WHERE {_pred(r, parent, 't0.')}"
    )


def t_join_window(r: random.Random) -> str:
    # Rank window over a join result (top accounts per nation).
    k = r.choice([2, 3, 5])
    return (
        "SELECT g0, k0, rk FROM ("
        "SELECT t1.n_name AS g0, t0.c_custkey AS k0, "
        "RANK() OVER (PARTITION BY t1.n_name "
        "ORDER BY t0.c_acctbal DESC, t0.c_custkey) AS rk "
        "FROM customer t0 JOIN nation t1 ON t0.c_nationkey = t1.n_nationkey "
        f"WHERE {_pred(r, 'customer', 't0.')}) q WHERE rk <= {k}"
    )


def t_having_sum(r: random.Random) -> str:
    # HAVING over the exact-decimal sum (identical doubles both engines,
    # so the threshold comparison is deterministic).
    t = r.choice(["orders", "lineitem", "events"])
    g = r.choice(_cols_of(t, "s"))
    f = r.choice(_cols_of(t, "f"))
    lit = r.choice(NUM_LITS.get(f, [10.0]))
    mult = r.choice([10, 100])
    return (
        f"SELECT {g} AS g0, {_sum_exact(f)} AS a0 FROM {t} "
        f"WHERE {_pred(r, t)} GROUP BY {g} "
        f"HAVING {_sum_exact(f)} > {lit * mult}"
    )


def t_grouping_sets(r: random.Random) -> str:
    # Rules D9 (string keys only) and D12 (empty-input guard) apply to
    # every grouping-set form, not just ROLLUP.
    t = r.choice([x for x in COLS if len(_cols_of(x, "s")) >= 2])
    g1, g2 = r.sample(_cols_of(t, "s"), 2)
    return (
        f"SELECT {g1} AS g0, {g2} AS g1, CAST(COUNT(*) AS BIGINT) AS a0 "
        f"FROM {t} WHERE {_pred(r, t)} "
        f"GROUP BY GROUPING SETS (({g1}), ({g2}), ({g1}, {g2})) "
        f"HAVING COUNT(*) > 0"
    )


def t_cube(r: random.Random) -> str:
    t = r.choice([x for x in COLS if len(_cols_of(x, "s")) >= 2])
    g1, g2 = r.sample(_cols_of(t, "s"), 2)
    a1 = _agg(r, t, "", "a0")
    return (
        f"SELECT {g1} AS g0, {g2} AS g1, {a1} FROM {t} "
        f"WHERE {_pred(r, t)} GROUP BY CUBE({g1}, {g2}) "
        f"HAVING COUNT(*) > 0"
    )


def t_agg_filter(r: random.Random) -> str:
    # FILTER (WHERE ...) aggregate modifier; an all-filtered group sums
    # to NULL in both engines, COALESCEd to keep dtypes aligned.
    t = r.choice(["orders", "lineitem", "events"])
    g = r.choice(_cols_of(t, "s"))
    f = r.choice(_cols_of(t, "f"))
    p = _pred(r, t)
    return (
        f"SELECT {g} AS g0, "
        f"COALESCE(CAST(SUM(CAST({f} AS DECIMAL(28,6))) "
        f"FILTER (WHERE {p}) AS DOUBLE), 0.0) AS a0, "
        f"CAST(COUNT(*) FILTER (WHERE {p}) AS BIGINT) AS a1, "
        f"CAST(COUNT(*) AS BIGINT) AS a2 FROM {t} GROUP BY {g}"
    )


# ---------------------------------------------------------------------------
# Wave 4 (round 14): scalar-function and NULL-ordering breadth.  The pool
# below was probed Spark-vs-DuckDB before inclusion; the two functions that
# FAILED the probe are declared as D13/D14 and excluded.  These templates
# cover the §2.2 P4-P7 function class the reference's users write
# (``Fx_1min.py:71-75``: substring pair labels, string concat, date parsing).
# ---------------------------------------------------------------------------

# Verified dialect-identical single-arg string functions.
_STR_FN1 = ["UPPER({x})", "LOWER({x})", "TRIM({x})", "LTRIM({x})",
            "RTRIM({x})", "REVERSE({x})", "SUBSTR({x}, 1, 3)",
            "SUBSTR({x}, 2, 4)", "LEFT({x}, 4)", "RIGHT({x}, 3)"]


def _str_chain(r: random.Random, col: str, depth: int) -> str:
    """Nested chain of verified string functions over ``col``."""
    e = col
    for _ in range(depth):
        e = r.choice(_STR_FN1).format(x=e)
    return e


def t_str_chain(r: random.Random) -> str:
    # Depth-2/3 nested string chains + a REPLACE/PAD form; the reference's
    # pair-label manipulation (Fx_1min.py:71) is exactly this class.
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    s = r.choice(_cols_of(t, "s"))
    keys = ", ".join(UNIQUE[t])
    c0 = _str_chain(r, s, r.choice([2, 3]))
    pad = r.choice(["LPAD({x}, 12, '*')", "RPAD({x}, 12, '.')",
                    "REPLACE({x}, 'A', '@')"]).format(x=s)
    return (f"SELECT {keys}, {c0} AS c0, {pad} AS c1, "
            f"CAST(LENGTH({_str_chain(r, s, 1)}) AS BIGINT) AS c2 "
            f"FROM {t} WHERE {_pred(r, t)}")


def t_str_locate(r: random.Random) -> str:
    # INSTR / split_part / || concat — probed identical in both dialects.
    t = r.choice([x for x in COLS if len(_cols_of(x, "s")) >= 2])
    s1, s2 = r.sample(_cols_of(t, "s"), 2)
    keys = ", ".join(UNIQUE[t])
    needle = r.choice(["a", "e", "1", "#", "-"])
    # COALESCE inside split_part per rule D19 (NULL operand: Spark
    # returns NULL, DuckDB ''); a no-op whenever the columns are non-NULL.
    return (f"SELECT {keys}, CAST(INSTR({s1}, '{needle}') AS BIGINT) AS c0, "
            f"split_part(COALESCE({s1}, '') || '|' || COALESCE({s2}, ''), "
            f"'|', 2) AS c1 "
            f"FROM {t} WHERE {_where(r, t, '', 1)}")


def t_coalesce_nullif(r: random.Random) -> str:
    # NULL-producing scalars (NULLIF, CASE→NULL) re-absorbed by COALESCE,
    # ordered under EXPLICIT NULLS FIRST/LAST (wave 4 retires blanket D8:
    # both dialects accept the explicit syntax, only the DEFAULT differs).
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    s = r.choice(_cols_of(t, "s"))
    lit = STR_LITS.get(s)
    litv = _q(r.choice(lit)) if lit else "'x'"
    keys = ", ".join(UNIQUE[t])
    u = ", ".join(UNIQUE[t])
    nd = r.choice(["NULLS FIRST", "NULLS LAST"])
    d = r.choice(["ASC", "DESC"])
    return (f"SELECT {keys}, NULLIF({s}, {litv}) AS c0, "
            f"COALESCE(NULLIF({s}, {litv}), 'FALLBACK') AS c1 "
            f"FROM {t} WHERE {_where(r, t, '', 1)} "
            f"ORDER BY c0 {d} {nd}, {u} LIMIT {r.choice([30, 60])}")


def t_order_nulls(r: random.Random) -> str:
    # A genuinely NULLABLE computed sort key (guarded division) under
    # explicit NULLS FIRST/LAST + unique tiebreak — the D8 territory the
    # default-ordering divergence kept off-limits until wave 4.
    t = r.choice([x for x in COLS if len(_cols_of(x, "f")) >= 1
                  and len(_cols_of(x, "i")) >= 1])
    f = r.choice(_cols_of(t, "f"))
    i = r.choice(_cols_of(t, "i"))
    pivot = r.choice(NUM_LITS.get(i, [10]))
    keys = ", ".join(UNIQUE[t])
    u = ", ".join(UNIQUE[t])
    d = r.choice(["ASC", "DESC"])
    nd = r.choice(["NULLS FIRST", "NULLS LAST"])
    return (f"SELECT {keys}, CAST({f} / NULLIF(CAST({i} AS DOUBLE) "
            f"- {float(pivot)}, 0.0) AS DOUBLE) AS c0 FROM {t} "
            f"WHERE {_pred(r, t)} "
            f"ORDER BY c0 {d} {nd}, {u} LIMIT {r.choice([25, 50])}")


def t_date_scalar(r: random.Random) -> str:
    # Date scalar chains: EXTRACT (D14 pool: YEAR/MONTH/DAY/QUARTER only),
    # interval arithmetic, date_trunc, DATE-typed values forced through
    # CAST(... AS STRING) per D13.
    t, dc = r.choice([("orders", "o_orderdate"), ("lineitem", "l_shipdate")])
    keys = ", ".join(UNIQUE[t])
    fld = r.choice(["YEAR", "MONTH", "DAY", "QUARTER"])
    n = r.choice([7, 30, 90])
    unit = r.choice(["DAY", "MONTH"])
    return (f"SELECT {keys}, CAST(EXTRACT({fld} FROM {dc}) AS BIGINT) AS c0, "
            f"{dc} + INTERVAL {n} {unit} AS c1, "
            f"CAST(CAST({dc} AS DATE) AS STRING) AS c2, "
            f"CAST(last_day(CAST({dc} AS DATE)) AS STRING) AS c3 "
            f"FROM {t} WHERE {_pred(r, t)}")


def t_like_family(r: random.Random) -> str:
    # LIKE / NOT LIKE / ILIKE with %/_ wildcards built from the frozen
    # literal pools (both dialects: identical wildcard semantics; ILIKE
    # probed identical).
    t = r.choice([x for x in COLS
                  if any(c in STR_LITS for c in _cols_of(x, "s"))])
    s = r.choice([c for c in _cols_of(t, "s") if c in STR_LITS])
    base = r.choice(STR_LITS[s])
    pat = r.choice([base[:2] + "%", "%" + base[-2:], "%" + base[1:3] + "%",
                    base[:1] + "_" + base[2:3] + "%"])
    op = r.choice(["LIKE", "NOT LIKE", "ILIKE"])
    keys = ", ".join(UNIQUE[t])
    return (f"SELECT {keys}, {s} FROM {t} "
            f"WHERE {s} {op} {_q(pat)} AND {_pred(r, t)}")


def t_str_group(r: random.Random) -> str:
    # GROUP BY a string-FUNCTION expression (prefix bucket / length mod) —
    # the grouping key itself exercises the scalar surface.
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    s = r.choice(_cols_of(t, "s"))
    g = r.choice([f"SUBSTR({s}, 1, 2)", f"UPPER(LEFT({s}, 1))",
                  f"CAST(LENGTH({s}) % {r.choice([3, 5])} AS BIGINT)"])
    a1 = _agg(r, t, "", "a0")
    return (f"SELECT {g} AS g0, {a1}, CAST(COUNT(*) AS BIGINT) AS a1 "
            f"FROM {t} WHERE {_pred(r, t)} GROUP BY {g}")


# ---------------------------------------------------------------------------
# Wave 5 (round 14): window breadth (offsets, frames, value functions,
# distribution ranks), FULL OUTER JOIN, ALL-variant set ops, LATERAL,
# numeric scalar chains, and argmin/argmax-family aggregates.  Every
# construct was probed Spark-vs-DuckDB before inclusion (see D15-D17 for
# the probe's exclusions); ROUND / MEDIAN / PERCENT_RANK / NTILE were
# additionally probed at sf0.1 (600k rows).
# ---------------------------------------------------------------------------

def t_win_offset(r: random.Random) -> str:
    # LAG/LEAD under a totalized order (rule D5: ORDER BY ends in the
    # unique key). NULL fill and explicit-default forms both fuzzed.
    # Rule D18: lineitem's composite key is not unique — per-row
    # offsets need a genuinely total order.
    t = r.choice(["orders", "events", "customer", "part"])
    g = r.choice(_cols_of(t, "s"))
    x = r.choice(_cols_of(t, "f"))
    u = ", ".join(UNIQUE[t])
    keys = ", ".join(UNIQUE[t])
    k1, k2 = r.choice([1, 2, 3]), r.choice([1, 2])
    dflt = r.choice(["", f", {float(r.choice([0, 1]))}"])
    return (
        f"SELECT {keys}, "
        f"LAG({x}, {k1}{dflt}) OVER (PARTITION BY {g} ORDER BY {u}) AS c0, "
        f"LEAD({x}, {k2}) OVER (PARTITION BY {g} ORDER BY {u}) AS c1 "
        f"FROM {t} WHERE {_pred(r, t)}"
    )


def t_win_dist(r: random.Random) -> str:
    # Distribution ranks: NTILE / PERCENT_RANK / CUME_DIST / ROW_NUMBER.
    # ROW_NUMBER is deterministic here because the order is totalized by
    # the unique key (D5's nondeterminism caveat applies only to
    # non-unique orders). PERCENT_RANK/CUME_DIST emit exact ratios of
    # BIGINTs — the same IEEE division in both engines.
    # Rule D8 applies to the window ORDER BY too: ``x`` is a nullable
    # payload column, and a predicate on a never-NULL skeleton column
    # keeps NULL-x rows on the NULL-bearing fixtures — so the placement
    # is EXPLICIT, matching Spark's defaults (ASC NULLS FIRST /
    # DESC NULLS LAST) exactly as t_order_nulls and opsfuzz O9 do.
    t = r.choice(["orders", "events", "customer", "part"])  # D18
    g = r.choice(_cols_of(t, "s"))
    x = r.choice(_cols_of(t, "f"))
    u = ", ".join(UNIQUE[t])
    keys = ", ".join(UNIQUE[t])
    d = r.choice(["ASC NULLS FIRST", "DESC NULLS LAST"])
    n = r.choice([4, 7, 10])
    return (
        f"SELECT {keys}, "
        f"CAST(NTILE({n}) OVER (ORDER BY {x} {d}, {u}) AS BIGINT) AS c0, "
        f"PERCENT_RANK() OVER (PARTITION BY {g} ORDER BY {x} {d}, {u}) AS c1, "
        f"CUME_DIST() OVER (PARTITION BY {g} ORDER BY {x} {d}, {u}) AS c2, "
        f"CAST(ROW_NUMBER() OVER (ORDER BY {x} {d}, {u}) AS BIGINT) AS c3 "
        f"FROM {t} WHERE {_pred(r, t)}"
    )


def t_win_frame(r: random.Random) -> str:
    # Explicit ROWS frames over a named WINDOW clause; the framed average
    # is exact-sum / framed COUNT per rules D2/D3.
    t = r.choice(["orders", "events", "customer"])  # D18
    g = r.choice(_cols_of(t, "s"))
    x = r.choice(_cols_of(t, "f"))
    u = ", ".join(UNIQUE[t])
    keys = ", ".join(UNIQUE[t])
    frame = r.choice([
        f"ROWS BETWEEN {r.choice([2, 3, 5])} PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    ])
    return (
        f"SELECT {keys}, "
        f"CAST(SUM(CAST({x} AS DECIMAL(28,6))) OVER w AS DOUBLE) AS c0, "
        f"CAST(COUNT(*) OVER w AS BIGINT) AS c1, "
        f"CAST(SUM(CAST({x} AS DECIMAL(28,6))) OVER w AS DOUBLE) "
        f"/ COUNT(*) OVER w AS c2, "
        f"MIN({x}) OVER w AS c3 "
        f"FROM {t} WHERE {_pred(r, t)} "
        f"WINDOW w AS (PARTITION BY {g} ORDER BY {u} {frame})"
    )


def t_win_value(r: random.Random) -> str:
    # FIRST_VALUE / LAST_VALUE / NTH_VALUE with an explicit full frame
    # (the default frame stops at CURRENT ROW, which would make
    # LAST_VALUE trivially the current row in both engines — the full
    # frame is the shape users actually mean).
    t = r.choice(["orders", "events", "customer"])  # D18
    g = r.choice(_cols_of(t, "s"))
    x = r.choice(_cols_of(t, "f"))
    u = ", ".join(UNIQUE[t])
    keys = ", ".join(UNIQUE[t])
    nth = r.choice([2, 3])
    full = ("ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")
    return (
        f"SELECT {keys}, "
        f"FIRST_VALUE({x}) OVER (PARTITION BY {g} ORDER BY {u} {full}) AS c0, "
        f"LAST_VALUE({x}) OVER (PARTITION BY {g} ORDER BY {u} {full}) AS c1, "
        f"NTH_VALUE({x}, {nth}) OVER (PARTITION BY {g} ORDER BY {u} {full}) AS c2 "
        f"FROM {t} WHERE {_pred(r, t)}"
    )


def t_full_outer(r: random.Random) -> str:
    # FULL OUTER JOIN of two grouped halves of the same table under
    # disjoint-ish predicates; unmatched sides surface NULL aggregates
    # (float64 via pandas in BOTH engines, so dtypes stay aligned).
    t = r.choice([x for x in COLS if _cols_of(x, "s") and _cols_of(x, "f")])
    g = r.choice(_cols_of(t, "s"))
    f = r.choice(_cols_of(t, "f"))
    p1, p2 = _pred(r, t), _pred(r, t)
    return (
        f"SELECT COALESCE(t0.g, t1.g) AS g0, t0.a0 AS a0, t1.a1 AS a1 FROM "
        f"(SELECT {g} AS g, {_sum_exact(f)} AS a0 FROM {t} WHERE {p1} "
        f"GROUP BY {g}) t0 FULL OUTER JOIN "
        f"(SELECT {g} AS g, {_sum_exact(f)} AS a1 FROM {t} WHERE {p2} "
        f"GROUP BY {g}) t1 ON t0.g = t1.g"
    )


def t_setop_all(r: random.Random) -> str:
    # Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) + UNION DISTINCT —
    # the ALL variants keep duplicate multiplicity, which the row-sorted
    # comparator checks exactly.
    t = r.choice([x for x in COLS if _cols_of(x, "s")])
    g = r.choice(_cols_of(t, "s"))
    op = r.choice(["INTERSECT ALL", "EXCEPT ALL", "UNION"])
    p1, p2 = _pred(r, t), _pred(r, t)
    return (
        f"SELECT {g} AS g0 FROM {t} WHERE {p1} "
        f"{op} SELECT {g} AS g0 FROM {t} WHERE {p2}"
    )


def t_lateral(r: random.Random) -> str:
    # LATERAL correlated aggregate subquery (probed portable: Spark 4 and
    # DuckDB agree on the comma-LATERAL form). The reference's per-pair
    # lookup shape (update_exchange_rates.py:147-176) decorrelates to
    # exactly this.
    child, ck, parent, pk = r.choice(
        [(c, ck, p, pk) for (c, ck, p, pk) in FKS if _cols_of(c, "f")]
    )
    f = r.choice(_cols_of(child, "f"))
    return (
        f"SELECT t0.{pk} AS g0, l.a0, l.a1 FROM {parent} t0, "
        f"LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS a0, "
        f"COALESCE({_sum_exact('t1.' + f)}, 0.0) AS a1 FROM {child} t1 "
        f"WHERE t1.{ck} = t0.{pk} AND {_pred(r, child, 't1.')}) l "
        f"WHERE {_pred(r, parent, 't0.')}"
    )


def t_num_scalar(r: random.Random) -> str:
    # Numeric scalar chains from the probed-portable pool (D15/D16 rules:
    # SQRT and ROUND in, LN/EXP/POWER out; CEIL/FLOOR→DOUBLE,
    # SIGN→BIGINT).
    t = r.choice([x for x in COLS
                  if _cols_of(x, "f") and _cols_of(x, "i")])
    f = r.choice(_cols_of(t, "f"))
    i = r.choice(_cols_of(t, "i"))
    lit = float(r.choice(NUM_LITS.get(f, [10.0])))
    keys = ", ".join(UNIQUE[t])
    pool = [
        f"ABS({f} - {lit}) AS c0",
        f"CAST(CEIL({f}) AS DOUBLE) AS c0",
        f"CAST(FLOOR({f}) AS DOUBLE) AS c0",
        f"SQRT(ABS({f})) AS c0",
        f"ROUND({f}, {r.choice([-1, 0, 1, 2])}) AS c0",
    ]
    c0 = r.choice(pool)
    c1 = r.choice([
        f"CAST(SIGN({f} - {lit}) AS BIGINT) AS c1",
        f"GREATEST({f}, {lit}) AS c1",
        f"LEAST({f}, {lit}) AS c1",
    ])
    return (
        f"SELECT {keys}, {c0}, {c1}, "
        f"CAST({i} % {r.choice([7, 10, 13])} AS BIGINT) AS c2 "
        f"FROM {t} WHERE {_pred(r, t)}"
    )


def t_arg_minmax(r: random.Random) -> str:
    # MAX_BY/MIN_BY keyed on the unique column (deterministic: the
    # ordering value never ties), plus MEDIAN (exact midpoint
    # interpolation — one IEEE mean, identical both engines; probed at
    # sf0.1) and BOOL_AND/BOOL_OR.
    # Rule D18: MAX_BY/MIN_BY need a tie-free ordering value, so the
    # pool is tables whose single-column key is verified unique.
    t = r.choice(["orders", "events", "customer", "part"])
    g = r.choice(_cols_of(t, "s"))
    f = r.choice(_cols_of(t, "f"))
    u = UNIQUE[t][0]
    vcols = [c for c in _cols_of(t, "sf") if c != g]
    v = r.choice(vcols or [u])
    lit = r.choice(NUM_LITS.get(f, [10.0]))
    # D23: the payload must be non-NULL — Spark MAX_BY carries a NULL
    # payload where DuckDB arg_max skips it
    return (
        f"SELECT {g} AS g0, MAX_BY({v}, {u}) AS c0, MIN_BY({v}, {u}) AS c1, "
        f"MEDIAN({f}) AS c2, BOOL_AND({f} >= {lit}) AS c3, "
        f"BOOL_OR({f} > {lit}) AS c4 "
        f"FROM {t} WHERE ({_pred(r, t)}) AND {v} IS NOT NULL GROUP BY {g}"
    )


def t_range_interval(r: random.Random) -> str:
    # RANGE frame bounded by a calendar INTERVAL over a micros-safe date
    # column (rule D7 keeps nanos ts out). Ties on the order value are
    # frame-peers, so the frame is a deterministic SET even though the
    # date is non-unique — aggregates over it are order-insensitive
    # under D1/D2. Rule D8: the order date is nullable on NULL-bearing
    # fixtures and a NULL order value's RANGE-INTERVAL frame is engine-
    # defined territory (whether NULL rows form one peer frame is an
    # unprobed assumption), so NULL dates are excluded in the WHERE
    # rather than relying on incidental agreement.
    t, dc, key = r.choice([("orders", "o_orderdate", "o_custkey"),
                           ("lineitem", "l_shipdate", "l_suppkey")])
    f = r.choice(_cols_of(t, "f"))
    keys = ", ".join(UNIQUE[t])
    n = r.choice([7, 30, 90])
    return (
        f"SELECT {keys}, "
        f"CAST(COUNT(*) OVER w AS BIGINT) AS c0, "
        f"CAST(SUM(CAST({f} AS DECIMAL(28,6))) OVER w AS DOUBLE) AS c1 "
        f"FROM {t} WHERE ({_pred(r, t)}) AND {dc} IS NOT NULL "
        f"WINDOW w AS (PARTITION BY {key} ORDER BY {dc} "
        f"RANGE BETWEEN INTERVAL {n} DAY PRECEDING AND CURRENT ROW)"
    )


# ---------------------------------------------------------------------------
# Wave 6 (round 15): SEMI/ANTI joins (bare keyword form), GROUP BY ALL,
# inline-VALUES dimension joins, COUNT_IF. Every construct probed verbatim
# in both engines before inclusion (rule D21 records the one syntax split).
# ---------------------------------------------------------------------------

def t_semi_anti(r: random.Random) -> str:
    # Rule D21: the BARE `SEMI JOIN` / `ANTI JOIN` keywords parse in BOTH
    # dialects (probed round 15); Spark additionally accepts the LEFT-
    # prefixed spelling, which DuckDB REJECTS — so the corpus emits only
    # the bare form. Semi/anti output is the child's rows verbatim
    # (projection multiset — no order sensitivity).
    child, fk, parent, pk = r.choice(FKS)
    kind = r.choice(["SEMI", "ANTI"])
    keys = ", ".join(UNIQUE[child])
    c0 = r.choice(_cols_of(child, "sf"))
    return (
        f"SELECT {keys}, {c0} AS c0 FROM {child} {kind} JOIN "
        f"(SELECT {pk} FROM {parent} WHERE {_pred(r, parent)}) d "
        f"ON {child}.{fk} = d.{pk} WHERE {_pred(r, child)}"
    )


def t_group_by_all(r: random.Random) -> str:
    # GROUP BY ALL binds to the non-aggregate select list identically in
    # both dialects (probed round 15); aggregates follow D1/D2.
    t = r.choice(["orders", "lineitem", "customer", "events", "part"])
    gs = r.sample(_cols_of(t, "s"), min(2, len(_cols_of(t, "s"))))
    f = r.choice(_cols_of(t, "f"))
    sel_g = ", ".join(f"{c} AS g{i}" for i, c in enumerate(gs))
    return (
        f"SELECT {sel_g}, {_sum_exact(f)} AS a0, "
        f"CAST(COUNT(*) AS BIGINT) AS a1 "
        f"FROM {t} WHERE {_pred(r, t)} GROUP BY ALL"
    )


def t_values_join(r: random.Random) -> str:
    # Inline-VALUES dimension join: a literal lookup table folded into the
    # query text — the broadcast-dim shape in its smallest form; both
    # dialects parse `(VALUES ...) AS v(k, cat)` (probed round 15). The
    # dim maps a frozen label pool onto two buckets via a seeded
    # permutation, so the mapping itself is fuzzed.
    t, col = r.choice([
        ("orders", "o_orderstatus"), ("lineitem", "l_returnflag"),
        ("events", "event_type"), ("customer", "c_mktsegment"),
        ("part", "p_type"),
    ])
    perm = list(STR_LITS[col])
    r.shuffle(perm)
    rows = ", ".join(
        f"({_q(v)}, {_q('b' + str(i % 2))})" for i, v in enumerate(perm)
    )
    f = r.choice(_cols_of(t, "f"))
    return (
        f"SELECT v.cat AS g0, CAST(COUNT(*) AS BIGINT) AS a0, "
        f"{_sum_exact(f)} AS a1 "
        f"FROM {t} JOIN (VALUES {rows}) AS v(k, cat) ON {t}.{col} = v.k "
        f"WHERE {_pred(r, t)} GROUP BY v.cat"
    )


def t_count_if(r: random.Random) -> str:
    # COUNT_IF: counts TRUE only — a NULL condition row is uncounted in
    # both dialects (NULL-fixture safe); BIGINT-cast per D1 (DuckDB
    # aggregates widen).
    t, s = r.choice([
        ("orders", "o_orderstatus"), ("lineitem", "l_returnflag"),
        ("events", "event_type"), ("customer", "c_mktsegment"),
        ("part", "p_brand"),
    ])
    g = r.choice(_cols_of(t, "s"))
    f = r.choice(_cols_of(t, "f"))
    lit = r.choice(NUM_LITS.get(f, [10.0]))
    return (
        f"SELECT {g} AS g0, "
        f"CAST(COUNT_IF({f} > {lit}) AS BIGINT) AS a0, "
        f"CAST(COUNT_IF({s} = {_q(r.choice(STR_LITS[s]))}) AS BIGINT) AS a1, "
        f"CAST(COUNT(*) AS BIGINT) AS a2 "
        f"FROM {t} WHERE {_pred(r, t)} GROUP BY {g}"
    )


TEMPLATES = [
    t_filter_project, t_group_agg, t_join_agg, t_explicit_join, t_left_join,
    t_theta_join, t_window_rank, t_window_running, t_scalar_subquery,
    t_exists, t_in_subquery, t_case_bucket, t_union, t_rollup, t_distinct,
    t_order_limit, t_date_group, t_ts_trunc, t_cte_chain, t_setop,
    t_second_latest, t_grouped_max_cutoff, t_not_in, t_correlated_scalar,
    t_join_window, t_having_sum, t_grouping_sets, t_cube, t_agg_filter,
    t_str_chain, t_str_locate, t_coalesce_nullif, t_order_nulls,
    t_date_scalar, t_like_family, t_str_group,
    t_win_offset, t_win_dist, t_win_frame, t_win_value, t_full_outer,
    t_setop_all, t_lateral, t_num_scalar, t_arg_minmax, t_range_interval,
    t_semi_anti, t_group_by_all, t_values_join, t_count_if,
]


def generate(seed: int = DEFAULT_SEED, n: int = DEFAULT_N
             ) -> list[tuple[str, str]]:
    """Return ``n`` (name, sql) pairs, a pure function of ``(seed, n)``.

    Templates are cycled so every shape gets ~n/len(TEMPLATES) instances;
    each instance draws from its own child Random seeded by (seed, i) so
    inserting a template never reshuffles the queries after it.
    """
    out: list[tuple[str, str]] = []
    for i in range(n):
        tmpl = TEMPLATES[i % len(TEMPLATES)]
        r = random.Random(f"{seed}:{i}")
        name = f"fz{seed}_{i:03d}_{tmpl.__name__[2:]}"
        out.append((name, tmpl(r)))
    return out


def main() -> None:  # pragma: no cover — manual differential runner
    """CLI: ``python -m fxspark.sqlfuzz [seed] [n] [sf_dir]`` — run the
    full differential and print one line per query + failing SQL verbatim
    (the reproduction recipe is the seed)."""
    import os
    import sys

    # tests.oracle_diff lives at the repo root, which is this package's
    # parent directory — derive it so the CLI works from any checkout.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from fxspark.session import get_spark, register_views
    from tests.oracle_diff import compare, diff_report, duck_connect

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_SEED
    n = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_N
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    spark = get_spark("sqlfuzz")
    register_views(spark, sf)
    con = duck_connect(sf)
    bad = 0
    for name, sql in generate(seed, n):
        try:
            res = compare(spark.sql(sql).toPandas(),
                          con.execute(sql).fetchdf())
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {ex!r}\n  SQL: {sql}", flush=True)
            bad += 1
            continue
        print(diff_report(name, res), flush=True)
        if not res["ok"]:
            print(f"  SQL: {sql}", flush=True)
            bad += 1
    print(f"\n{n - bad}/{n} match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":  # pragma: no cover
    main()
