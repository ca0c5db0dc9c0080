"""Degenerate-input fixtures: schema-identical EMPTY / ONE-ROW / ALL-NULL /
ALTERNATING-NULL star schemas, plus (round 15) the SKEW axis — Zipf keys
(``build_skew``) and all-rows-one-key (``build_onekey``) — and (round 16)
the INDEPENDENT-NULL axis (``build_inulls``: per-column missingness, so
cross-column NULL states the co-nulled axes mask become reachable).

Round-14 verdict item 1: the 249-query registry had only ever run on
well-populated fixtures, while D12 (``fxspark/sqlfuzz.py``) proved a class of
Spark-vs-oracle divergences that ONLY degenerate inputs expose (grouping-set
grand totals over empty input). These builders derive `sf_empty` (0 rows per
table) and `sf_unit` (1 row per table) from an existing driver testdata
directory with pyarrow, preserving the parquet physical schema EXACTLY —
including the `events.ts` TIMESTAMP(NANOS) column that `fxspark.session.
load_table` special-cases — so every engine code path (nanosAsLong read,
floor-div to micros, NTZ normalization) runs identically on the degenerate
tables.

The reference's own "no rows yet" path is the v1 LEFT JOIN + 'No Previous
Rate' fallback (`/root/reference/update_exchange_rates.py:202-213`) — a
degenerate-input behavior the engine already replicates; this module extends
that care registry-wide.

Fixtures are a pure function of the source directory (row 0 of row-group 0
for `sf_unit` — parquet read order is deterministic), so tests rebuild them
into a tmp dir instead of committing binaries.
"""

from __future__ import annotations

import os

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def build(sf_src: str, out_dir: str, rows: int) -> str:
    """Write a schema-identical copy of every table with the first ``rows``
    rows (0 = empty). Returns ``out_dir``."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_src, f"{t}.parquet")
        table = pq.read_table(src)
        head = table.slice(0, rows)
        # version 2.6 keeps timestamp[ns] as parquet TIMESTAMP(NANOS) —
        # the same physical type the driver testdata stores, so the
        # nanosAsLong read path is exercised, not bypassed.
        pq.write_table(head, os.path.join(out_dir, f"{t}.parquet"),
                       version="2.6")
    return out_dir


# The relational SKELETON: unique row keys + FK columns stay populated in
# ``sf_nulls`` so joins, grouping cardinalities, and row identity survive —
# everything else (measures, labels, text, timestamps, embeddings) is NULL.
# This is the "payload went missing" regime a 100 TB corpus actually ships
# (late columns, failed extractors, tri-state enrichments); the reference's
# own tolerant-ingest path (`Fx_1min.py:83-101`: absent JSON keys) is the
# same class at the row level.
SKELETON: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey", "n_regionkey"),
    "customer": ("c_custkey", "c_nationkey"),
    "supplier": ("s_suppkey", "s_nationkey"),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def build_nulls(sf_src: str, out_dir: str) -> str:
    """Write a schema-identical copy of every table with every non-SKELETON
    nullable column replaced by all-NULL (same arrow type, same row count).
    Non-nullable fields (none in the current driver testdata) keep their
    values rather than violate their own schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_src, f"{t}.parquet")
        table = pq.read_table(src)
        keep = set(SKELETON[t])
        arrays, fields = [], []
        for field in table.schema:
            col = table.column(field.name)
            if field.name not in keep and field.nullable:
                col = pa.nulls(len(table), type=field.type)
            arrays.append(col)
            fields.append(field)
        out = pa.table(arrays, schema=pa.schema(fields))
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"),
                       version="2.6")
    return out_dir


def build_mixed(sf_src: str, out_dir: str) -> str:
    """Write a schema-identical copy with every non-SKELETON nullable
    column NULLED ON ALTERNATING ROWS (row index % 2 == 1), keys intact —
    the PARTIAL-missing-payload regime between the pristine driver data
    and ``build_nulls``'s all-NULL extreme. This is where default NULL
    ordering (sqlfuzz D8: Spark ASC=NULLS FIRST / DuckDB ASC=NULLS LAST,
    mirrored for DESC) can change which row a rank/argmax picks, so it
    probes the registry's NULL-order discipline, not just NULL
    propagation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_src, f"{t}.parquet")
        table = pq.read_table(src)
        keep = set(SKELETON[t])
        mask = pa.array(np.arange(len(table)) % 2 == 1)
        arrays, fields = [], []
        for field in table.schema:
            col = table.column(field.name)
            if field.name not in keep and field.nullable and len(table):
                col = pa.compute.if_else(
                    mask, pa.nulls(len(table), type=field.type),
                    col.combine_chunks(),
                )
            arrays.append(col)
            fields.append(field)
        out = pa.table(arrays, schema=pa.schema(fields))
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"),
                       version="2.6")
    return out_dir


def _md5_u32(token: str, n: int):
    """The declared-randomness primitive shared by every hash-drawn axis:
    row i's draw is the first 4 bytes of md5(f"{token}:{i}") as a uint32
    (== the historical ``int(hexdigest()[:8], 16)`` — same bytes, no hex
    round-trip). One md5 state is seeded with the ``f"{token}:"`` prefix
    and ``.copy()``-extended per row, which hashes the identical byte
    stream while skipping the per-row f-string + re-absorb of the prefix
    (round-16 ADVICE, low: the per-row loop is interpreter-bound — this
    keeps every existing mask BYTE-IDENTICAL, trading the suggested
    numpy re-derivation away because mask stability IS the fixture
    contract: fixtures are a pure function of the path, and every pinned
    sweep/gate references these exact draws)."""
    import hashlib

    import numpy as np

    prefix = hashlib.md5(f"{token}:".encode())
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        h = prefix.copy()
        h.update(str(i).encode())
        out[i] = int.from_bytes(h.digest()[:4], "big")
    return out


def _md5_mod_mask(token: str, n: int, k: int):
    """Boolean mask selecting rows whose md5 draw ≡ 0 (mod k) — ~1/k of
    rows, independently per ``token`` (one column's pattern says nothing
    about another's)."""
    import pyarrow as pa

    return pa.array(_md5_u32(token, n) % k == 0)


def build_inulls(sf_src: str, out_dir: str) -> str:
    """INDEPENDENT-NULL fixture: every non-SKELETON nullable column nulls
    its own ~1/3 of rows, chosen by md5(f"{table}.{col}:{i}") — each
    column's missingness pattern is INDEPENDENT of every other column's.

    ``build_nulls`` / ``build_mixed`` null all payload columns on the SAME
    rows, so cross-column regimes — ``ts`` NULL while ``event_type`` is a
    live ``'purchase'`` — are unreachable there: any filter on one payload
    column also excludes the other's NULLs. That co-null masking hid the
    asof/nearest left-side NULL-``on`` contract divergence (round-16
    ADVICE, medium): the ops drop NULL-coordinate rows from BOTH sides,
    while three oracles kept NULL-ts left rows as unmatched. This axis
    makes every such single-column-NULL-under-live-filter state reachable.
    Keys/FKs stay populated (SKELETON), so row identity and join
    cardinality survive; the draw is the declared-randomness md5
    discipline — no RNG state, reproducible from the path alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_src, f"{t}.parquet")
        table = pq.read_table(src)
        keep = set(SKELETON[t])
        arrays, fields = [], []
        for field in table.schema:
            col = table.column(field.name)
            if field.name not in keep and field.nullable and len(table):
                null_mask = _md5_mod_mask(
                    f"{t}.{field.name}", len(table), 3
                )
                col = pa.compute.if_else(
                    null_mask,
                    pa.nulls(len(table), type=field.type),
                    col.combine_chunks(),
                )
            arrays.append(col)
            fields.append(field)
        out = pa.table(arrays, schema=pa.schema(fields))
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"),
                       version="2.6")
    return out_dir


def build_nullkeys(sf_src: str, out_dir: str) -> str:
    """NULL-JOIN-KEY fixture: each SKEW_COLS column (the FK / partition
    keys — NOT the unique row ids) nulls its own ~1/5 of rows, chosen by
    md5(f"{table}.{col}:{i}") like ``build_inulls``.

    The axis splits two implementation families that agree everywhere
    else: SQL equi-joins are null-unsafe (a NULL key matches nothing),
    while window-PARTITION-BY groups all NULL keys into ONE partition —
    so an as-of/nearest join realized as a union + keyed running window
    would happily match NULL-user purchases to NULL-user clicks where the
    oracle's ``ON p.user_id = c.user_id`` drops both. Unique row ids stay
    populated, so row identity and rank totalization survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_src, f"{t}.parquet")
        table = pq.read_table(src)
        targets = set(SKEW_COLS.get(t, ()))
        arrays, fields = [], []
        for field in table.schema:
            col = table.column(field.name)
            if field.name in targets and field.nullable and len(table):
                null_mask = _md5_mod_mask(
                    f"{t}.{field.name}", len(table), 5
                )
                col = pa.compute.if_else(
                    null_mask,
                    pa.nulls(len(table), type=field.type),
                    col.combine_chunks(),
                )
            arrays.append(col)
            fields.append(field)
        out = pa.table(arrays, schema=pa.schema(fields))
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"),
                       version="2.6")
    return out_dir


def build_dups(sf_src: str, out_dir: str) -> str:
    """DUPLICATE-KEY fixture (round-17, carried from the r14 ad-hoc probe):
    every table concatenated with itself, so every FIXTURES.md "unique" id
    collides with an exact copy. The duplicate row is indistinguishable
    (every column equal), which makes the axis a clean CONTRACT probe:

    - the queries wired with ``ops.checks.require_unique`` must fail as a
      typed ``ContractViolation`` under ``FXSPARK_VALIDATE_CONTRACTS=1``
      (never a silent entity-miscount — the r14 kmeans collapse class);
    - every OTHER query must still MATCH its DuckDB oracle, because both
      engines see the same doubled rows and a tiebreak between identical
      rows cannot change emitted values — any mismatch here is a new
      uniqueness dependency that belongs behind the gate.

    Gated by ``tests/test_degenerate_registry.py::
    test_registry_on_duplicate_keys``. Reference anchor: the reference's
    upsert exists precisely because its natural key collides
    (`/root/reference/Fx_1min.py:38,106-109`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(os.path.join(sf_src, f"{t}.parquet"))
        pq.write_table(
            pa.concat_tables([table, table]),
            os.path.join(out_dir, f"{t}.parquet"),
            version="2.6",
        )
    return out_dir


def build_pair(sf_src: str, base_dir: str) -> tuple[str, str]:
    """Build (sf_empty, sf_unit) under ``base_dir``."""
    return (
        build(sf_src, os.path.join(base_dir, "sf_empty"), 0),
        build(sf_src, os.path.join(base_dir, "sf_unit"), 1),
    )


# Round 15 (r14 verdict item 2): the SKEW axis. FK / grouping columns whose
# DISTRIBUTION is reshaped — values stay inside the column's existing
# distinct set (referential integrity and literal pools survive), only the
# frequency profile changes. Unique row ids are never touched, so every
# rank-totalization and key-uniqueness contract (FIXTURES.md) still holds:
# the axis probes hot-key behavior (the regime the `ccy_couple` partition
# column becomes at 100×, and what AQE skew handling exists for), not
# tie-brokenness. `lineitem` is deliberately excluded: its declared "unique"
# tiebreak is the full FK quad (sqlfuzz D18), which key-skew would collide.
SKEW_COLS: dict[str, tuple[str, ...]] = {
    "nation": ("n_regionkey",),
    "customer": ("c_nationkey",),
    "supplier": ("s_nationkey",),
    "orders": ("o_custkey",),
    "events": ("user_id", "event_type"),
}

ZIPF_S = 1.2  # classic web/word-frequency exponent: one dominant head key


def _zipf_ranks(n_rows: int, n_values: int, token: str):
    """Deterministic per-row Zipf(ZIPF_S) rank draw: row i's uniform comes
    from md5(f"{token}:{i}") (the engine's declared-randomness discipline —
    no RNG state, reproducible from the fixture path alone), mapped through
    the inverse CDF over ranks 0..n_values-1."""
    import hashlib

    import numpy as np

    w = 1.0 / np.power(np.arange(1, n_values + 1, dtype=np.float64), ZIPF_S)
    cdf = np.cumsum(w) / w.sum()
    # Same prefix-copy/digest-bytes trick as _md5_u32, 52-bit variant:
    # first 13 hex chars == first 7 digest bytes >> 4. Byte-identical to
    # the historical hexdigest form.
    prefix = hashlib.md5(f"{token}:".encode())
    u = np.empty(n_rows, dtype=np.float64)
    for i in range(n_rows):
        h = prefix.copy()
        h.update(str(i).encode())
        u[i] = (int.from_bytes(h.digest()[:7], "big") >> 4) / 2**52
    # cumsum/sum float error can leave cdf[-1] a hair below 1.0, and a
    # hash-derived u above it would index past the value set — clamp.
    return np.minimum(
        np.searchsorted(cdf, u, side="right"), n_values - 1
    )


def _remap(table, t: str, pick):
    """Rebuild ``table`` with each SKEW_COLS[t] column's values replaced by
    ``pick(sorted_distinct_values, n_rows, token)`` (same arrow type)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = SKEW_COLS.get(t, ())
    arrays, fields = [], []
    for field in table.schema:
        col = table.column(field.name)
        if field.name in cols and len(table):
            vals = pc.unique(col.combine_chunks()).drop_null().sort()
            new = pick(vals, len(table), f"{t}.{field.name}")
            col = pa.array(new, type=field.type)
        arrays.append(col)
        fields.append(field)
    return pa.table(arrays, schema=pa.schema(fields))


def build_skew(sf_src: str, out_dir: str) -> str:
    """ZIPF-SKEWED key fixture: each skew column's row values are redrawn
    Zipf(1.2) over its own sorted distinct set — rank 1 (the smallest
    value) becomes the hot key holding roughly half the rows, with a
    long tail. Join/group cardinalities turn heavy-headed while the value
    domain is unchanged."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(os.path.join(sf_src, f"{t}.parquet"))

        def pick(vals, n, token):
            ranks = _zipf_ranks(n, len(vals), token)
            return vals.take(ranks)

        pq.write_table(_remap(table, t, pick),
                       os.path.join(out_dir, f"{t}.parquet"), version="2.6")
    return out_dir


def build_onekey(sf_src: str, out_dir: str) -> str:
    """ALL-ROWS-ONE-KEY degenerate: every skew column collapses to its
    minimum distinct value — the single-partition extreme of the skew
    axis (every window/group/join on these keys funnels through ONE
    key). The determinism contracts must survive it: ranks stay
    totalized by the untouched unique ids."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(os.path.join(sf_src, f"{t}.parquet"))

        def pick(vals, n, token):
            return vals.take([0] * n)

        pq.write_table(_remap(table, t, pick),
                       os.path.join(out_dir, f"{t}.parquet"), version="2.6")
    return out_dir


def build_tsties(sf_src: str, out_dir: str) -> str:
    """EVENT-TIME-TIE fixture (round-17 axis): ``events.ts`` floored to
    DAY grain, every other column untouched.

    The driver testdata's ``events.ts`` is microsecond-precision and ALL
    DISTINCT at every scale factor — so exact event-time EQUALITY (two
    observations at the same instant, same or different key) is an input
    state no prior fixture could represent, and every tie path is dead
    code under the whole existing gate surface: as-of anchors exactly AT
    the probe time (``<=`` vs ``<``), RANGE-frame peer sets (D20's
    micros-precision frames suddenly have dense peers), session gaps of
    exactly zero, interarrival gaps of zero (burstiness/CV denominators),
    window ORDER BY ties that only the D5 unique-key suffix totalizes,
    and argmax ties on (value, ts) pairs. Flooring to day grain collapses
    each user's events onto a handful of instants (~20 events over 31
    days at sf0.001), which makes within-key ties the COMMON case rather
    than a measure-zero accident. Timestamps stay valid day boundaries,
    so D7's whole-second predicate discipline and the NY-cutoff logic are
    unaffected; keys, payloads, and row identity are untouched."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(os.path.join(sf_src, f"{t}.parquet"))
        if t == "events" and len(table):
            arrays, fields = [], []
            for field in table.schema:
                col = table.column(field.name)
                if field.name == "ts":
                    day_us = 86_400_000_000
                    unit = str(field.type.unit)
                    per_day = {"s": 86_400, "ms": 86_400_000,
                               "us": day_us, "ns": day_us * 1000}[unit]
                    ints = pc.cast(col.combine_chunks(), pa.int64())
                    floored = pc.multiply(
                        pc.divide(ints, per_day), per_day
                    )
                    col = pc.cast(floored, field.type)
                arrays.append(col)
                fields.append(field)
            table = pa.table(arrays, schema=pa.schema(fields))
        pq.write_table(table, os.path.join(out_dir, f"{t}.parquet"),
                       version="2.6")
    return out_dir


# The AXIS REGISTRY — the single source of truth for which degenerate-input
# axes exist. Docs (README's fixture list, the verify skill's sweep step)
# are LINTED against this dict (`tests/test_docs_ledger_lint.py`, round-17
# verdict item 2: the fixture list drifted from the builders twice), and
# the __main__ builder derives its output set from it. Key = the fixture
# directory name every sweep/gates uses; value = builder(sf_src, out_dir).
AXES: dict[str, "object"] = {
    "sf_empty": lambda src, out: build(src, out, 0),
    "sf_unit": lambda src, out: build(src, out, 1),
    "sf_nulls": build_nulls,
    "sf_mixed": build_mixed,
    "sf_skew": build_skew,
    "sf_onekey": build_onekey,
    "sf_inulls": build_inulls,
    "sf_nullkeys": build_nullkeys,
    "sf_dups": build_dups,
    "sf_tsties": build_tsties,
}


if __name__ == "__main__":  # pragma: no cover — manual builder
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fxspark_degenerate"
    for axis, builder in AXES.items():
        print(builder(src, os.path.join(out, axis)))
