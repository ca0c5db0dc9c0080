"""Seeded STREAM ≡ BATCH equivalence fuzzer (rule O11, round 17).

``fxspark/sqlfuzz.py`` differentials the raw-SQL surface against DuckDB and
``fxspark/opsfuzz.py`` the curated operator API; this module covers the
third surface: the MAINTAINED-STATE topology. The registry's ``stream_*_
replay`` queries pin FIXED parameter choices of the streaming wrappers;
here a seeded composer draws keys / orders / value columns / split counts
/ arrival orders and replays each draw through REAL Structured Streaming
micro-batches — a file stream (``maxFilesPerTrigger=1``, ``Trigger.
AvailableNow``) into a ``foreachBatch`` store merge, the exact
``streaming.runner.run_upsert_stream`` topology — then compares the final
store to the one-shot batch form of the same computation.

Rule O11 (DIALECT.md): for any op whose maintained form is a keyed merge
with associative/commutative state — last-writer-wins upsert under a
TOTALIZED order (O1), and grouped rollups over exact-typed aggregates
(COUNT / MAX / MIN / exact-DECIMAL SUM) merged as union + keyed
re-aggregation (the D27 discipline) — replaying the input through ANY
partition of the rows into micro-batches, arriving in ANY order, must
reproduce the one-shot batch answer BIT-FOR-BIT. The two templates:

  T1 ``upsert_lww``  — micro-batch ``sink.upsert`` (union + dedup_latest)
      vs ``dedup_latest`` over the whole table. Equivalence holds because
      argmax under a total order is associative; the composer appends the
      table's unique key to the drawn order columns (O1) so the order IS
      total, and ``dedup_latest`` drops NULL-order rows identically on
      both paths (O8).
  T2 ``rollup_merge`` — micro-batch partial aggregation merged by union +
      GROUP-BY re-aggregation vs one-shot ``groupBy().agg()``. COUNT adds,
      MAX/MIN fold, and SUM over DECIMAL(38,6) is exact, so the merge is
      associative to the bit; NULL moments follow SQL-SUM semantics
      (skip-NULL, all-NULL stays NULL — the ``merge_ols_rollup`` pin) and
      NULL group keys collect into ONE group on both paths because both
      paths ARE GROUP BY (D27).

The split assignment is a deterministic hash of the unique key
(``xxhash64 % k``) and the drop files are written in a seeded permutation,
so arrival order is fuzzed too — the property is order-independence, so
no draw may change the verdict.

``generate(seed, n)`` is a pure function of its arguments; composition
``i`` draws from ``random.Random(f"{seed}:{i}")`` (prefix-stable).
CLI: ``python -m fxspark.streamfuzz [seed] [n] [sf_dir]`` prints
``ok/n match`` and exits non-zero on any mismatch.

Reference anchor: the reference's whole pipeline IS this topology — a
scheduled micro-batch upsert whose correctness rests on the merge
reproducing a from-scratch load (``Fx_1min.py:106-109`` ON DUPLICATE KEY
UPDATE; ``run_update_1min.bat`` cadence).
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fxspark.opsfuzz import META
from fxspark.ops.latest import dedup_latest
from fxspark.session import load_table
from fxspark.sink import upsert

__all__ = ["generate", "run_composition", "DEFAULT_SEED", "DEFAULT_N"]

DEFAULT_SEED = 17
DEFAULT_N = 120


@dataclass
class Comp:
    name: str
    template: str  # upsert_lww | rollup_merge
    table: str
    keys: list
    order: list  # T1 only: totalized order columns
    value: str | None  # T2 only: aggregated column
    n_splits: int
    arrival: list  # permutation of range(n_splits): file write order


def generate(seed: int, n: int) -> list[Comp]:
    comps = []
    tables = sorted(META)
    for i in range(n):
        rng = random.Random(f"{seed}:{i}")
        table = rng.choice(tables)
        meta = META[table]
        template = rng.choice(["upsert_lww", "rollup_merge"])
        keys = list(rng.choice(meta["keys"]))
        order = list(rng.choice(meta["orders"])) + list(meta["unique"])
        value = rng.choice(meta["gmax"])
        n_splits = rng.choice([2, 3, 5])
        arrival = list(range(n_splits))
        rng.shuffle(arrival)
        comps.append(
            Comp(
                name=f"sf{seed}_{i:03d}_{template}_{table}",
                template=template,
                table=table,
                keys=keys,
                order=order,
                value=value,
                n_splits=n_splits,
                arrival=arrival,
            )
        )
    return comps


def _batch_form(df: DataFrame, comp: Comp) -> DataFrame:
    if comp.template == "upsert_lww":
        return dedup_latest(df, comp.keys, comp.order)
    v = F.col(comp.value)
    return df.groupBy(*comp.keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(v).alias("max_v"),
        F.min(v).alias("min_v"),
        F.sum(v.cast("decimal(38,6)")).alias("sum_v"),
    )


def _merge(state: DataFrame | None, batch_df: DataFrame, comp: Comp) -> DataFrame:
    if comp.template == "upsert_lww":
        return upsert(state, batch_df, comp.keys, comp.order)
    partial = _batch_form(batch_df, comp)
    if state is None:
        return partial
    merged = state.unionByName(partial)
    return merged.groupBy(*comp.keys).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
        F.max("max_v").alias("max_v"),
        F.min("min_v").alias("min_v"),
        F.sum("sum_v").cast("decimal(38,6)").alias("sum_v"),
    )


def _split_col(comp: Comp) -> F.Column:
    meta = META[comp.table]
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in meta["unique"]]),
        F.lit(comp.n_splits),
    )


def run_composition(
    spark: SparkSession, sf_dir: str, comp: Comp, workdir: str | None = None
) -> dict:
    """Replay ``comp`` through a real file-stream + foreachBatch store and
    compare to the one-shot batch form. Returns {"ok": bool, ...detail}."""
    df = load_table(spark, sf_dir, comp.table).select(*META[comp.table]["cols"])
    want = _batch_form(df, comp).toPandas()

    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix=f"streamfuzz_{comp.name}_")
    in_dir = os.path.join(workdir, "in")
    store = os.path.join(workdir, "store")
    chk = os.path.join(workdir, "chk")
    os.makedirs(in_dir, exist_ok=True)
    try:
        tagged = df.withColumn("_split", _split_col(comp))
        for j in comp.arrival:
            # one parquet FILE per drop: each becomes its own micro-batch
            # under maxFilesPerTrigger=1 (empty splits are legal — an
            # empty micro-batch must be a merge no-op)
            part = tagged.filter(F.col("_split") == j).drop("_split")
            tmp_out = os.path.join(workdir, f"_stage_{j}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp_out)
            src = [f for f in os.listdir(tmp_out) if f.endswith(".parquet")]
            for k, f in enumerate(src):
                shutil.move(
                    os.path.join(tmp_out, f),
                    os.path.join(in_dir, f"drop_{j}_{k}.parquet"),
                )
            shutil.rmtree(tmp_out)

        state = {"df": None}

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            merged = _merge(state["df"], batch_df, comp)
            # materialize through the store (the run_upsert_stream
            # topology: the store is the state; executors hold none)
            merged.write.mode("overwrite").parquet(
                os.path.join(workdir, f"store_{batch_id}")
            )
            state["df"] = spark.read.parquet(
                os.path.join(workdir, f"store_{batch_id}")
            )

        q = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["df"] is None:  # no rows at all (sf_empty): state is empty
            got = want.iloc[0:0]
        else:
            state["df"].write.mode("overwrite").parquet(store)
            got = spark.read.parquet(store).toPandas()
    finally:
        if own_tmp:
            shutil.rmtree(workdir, ignore_errors=True)

    cols = sorted(want.columns)
    want_s = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    got_s = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    ok = want_s.equals(got_s)
    detail = {"ok": ok, "rows_batch": len(want), "rows_stream": len(got)}
    if not ok and len(want_s) == len(got_s):
        for c in cols:
            neq = ~(
                (want_s[c] == got_s[c])
                | (want_s[c].isna() & got_s[c].isna())
            )
            if neq.any():
                i = int(neq.idxmax())
                detail["first_diff"] = {
                    "col": c,
                    "row": i,
                    "batch": repr(want_s[c].iloc[i]),
                    "stream": repr(got_s[c].iloc[i]),
                }
                break
    return detail


def main() -> None:  # pragma: no cover — manual runner
    import sys

    from fxspark.session import get_spark

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_SEED
    n = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_N
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    spark = get_spark("streamfuzz")
    comps = generate(seed, n)
    ok = 0
    fails = []
    for comp in comps:
        res = run_composition(spark, sf_dir, comp)
        if res["ok"]:
            ok += 1
        else:
            fails.append((comp.name, res))
            print(f"FAIL {comp.name}: {res}", flush=True)
    print(f"{ok}/{len(comps)} match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":  # pragma: no cover
    main()
