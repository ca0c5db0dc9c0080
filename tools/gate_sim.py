"""Local simulation of the driver's correctness gate.

Mirrors what CORRECTNESS_r{N}.json records: for every ``queries()`` entry run
the Spark DataFrame at sf=0.01 on a DRIVER-STYLE session (plain builder, none
of get_spark's configs — this is what bit round 1's nanos reads), run the
matching ``oracle_sql()`` in DuckDB over the same parquet files, then compare
row count, schema width, and an order-insensitive value hash after the same
pandas canonicalization the driver uses (sort columns by name, round floats,
sort rows) — list-typed output columns break that sort, exactly like the
driver's media_features failure.

Usage: python tools/gate_sim.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import traceback

import duckdb
import pandas as pd

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if not isinstance(v, (str, bytes, type(None))) else v
            )
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession

    # Driver-style session: NOT get_spark — no nanosAsLong builder config.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("gate_sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    sys.path.insert(0, "/root/repo")
    import importlib

    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(queries)
    results: dict[str, dict] = {}
    fails = []
    for name in names:
        rec: dict = {}
        try:
            sdf = queries[name](spark, SF_DIR)
            spdf = _canon(sdf.toPandas())
            rec["spark_rows"] = len(spdf)
            if name in oracles:
                odf = _canon(con.execute(oracles[name]).fetchdf())
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(spdf) == len(odf)
                rec["schema_match"] = list(spdf.columns) == list(odf.columns)
                rec["hash_match"] = _hash(spdf) == _hash(odf)
                if not rec["hash_match"]:
                    rec["spark_head"] = spdf.head(3).to_dict("records")
                    rec["oracle_head"] = odf.head(3).to_dict("records")
            else:
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc()[-1500:]
        results[name] = rec
        ok = rec.get("hash_match") or (
            rec.get("err") == "no_oracle" and rec.get("spark_rows", 0) >= 0
        )
        status = "OK " if ok else "FAIL"
        if not ok:
            fails.append(name)
        print(
            f"{status} {name}: spark={rec.get('spark_rows')} oracle={rec.get('oracle_rows')} "
            f"hash={rec.get('hash_match')}",
            flush=True,
        )

    with open("/tmp/gate_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{len(names) - len(fails)}/{len(names)} pass; fails: {fails}")


if __name__ == "__main__":
    main()
