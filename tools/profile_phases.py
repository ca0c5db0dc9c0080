#!/usr/bin/env python
"""Split each query's cost into build / plan / execute phases.

Usage: python tools/profile_phases.py q1 q2 ...
- build: calling QUERIES[name](spark, sf_dir) (Python DSL + any eager
  checkpoint/count actions the builder runs)
- plan: forcing queryExecution().executedPlan() on the built frame
  (analysis + optimization + physical planning; codegen happens at execute)
- exec: noop write of the already-planned frame
All phases repeated REPS times on fresh frames; medians printed. Bench
regime (8 shuffle partitions, AQE off) unless overridden.
"""
import os
import statistics
import sys
import time

os.environ.setdefault("FXSPARK_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("FXSPARK_AQE", "false")
REPS = int(os.environ.get("FXSPARK_PROFILE_REPS", "3"))


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from fxspark.queries import QUERIES
    from fxspark.session import get_spark

    spark = get_spark("fxspark-phases")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            builds, plans, execs = [], [], []
            for _ in range(REPS):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.perf_counter()
                builds.append(t1 - t0)
                plans.append(t2 - t1)
                execs.append(t3 - t2)
            print(
                f"{name}: build {statistics.median(builds):.3f}s "
                f"plan {statistics.median(plans):.3f}s "
                f"exec {statistics.median(execs):.3f}s",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
