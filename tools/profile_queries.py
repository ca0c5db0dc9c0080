#!/usr/bin/env python
"""Solo per-query profiling: noop-sink wall times + Spark job counts.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_queries.py q1 q2 ...
For each query: one warm-up run, then REPS timed runs (median reported),
each in its own job group so the job count per run is exact. Mirrors
bench.py's regime (FXSPARK_SHUFFLE_PARTITIONS=8, AQE off) unless the env
is already set, so numbers are comparable with the bench sweep.
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

    spark = get_spark("fxspark-profile")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    import gc

    for name in names:
        fn = QUERIES[name]
        # bench.py's periodic block cleanup, applied per query: localCheckpoint
        # RDD blocks are only released when JVM GC processes the weak refs —
        # without this, checkpoint-heavy graph queries inflate across reps.
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        try:
            # warm-up (also absorbs codegen/classload)
            t0 = time.perf_counter()
            sc.setJobGroup(f"{name}-warm", name)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            runs, jobs = [], []
            for r in range(REPS):
                gid = f"{name}-r{r}"
                sc.setJobGroup(gid, name)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                jobs.append(len(sc.statusTracker().getJobIdsForGroup(gid)))
            print(
                f"{name}: warm {warm:.3f}s median {statistics.median(runs):.3f}s "
                f"runs {[round(x, 3) for x in runs]} jobs/run {jobs}",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
