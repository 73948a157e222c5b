"""Isolated per-query timing through the noop sink (guide §1.4).

Usage: python tools/time_queries.py [-n REPS] <query> [query ...]
One warm run (unmeasured: codegen/JIT + Python-worker spin-up), then
REPS measured runs; prints per-query min/median. Same sf_dir/core-count
envs as bench.py.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tech_ml_dataset_spark import get_spark


def main():
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    qs = entry.queries()
    unknown = sorted(set(args) - set(qs))
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    # Python worker pool warm-up (same exclusion as bench.py)
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 4, numPartitions=cores).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").write.format("noop") \
        .mode("overwrite").save()
    for name in args:
        spark.sparkContext.setJobDescription(f"warm {name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"run{i} {name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s"
              f" runs={[round(t, 3) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
