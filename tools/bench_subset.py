"""Time a SUBSET of registry queries with bench.py's exact methodology
(count action, clearCache between runs, min-of-N) — the measure-first
loop of the optimization round without paying for the whole registry.

Usage:
  python tools/bench_subset.py q1 q2 ...            # time only
  PLANS_OUT=plans/r13 SUFFIX=_before python tools/bench_subset.py q1   # + explain capture
  RUNS=3 python tools/bench_subset.py q1             # samples per query

Prints one JSON line {name: min_sec} plus per-run samples on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_finance_pipeline_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = max(1, int(os.environ.get("RUNS", "3")))
    plans_out = os.environ.get("PLANS_OUT")
    suffix = os.environ.get("SUFFIX", "")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    names = sys.argv[1:]
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # Warm up JVM / parquet footer caches, as bench.py does.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # CALIB=1: run bench.py's pinned machine-speed probes before and
    # after the subset, so an A/B across two invocations can divide out
    # ambient machine drift (this box swings ±20% between sessions).
    calib = os.environ.get("CALIB") == "1"
    if calib:
        import bench as benchmod

        print(f"# calib pre: {benchmod._calibration(spark, sf_dir)}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        timings[name] = min(samples)
        print(f"# {name}: min={min(samples)} samples={samples} rows={n}", file=sys.stderr)
        if plans_out:
            os.makedirs(plans_out, exist_ok=True)
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plans_out, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
    if calib:
        import bench as benchmod

        print(f"# calib post: {benchmod._calibration(spark, sf_dir)}", file=sys.stderr)
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
