"""Round-6 optimization measurement harness (guide §1.4) — NOT the driver
bench. Isolates each bench.py query with the noop sink, captures
`.explain("formatted")`, and reports per-stage executor metrics via the
status tracker so time can be attributed to scan / exchange / window /
Python stages. bench.py itself stays frozen (driver contract).

Usage:
  python bench_extra.py [query ...]        # default: all 8
  SPARK_GRAFT_CPUS=32 python bench_extra.py north_asof_features
Flags (env):
  BX_EXPLAIN_DIR=plans/r06      write <query>_before.txt explain files
  BX_EXPLAIN_SUFFIX=before      suffix for the explain files
  BX_RUNS=2                     timed runs per query (min reported)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BX_RUNS", "2"))
EXPLAIN_DIR = os.environ.get("BX_EXPLAIN_DIR")
EXPLAIN_SUFFIX = os.environ.get("BX_EXPLAIN_SUFFIX", "before")


def main():
    import bench
    from netml_spark.session import get_spark

    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=64
    )
    qs = bench.bench_queries(spark)
    names = [a for a in sys.argv[1:] if a in qs] or list(qs)

    sc = spark.sparkContext
    out = {}
    for name in names:
        fn = qs[name]
        df = fn()
        if EXPLAIN_DIR:
            os.makedirs(EXPLAIN_DIR, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(EXPLAIN_DIR, f"{name}_{EXPLAIN_SUFFIX}.txt"), "w"
            ) as f:
                f.write(plan)
        if os.environ.get("BX_EXPLAIN_ONLY"):
            out[name] = None
            continue
        # warm (codegen + python worker forks)
        sc.setJobDescription(f"{name}: warm")
        fn().write.format("noop").mode("overwrite").save()
        best = None
        for i in range(RUNS):
            sc.setJobDescription(f"{name}: timed {i}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]} s", file=sys.stderr)
    print(json.dumps({"cpus": CPUS, "runs": RUNS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
