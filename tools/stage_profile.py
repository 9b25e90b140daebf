"""Per-stage time attribution for one bench query (guide §7.1, local mode).

Runs a single bench.py query with the UI enabled and prints stage-level
metrics from the REST API: duration, task time, shuffle read/write bytes,
GC, and the stage's name line (maps to plan operators).

Usage: SPARK_GRAFT_CPUS=32 python tools/stage_profile.py north_asof_features
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import bench
    from netml_spark.session import get_spark

    name = sys.argv[1]
    spark = get_spark(
        "stage-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    qs = bench.bench_queries(spark)
    fn = qs[name]
    # warm
    fn().write.format("noop").mode("overwrite").save()
    sc = spark.sparkContext
    sc.setJobDescription(f"{name}: profiled")
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    app_id = sc.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    # keep only stages submitted after t0
    t0_ms = int(t0 * 1000)
    rows = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        sub_ms = int(
            time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        )
        if sub_ms < t0_ms - 1000:
            continue
        rows.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "executorRunTime_s": round(s["executorRunTime"] / 1000, 2),
                "cpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(s.get("jvmGcTime", 0) / 1000, 2),
                "shuffleRead_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffleWrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "fetchWait_s": round(s.get("shuffleFetchWaitTime", 0) / 1000, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "name": s["name"].split("\n")[0][:90],
            }
        )
    print(json.dumps({"query": name, "wall_s": round(wall, 3), "stages": rows}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
