"""Decompose subflows_chain cost (r6): time the chain's prefixes with the
noop sink, fenced by the bench control, so the Arrow-kernel share is
attributable. Usage: SPARK_GRAFT_CPUS=32 python tools/subflows_decompose.py"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import bench
    from pyspark.sql import functions as F

    from netml_spark.operators.sessionize import (
        sessionize_timeout, subflows_interval,
    )
    from netml_spark.session import get_spark

    spark = get_spark("subflows-decompose", master=f"local[{CPUS}]",
                      shuffle_partitions=64)
    seqs, tev = bench.ensure_corpus(spark)
    control, _ = bench.make_control(spark)

    def sess():
        return sessionize_timeout(tev, ("doc_id",), "ts", 600.0, 2, ("seq",),
                                  defer_seg_filter=True)

    def sess_sorted():
        return sess().sortWithinPartitions("doc_id", "session_id", "ts", "seq")

    def subs():
        return subflows_interval(sess(), 10.0, ["doc_id", "session_id"], "ts",
                                 2, ("seq",), assume_partitioned=True)

    def full():
        per = subs().groupBy("doc_id", "session_id", "subflow_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("token").alias("s"))
        return per.agg(F.count(F.lit(1)).alias("chk"),
                       F.sum("s").alias("chk2"))

    legs = {
        "sessionize_sorted_noop": sess_sorted,
        "subflows_noop": subs,
        "full_chain": full,
    }
    out = {}
    control().collect()  # warm control
    for name, fn in legs.items():
        fn().write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.time() - t0)
        t0 = time.time()
        control().collect()
        fence = time.time() - t0
        out[name] = {"best": round(best, 3), "post_fence": round(fence, 3)}
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
