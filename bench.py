"""Benchmark harness — prints ONE JSON line per run (driver contract).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the north-metric workload: as-of join +
window feature extraction over a deterministic synthetic token-sequence
table of the BASELINE.json input_hint shape (seed 42, cached as parquet
under BENCH/ on first run).

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, "sequences_per_sec": N, ...}

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/scaling.py, which re-invokes this file with SPARK_GRAFT_CPUS set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEQ_DOCS = int(os.environ.get("SPARK_GRAFT_SEQ_DOCS", "120000"))
SEQ_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", f"sequences_{SEQ_DOCS}"
)


def ensure_sequences(spark):
    """Deterministic input_hint-shaped table, cached as parquet (seed 42)."""
    if not os.path.exists(os.path.join(SEQ_PATH, "_SUCCESS")):
        from netml_spark.datagen import gen_sequences_fast

        pdf = gen_sequences_fast(n_docs=SEQ_DOCS, seed=42)
        (
            spark.createDataFrame(pdf)
            .repartition(64)  # enough tasks for 32-way parallelism
            .write.mode("overwrite")
            .parquet(SEQ_PATH)
        )
    return spark.read.parquet(SEQ_PATH)


def bench_queries(spark):
    """name -> (callable producing a DataFrame, rows-metric)."""
    import __spark_entry__ as entry

    seqs = ensure_sequences(spark)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def q_seq_kernel_features():
        # north-metric core: per-sequence window feature extraction
        # (IAT + IAT_SIZE + pad/truncate at fixed dim) — all native kernels
        from netml_spark.operators import kernels

        dim = 64
        out = seqs.select(
            "doc_id",
            kernels.pad_truncate(kernels.iat("times"), dim - 1).alias("f_iat"),
            kernels.pad_truncate(kernels.iat_size("times", "tokens"), 2 * dim - 1).alias("f_iat_size"),
        )
        return out.select(F.sum(F.element_at("f_iat", 1) + F.element_at("f_iat_size", 1)).alias("chk"))

    def q_seq_stats():
        # STATS 12-vector computed natively from the array columns
        t, s = F.col("times"), F.col("tokens")
        dur = F.element_at(t, -1) - F.element_at(t, 1)
        ssum = F.aggregate(s, F.lit(0.0), lambda a, x: a + x.cast("double"))
        out = seqs.select(
            "doc_id", dur.alias("duration"),
            F.when(dur == 0, 0.0).otherwise(F.col("n_tok") / dur).alias("pkts_rate"),
            ssum.alias("num_bytes"),
        )
        return out.agg(F.sum("duration").alias("chk"))

    def q_asof_windows():
        # as-of join + lag/lead + sliding window over the events table
        from netml_spark.operators.asof import asof_join

        right = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("pv"))
        )
        out = asof_join(ev.select("event_id", "user_id", "ts"), right,
                        on=("user_id",), left_ts="ts", right_ts="ts",
                        value_cols=("pv",))
        return out.agg(F.count("pv").alias("chk"))

    def q_session_stats():
        return entry.q_session_stats(spark, SF_DIR).agg(F.sum("num_bytes").alias("chk"))

    def q_featureplan_samp():
        # Arrow-UDF path: SAMP over the sequence arrays at a fixed rate
        from netml_spark.operators import kernels

        out = seqs.select(
            kernels.samp_udf("SAMP_NUM", 1.0)("times", "tokens").alias("f")
        )
        return out.agg(F.sum(F.element_at("f", 1)).alias("chk"))

    def q_pricing():
        return entry.q_pricing_summary(spark, SF_DIR).agg(F.sum("sum_qty").alias("chk"))

    return {
        "seq_kernel_features": q_seq_kernel_features,
        "seq_stats": q_seq_stats,
        "asof_windows": q_asof_windows,
        "session_stats": q_session_stats,
        "samp_udf": q_featureplan_samp,
        "pricing_summary": q_pricing,
    }


def main():
    from netml_spark.session import get_spark

    spark = get_spark("netml-spark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(2 * CPUS, 16))
    qs = bench_queries(spark)
    # warm the JVM/scan path once with a trivial action
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    seqs = ensure_sequences(spark)
    n_seq = seqs.count()

    # steady-state measurement: one untimed warm-up run per query (JVM
    # codegen + Python-worker fork/import dominate cold runs — see
    # BENCH/BASELINE.md), then the timed run
    times = {}
    for name, fn in qs.items():
        fn().collect()
        t0 = time.time()
        fn().collect()
        times[name] = round(time.time() - t0, 3)
    total = round(sum(times.values()), 3)
    seq_secs = times["seq_kernel_features"] + times["seq_stats"] + times["samp_udf"]
    result = {
        "metric": "headline feature-engineering suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None,
        "cpus": CPUS,
        "n_sequences": n_seq,
        "sequences_per_sec": round(3 * n_seq / seq_secs, 1) if seq_secs > 0 else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
