"""Benchmark harness — prints ONE JSON line per run (driver contract).

Workloads:
- the NORTH-METRIC job: sort-merge as-of join + window feature extraction
  (lag/gap/rolling) over a deterministic synthetic token-EVENT corpus
  derived from the BASELINE.json input_hint sequence table (seed 42,
  ~5.4M events from 120k sequences; cached as parquet under BENCH/)
- reference-lifecycle jobs: timeout sessionize + STATS over the same corpus
- per-sequence kernels (native IAT/IAT_SIZE/pad + Arrow SAMP) over the
  sequence-shaped table
- driver-table queries at $SPARK_GRAFT_SF_DIR (sf0.1 default)

Timing is steady-state: each query runs once untimed (JVM codegen +
Python-worker fork/import dominate cold runs), then timed.
``spark.sql.shuffle.partitions`` is fixed at 64 for every parallelism level
so local[8]-vs-local[32] scaling (tools/scaling.py) compares identical
plans.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "sequences_per_sec": N, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Default 16, not 32: the host contends above ~16 vCPUs (a pure-CPU
# busy-loop gains nothing 16->32; see BENCH/BASELINE.md calibration), so
# local[16] is both faster and steadier. The driver's SPARK_GRAFT_CPUS
# env still overrides.
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
SEQ_DOCS = int(os.environ.get("SPARK_GRAFT_SEQ_DOCS", "480000"))
_HERE = os.path.dirname(os.path.abspath(__file__))
SEQ_PATH = os.path.join(_HERE, "BENCH", f"sequences_{SEQ_DOCS}")
EV_PATH = os.path.join(_HERE, "BENCH", f"token_events_{SEQ_DOCS}")


def ensure_corpus(spark):
    """Deterministic input_hint sequence table + its exploded event twin."""
    if not os.path.exists(os.path.join(SEQ_PATH, "_SUCCESS")):
        from netml_spark.datagen import gen_sequences_fast

        pdf = gen_sequences_fast(n_docs=SEQ_DOCS, seed=42)
        (
            spark.createDataFrame(pdf)
            .repartition(64)
            .write.mode("overwrite")
            .parquet(SEQ_PATH)
        )
    seqs = spark.read.parquet(SEQ_PATH)
    if not os.path.exists(os.path.join(EV_PATH, "_SUCCESS")):
        ev = seqs.select(
            "doc_id", "source",
            F.posexplode(F.arrays_zip("times", "tokens")).alias("seq", "z"),
        ).select(
            "doc_id", "source", F.col("z.times").alias("ts"),
            F.col("seq").cast("int").alias("seq"), F.col("z.tokens").alias("token"),
        )
        ev.repartition(64).write.mode("overwrite").parquet(EV_PATH)
    return seqs, spark.read.parquet(EV_PATH)


def bench_queries(spark):
    import __spark_entry__ as entry

    seqs, tev = ensure_corpus(spark)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def q_north_asof_features():
        """As-of join + window feature extraction at entity x timestamp —
        the BASELINE.json north metric, over 5.4M token events."""
        from netml_spark.operators.asof import asof_join

        right = tev.filter(F.col("seq") % 20 == 0).select(
            "doc_id", "ts", F.col("token").alias("snap")
        )
        j = asof_join(tev, right, on=("doc_id",), value_cols=("snap",))
        w = Window.partitionBy("doc_id").orderBy("ts", "seq")
        feat = (
            j.withColumn("gap", F.col("ts") - F.lag("ts").over(w))
            .withColumn("tok_lag", F.lag("token").over(w))
            .withColumn("roll_sum", F.sum("token").over(w.rowsBetween(-16, 0)))
        )
        return feat.agg(
            F.sum("roll_sum").alias("c1"), F.count("snap").alias("c2"),
            F.sum("gap").alias("c3"),
        )

    def q_sessionize_stats():
        """Reference lifecycle: timeout sessionize -> STATS 12-vector."""
        from netml_spark.operators import sessionize_timeout
        from netml_spark.operators.stats import stats_features

        sess = sessionize_timeout(tev, ("doc_id",), "ts", 600.0, 2, ("seq",),
                                  defer_seg_filter=True)
        st = stats_features(sess, ("doc_id", "session_id"), "ts", "token")
        return st.filter(F.col("num_pkts") >= 2).agg(F.sum("num_bytes").alias("chk"))

    def q_subflows_chain():
        """Reference lifecycle with the grid-aligned interval re-split
        (netml_subflows at bench scale): sessionize -> subflows ->
        per-subflow agg. Fixed interval (no data-dependent quantile
        driver pass) so the plan is identical across scaling trials."""
        from netml_spark.operators.sessionize import (
            sessionize_timeout, subflows_interval,
        )

        sess = sessionize_timeout(tev, ("doc_id",), "ts", 600.0, 2, ("seq",),
                                  defer_seg_filter=True)
        subs = subflows_interval(
            sess, 10.0, ["doc_id", "session_id"], "ts", 2, ("seq",),
            assume_partitioned=True,
        )
        per = subs.groupBy("doc_id", "session_id", "subflow_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("token").alias("s")
        )
        return per.agg(
            F.count(F.lit(1)).alias("chk"), F.sum("s").alias("chk2")
        )

    def q_seq_kernels():
        """Native array kernels: IAT + IAT_SIZE + pad/truncate."""
        from netml_spark.operators import kernels

        dim = 64
        out = seqs.select(
            kernels.pad_truncate(kernels.iat("times"), dim - 1).alias("f1"),
            kernels.pad_truncate(kernels.iat_size("times", "tokens"), 2 * dim - 1).alias("f2"),
        )
        return out.agg(
            F.sum(F.element_at("f1", 1) + F.element_at("f2", 1)).alias("chk")
        )

    def q_samp_udf():
        """Arrow-UDF SAMP_NUM loop transcription."""
        from netml_spark.operators import kernels

        out = seqs.select(kernels.samp_udf("SAMP_NUM", 1.0)("times", "tokens").alias("f"))
        return out.agg(F.sum(F.element_at("f", 1)).alias("chk"))

    def q_minhash_dedup():
        """MinHash signatures + banded LSH pair generation over documents."""
        from netml_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        sigs = minhash_signatures(docs, n_hashes=64)
        return minhash_lsh_pairs(sigs, bands=16, threshold=0.5).agg(
            F.count(F.lit(1)).alias("chk")
        )

    def q_session_stats_sf():
        return entry.q_session_stats(spark, SF_DIR).agg(F.sum("num_bytes").alias("chk"))

    def q_pricing():
        return entry.q_pricing_summary(spark, SF_DIR).agg(F.sum("sum_qty").alias("chk"))

    qs = {
        "north_asof_features": q_north_asof_features,
        "sessionize_stats": q_sessionize_stats,
        "subflows_chain": q_subflows_chain,
        "seq_kernels": q_seq_kernels,
        "samp_udf": q_samp_udf,
        "minhash_dedup": q_minhash_dedup,
        "session_stats_sf": q_session_stats_sf,
        "pricing_summary": q_pricing,
    }
    # optional filter, e.g. for focused scaling trials:
    # SPARK_GRAFT_BENCH_QUERIES=north_asof_features,sessionize_stats
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        keep = [q.strip() for q in only.split(",") if q.strip()]
        qs = {k: v for k, v in qs.items() if k in keep}
    return qs


# queries whose wall time feeds the sequences/sec north number
NORTH_QUERIES = ("north_asof_features", "sessionize_stats", "seq_kernels", "samp_udf")

# a per-query control slot above this reads as a degraded host window.
# The default is calibrated for local[16]; at lower parallelism the same
# fixed-size control legitimately takes ~16/CPUS longer.
CONTROL_HEALTHY_SECS = float(os.environ.get(
    "BENCH_CONTROL_HEALTHY_SECS", str(3.0 * max(1.0, 16.0 / CPUS))))
# The map-only control misses one documented degradation mode: on
# 2026-08-17 the shuffle/sort-heavy queries (north_asof, sessionize_stats,
# subflows_chain) ran 2-3x inflated while every expression/UDF-path query
# AND the map-only control fence sat at r2 parity — the host degradation
# lived entirely in the shuffle I/O path. This second fence does a fixed
# narrow 480k-row exchange so that mode is visible too. Threshold
# calibrated from the certified-healthy runs of 2026-08-18 (the clean
# 4x scaling pair + the certified 480k lineage line): healthy shuffle
# fences read 0.28-0.66 s at local[16] and 0.29-0.92 s at local[4], so
# 2.0 s (scaled) keeps 2-3x headroom over the healthy band while still
# catching the 2-3x shuffle-path inflation it exists to detect.
SHUFFLE_CONTROL_HEALTHY_SECS = float(os.environ.get(
    "BENCH_SHUFFLE_CONTROL_HEALTHY_SECS", str(2.0 * max(1.0, 16.0 / CPUS))))
# the control ALWAYS reads the 480k corpus (even when SEQ_DOCS scales the
# suite input) so its absolute seconds stay comparable across runs
CONTROL_SEQ_PATH = os.path.join(_HERE, "BENCH", "sequences_480000")


def make_control(spark):
    """~2 s pure-JVM control (the untouched seq_kernels twin over the
    fixed 480k corpus): timed IMMEDIATELY before/after every query so
    each number carries its own local host-health annotation (r4 verdict
    item 2 — BENCH_r04 mixed healthy and degraded sub-windows invisibly;
    a single control slot per run cannot catch the ~5-minute host
    oscillation)."""
    from netml_spark.operators import kernels

    path = CONTROL_SEQ_PATH if os.path.exists(
        os.path.join(CONTROL_SEQ_PATH, "_SUCCESS")) else SEQ_PATH
    seqs = spark.read.parquet(path)

    def control():
        out = seqs.select(
            kernels.pad_truncate(kernels.iat("times"), 63).alias("f1"),
            kernels.pad_truncate(kernels.iat_size("times", "tokens"), 127).alias("f2"),
        )
        return out.agg(
            F.sum(F.element_at("f1", 1) + F.element_at("f2", 1)).alias("c")
        )

    def shuffle_control():
        # narrow (two longs per row) but a REAL exchange of 480k rows:
        # exercises shuffle write/read, which the map-only control never
        # touches and which is exactly where the 2026-08-17 degradation
        # hit. The key is high-cardinality (hash of distinct doc_id) ON
        # PURPOSE: a low-cardinality key would collapse in the map-side
        # partial and the exchange would carry almost nothing.
        return (
            seqs.select(
                F.xxhash64("doc_id").alias("k"),
                F.col("n_tok").cast("long").alias("n"),
            )
            .groupBy("k")
            .agg(F.sum("n").alias("s"))
            .agg(F.sum("s").alias("c"))
        )

    return control, shuffle_control


def main():
    from netml_spark.session import get_spark

    spark = get_spark(
        "netml-spark-bench", master=f"local[{CPUS}]", shuffle_partitions=64
    )
    qs = bench_queries(spark)
    seqs, _ = ensure_corpus(spark)
    n_seq = seqs.count()
    control, shuffle_control = make_control(spark)
    control().collect()  # warm the controls too
    shuffle_control().collect()

    def time_control():
        t0 = time.time()
        control().collect()
        return round(time.time() - t0, 3)

    def time_shuffle_control():
        t0 = time.time()
        shuffle_control().collect()
        return round(time.time() - t0, 3)

    def drain_and_rewarm():
        # Fence hygiene, ported from tools/skew_bench.py (round-5 skew
        # forensics): a heavy query leaves the heap near Xmx and evicts
        # the control corpus from the page cache, so an immediate fence
        # pays the QUERY's GC + re-read instead of measuring the host
        # regime it certifies (observed live: the fence after
        # sessionize_stats read 10.1 s and 15.5 s in back-to-back runs
        # whose other fences were 1.7-2.5 s). Drain + re-warm first; the
        # query's own timed runs above still include all their GC cost.
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
        control().collect()

    # warm once (codegen + python worker forks), then take the better of
    # two timed runs — the host shows transient multi-x slowdowns, and a
    # single unlucky sample misrepresents steady-state throughput.
    # The control fence c_i between queries serves as query i's post-
    # control AND query i+1's pre-control.
    times = {}
    controls = {}
    shuffle_controls = {}
    drain_and_rewarm()
    fence = time_control()
    sh_fence = time_shuffle_control()
    for name, fn in qs.items():
        pre, sh_pre = fence, sh_fence
        fn().collect()
        best = None
        for _ in range(2):
            t0 = time.time()
            fn().collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        drain_and_rewarm()
        fence = time_control()
        sh_fence = time_shuffle_control()
        controls[name] = [pre, fence]
        shuffle_controls[name] = [sh_pre, sh_fence]
    total = round(sum(times.values()), 3)
    controls_healthy = all(
        c <= CONTROL_HEALTHY_SECS for pair in controls.values() for c in pair
    ) and all(
        c <= SHUFFLE_CONTROL_HEALTHY_SECS
        for pair in shuffle_controls.values() for c in pair
    )
    north_secs = sum(times[q] for q in NORTH_QUERIES if q in times)
    result = {
        "metric": "feature-engineering suite wall time (steady-state)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None,
        "cpus": CPUS,
        "controls": controls,
        "shuffle_controls": shuffle_controls,
        "controls_healthy": controls_healthy,
        "n_sequences": n_seq,
        "sequences_per_sec": round(len(NORTH_QUERIES) * n_seq / north_secs, 1)
        if north_secs > 0
        else None,
    }
    print(json.dumps(result))
    # explicit stop: a bench subprocess whose JVM outlives the python
    # driver (observed under subprocess.run with captured pipes) pollutes
    # the NEXT scaling trial with an idle 48g-heap JVM
    spark.stop()


if __name__ == "__main__":
    main()
