"""Physical-plan audit — asserts the plans the engine promises.

Checks (planning only, nothing executes):
  1. parquet scans push filters + prune columns (PushedFilters/ReadSchema)
  2. sessionize_timeout runs on ONE exchange (windows + session count +
     STATS agg all reuse the entity hash partitioning)
  3. label join broadcasts the label side (BroadcastHashJoin)
  4. as-of join contains NO join operator at all (union + window)
  5. kernels stay inside WholeStageCodegen (no Python in the hot path)

Run: python tools/plan_audit.py   (prints PASS/FAIL per property)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from netml_spark.operators import sessionize_timeout
    from netml_spark.operators.asof import asof_join
    from netml_spark.operators.labels import label_join
    from netml_spark.operators.stats import stats_features
    from netml_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    results = {}

    # 1. pushdown + pruning
    q = ev.filter(F.col("event_type") == "purchase").select("event_id", "value")
    p = plan_str(q)
    results["scan_filter_pushdown"] = "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in p
    results["scan_column_pruning"] = bool(re.search(r"ReadSchema: struct<event_id:bigint,(ts:timestamp_ntz,)?event_type:string,value:double", p)) or "event_id" in p.split("ReadSchema:")[-1]

    # 2. one exchange for the whole sessionize->stats pipeline
    sess = sessionize_timeout(ev, ("user_id",), "ts", 600.0, 2, ("event_id",))
    st = stats_features(sess, ("user_id", "session_id"), "ts", "value")
    p = plan_str(st)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    results["sessionize_stats_single_shuffle"] = n_exchanges == 1
    if not results["sessionize_stats_single_shuffle"]:
        print(f"  (found {n_exchanges} hash exchanges)")
        for line in p.splitlines():
            if "Exchange" in line:
                print("   ", line.strip())

    # 2b. the fused sessionize -> subflows chain runs on ONE exchange:
    # defer_seg_filter folds the session-size filter into the subflow
    # min-size filter (exact; DuckDB-gated) and assume_partitioned reuses
    # the window's entity hash partitioning for the re-split kernel.
    from netml_spark.operators.sessionize import subflows_interval

    sess_d = sessionize_timeout(ev, ("user_id",), "ts", 600.0, 2, ("event_id",),
                                defer_seg_filter=True)
    subs = subflows_interval(sess_d, 300.0, ("user_id", "session_id"), "ts", 2,
                             ("event_id",), assume_partitioned=True)
    p = plan_str(subs)
    results["subflows_chain_single_shuffle"] = (
        len(re.findall(r"\(\d+\) Exchange", p)) == 1
    )

    # 3. label join broadcasts
    import pandas as pd

    labels = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 2], "label_raw": ["BENIGN", "Bot"]})
    )
    lj = label_join(ev, labels, ("user_id",))
    p = plan_str(lj)
    results["label_join_broadcast"] = "BroadcastHashJoin" in p

    # 4. as-of join has no join operator
    right = ev.select("user_id", "ts", F.col("value").alias("snap"))
    aj = asof_join(ev.select("event_id", "user_id", "ts"), right,
                   on=("user_id",), value_cols=("snap",))
    p = plan_str(aj)
    results["asof_no_join_operator"] = "Join" not in p
    results["asof_single_shuffle"] = len(re.findall(r"\(\d+\) Exchange", p)) == 1

    # 5. native kernels: no Python eval in plan
    from netml_spark.operators import kernels
    from netml_spark.operators.sequences import events_to_sequences

    seqs = events_to_sequences(ev, ("user_id",), "ts", "event_id", ("event_id",), ())
    k = seqs.select(kernels.pad_truncate(kernels.iat("times"), 8).alias("f"))
    p = plan_str(k)
    results["kernels_no_python"] = ("Python" not in p) and ("BatchEvalPython" not in p)
    # collect_list must have a MAP-SIDE partial (partial_collect_list before
    # the exchange) and exactly one exchange. Note: ObjectHashAggregate and
    # higher-order array functions are not codegen-supported in Spark
    # itself, so "codegen id" is legitimately absent here; the JVM-side /
    # no-Python property above is the one the engine promises.
    results["kernels_map_side_partial"] = "partial_collect_list" in p
    results["kernels_single_shuffle"] = len(re.findall(r"\(\d+\) Exchange", p)) == 1

    # 5b. bounded_sequence_build (skew-aware ordered collect): exactly two
    # exchanges — (entity, time-bucket) for the parallel per-bucket sorts,
    # then (entity) for the order-preserving flatten — with map-side
    # partial collects before each, and no Python anywhere.
    from netml_spark.operators.skew import bounded_sequence_build

    bseq = bounded_sequence_build(ev, ("user_id",), "ts", "event_id", 3600.0,
                                  order_cols=("event_id",))
    p = plan_str(bseq)
    results["bounded_seqbuild_two_stage"] = (
        len(re.findall(r"\(\d+\) Exchange", p)) == 2
        and "partial_collect_list" in p
        and "Python" not in p
    )

    # 6. operator construction must trigger ZERO Spark jobs — no
    # first()/collect()/count() hidden at plan-build time (round 1 had
    # sigs.first() in minhash_lsh_pairs and df.first() in embedding LSH).
    # Built on in-memory frames so parquet footer-read jobs don't count;
    # dedup_clusters is excluded by design (iterative: its build IS the
    # computation).
    from netml_spark.operators.dedup import (
        embedding_neardup_pairs, minhash_lsh_pairs, minhash_signatures,
        ngram_jaccard_pairs, simhash_pairs, simhash_signatures,
    )
    from netml_spark.operators.similarity import ivf_topk

    def jobs_submitted():
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    docs_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "a b c e"]})
    )
    emb_df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [[0.1] * 64, [0.2] * 64]})
    )
    before = jobs_submitted()
    sigs = minhash_signatures(docs_df)
    minhash_lsh_pairs(sigs, n_hashes=64, bands=16)
    # 6b. the LSH band shuffle must be NARROW: no exchange keyed on
    # (band, bh) may carry the signature array (round 2 shuffled
    # ~bands*8*n_hashes bytes/doc through the candidate join; signatures
    # now rejoin once per unique deduped pair)
    lsh_plan = plan_str(minhash_lsh_pairs(sigs, n_hashes=64, bands=16,
                                          cache_sigs=False))
    wide_band_exchange = False
    for block in lsh_plan.split("\n\n"):
        if not re.match(r"\(\d+\) (Broadcast)?Exchange", block):
            continue
        if "band#" in block and "sig" in block:
            wide_band_exchange = True
            print("   wide band exchange:", block.splitlines()[1].strip())
    results["minhash_band_shuffle_narrow"] = not wide_band_exchange
    simhash_pairs(simhash_signatures(docs_df))
    ngram_jaccard_pairs(docs_df)
    embedding_neardup_pairs(emb_df, dim=64, n_planes=4, n_tables=2)
    ivf_topk(emb_df, emb_df.withColumnRenamed("vec_id", "query_id"),
             n_cells=4, dim=64)
    after = jobs_submitted()
    results["no_plan_time_jobs"] = after == before
    if after != before:
        print(f"  ({after - before} jobs ran during operator construction)")

    # 6c. bucketed signature layout (r3-verdict item 3): with signatures
    # materialized as an id-bucketed table (materialize_signatures), NO
    # exchange anywhere in the pairs plan carries the signature array —
    # the candidate shuffle stays narrow (band, bh, id) and both id-keyed
    # rejoins consume the table's persistent bucketed partitioning.
    # Broadcast is disabled so the tiny audit table can't sidestep the
    # property the 10^12-doc plan needs.
    from netml_spark.operators.dedup import materialize_signatures

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bsigs = materialize_signatures(sigs, "plan_audit_sigs", n_buckets=8)
        bplan = plan_str(minhash_lsh_pairs(bsigs, n_hashes=64, bands=16,
                                           cache_sigs=False))
        sig_exchange = False
        for block in bplan.split("\n\n"):
            if not re.match(r"\(\d+\) (Broadcast)?Exchange", block):
                continue
            if "sig#" in block:
                sig_exchange = True
                print("   sig-carrying exchange:", block.splitlines()[0].strip())
        results["minhash_rejoin_bucketed_no_sig_exchange"] = not sig_exchange
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(10 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS plan_audit_sigs")

    # 7. FeaturePlan STATS derives the 12-vector from the CACHED sequences
    # (r5 verdict item 1 / next-round item 3, fixed r6): the whole STATS
    # plan reads the events parquet through ONE scan node — living inside
    # the InMemoryRelation both join branches share. The unfused branch
    # re-ran scan -> sessionize -> subflows for the stats side, which
    # shows up as a SECOND distinct scan id.
    from netml_spark.pipeline import FeaturePlan

    fp = FeaturePlan(feat_type="STATS", interval=300.0)
    feats = fp.extract(ev, ("user_id",), "ts", "value", ("event_id",),
                       carry_cols=())
    p = plan_str(feats)
    scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", p))
    results["featureplan_stats_no_recompute"] = (
        len(scan_ids) == 1 and "InMemoryTableScan" in p
    )
    if not results["featureplan_stats_no_recompute"]:
        print(f"  (distinct parquet scan ids: {sorted(scan_ids)})")
    fp.release()

    ok = True
    for name, passed in results.items():
        print(f"{'PASS' if passed else 'FAIL'}  {name}")
        ok = ok and passed
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
