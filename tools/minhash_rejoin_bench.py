"""MinHash pairs-build evidence: cached vs bucketed signatures (r4
verdict item 7).

The plan property ``minhash_rejoin_bucketed_no_sig_exchange`` pins that
``materialize_signatures`` makes both id-keyed signature rejoins
exchange-free; this tool adds the WALL-TIME comparison at 480k docs:

  pairs_cached    minhash_lsh_pairs(sigs, cache_sigs=True)  — in-memory
                  persisted signatures; both rejoins hash-partition the
                  signature side per build
  write_bucketed  one-time materialize_signatures cost (the layout write
                  a real deployment amortizes across every downstream
                  pairs build / cluster pass / re-run)
  pairs_bucketed  minhash_lsh_pairs(bucketed_table, cache_sigs=False) —
                  both rejoins consume the persistent hash partitioning

Signatures are synthesized deterministically (seed 42): 480k docs, 64
minhashes each, every 20th doc followed by a near-duplicate whose
signature differs in 4 of 64 positions (est_jaccard 0.9375 >= 0.5, so
~24k true pairs flow through the full rejoin path). Candidate content is
identical across variants (asserted), so the timing isolates the layout.

Appends a section to BENCH/BASELINE.md and prints one JSON line.
Run: python tools/minhash_rejoin_bench.py   (MINHASH_DOCS=480000)
NEVER run while any other Spark job is active (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("MINHASH_DOCS", "480000"))
CPUS = int(os.environ.get("MINHASH_CPUS", "16"))
N_HASHES = 64
BANDS = 16
SIG_PATH = os.path.join(REPO, "BENCH", f"minhash_sigs_{N_DOCS}")
TABLE = f"bench_minhash_sigs_{N_DOCS}"


def ensure_sigs(spark):
    if not os.path.exists(os.path.join(SIG_PATH, "_SUCCESS")):
        rng = np.random.default_rng(42)
        sigs = rng.integers(0, 2**31 - 1, size=(N_DOCS, N_HASHES), dtype=np.int64)
        # every 20th doc: the NEXT doc is a near-duplicate (4/64 positions
        # perturbed -> est_jaccard 0.9375)
        dup_src = np.arange(0, N_DOCS - 1, 20)
        sigs[dup_src + 1] = sigs[dup_src]
        for j in range(4):
            sigs[dup_src + 1, j * 16] = rng.integers(0, 2**31 - 1, len(dup_src))
        pdf = pd.DataFrame({
            "id": np.arange(N_DOCS, dtype=np.int64),
            "sig": list(sigs),
        })
        spark.createDataFrame(pdf).repartition(64).write.mode(
            "overwrite").parquet(SIG_PATH)
    return spark.read.parquet(SIG_PATH)


def main():
    from pyspark.sql import functions as F

    from netml_spark.operators.dedup import (
        materialize_signatures, minhash_lsh_pairs,
    )
    from netml_spark.session import get_spark

    spark = get_spark("minhash-rejoin-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=64)
    sigs = ensure_sigs(spark)

    def chk(df):
        return df.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).alias("idsum"),
        ).collect()[0].asDict()

    def pairs_cached():
        handle = []
        out = chk(minhash_lsh_pairs(sigs, n_hashes=N_HASHES, bands=BANDS,
                                    threshold=0.5, cache_sigs=True,
                                    unpersist_handle=handle))
        handle[0].unpersist()
        return out

    # one-time layout write (timed: the amortization denominator)
    t0 = time.time()
    bucketed = materialize_signatures(sigs, TABLE, n_buckets=64)
    write_secs = round(time.time() - t0, 3)

    def pairs_bucketed():
        return chk(minhash_lsh_pairs(bucketed, n_hashes=N_HASHES,
                                     bands=BANDS, threshold=0.5,
                                     cache_sigs=False))

    results, times = {}, {}
    for name, fn in (("pairs_cached", pairs_cached),
                     ("pairs_bucketed", pairs_bucketed)):
        results[name] = fn()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)

    assert results["pairs_cached"] == results["pairs_bucketed"], results
    assert results["pairs_cached"]["pairs"] >= N_DOCS // 20 - 1, results

    delta = times["pairs_cached"] - times["pairs_bucketed"]
    out = {
        "metric": "minhash pairs build: cached vs bucketed signatures",
        "docs": N_DOCS, "n_hashes": N_HASHES, "bands": BANDS, "cpus": CPUS,
        "queries": dict(times, write_bucketed=write_secs),
        "pairs": results["pairs_cached"]["pairs"],
        "bucketed_speedup": round(
            times["pairs_cached"] / times["pairs_bucketed"], 2),
        "write_amortizes_after_builds": (
            int(np.ceil(write_secs / delta)) if delta > 0 else None),
    }
    print(json.dumps(out))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\nMinHash rejoin layout ({stamp}): {N_DOCS} docs, "
            f"{N_HASHES} hashes x {BANDS} bands, local[{CPUS}], "
            f"steady-state min-of-2, {out['pairs']} pairs (identical "
            f"across variants).\n\n"
            "| signature layout | pairs build (s) | notes |\n"
            "|---|---|---|\n"
            f"| persisted in-memory (cache_sigs=True) | "
            f"{times['pairs_cached']:.2f} | rejoins hash-partition the "
            f"signature side per build |\n"
            f"| id-bucketed table (materialize_signatures) | "
            f"{times['pairs_bucketed']:.2f} | rejoins exchange-free on "
            f"the signature side; one-time write {write_secs:.2f} s"
            + (f", amortizes after {out['write_amortizes_after_builds']} "
               f"builds" if out["write_amortizes_after_builds"] else "")
            + " |\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
