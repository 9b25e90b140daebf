"""Skew-handling evidence: heavy-hitter entity, naive vs skew-aware plans.

The north rule requires skew handled EXPLICITLY; skew.py has parity tests
but (until round 4) no skewed-corpus measurement. This tool builds a
deterministic corpus where ONE entity owns 20% of all rows (the classic
heavy-hitter shape: one device/user/crawl-host dominating a day of data)
and times, steady-state:

  sessionize_naive    window-sort sessionize (sessionize_timeout): the hot
                      entity's whole history lands on ONE task's sort
  sessionize_bounded  bounded_sessionize: (entity, time-bucket) chunks the
                      hot entity across tasks; boundary splits ~gap/width
  agg_naive           plain groupBy.agg(count/sum/mean/min/max)
  agg_salted          salted_agg two-stage variant

Expected (and honest) reading: the window/sort class is where heavy
hitters actually hurt — Spark's hash aggregate already does map-side
partials, so for ALGEBRAIC aggregates the naive plan is skew-tolerant and
salted_agg roughly ties (its docstring says exactly when to reach for it:
final groups too big for one task, e.g. collect-class state). The bounded
sessionizer is the one that must win on this corpus.

Appends a table to BENCH/BASELINE.md and prints one JSON line.
Run: python tools/skew_bench.py   (SKEW_ROWS=4000000 SKEW_CPUS=16)
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

N_ROWS = int(os.environ.get("SKEW_ROWS", "4000000"))
CPUS = int(os.environ.get("SKEW_CPUS", "16"))
# SKEW_HOT_FRAC picks the regime: 0.2 (default) puts the hot entity a
# bit over per-core average work — the honest "mild skew" shape where
# the remedies' extra exchange LOSES; 0.8 makes one entity dominate the
# corpus (hot rows >> total/cores) — the shape the remedies (and the
# 5M-row heavy_hitters gate in sequence_build_auto/sessionize_auto)
# exist for. Measuring BOTH sides calibrates the auto threshold.
HOT_FRAC = float(os.environ.get("SKEW_HOT_FRAC", "0.20"))
N_COLD = 200_000
GAP = 30.0
BUCKET = 3600.0  # >> gap: ~gap/width = 0.8% of hot sessions split at bounds
_tag = f"{N_ROWS}" if HOT_FRAC == 0.20 else f"{N_ROWS}_hot{int(HOT_FRAC * 100)}"
PATH = os.path.join(REPO, "BENCH", f"skew_events_{_tag}")


def ensure_corpus(spark):
    if os.path.exists(os.path.join(PATH, "_SUCCESS")):
        return spark.read.parquet(PATH)
    rng = np.random.default_rng(42)
    n_hot = int(N_ROWS * HOT_FRAC)
    n_cold = N_ROWS - n_hot
    base = 1_700_000_000.0
    # hot entity: one long, dense history (mostly ~1 s gaps, occasional
    # session breaks) — the shape that serializes a window sort
    hot_gaps = np.where(rng.random(n_hot) < 0.995,
                        rng.uniform(0.1, 2.0, n_hot),
                        rng.uniform(GAP + 1, 600.0, n_hot))
    hot = pd.DataFrame({
        "doc_id": "HOT",
        "ts": base + np.cumsum(hot_gaps),
        "token": rng.integers(0, 1000, n_hot, dtype=np.int32),
    })
    cold_ids = rng.integers(0, N_COLD, n_cold)
    cold = pd.DataFrame({
        "doc_id": np.char.add("d", cold_ids.astype(str)),
        "ts": base + rng.uniform(0, 86_400.0, n_cold),
        "token": rng.integers(0, 1000, n_cold, dtype=np.int32),
    })
    pdf = pd.concat([hot, cold], ignore_index=True)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(PATH)
    return spark.read.parquet(PATH)


def main():
    from pyspark.sql import functions as F

    from netml_spark.operators.sequences import events_to_sequences
    from netml_spark.operators.sessionize import sessionize
    from netml_spark.operators.skew import (
        bounded_sequence_build, bounded_sessionize, salted_agg,
    )
    from netml_spark.session import get_spark

    spark = get_spark("skew-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=64)
    ev = ensure_corpus(spark)

    def q_sessionize_naive():
        # clean gap sessionizer — the SAME semantics class as
        # bounded_sessionize (neither drops rows), so the comparison is
        # purely the partitioning strategy
        s = sessionize(ev, ("doc_id",), "ts", GAP)
        return s.groupBy("doc_id", "session_id").agg(
            F.count(F.lit(1)).alias("n")).agg(
            F.count(F.lit(1)).alias("sessions"), F.sum("n").alias("rows"))

    def q_sessionize_bounded():
        s = bounded_sessionize(ev, ("doc_id",), "ts", GAP, BUCKET)
        return s.groupBy("doc_id", "session_id").agg(
            F.count(F.lit(1)).alias("n")).agg(
            F.count(F.lit(1)).alias("sessions"), F.sum("n").alias("rows"))

    def q_agg_naive():
        return ev.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("count_token"),
            F.sum(F.col("token").cast("double")).alias("sum_token"),
            F.mean(F.col("token").cast("double")).alias("mean_token"),
            F.min(F.col("token").cast("double")).alias("min_token"),
            F.max(F.col("token").cast("double")).alias("max_token"),
        ).agg(F.count(F.lit(1)).alias("keys"), F.sum("sum_token").alias("chk"))

    def q_agg_salted():
        return salted_agg(ev, ("doc_id",), "token").agg(
            F.count(F.lit(1)).alias("keys"), F.sum("sum_token").alias("chk"))

    def q_seqbuild_naive():
        # ordered collect per entity: the hot entity's 800k-row history
        # concatenates AND sorts inside ONE task's aggregation buffer
        s = events_to_sequences(ev, ("doc_id",), "ts", "token",
                                order_cols=(), carry_cols=())
        return s.agg(
            F.count(F.lit(1)).alias("keys"),
            F.sum("n_tok").alias("rows"),
            # exact, order-insensitive checksums: the two plans partition
            # their output differently, so a plain double SUM of ~1.7e9
            # magnitudes rounds differently per plan (observed at
            # hot_frac=0.8) — long/decimal addition is associative.
            F.sum(F.element_at("tokens", 1).cast("long")).alias("chk"),
            F.sum(F.element_at("times", -1).cast("decimal(18,6)")).alias("chk2"),
        )

    def q_seqbuild_bounded():
        s = bounded_sequence_build(ev, ("doc_id",), "ts", "token", BUCKET)
        return s.agg(
            F.count(F.lit(1)).alias("keys"),
            F.sum("n_tok").alias("rows"),
            # exact, order-insensitive checksums: the two plans partition
            # their output differently, so a plain double SUM of ~1.7e9
            # magnitudes rounds differently per plan (observed at
            # hot_frac=0.8) — long/decimal addition is associative.
            F.sum(F.element_at("tokens", 1).cast("long")).alias("chk"),
            F.sum(F.element_at("times", -1).cast("decimal(18,6)")).alias("chk2"),
        )

    qs = {
        "sessionize_naive": q_sessionize_naive,
        "sessionize_bounded": q_sessionize_bounded,
        "agg_naive": q_agg_naive,
        "agg_salted": q_agg_salted,
        "seqbuild_naive": q_seqbuild_naive,
        "seqbuild_bounded": q_seqbuild_bounded,
    }
    # SKEW_QUERIES=seqbuild (comma-separable prefixes) narrows the run to
    # one naive/remedy family — on an oscillating host a full-suite
    # certification window may never occur, but a 3-minute family window
    # does (observed: four families certified, then a 130 s spike landed
    # exactly on the fifth).
    fam = os.environ.get("SKEW_QUERIES")
    if fam:
        keep = tuple(f.strip() for f in fam.split(",") if f.strip())
        qs = {k: v for k, v in qs.items() if k.startswith(keep)}
    # Regime certification (2026-08-17 lesson): both r5 skew runs landed
    # in a shuffle-path-degraded window and INVERTED every comparison —
    # the remedies pay one extra exchange, which a degraded shuffle path
    # prices 2-3x. Reuse bench.py's dual fences (map-only + narrow real
    # exchange over the fixed 480k corpus) so every row carries its own
    # in-window health annotation instead of an after-the-fact inference.
    import bench as benchmod

    control, shuffle_control = benchmod.make_control(spark)
    control().collect()
    shuffle_control().collect()

    def fences():
        t0 = time.time()
        control().collect()
        c = round(time.time() - t0, 3)
        t0 = time.time()
        shuffle_control().collect()
        return c, round(time.time() - t0, 3)

    times, checks, controls = {}, {}, {}
    fence = fences()
    for name, fn in qs.items():
        pre = fence
        checks[name] = [r.asDict() for r in fn().collect()]  # warm + sanity
        best = None
        for _ in range(2):
            t0 = time.time()
            fn().collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        fence = fences()
        controls[name] = [pre, fence]  # [(map,shuffle) before, after]
    def fences_healthy(pairs):
        return all(
            c[0] <= benchmod.CONTROL_HEALTHY_SECS
            and c[1] <= benchmod.SHUFFLE_CONTROL_HEALTHY_SECS
            for c in pairs
        )

    controls_healthy = fences_healthy(
        [c for pair in controls.values() for c in pair])

    # sanity: both sessionizers cover every row; both aggs agree exactly;
    # the bounded sequence build is EXACTLY the unbounded one
    if "sessionize_naive" in times:
        assert checks["sessionize_naive"][0]["rows"] == N_ROWS
        assert checks["sessionize_bounded"][0]["rows"] == N_ROWS
    if "agg_naive" in times:
        assert checks["agg_naive"][0]["keys"] == checks["agg_salted"][0]["keys"]
    if "seqbuild_naive" in times:
        assert checks["seqbuild_naive"] == checks["seqbuild_bounded"]
        assert checks["seqbuild_naive"][0]["rows"] == N_ROWS

    # Per-FAMILY certification: each naive/remedy pair is bracketed by its
    # own three fences (pre-naive, between, post-remedy). On a host that
    # oscillates on a ~5-minute period a full-suite window may never occur,
    # but a single family's ~3-minute window does — the 18:14 UTC run had
    # four families fence-clean and lost ALL of them to one 130 s spike on
    # the fifth. A family's comparison is valid iff ITS OWN regime was
    # healthy for both legs; families run back-to-back, so the `between`
    # fence is shared.
    FAMILIES = (
        ("sessionize", "sessionize_naive", "sessionize_bounded",
         "sessionize (window sort)", "bounded_sessionize"),
        ("agg", "agg_naive", "agg_salted",
         "algebraic agg", "salted_agg"),
        ("seqbuild", "seqbuild_naive", "seqbuild_bounded",
         "ordered collect (sequence build)", "bounded_sequence_build"),
    )
    fam_cert = {}
    out = {
        "metric": "skewed-corpus wall time (20% of rows on one entity)",
        "rows": N_ROWS, "hot_frac": HOT_FRAC, "cpus": CPUS,
        "queries": times,
        "controls": controls,
        "controls_healthy": controls_healthy,
    }
    for famname, naive, remedy, _, _ in FAMILIES:
        if naive in times and remedy in times:
            out[f"{famname}_speedup"] = round(times[naive] / times[remedy], 2)
            fam_cert[famname] = fences_healthy(
                controls[naive] + controls[remedy])
    out["family_certified"] = fam_cert
    print(json.dumps(out))

    # evidence file only gets CERTIFIED families (degraded-regime numbers
    # invert the comparison and are recorded by the caller's JSON/log
    # instead); SKEW_APPEND_ALWAYS=1 overrides for forensics
    append_all = bool(os.environ.get("SKEW_APPEND_ALWAYS"))
    rows_md = ""
    for famname, naive, remedy, label, remedy_label in FAMILIES:
        if famname not in fam_cert:
            continue
        if not (fam_cert[famname] or append_all):
            continue
        cert = "yes" if fam_cert[famname] else "NO"
        rows_md += (
            f"| {label} | {times[naive]:.2f} | "
            f"{times[remedy]:.2f} ({remedy_label}) | "
            f"{out[famname + '_speedup']:.2f}x | {cert} |\n")
    if not rows_md:
        spark.stop()
        return

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\nSkew evidence ({stamp}): {N_ROWS} rows, {HOT_FRAC:.0%} on one "
            f"entity, local[{CPUS}], steady-state min-of-2; certification is "
            f"per family (dual fences bracketing each naive/remedy pair).\n\n"
            "| op class | naive (s) | skew-aware (s) | speedup | fences healthy |\n"
            "|---|---|---|---|---|\n"
            + rows_md
        )
    spark.stop()


if __name__ == "__main__":
    main()
