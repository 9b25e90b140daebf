"""Combine per-query minima across ALL kept scaling trial pairs.

tools/scaling.py already journals every completed N->4N trial pair —
kept or discarded — to BENCH/scaling_trials.jsonl the moment it exists,
and each scaling.py invocation reports minima only across its OWN kept
pairs. On this host (transient slowdowns only ever ADD time — CLAUDE.md
round-2/3 forensics) the best estimate of the contention-free runtime is
the per-query minimum across EVERY kept pair regardless of which run
produced it. This tool computes that combined estimate and appends it to
BENCH/BASELINE.md in the same row + per-query-detail format scaling.py
writes, tagged as combined evidence with the pair count.

Usage:  python tools/scaling_combine.py          # 1.92M-sequence pairs
        SCALING_COMBINE_SEQS=960000 python tools/scaling_combine.py

Pure post-processing: no Spark, no timing — safe to run any time.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOURNAL = os.path.join(REPO, "BENCH", "scaling_trials.jsonl")
NORTH = ("north_asof_features", "sessionize_stats", "seq_kernels", "samp_udf")


def main():
    want_seqs = int(os.environ.get("SCALING_COMBINE_SEQS", "1920000"))
    # pin the parallelism pair too (ADVICE r5: a future kept pair at the
    # same corpus but different N->4N, e.g. 8->32, must not be silently
    # mixed into the per-query minima)
    want_n = int(os.environ.get("SCALING_COMBINE_N", "4"))
    want_n4 = int(os.environ.get("SCALING_COMBINE_N4", "16"))
    pairs = []
    with open(JOURNAL) as f:
        for line in f:
            rec = json.loads(line)
            if (rec.get("kept") and rec.get("n_sequences") == want_seqs
                    and rec.get("n") == want_n and rec.get("n4") == want_n4):
                pairs.append(rec)
    if not pairs:
        print(f"no kept pairs at n_sequences={want_seqs} "
              f"n={want_n}->{want_n4} in {JOURNAL}", file=sys.stderr)
        sys.exit(2)

    n, n4 = pairs[0]["n"], pairs[0]["n4"]
    qminN: dict = {}
    qmin4N: dict = {}
    for rec in pairs:
        for q, t in rec["a_queries"].items():
            qminN[q] = min(qminN.get(q, t), t)
        for q, t in rec["b_queries"].items():
            qmin4N[q] = min(qmin4N.get(q, t), t)
    ceiling = max(rec["post_ceiling"] for rec in pairs)
    valN = round(sum(qminN.values()), 3)
    val4N = round(sum(qmin4N.values()), 3)
    north = [q for q in NORTH if q in qminN and q in qmin4N]
    thrN = len(north) * want_seqs / sum(qminN[q] for q in north)
    thr4N = len(north) * want_seqs / sum(qmin4N[q] for q in north)
    eff_seq = thr4N / (4 * thrN)
    eff_total = valN / (4 * val4N)
    eff_norm = thr4N / (ceiling * thrN) if ceiling > 0 else None
    per_query = {q: round(qminN[q] / (4 * qmin4N[q]), 3)
                 for q in qminN if q in qmin4N}
    print(json.dumps({
        "n": n, "n4": n4, "kept_pairs": len(pairs),
        "pure_cpu_ceiling_speedup": round(ceiling, 3),
        "qminN": qminN, "qmin4N": qmin4N,
        "suite_at_N": valN, "suite_at_4N": val4N,
        "seq_throughput_efficiency": round(eff_seq, 3),
        "seq_efficiency_vs_machine_ceiling":
            round(eff_norm, 3) if eff_norm is not None else None,
        "total_wall_efficiency": round(eff_total, 3),
        "per_query_efficiency": per_query,
    }))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    input_tag = f"{want_seqs} seqs + sf0.1"
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\nCombined minima across {len(pairs)} kept gated pairs "
            f"({stamp}, {input_tag} — per-query minimum over every kept "
            f"pair in scaling_trials.jsonl; transient host slowdowns only "
            f"ever add time, so minima approximate the contention-free "
            f"runtime at each parallelism level):\n\n"
            f"| run (UTC) | input | N->4N | cpu ceiling | seq/s @N | "
            f"seq/s @4N | seq eff | suite @N | suite @4N | suite eff |\n"
            f"|---|---|---|---|---|---|---|---|---|---|\n"
            f"| {stamp} (combined x{len(pairs)}) | {input_tag} | {n}->{n4} | "
            f"{ceiling:.2f}x/4 | {thrN:.0f} | {thr4N:.0f} | {eff_seq:.2f} | "
            f"{valN:.1f}s | {val4N:.1f}s | {eff_total:.2f} |"
            + (f" <!-- eff vs machine ceiling: {eff_norm:.2f} -->"
               if eff_norm is not None else "")
            + "\n\n"
        )
        f.write("| query | @N (s) | @4N (s) | raw eff | vs ceiling |\n"
                "|---|---|---|---|---|\n")
        for q in sorted(qminN, key=lambda q: -qminN[q]):
            if q not in qmin4N:
                continue
            tN, t4 = qminN[q], qmin4N[q]
            f.write(f"| {q} | {tN:.2f} | {t4:.2f} | {tN / (4 * t4):.2f} | "
                    f"{tN / (ceiling * t4):.2f} |\n")
        f.write("\n")


if __name__ == "__main__":
    main()
