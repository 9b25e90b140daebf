"""Generate golden Parquet snapshots from the numpy oracle (FIXTURES.md F5).

The north star requires "netml's pcap2features test fixtures re-expressed as
golden Parquet snapshots". netml itself cannot run here (no scapy), so the
goldens are produced by the line-cited oracle transcription
(netml_spark/oracle/netml_ref.py) over the deterministic seed-42 fixture and
committed; tests/test_golden.py replays the Spark engine against them.

Regenerate (only if the oracle or fixture changes):
    python tests/golden/gen_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from netml_spark import datagen  # noqa: E402
from netml_spark.oracle import netml_ref  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def main():
    os.makedirs(OUT, exist_ok=True)
    events = datagen.gen_token_events(n_docs=200, seed=42)
    events.to_parquet(os.path.join(OUT, "token_events.parquet"), index=False)

    flows = datagen.oracle_flows(events)
    sess = netml_ref.pcap2flows(flows, flow_pkts_thres=2, timeout=600.0)
    sess_rows = pd.DataFrame(
        {
            "doc_id": [fid for fid, _, _ in sess],
            "seg_ordinal": _ordinals([fid for fid, _, _ in sess]),
            "ts_start": [float(t[0]) for _, t, _ in sess],
            "ts_end": [float(t[-1]) for _, t, _ in sess],
            "n_tok": [len(t) for _, t, _ in sess],
        }
    )
    sess_rows.to_parquet(os.path.join(OUT, "sessions.parquet"), index=False)

    durations = [netml_ref.flow_duration(t) for _, t, _ in sess]
    interval = netml_ref.split_interval(durations, 0.9)
    subs = netml_ref.flows2subflows(sess, interval, flow_pkts_thres=2)
    meta = {"interval": interval, "n_subflows": len(subs)}

    for feat_type in ("IAT", "SIZE", "IAT_SIZE", "STATS", "SAMP_NUM", "SAMP_SIZE"):
        X = netml_ref.flow2features(subs, feat_type, 0.9, fft=False)
        df = pd.DataFrame(
            {
                "doc_id": [fid for fid, _, _ in subs],
                "t0": [round(float(t[0]), 9) for _, t, _ in subs],
                "n_tok": [len(t) for _, t, _ in subs],
                "features": list(X),
            }
        )
        df.to_parquet(os.path.join(OUT, f"features_{feat_type}.parquet"), index=False)
        meta[f"dim_{feat_type}"] = X.shape[1]
    X = netml_ref.flow2features(subs, "IAT", 0.9, fft=True)
    pd.DataFrame(
        {
            "doc_id": [fid for fid, _, _ in subs],
            "t0": [round(float(t[0]), 9) for _, t, _ in subs],
            "n_tok": [len(t) for _, t, _ in subs],
            "features": list(X),
        }
    ).to_parquet(os.path.join(OUT, "features_FFT-IAT.parquet"), index=False)
    meta["dim_FFT-IAT"] = X.shape[1]

    pd.DataFrame([meta]).to_parquet(os.path.join(OUT, "meta.parquet"), index=False)
    print("goldens written to", OUT, meta)


def _ordinals(fids):
    seen = {}
    out = []
    for f in fids:
        k = seen.get(f, 0)
        seen[f] = k + 1
        out.append(k)
    return out


if __name__ == "__main__":
    main()
