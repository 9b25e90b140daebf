"""Property-based tests (hypothesis) — kernel semantics vs oracle on
adversarial inputs. Spark roundtrips are expensive, so each property
batches all hypothesis examples into ONE DataFrame keyed by case id.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from netml_spark.oracle import netml_ref

# -- pure-oracle properties (no Spark, cheap, many examples) ---------------


@given(
    st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False), min_size=2, max_size=50),
    st.floats(min_value=0.01, max_value=1000),
)
@settings(max_examples=200, deadline=None)
def test_samp_invariants(times, rate):
    times = np.sort(np.asarray(times, dtype=np.float64))
    sizes = np.ones_like(times)
    f = netml_ref.get_SAMP(times, sizes, "SAMP_NUM", rate)
    assert len(f) <= 501  # 500-cap + possible trailing bucket
    assert (f >= 0).all()
    # total counted packets never exceeds n (zero-fill adds none)
    assert f.sum() <= len(times)


@given(
    st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False), min_size=2, max_size=60),
    st.floats(min_value=0.5, max_value=5000),
)
@settings(max_examples=200, deadline=None)
def test_subflows_partition_property(times, interval):
    """Subflow split never invents or duplicates rows (beyond trailing
    discard + min-size filter), and every kept segment has >= 2 rows."""
    times = np.sort(np.asarray(times, dtype=np.float64))
    sizes = np.arange(len(times))
    subs = netml_ref.flows2subflows([("x", times, sizes)], interval, 2)
    total = sum(len(t) for _, t, _ in subs)
    assert total <= len(times)
    for _, t, s in subs:
        assert len(t) >= 2
        assert (np.diff(t) >= 0).all()


@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=40))
@settings(max_examples=200, deadline=None)
def test_pad_truncate_property(vals, dim):
    out = netml_ref.pad_truncate(vals, dim)
    assert len(out) == dim
    k = min(len(vals), dim)
    assert list(out[:k]) == [float(v) for v in vals[:k]]
    assert (out[k:] == 0).all()


# -- Spark-vs-oracle property (one batched DataFrame) ----------------------


def test_sessionize_random_cases_batched(spark):
    rng = np.random.default_rng(123)
    rows = []
    for case in range(60):
        n = int(rng.integers(1, 40))
        # adversarial gaps: exactly at the threshold, zero, huge
        gaps = rng.choice([0.0, 599.999, 600.0, 600.0001, 1.0, 10_000.0],
                          size=max(n - 1, 0), p=[0.1, 0.15, 0.15, 0.2, 0.3, 0.1])
        t0 = float(rng.uniform(0, 1e6))
        ts = np.concatenate([[t0], t0 + np.cumsum(gaps)]) if n > 1 else np.array([t0])
        for i, t in enumerate(ts):
            rows.append((f"case{case}", float(t), i, int(rng.integers(40, 1500))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "seq", "token"])

    from netml_spark.operators import sessionize_timeout

    got = sessionize_timeout(
        spark.createDataFrame(pdf), ("doc_id",), "ts", 600.0, 2, ("seq",)
    ).toPandas()

    flows = [
        (doc, g.sort_values(["ts", "seq"])["ts"].to_numpy(),
         g.sort_values(["ts", "seq"])["token"].to_numpy())
        for doc, g in pdf.groupby("doc_id")
    ]
    exp = netml_ref.pcap2flows(flows, flow_pkts_thres=2, timeout=600.0)
    exp_rows = sum(len(t) for _, t, _ in exp)
    assert len(got) == exp_rows
    # per-case multiset of segment sizes matches
    got_sizes = got.groupby(["doc_id", "session_id"]).size()
    exp_sizes = {}
    for fid, t, _ in exp:
        exp_sizes.setdefault(fid, []).append(len(t))
    for fid, sizes in exp_sizes.items():
        assert sorted(got_sizes[fid].tolist()) == sorted(sizes), fid
