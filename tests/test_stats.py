"""Parity: native STATS aggregate vs numpy oracle (reference parser.py:430-469)."""

import numpy as np

from netml_spark import datagen
from netml_spark.operators import sessionize_timeout
from netml_spark.operators.stats import STATS_COLS, stats_features
from netml_spark.oracle import netml_ref


def test_stats_matches_oracle(spark, token_events_df, token_events_pdf):
    sess = sessionize_timeout(token_events_df, ("doc_id",), "ts", 600.0, 2, ("seq",))
    got = stats_features(sess, keys=("doc_id", "session_id"), ts_col="ts", size_col="token")
    gpdf = got.toPandas()
    # re-key raw cumsum session ids to per-doc ordinals (short middle
    # segments are dropped, leaving id gaps; the oracle list is ordinal)
    gpdf["session_id"] = gpdf.sort_values("session_id").groupby("doc_id").cumcount()
    gpdf = gpdf.set_index(["doc_id", "session_id"]).sort_index()

    flows = datagen.oracle_flows(token_events_pdf)
    segs = netml_ref.pcap2flows(flows, flow_pkts_thres=2, timeout=600.0)
    ordinal = {}
    for fid, t, s in segs:
        k = ordinal.get(fid, 0)
        ordinal[fid] = k + 1
        exp = netml_ref.get_STATS(t, s)
        gotv = gpdf.loc[(fid, k)][list(STATS_COLS)].to_numpy(dtype=np.float64)
        np.testing.assert_allclose(gotv, exp, rtol=1e-9, atol=1e-9)


def test_stats_zero_duration(spark):
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": ["z", "z"], "ts": [5.0, 5.0], "token": [10, 20],
        "session_id": [0, 0],
    })
    got = stats_features(spark.createDataFrame(pdf), ("doc_id", "session_id"), "ts", "token").toPandas()
    assert got["pkts_rate"].iloc[0] == 0.0
    assert got["bytes_rate"].iloc[0] == 0.0
    assert got["duration"].iloc[0] == 0.0
