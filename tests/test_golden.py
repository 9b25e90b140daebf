"""Golden-snapshot replay: the Spark engine run end-to-end over the
committed fixture parquet must reproduce the oracle-generated goldens
(FIXTURES.md F5; the north star's "fixtures re-expressed as golden
Parquet snapshots")."""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "data")


@pytest.fixture(scope="module")
def golden_events(spark):
    df = spark.read.parquet(os.path.join(GOLDEN, "token_events.parquet"))
    return df.repartition(8, "doc_id").cache()


def test_sessions_match_golden(spark, golden_events):
    from netml_spark.operators import sessionize_timeout
    from pyspark.sql import functions as F

    sess = sessionize_timeout(golden_events, ("doc_id",), "ts", 600.0, 2, ("seq",))
    got = (
        sess.groupBy("doc_id", "session_id")
        .agg(F.min("ts").alias("ts_start"), F.max("ts").alias("ts_end"),
             F.count(F.lit(1)).alias("n_tok"))
        .toPandas()
    )
    got["seg_ordinal"] = (
        got.sort_values("session_id").groupby("doc_id").cumcount()
    )
    got = got.sort_values(["doc_id", "seg_ordinal"]).reset_index(drop=True)
    exp = pd.read_parquet(os.path.join(GOLDEN, "sessions.parquet"))
    exp = exp.sort_values(["doc_id", "seg_ordinal"]).reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["doc_id", "seg_ordinal", "ts_start", "ts_end"]],
        exp[["doc_id", "seg_ordinal", "ts_start", "ts_end"]],
        check_dtype=False,
    )
    assert (got["n_tok"].to_numpy() == exp["n_tok"].to_numpy()).all()


@pytest.mark.parametrize(
    "feat_type,fft",
    [("IAT", False), ("STATS", False), ("SAMP_NUM", False), ("IAT", True)],
)
def test_features_match_golden(spark, golden_events, feat_type, fft):
    from netml_spark.pipeline import FeaturePlan

    name = ("FFT-" if fft else "") + feat_type
    exp = pd.read_parquet(os.path.join(GOLDEN, f"features_{name}.parquet"))
    meta = pd.read_parquet(os.path.join(GOLDEN, "meta.parquet")).iloc[0]

    plan = FeaturePlan(feat_type=feat_type, fft=fft, q_interval=0.9)
    out = plan.extract(golden_events, ("doc_id",), "ts", "token", ("seq",))
    got = out.select("doc_id", "times", "features").toPandas()
    got["t0"] = got["times"].map(lambda t: round(float(t[0]), 9))
    got["n_tok"] = got["times"].map(len)

    assert abs(plan.split_interval - meta["interval"]) < 1e-9
    assert len(got) == meta["n_subflows"] == len(exp)
    gk = got.set_index(["doc_id", "t0", "n_tok"])["features"].sort_index()
    ek = exp.set_index(["doc_id", "t0", "n_tok"])["features"].sort_index()
    assert list(gk.index) == list(ek.index)
    G = np.stack(gk.map(np.asarray))
    E = np.stack(ek.map(np.asarray))
    assert G.shape[1] == meta[f"dim_{name}"]
    np.testing.assert_allclose(G, E, rtol=1e-9, atol=1e-9)
