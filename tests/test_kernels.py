"""Parity: array kernels vs numpy oracle (reference parser.py:354-652)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from netml_spark.operators import kernels
from netml_spark.operators.sequences import events_to_sequences
from netml_spark.oracle import netml_ref


def _seqs(spark, token_events_df):
    return events_to_sequences(
        token_events_df, ("doc_id",), "ts", "token", ("seq",), ("source",)
    )


def _oracle_by_doc(token_events_pdf):
    out = {}
    pdf = token_events_pdf.sort_values(["doc_id", "ts", "seq"], kind="stable")
    for doc_id, g in pdf.groupby("doc_id"):
        out[doc_id] = (
            g["ts"].to_numpy(np.float64),
            g["token"].to_numpy(np.float64),
        )
    return out


def test_iat_and_size_and_iat_size(spark, token_events_df, token_events_pdf):
    seqs = _seqs(spark, token_events_df)
    got = seqs.select(
        "doc_id",
        kernels.iat("times").alias("iat"),
        kernels.sizes_double("tokens").alias("size"),
        kernels.iat_size("times", "tokens").alias("iat_size"),
    ).collect()
    ora = _oracle_by_doc(token_events_pdf)
    assert len(got) == len(ora)
    for r in got:
        t, s = ora[r.doc_id]
        np.testing.assert_allclose(np.asarray(r.iat), netml_ref.get_IAT(t), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(r.size), netml_ref.get_SIZE(s))
        np.testing.assert_allclose(
            np.asarray(r.iat_size), netml_ref.get_IAT_SIZE(t, s), rtol=0, atol=0
        )


def test_pad_truncate(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [[1.0, 2.0, 3.0], [1.0], []]})
    )
    got = df.select(kernels.pad_truncate("v", 2).alias("p")).collect()
    assert [list(r.p) for r in got] == [[1.0, 2.0], [1.0, 0.0], [0.0, 0.0]]
    got5 = df.select(kernels.pad_truncate("v", 5).alias("p")).collect()
    assert [list(r.p) for r in got5] == [
        [1.0, 2.0, 3.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0, 0.0], [0.0] * 5
    ]


def test_samp_kernels(spark, token_events_df, token_events_pdf):
    seqs = _seqs(spark, token_events_df)
    rate = 1.0
    got = seqs.select(
        "doc_id",
        kernels.samp_udf("SAMP_NUM", rate)("times", "tokens").alias("sn"),
        kernels.samp_udf("SAMP_SIZE", rate)("times", "tokens").alias("ss"),
    ).collect()
    ora = _oracle_by_doc(token_events_pdf)
    for r in got:
        t, s = ora[r.doc_id]
        np.testing.assert_allclose(
            np.asarray(r.sn), netml_ref.get_SAMP(t, s, "SAMP_NUM", rate), rtol=0, atol=0
        )
        np.testing.assert_allclose(
            np.asarray(r.ss), netml_ref.get_SAMP(t, s, "SAMP_SIZE", rate), rtol=0, atol=0
        )


def test_samp_fast_path_exact_vs_loop(spark):
    """One Arrow batch mixing fast-path rows (clean off-grid times) with
    forced fallbacks (grid-boundary times, >500-bucket spans, huge-gap
    caps) — every row must equal the verbatim loop exactly."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        n = int(rng.integers(1, 50))
        t = np.sort(rng.uniform(0, 300, n)); t[0] = 0.0
        rows.append((i, t, rng.uniform(1, 1500, n)))
    rows.append((100, np.array([0.0, 1.0, 2.0, 5.0]), np.ones(4)))          # exact grid
    rows.append((101, np.array([0.0, 1000.0, 1001.0, 2000.0]), np.ones(4))) # caps
    rows.append((102, np.arange(0.0, 900.0, 1.5), np.ones(600)))            # >500 buckets
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows],
                        "times": [r[1] for r in rows],
                        "tokens": [r[2] for r in rows]})
    df = spark.createDataFrame(pdf)
    for feat in ("SAMP_NUM", "SAMP_SIZE"):
        got = df.select("doc_id", kernels.samp_udf(feat, 1.0)("times", "tokens").alias("f")).collect()
        byid = {r[0]: (r[1], r[2]) for r in rows}
        for r in got:
            t, s = byid[r.doc_id]
            exp = netml_ref.get_SAMP(t, s, feat, 1.0)
            np.testing.assert_allclose(np.asarray(r.f), exp, rtol=0, atol=0)


def test_samp_500_caps():
    # quirk pin (parser.py:535-542): wide gap zero-fill capped at 500 per
    # gap; whole feature truncated at 500
    t = np.array([0.0, 1000.0, 1001.0, 2000.0])
    s = np.ones(4)
    f = netml_ref.get_SAMP(t, s, "SAMP_NUM", 0.1)
    assert len(f) == 500
    # one emitted bucket then zeros
    assert f[0] == 1 and set(f[1:]) == {0.0}


def test_fft_kernel(spark, token_events_df, token_events_pdf):
    seqs = _seqs(spark, token_events_df)
    got = seqs.select(
        "doc_id", kernels.fft_udf(8)(kernels.iat("times")).alias("f")
    ).collect()
    ora = _oracle_by_doc(token_events_pdf)
    for r in got:
        t, _ = ora[r.doc_id]
        exp = netml_ref.get_FFT(netml_ref.get_IAT(t), 8)
        np.testing.assert_allclose(np.asarray(r.f), exp, rtol=1e-12, atol=1e-12)


def test_header_features(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": ["h"] * 4,
            "source": ["s"] * 4,
            "ts": [0.0, 1.0, 2.0, 3.0],
            "seq": np.arange(4, dtype=np.int32),
            "token": np.int32([10, 20, 30, 40]),
            "proto": np.int32([6, 6, 17, 6]),
            "ttl": np.int32([64, 63, 62, 61]),
            "tcp_flags": ["SA", "A", "", "FA"],
        }
    )
    df = spark.createDataFrame(pdf)
    seqs = events_to_sequences(
        df, ("doc_id",), "ts", "token", ("seq",), ("source",),
        extra_series=("tcp_flags", "proto", "ttl"),
    )
    got = seqs.select(
        kernels.header_features("tcp_flagss", "protos", "ttls").alias("h")
    ).collect()[0].h
    exp = netml_ref.get_header([6, 6, 17, 6], [64, 63, 62, 61], ["SA", "A", "", "FA"])
    np.testing.assert_array_equal(np.asarray(got), exp)
