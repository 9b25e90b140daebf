"""End-to-end parity: FeaturePlan vs the oracle's full
pcap2flows -> flows2subflows -> flow2features lifecycle (parser.py:691-834),
including both data-dependent quantile barriers."""

import numpy as np
import pytest

from netml_spark import datagen
from netml_spark.oracle import netml_ref
from netml_spark.pipeline import FeaturePlan


def _oracle_features(token_events_pdf, feat_type, fft=False, q_interval=0.9):
    flows = datagen.oracle_flows(token_events_pdf)
    sess = netml_ref.pcap2flows(flows, flow_pkts_thres=2, timeout=600.0)
    durations = [netml_ref.flow_duration(t) for _, t, _ in sess]
    interval = netml_ref.split_interval(durations, q_interval)
    subs = netml_ref.flows2subflows(sess, interval, flow_pkts_thres=2)
    X = netml_ref.flow2features(subs, feat_type, q_interval, fft=fft)
    # key rows by (doc_id, t0, n) for alignment with the Spark side
    keys = [(fid, round(float(t[0]), 9), len(t)) for fid, t, _ in subs]
    return dict(zip(keys, X)), interval


def _spark_features(spark, token_events_df, feat_type, fft=False):
    plan = FeaturePlan(feat_type=feat_type, fft=fft, q_interval=0.9)
    out = plan.extract(token_events_df, ("doc_id",), "ts", "token", ("seq",))
    rows = out.select("doc_id", "times", "features").collect()
    got = {
        (r.doc_id, round(float(r.times[0]), 9), len(r.times)): np.asarray(r.features)
        for r in rows
    }
    return got, plan


def test_featureplan_on_timestamp_input(spark):
    """Regression: subflows_interval must treat datetime64 as epoch SECONDS
    (it initially converted to float nanoseconds, breaking every gap test
    on real TIMESTAMP_NTZ parquet)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev2 = ev.select(
        F.col("user_id").cast("string").alias("doc_id"),
        "ts",
        F.col("event_id").alias("seq"),
        (F.col("value") * 100).cast("int").alias("token"),
    )
    plan = FeaturePlan(feat_type="STATS")
    out = plan.extract(ev2, ("doc_id",), "ts", "token", ("seq",), carry_cols=()).toPandas()
    assert len(out) > 0
    assert set(out["features"].map(len)) == {12}
    # sane interval: seconds-scale, not nanoseconds
    assert 1.0 < plan.split_interval < 1e6


@pytest.mark.parametrize(
    "feat_type,fft",
    [
        ("IAT", False),
        ("SIZE", False),
        ("IAT_SIZE", False),
        ("STATS", False),
        ("SAMP_NUM", False),
        ("SAMP_SIZE", False),
        ("IAT", True),  # FFT-IAT
    ],
)
def test_featureplan_parity(spark, token_events_df, token_events_pdf, feat_type, fft):
    ora, interval = _oracle_features(token_events_pdf, feat_type, fft=fft)
    got, plan = _spark_features(spark, token_events_df, feat_type, fft=fft)
    assert abs(plan.split_interval - interval) < 1e-9, "split interval mismatch"
    assert set(got.keys()) == set(ora.keys())
    dims = {len(v) for v in got.values()}
    assert dims == {len(next(iter(ora.values())))}, "fixed output dim"
    for k in ora:
        np.testing.assert_allclose(got[k], ora[k], rtol=1e-9, atol=1e-9, err_msg=str(k))


def test_featureplan_empty_input_is_a_value(spark, token_events_df):
    """r3-verdict item 6: zero input rows (or none surviving the
    session/subflow thresholds) yield an EMPTY, correctly-schemaed frame —
    not a ValueError from the two-pass quantile. Placeholder scalars flow
    through the plan (flagged by plan.empty_input); every caller composes
    without a catch (jobs/classify.py's was removed)."""
    from pyspark.sql import functions as F

    empty = token_events_df.filter(F.col("doc_id") == "__no_such_doc__")
    for feat_type in ("IAT", "STATS", "SAMP_NUM"):
        plan = FeaturePlan(feat_type=feat_type)
        out = plan.extract(empty, ("doc_id",), "ts", "token", ("seq",))
        assert out.columns == [
            "doc_id", "session_id", "subflow_id", "source",
            "n_tok", "tokens", "times", "features",
        ]
        assert dict(out.dtypes)["features"] == "array<double>"
        assert out.count() == 0
        assert plan.empty_input

    # a plan over real input keeps the flag off
    plan = FeaturePlan(feat_type="IAT")
    out = plan.extract(token_events_df, ("doc_id",), "ts", "token", ("seq",))
    assert not plan.empty_input and out.count() > 0


def test_featureplan_release_unpersists_cache(spark, token_events_df):
    """r4 verdict item 5: extract()'s stage-4 sequences cache is released
    by plan.release(); a repeated extract() on the same plan releases the
    previous cache automatically — no accumulation across extracts."""

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    spark.catalog.clearCache()
    base = n_cached()
    plan = FeaturePlan(feat_type="IAT")
    out = plan.extract(token_events_df, ("doc_id",), "ts", "token", ("seq",))
    assert out.count() > 0
    assert n_cached() == base + 1
    # re-extract on the same plan: previous cache released first
    out2 = plan.extract(token_events_df, ("doc_id",), "ts", "token", ("seq",))
    assert out2.count() > 0
    assert n_cached() == base + 1
    plan.release()
    assert n_cached() == base
    plan.release()  # idempotent


def test_empty_input_error_is_distinct(spark):
    """ADVICE r4: only the empty-input case is caught by FeaturePlan —
    a genuinely bad argument (here: an aggregate of a missing column)
    must NOT be swallowed as empty input."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    from netml_spark.operators.quantile import EmptyInputError, exact_quantile

    df = spark.range(0).selectExpr("cast(id as double) as duration")
    with pytest.raises(EmptyInputError):
        exact_quantile(df, "duration", 0.9)
    with pytest.raises(AnalysisException):
        exact_quantile(df, "no_such_column", 0.9)
