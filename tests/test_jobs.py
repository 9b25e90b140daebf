"""jobs/ lifecycle under pytest: learn -> classify with DISTRIBUTED
scoring (broadcast-model pandas_udf) must reproduce the driver-side
model.predict exactly, and the printed report must match the sink."""

import re

import numpy as np
import pytest

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    import jobs.learn as learn

    p = str(tmp_path_factory.mktemp("model") / "model.pkl")
    learn.main([
        "--inputs", EVENTS, "--feat-type", "STATS", "--model", "pca",
        "--entity-cols", "user_id", "--token-col", "value",
        "--order-cols", "event_id", "--output-model", p,
    ])
    return p


def test_cli_argument_validation_surface(capsys):
    """The reference CLI's argument-validation contract
    (/root/reference/tests/cli_tests/test_learn.py:32-77): a missing
    required argument exits code 2 with an 'arguments are required'
    stderr naming the flag. No Spark session is ever built for a bad
    invocation."""
    import jobs.classify as classify
    import jobs.extract_features as ef
    import jobs.learn as learn

    cases = [
        # extract requires an input (reference: -p/--pcap) and an output
        # (reference: -f/--feature)
        (ef.main, ["--output", "/tmp/x"], r"arguments are required.*--input"),
        (ef.main, ["--input", "/tmp/x"], r"arguments are required.*--output"),
        # train requires a model output (reference: -o/--output/-m/--model)
        (learn.main, ["--inputs", "/tmp/x"],
         r"arguments are required.*-m/--output-model"),
        # classify requires the trained model
        (classify.main, ["--input", "/tmp/x"],
         r"arguments are required.*--model"),
        # dynamic checks transcribed from cli.py:384-404
        # (test_learn.py:191-229: label/input counts must match, both ways)
        (learn.main, ["--inputs", "/tmp/x", "--labels", "/tmp/a", "/tmp/b",
                      "--output-model", "/tmp/m"],
         r"number of files .+ must match"),
        (learn.main, ["--inputs", "/tmp/x", "/tmp/y", "--labels", "/tmp/a",
                      "--output-model", "/tmp/m"],
         r"number of files .+ must match"),
        # test_learn.py:337-357: unlabeled + flag-labeled inputs may not mix
        (learn.main, ["--inputs", "/tmp/x", "--input-normal", "/tmp/n",
                      "--output-model", "/tmp/m"],
         r"may not specify --inputs and --input-normal/--input-abnormal "
         r"without also specifying --labels"),
        # cli.py:384-388: at least one input of any kind is required
        (learn.main, ["--output-model", "/tmp/m"],
         r"at least one of the following arguments are required"),
    ]
    for fn, argv, pattern in cases:
        with pytest.raises(SystemExit) as exc:
            fn(argv)
        assert exc.value.code == 2, (fn.__module__, argv)
        err = capsys.readouterr().err
        assert re.search(pattern, err), (fn.__module__, argv, err)


def test_learn_paired_file_labels(spark, tmp_path, capsys):
    """Per-input label pairing is positional, like the reference's
    zip(pcaps, label_files) (cli.py:434-436, test_learn.py:170-189): the
    same events table read twice, paired with an all-BENIGN and an
    all-attack label table, must yield equal 0/1 label counts."""
    import pandas as pd

    import jobs.learn as learn

    users = pd.read_parquet(EVENTS, columns=["user_id"])["user_id"].unique()
    lab0 = str(tmp_path / "lab0.parquet")
    lab1 = str(tmp_path / "lab1.parquet")
    pd.DataFrame({"user_id": users, "label_raw": "BENIGN"}).to_parquet(lab0)
    pd.DataFrame({"user_id": users, "label_raw": "portscan"}).to_parquet(lab1)
    p = str(tmp_path / "model.pkl")
    learn.main([
        "--inputs", EVENTS, EVENTS, "--labels", lab0, lab1,
        "--feat-type", "STATS", "--model", "pca",
        "--entity-cols", "user_id", "--token-col", "value",
        "--order-cols", "event_id", "--output-model", p,
    ])
    out = capsys.readouterr().out
    m = re.search(r"labels: \{0: (\d+), 1: (\d+)\}", out)
    assert m, out
    assert int(m.group(1)) == int(m.group(2)) > 0


def test_learn_flag_labeled_inputs(spark, tmp_path, capsys):
    """--input-normal/--input-abnormal label whole inputs 0/1 wholesale
    (reference --pcap-normal/--pcap-abnormal, test_learn.py:232-278)."""
    import jobs.learn as learn

    p = str(tmp_path / "model.pkl")
    learn.main([
        "--input-normal", EVENTS, "--input-abnormal", EVENTS,
        "--feat-type", "STATS", "--model", "pca",
        "--entity-cols", "user_id", "--token-col", "value",
        "--order-cols", "event_id", "--output-model", p,
    ])
    out = capsys.readouterr().out
    m = re.search(r"labels: \{0: (\d+), 1: (\d+)\}", out)
    assert m, out
    assert int(m.group(1)) == int(m.group(2)) > 0
    from netml_spark import ndm

    assert hasattr(ndm.Model.load(p), "predict")


def test_classify_distributed_scoring_parity(spark, tmp_path, capsys, model_path):
    import jobs.classify as classify

    out_dir = str(tmp_path / "scored")
    classify.main(["--input", EVENTS, "--model", model_path,
                   "--output", out_dir])
    report = capsys.readouterr().out
    m = re.search(r"# flows=(\d+) anomalies=(\d+)", report)
    assert m, report

    scored = spark.read.parquet(out_dir).toPandas()
    assert int(m.group(1)) == len(scored)
    assert int(m.group(2)) == int(scored.prediction.sum())
    # every anomaly line in the report names a flow the sink scored 1
    n_lines = sum(1 for ln in report.splitlines() if ln.endswith("ANOMALY"))
    assert n_lines == int(scored.prediction.sum())

    # parity: executor-side pandas_udf predictions == driver-side
    # model.predict on the same re-extracted feature matrix
    from netml_spark import ndm
    from netml_spark.pipeline import FeaturePlan

    model = ndm.Model.load(model_path)
    ex = model.history["report"]["extract"]
    plan = FeaturePlan(feat_type=ex["feat_type"],
                       q_interval=float(ex["q_interval"]))
    feats = plan.extract(spark.read.parquet(EVENTS), ("user_id",), "ts",
                         "value", ("event_id",), carry_cols=())
    pdf = feats.select("user_id", "session_id", "subflow_id",
                       "features").toPandas()
    X = np.stack(pdf["features"].map(lambda v: np.asarray(v, np.float64)))
    pdf["expected"] = model.predict(X)
    key = ["user_id", "session_id", "subflow_id"]
    merged = scored.merge(pdf.drop(columns=["features"]), on=key)
    assert len(merged) == len(scored) == len(pdf)
    np.testing.assert_array_equal(merged["prediction"], merged["expected"])


def test_classify_empty_input_zero_report(spark, tmp_path, capsys, model_path):
    import pandas as pd

    import jobs.classify as classify

    empty = str(tmp_path / "empty.parquet")
    spark.createDataFrame(pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="float64"),
        "value": pd.Series([], dtype="float64"),
        "event_id": pd.Series([], dtype="int64"),
    }), schema="user_id long, ts double, value double, event_id long",
    ).write.mode("overwrite").parquet(empty)
    classify.main(["--input", empty, "--model", model_path])
    assert "# flows=0 anomalies=0" in capsys.readouterr().out
