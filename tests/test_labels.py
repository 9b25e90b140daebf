"""Label join parity vs oracle (reference parser.py:858-924): last-wins
dedupe, BENIGN/NORMAL binarization, inner semantics + anti diagnostic."""

import pandas as pd

from netml_spark import datagen
from netml_spark.operators.labels import label_join, normalize_labels
from netml_spark.oracle import netml_ref


def test_label_join_matches_oracle(spark, token_events_pdf):
    doc_ids = sorted(token_events_pdf["doc_id"].unique())
    labels_pdf = datagen.gen_labels(doc_ids, seed=42)
    flows = spark.createDataFrame(pd.DataFrame({"doc_id": doc_ids}))
    labels = spark.createDataFrame(labels_pdf)

    got = label_join(flows, labels, ("doc_id",)).toPandas()
    got = got.set_index("doc_id")["label"].sort_index()

    kept_idx, exp_labels = netml_ref.label_flows(
        doc_ids, list(labels_pdf.itertuples(index=False, name=None))
    )
    exp = pd.Series(
        exp_labels, index=[doc_ids[i] for i in kept_idx], name="label"
    ).sort_index()
    assert list(got.index) == list(exp.index)
    assert got.astype(int).tolist() == exp.astype(int).tolist()


def test_label_last_wins(spark):
    labels = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["x", "x"], "label_raw": ["BENIGN", "DDoS"]})
    )
    out = normalize_labels(labels, ("doc_id",)).toPandas()
    assert len(out) == 1 and out["label"].iloc[0] == 1  # last row (DDoS) wins

    labels2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["x", "x"], "label_raw": ["DDoS", "normal"]})
    )
    out2 = normalize_labels(labels2, ("doc_id",)).toPandas()
    assert out2["label"].iloc[0] == 0  # case-insensitive normal


def test_label_anti_diagnostic(spark):
    flows = spark.createDataFrame(pd.DataFrame({"doc_id": ["a", "b", "c"]}))
    labels = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "zz"], "label_raw": ["BENIGN", "Bot"]})
    )
    inner = label_join(flows, labels, ("doc_id",)).toPandas()
    anti = label_join(flows, labels, ("doc_id",), anti=True).toPandas()
    assert sorted(inner["doc_id"]) == ["a"]
    assert sorted(anti["doc_id"]) == ["b", "c"]
