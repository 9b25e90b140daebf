"""Text-analysis ops over the driver documents table."""

import pandas as pd
from pyspark.sql import functions as F

from netml_spark.operators import text

SF = "/root/testdata/sf0.001"


def test_text_quality(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = text.text_quality(docs).toPandas()
    assert (out.q_n_chars == out.n_chars).all()  # matches the table's own count
    assert ((out.q_punct_ratio >= 0) & (out.q_punct_ratio <= 1)).all()
    assert ((out.q_stopword_ratio >= 0) & (out.q_stopword_ratio <= 1)).all()


def test_lang_id_markers(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat sat on the mat and the dog is in that house",
                "el perro y la casa de los gatos en una calle",
                "der hund und die katze das ist von ein haus nicht",
                "xyzzy plugh qwerty",
            ],
        }
    )
    out = text.lang_id(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "es"
    assert out.loc[3, "lang_pred"] == "de"
    assert out.loc[4, "lang_pred"] == "und"


def test_token_counts(spark):
    pdf = pd.DataFrame({"doc_id": [1], "text": ["Hello, world! abc123 x-y"]})
    out = text.token_counts(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert out.tok_ws == 4
    # BPE-ish: Hello , world ! abc 123 x - y  -> 9
    assert out.tok_bpe == 9


def test_fingerprint_deterministic_and_distinct(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c", "a b c", "a b d"]}
    )
    out = text.fingerprint(spark.createDataFrame(pdf)).toPandas()
    assert out.fp[0] == out.fp[1]
    assert out.fp[0] != out.fp[2]
    # pure function of normalized words: case/whitespace-insensitive
    pdf2 = pd.DataFrame({"doc_id": [1], "text": ["A  B   c"]})
    out2 = text.fingerprint(spark.createDataFrame(pdf2)).toPandas()
    assert out2.fp[0] == out.fp[0]
