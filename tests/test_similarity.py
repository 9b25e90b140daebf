"""ANN search: brute-force exactness (vs numpy) and IVF recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from netml_spark.operators.similarity import brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_topk(corpus_pdf, queries_pdf, k):
    C = np.stack(corpus_pdf["embedding"].map(np.asarray))
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    out = {}
    for qid, qv in zip(queries_pdf["vec_id"], queries_pdf["embedding"]):
        q = np.asarray(qv, dtype=np.float64)
        sims = Cn @ (q / np.linalg.norm(q))
        # tie-break by vec_id ascending, sort by -cosine
        order = np.lexsort((corpus_pdf["vec_id"].to_numpy(), -np.round(sims, 12)))
        out[qid] = [int(corpus_pdf["vec_id"].iloc[i]) for i in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    got = brute_force_topk(emb, queries, k=5, query_id_col="query_id").toPandas()
    corpus_pdf = emb.select("vec_id", "embedding").toPandas()
    queries_pdf = corpus_pdf[corpus_pdf.vec_id < 5]
    exp = _numpy_topk(corpus_pdf, queries_pdf, 5)
    for qid, g in got.groupby("query_id"):
        ids = g.sort_values("rank")["vec_id"].tolist()
        assert ids == exp[qid], f"query {qid}"


def test_ivf_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(emb, queries, k=5, query_id_col="query_id").toPandas()
    approx = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3,
                      query_id_col="query_id").toPandas()
    # recall@5 over 20 queries
    hits = tot = 0
    for qid in range(20):
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.6, f"IVF recall too low: {hits}/{tot}"
