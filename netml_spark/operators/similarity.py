"""Approximate-nearest-neighbor search over an embedding column
(graft-added surface).

- ``brute_force_topk``: exact cosine top-k of every query against the
  corpus. Queries are broadcast (they're the small side); the corpus
  streams through one projection + per-query window top-k. This is the
  correctness baseline and the right plan whenever |queries| is small.
- ``ivf_topk``: the scale path — k-means-style inverted-file (IVF)
  partitioning: corpus vectors are assigned to their nearest centroid
  (centroids sampled deterministically from the corpus, one Arrow-batched
  matmul per batch), queries probe only the ``n_probe`` nearest cells, so
  the candidate set shrinks by ~n_cells/n_probe before exact re-ranking.

Scale notes: at 10^12 rows the IVF cell id becomes the partition/cluster
key (write the corpus bucketed by cell); probing touches only matching
buckets — the join key is (cell), never a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from netml_spark.operators.dedup import cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank<=k), exact. Broadcast the queries."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", cosine_expr(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _centroids_from_sample(corpus_pdf: np.ndarray, n_cells: int, seed: int = 42,
                           iters: int = 5) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (centroid count is
    tiny; the sample is a few thousand rows — this is the standard IVF
    training step, not a data-scale operation)."""
    rng = np.random.default_rng(seed)
    X = corpus_pdf / np.maximum(np.linalg.norm(corpus_pdf, axis=1, keepdims=True), 1e-12)
    C = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        for j in range(n_cells):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """IVF-partitioned ANN: assign corpus to nearest centroid cell (Arrow
    matmul), probe the n_probe nearest cells per query, exact re-rank
    within candidates."""
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64)
         for r in corpus.select(vec_col).limit(sample_size).collect()]
    )
    C = _centroids_from_sample(sample, n_cells, seed)

    @pandas_udf("int")
    def _cell(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def _probe_cells(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ C.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"),
        _cell(vec_col).alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(_probe_cells(vec_col)).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").withColumn(
        "cosine", cosine_expr(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
