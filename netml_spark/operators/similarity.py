"""Approximate-nearest-neighbor search over an embedding column
(graft-added surface).

- ``brute_force_topk``: exact cosine top-k of every query against the
  corpus. Queries are broadcast (they're the small side); the corpus
  streams through one projection + per-query window top-k. This is the
  correctness baseline and the right plan whenever |queries| is small.
- ``ivf_topk``: the scale path — inverted-file (IVF) partitioning: corpus
  vectors are assigned to their nearest centroid cell, queries probe only
  the ``n_probe`` nearest cells, so the candidate set shrinks by
  ~n_cells/n_probe before exact re-ranking. Cell assignment and probing
  are NATIVE sequential-fold dot products against literal centroids —
  fully codegen, no plan-time driver action, and bit-reproducible in the
  DuckDB oracle (same left-fold order as list_reduce).
- Centroids: ``ivf_random_centroids`` (seeded, data-independent — the
  oracle-checkable default) or ``ivf_train_centroids`` (mini k-means on a
  deterministic hash-ordered corpus sample — unbiased, unlike a
  limit().collect() of the first partitions; better cells, data-dependent).

Scale notes: at 10^12 rows the IVF cell id becomes the partition/cluster
key (write the corpus bucketed by cell); probing touches only matching
buckets — the join key is (cell), never a cross join. n_cells should scale
~sqrt(corpus_rows); the defaults here are sized for the test corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netml_spark.operators.dedup import cosine_expr, dot_literal


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


def ivf_random_centroids(n_cells: int, dim: int, seed: int = 42) -> np.ndarray:
    """Seeded Gaussian unit centroids — data-independent, so the DuckDB
    oracle can embed the identical literals. Random unit directions are
    the standard cheap IVF bootstrap when training is not worth a pass."""
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(n_cells, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    iters: int = 5,
) -> np.ndarray:
    """Mini k-means on a deterministic hash-ordered sample of the corpus.

    The sample is the ``sample_size`` rows with smallest
    xxhash64(vector-as-string) — a uniform pseudo-random subset computed
    with a per-partition top-n (TakeOrdered; no full sort, no bias toward
    the first partitions like round 1's limit().collect())."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("string")))
        .limit(int(sample_size))
        .collect()
    )
    X = np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
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


def _cell_dots(vec_col, centroids: np.ndarray):
    """Array of sequential-fold dots of the (double-cast) vector against
    every centroid. Argmax over these is scale-invariant in the vector
    norm, so no row normalization is needed for assignment."""
    vd = F.transform(F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                     lambda x: x.cast("double"))
    return F.array(*[dot_literal(vd, c) for c in centroids])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF-partitioned ANN: assign corpus to nearest centroid cell (first
    argmax wins ties), probe the n_probe nearest cells per query
    (dot-descending, cell-id tie-break), exact cosine re-rank within the
    candidates. Pass trained ``centroids`` (ivf_train_centroids) for
    data-adapted cells; the default is seeded random unit centroids."""
    if centroids is None:
        centroids = ivf_random_centroids(n_cells, dim, seed)
    n_cells = len(centroids)
    n_probe = min(n_probe, n_cells)

    dots = _cell_dots(vec_col, centroids)
    # argmax = 1-based position of the first occurrence of the max
    cell = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"),
        cell.alias("cell"),
    )

    # probe cells: sort (−dot, cell) structs lexicographically, take n_probe
    probe_structs = F.array(*[
        F.struct((-F.element_at(dots, i + 1)).alias("nd"), F.lit(i).alias("c"))
        for i in range(n_cells)
    ])
    probe = F.transform(F.slice(F.array_sort(probe_structs), 1, n_probe),
                        lambda x: x["c"].cast("int"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(probe).alias("cell"),
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
