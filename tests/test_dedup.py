"""Dedup suite: exact, jaccard-join, minhash-LSH, simhash, embedding LSH —
over the driver documents/embeddings tables plus planted duplicates."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from netml_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # plant exact + near duplicates with known ids
    base = docs.filter(F.col("doc_id") < 5).collect()
    extra = []
    for r in base:
        extra.append((10_000 + r.doc_id, r.text))                       # exact dup
        extra.append((20_000 + r.doc_id, r.text + " extra tail words")) # near dup
    extra_df = spark.createDataFrame(pd.DataFrame(extra, columns=["doc_id", "text"]))
    return docs.unionByName(extra_df)


def test_short_docs_yield_empty_shingles(spark):
    """Docs with < n words must produce an EMPTY shingle array, not an
    ANSI slice error (sequence(1, k<=0) steps downward)."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4],
                      "text": ["one", "two words", "", "a b c d"]})
    )
    out = df.select("doc_id", dedup.word_shingles("text", 3).alias("sh")).toPandas()
    sizes = dict(zip(out.doc_id, out.sh.map(len)))
    assert sizes[1] == 0 and sizes[2] == 0 and sizes[3] == 0 and sizes[4] == 2
    # and the pair join runs end-to-end over a corpus containing short docs
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.1, n=3).toPandas()
    assert set(zip(pairs.id_a, pairs.id_b)) == set()


def test_exact_dedup(spark, docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups).toPandas()
    dup_groups = out[out.n_dups > 1]
    assert len(dup_groups) >= 5  # the 5 planted exact dups
    assert (dup_groups.winner_id < 10_000).all()  # min id wins


def test_ngram_jaccard_pairs(spark, docs_with_dups):
    pairs = dedup.ngram_jaccard_pairs(
        docs_with_dups, threshold=0.5, n=3
    ).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    for d in range(5):
        assert (d, 10_000 + d) in got  # exact dup -> jaccard 1.0
        assert (d, 20_000 + d) in got  # near dup above threshold
    ones = pairs[(pairs.id_b - pairs.id_a == 10_000) & (pairs.id_a < 5)]
    assert (ones.jaccard == 1.0).all()


def test_minhash_lsh_finds_planted_dups(spark, docs_with_dups):
    sigs = dedup.minhash_signatures(docs_with_dups, n_hashes=64)
    pairs = dedup.minhash_lsh_pairs(sigs, bands=16, threshold=0.5).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    for d in range(5):
        assert (d, 10_000 + d) in got
    exact = pairs[(pairs.id_b - pairs.id_a == 10_000) & (pairs.id_a < 5)]
    assert (exact.est_jaccard == 1.0).all()


def test_minhash_estimates_track_true_jaccard(spark, docs_with_dups):
    sigs = dedup.minhash_signatures(docs_with_dups, n_hashes=64)
    est = dedup.minhash_lsh_pairs(sigs, bands=16, threshold=0.3).toPandas()
    true = dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.0).toPandas()
    merged = est.merge(true, on=["id_a", "id_b"])
    assert len(merged) >= 5
    err = (merged.est_jaccard - merged.jaccard).abs()
    assert err.mean() < 0.2  # 64 hashes -> ~1/8 std error


def test_dedup_clusters(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    )
    out = dedup.dedup_clusters(pairs).toPandas().set_index("id")["cluster_id"]
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10


def test_simhash_near_dups(spark, docs_with_dups):
    sigs = dedup.simhash_signatures(docs_with_dups)
    # exact dups -> identical simhash (hamming 0)
    pairs = dedup.simhash_pairs(sigs, max_hamming=3).toPandas()
    got = {(a, b): h for a, b, h in zip(pairs.id_a, pairs.id_b, pairs.hamming)}
    for d in range(5):
        assert got.get((d, 10_000 + d)) == 0


def test_embedding_neardup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # plant: duplicate vec 0 with tiny noise as id 9001
    v0 = np.asarray(emb.filter(F.col("vec_id") == 0).first()["embedding"], dtype=np.float32)
    noisy = (v0 + np.float32(1e-4)).tolist()
    extra = spark.createDataFrame(
        pd.DataFrame({"vec_id": [9001], "embedding": [noisy], "label": [0]})
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    both = emb.unionByName(extra)
    pairs = dedup.embedding_neardup_pairs(both, threshold=0.99).toPandas()
    assert (0, 9001) in set(zip(pairs.id_a, pairs.id_b))


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _sig_carrying_exchanges(df) -> list:
    import re

    bad = []
    for block in _plan(df).split("\n\n"):
        if re.match(r"\(\d+\) (Broadcast)?Exchange", block) and "sig#" in block:
            bad.append(block.splitlines()[0].strip())
    return bad


def test_minhash_bucketed_sigs_parity_and_no_sig_exchange(spark, docs_with_dups):
    """r3-verdict item 3: with signatures materialized as an id-bucketed
    table, minhash_lsh_pairs returns the SAME pairs, and NO exchange in
    the plan carries the signature array — the band candidate shuffle is
    narrow (ids only) and both id-keyed rejoins read the table's
    persistent bucketed partitioning instead of re-hashing the sig side."""
    sigs = dedup.minhash_signatures(docs_with_dups, n_hashes=64)
    base = (
        dedup.minhash_lsh_pairs(sigs, bands=16, threshold=0.5, cache_sigs=False)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    bsigs = dedup.materialize_signatures(sigs, "minhash_sigs_t", n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = dedup.minhash_lsh_pairs(bsigs, bands=16, threshold=0.5,
                                        cache_sigs=False)
        assert _sig_carrying_exchanges(pairs) == []
        got = pairs.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(10 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS minhash_sigs_t")
    pd.testing.assert_frame_equal(got, base)
    assert len(base) > 0


def test_minhash_unpersist_handle_releases_cache(spark, docs_with_dups):
    """cache_sigs=True persists the signature frame for the lifetime of
    the session (documented); the unpersist_handle gives callers the
    persisted frame so they can release it after consuming the pairs."""
    sigs = dedup.minhash_signatures(docs_with_dups, n_hashes=64)
    handle = []
    pairs = dedup.minhash_lsh_pairs(sigs, bands=16, unpersist_handle=handle)
    assert pairs.count() > 0
    assert len(handle) == 1 and handle[0].is_cached
    handle[0].unpersist(blocking=True)
    assert not handle[0].is_cached
