"""Skew tools: salted agg equals plain agg; bounded sessionize contains
exactly the unchunked sessions away from bucket boundaries."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from netml_spark.operators import sessionize
from netml_spark.operators.skew import bounded_sessionize, heavy_hitters, salted_agg


def test_salted_agg_matches_plain(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            # one heavy key (80%) + tail
            "k": np.where(rng.random(20_000) < 0.8, "heavy",
                          rng.integers(0, 50, 20_000).astype(str)),
            "v": np.round(rng.normal(100, 15, 20_000), 4),
        }
    )
    df = spark.createDataFrame(pdf)
    # default sum_type: DECIMAL(18,4) accumulator (v has 4 decimals) must
    # be BIT-IDENTICAL to a one-pass decimal SUM — that is the property
    # the two-stage split must not break
    got = salted_agg(df, ("k",), "v", n_salts=16,
                     sum_type="decimal(18,4)").toPandas().set_index("k").sort_index()
    exp = (
        df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("count_v"),
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("sum_v"),
            (F.sum(F.col("v").cast("decimal(18,4)")).cast("double")
             / F.count(F.lit(1))).alias("mean_v"),
            F.min(F.col("v").cast("double")).alias("min_v"),
            F.max(F.col("v").cast("double")).alias("max_v"),
        )
        .toPandas().set_index("k").sort_index()
    )
    assert (got["count_v"] == exp["count_v"]).all()
    np.testing.assert_array_equal(got["sum_v"], exp["sum_v"])  # exact
    np.testing.assert_array_equal(got["mean_v"], exp["mean_v"])
    np.testing.assert_array_equal(got["min_v"], exp["min_v"])
    np.testing.assert_array_equal(got["max_v"], exp["max_v"])
    # sum_type="double" keeps full float precision (reordered partials ->
    # tolerance, not equality)
    got_d = salted_agg(df, ("k",), "v", n_salts=16,
                       sum_type="double").toPandas().set_index("k").sort_index()
    exp_d = (
        df.groupBy("k").agg(F.sum(F.col("v").cast("double")).alias("sum_v"))
        .toPandas().set_index("k").sort_index()
    )
    np.testing.assert_allclose(got_d["sum_v"], exp_d["sum_v"], rtol=1e-9)


def test_heavy_hitters_detects(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "k": np.where(rng.random(50_000) < 0.6, "big", rng.integers(0, 200, 50_000).astype(str)),
    })
    hh = heavy_hitters(spark.createDataFrame(pdf), ("k",),
                       threshold_rows=10_000, fraction=0.05).toPandas()
    assert "big" in set(hh["k"])
    assert len(hh) <= 3


def test_bounded_sessionize_away_from_boundaries(spark):
    rng = np.random.default_rng(9)
    # sessions well inside buckets: bucket 10_000s, gap 600s, sessions ~100s
    rows = []
    for d in range(30):
        t = d * 100_000.0 + 1000.0
        for s in range(3):
            n = int(rng.integers(2, 10))
            for _ in range(n):
                rows.append(("e%d" % d, t))
                t += float(rng.uniform(0.1, 50))
            t += 700.0  # new session, still far from any 10k boundary? ensure below
    pdf = pd.DataFrame(rows, columns=["ent", "ts"])
    df = spark.createDataFrame(pdf)
    plain = sessionize(df, ("ent",), "ts", 600.0).toPandas()
    chunked = bounded_sessionize(df, ("ent",), "ts", 600.0, 10_000.0).toPandas()
    # same number of distinct sessions per entity when no session straddles
    # a bucket boundary
    p = plain.groupby("ent")["session_id"].nunique()
    c = chunked.groupby("ent")["session_id"].nunique()
    # sessions that straddle a 10k boundary may split; allow only those
    assert (c >= p).all()
    assert (c - p).sum() <= 3  # rare boundary splits at most
