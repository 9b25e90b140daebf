"""Streaming session twin: micro-batch stream result == batch result ==
the engine's clean batch sessionizer aggregates."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from netml_spark.streaming.session_stream import streaming_session_stats


@pytest.fixture()
def event_pdf():
    rng = np.random.default_rng(3)
    rows = []
    for d in range(20):
        t = 1_700_000_000.0 + d
        for s in range(rng.integers(1, 4)):
            n = int(rng.integers(2, 30))
            for i in range(n):
                rows.append((f"d{d}", t, int(rng.integers(40, 1500))))
                t += float(rng.uniform(0.01, 30.0))
            t += 700.0  # force a session close (> 600s gap)
    return pd.DataFrame(rows, columns=["doc_id", "ts", "token"])


def test_stream_matches_batch(spark, tmp_path, event_pdf):
    batch_df = spark.createDataFrame(event_pdf)
    batch_out = streaming_session_stats(batch_df).toPandas()

    # feed the same rows through a real micro-batch stream (file source)
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(event_pdf).coalesce(4).write.mode("overwrite").parquet(src)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(src)
    out = streaming_session_stats(stream_df)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = spark.sql("select * from sess_stream").toPandas()

    key = ["doc_id", "session_start"]
    b = batch_out.sort_values(key).reset_index(drop=True)
    s = stream_out.sort_values(key).reset_index(drop=True)
    # watermark: with availableNow + append, only sessions older than the
    # watermark emit; compare the emitted subset
    assert len(s) > 0
    merged = s.merge(b, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(s), "stream emitted a session batch doesn't have"
    for c in ["num_pkts", "num_bytes", "duration"]:
        np.testing.assert_allclose(merged[f"{c}_s"], merged[f"{c}_b"])
