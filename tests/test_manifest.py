"""Checkpoint manifest: metrics, resume-skip, and idempotent re-run."""

import os

import pandas as pd
from pyspark.sql import functions as F

from netml_spark.manifest import CheckpointManifest, partition_metrics


def test_partition_metrics_order_insensitive(spark):
    a = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]}))
    b = spark.createDataFrame(pd.DataFrame({"x": [3, 1, 2], "y": ["c", "a", "b"]}))
    ma = partition_metrics(a).collect()[0]
    mb = partition_metrics(b).collect()[0]
    assert ma.row_count == 3 and ma.checksum == mb.checksum
    c = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 4], "y": ["a", "b", "c"]}))
    assert partition_metrics(c).collect()[0].checksum != ma.checksum


def test_run_stage_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    m = CheckpointManifest(spark, root)
    calls = []

    def build(p):
        calls.append(p)
        return spark.createDataFrame(pd.DataFrame({"src": [p] * 3, "v": [1, 2, 3]}))

    r1 = m.run_stage("stage1", ["a", "b"], build, "src")
    assert r1 == {"a": ("ok", 3), "b": ("ok", 3)}
    assert sorted(calls) == ["a", "b"]

    # resume: nothing re-runs; a new partition runs
    calls.clear()
    r2 = m.run_stage("stage1", ["a", "b", "c"], build, "src")
    assert r2["a"] == ("skipped", None) and r2["b"] == ("skipped", None)
    assert r2["c"] == ("ok", 3)
    assert calls == ["c"]

    # outputs exist per partition; manifest has 3 ok rows
    assert os.path.exists(os.path.join(root, "stage1", "src=a"))
    man = m.read().filter(F.col("status") == "ok").toPandas()
    assert len(man) == 3 and set(man.partition) == {"a", "b", "c"}
