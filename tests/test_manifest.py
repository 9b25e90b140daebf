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


def test_run_stage_input_fingerprint_recompute(spark, tmp_path):
    """A checkpointed partition whose input fingerprint changed is
    recomputed, not silently skipped (stale-resume guard)."""
    root = str(tmp_path / "ckpt_fp")
    m = CheckpointManifest(spark, root)
    calls = []

    def build(p):
        calls.append(p)
        return spark.createDataFrame(pd.DataFrame({"src": [p] * 2, "v": [1, 2]}))

    fps = {"a": "v1", "b": "v1"}
    m.run_stage("s", ["a", "b"], build, "src", input_fp=lambda p: fps[p])
    assert sorted(calls) == ["a", "b"]

    calls.clear()
    fps["b"] = "v2"  # b's input changed
    r = m.run_stage("s", ["a", "b"], build, "src", input_fp=lambda p: fps[p])
    assert r["a"] == ("skipped", None)
    assert r["b"] == ("ok", 2)
    assert calls == ["b"]

    calls.clear()  # and the new fp is now checkpointed
    r = m.run_stage("s", ["a", "b"], build, "src", input_fp=lambda p: fps[p])
    assert calls == [] and all(v[0] == "skipped" for v in r.values())


def test_run_stage_error_isolation_and_retry(spark, tmp_path):
    """A failing partition is recorded as 'error' (not resumable-ok) and
    does NOT kill the backfill; the next run retries only it."""
    m = CheckpointManifest(spark, str(tmp_path / "ckpt_err"))
    fail = {"b": True}

    def build(p):
        if p == "b" and fail["b"]:
            raise ValueError("boom")
        return spark.createDataFrame(pd.DataFrame({"src": [p], "v": [1]}))

    r1 = m.run_stage("s", ["a", "b", "c"], build, "src")
    assert r1["a"] == ("ok", 1) and r1["c"] == ("ok", 1)
    assert r1["b"][0] == "error" and "boom" in r1["b"][1]

    fail["b"] = False
    r2 = m.run_stage("s", ["a", "b", "c"], build, "src")
    assert r2["a"] == ("skipped", None) and r2["c"] == ("skipped", None)
    assert r2["b"] == ("ok", 1)


def test_iceberg_detection_degrades_to_parquet(spark, tmp_path):
    """No Iceberg jar in the sandbox -> detection is False and the
    manifest writes parquet dirs (the writeTo hook engages only when a
    runtime jar + catalog are present)."""
    from netml_spark.manifest import iceberg_available

    assert iceberg_available(spark) is False
    m = CheckpointManifest(spark, str(tmp_path / "ice"))
    assert m.iceberg is False
    m.run_stage("s", ["a"], lambda p: spark.createDataFrame(
        pd.DataFrame({"src": [p], "v": [1]})), "src")
    assert os.path.exists(str(tmp_path / "ice" / "s" / "src=a"))


def test_run_stage_parallel(spark, tmp_path):
    """max_parallel > 1 computes every partition exactly once."""
    root = str(tmp_path / "ckpt_par")
    m = CheckpointManifest(spark, root)

    def build(p):
        return spark.createDataFrame(pd.DataFrame({"src": [p] * 3, "v": [1, 2, 3]}))

    parts = [f"p{i}" for i in range(6)]
    r = m.run_stage("par", parts, build, "src", max_parallel=4)
    assert all(r[p] == ("ok", 3) for p in parts)
    man = m.read().filter(F.col("status") == "ok").toPandas()
    assert sorted(man.partition) == sorted(parts)
