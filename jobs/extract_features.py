"""spark-submit job: tokenized events -> netml feature vectors.

Usage (cluster):
    python tools/package.py   # builds dist/netml_spark.zip
    spark-submit --driver-memory 48g \
        --py-files dist/netml_spark.zip jobs/extract_features.py \
        --input s3://bucket/token_events --output s3://bucket/features \
        --feat-type IAT --q-interval 0.9 --entity-cols doc_id \
        --checkpoint s3://bucket/ckpt --partition-col source

NOTE: under spark-submit the JVM starts before session.py's conf applies,
so spark.driver.memory MUST be passed on the command line (local mode
shares one heap across all task threads; the 1g default OOMs).

Locally the same file runs under plain ``python`` (it builds its own
session). With --checkpoint, extraction runs per partition value through
the CheckpointManifest, so a killed backfill resumes idempotently.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--feat-type", default="IAT",
                    choices=["IAT", "SIZE", "IAT_SIZE", "STATS", "SAMP_NUM",
                             "SAMP_SIZE"])
    ap.add_argument("--fft", action="store_true")
    ap.add_argument("--header", action="store_true")
    ap.add_argument("--q-interval", type=float, default=0.9)
    ap.add_argument("--interval", type=float, default=0.0)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--entity-cols", default="doc_id")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--token-col", default="token")
    ap.add_argument("--order-cols", default="seq")
    ap.add_argument("--checkpoint", default=None,
                    help="manifest root for idempotent per-partition resume")
    ap.add_argument("--partition-col", default="source")
    ap.add_argument("--approx-quantiles", action="store_true",
                    help="percentile_approx for the two-pass scalars (bench path)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from netml_spark.pipeline import FeaturePlan
    from netml_spark.session import get_spark

    spark = get_spark("netml-extract-features")
    events = spark.read.parquet(args.input)
    entity_cols = tuple(args.entity_cols.split(","))
    order_cols = tuple(c for c in args.order_cols.split(",") if c)

    def extract(df):
        plan = FeaturePlan(
            feat_type=args.feat_type, fft=args.fft, header=args.header,
            q_interval=args.q_interval, interval=args.interval,
            timeout=args.timeout, approx_quantiles=args.approx_quantiles,
        )
        carry = (args.partition_col,) if args.partition_col in df.columns else ()
        return plan.extract(
            df, entity_cols, args.ts_col, args.token_col, order_cols,
            carry_cols=carry,
        )

    if args.checkpoint:
        from netml_spark.manifest import CheckpointManifest

        parts = [
            r[0] for r in events.select(args.partition_col).distinct().collect()
        ]
        man = CheckpointManifest(spark, args.checkpoint)
        results = man.run_stage(
            f"features_{args.feat_type}", sorted(parts),
            lambda p: extract(events.filter(F.col(args.partition_col) == p)),
            args.partition_col,
        )
        done = sum(1 for v in results.values() if v[0] == "ok")
        skipped = sum(1 for v in results.values() if v[0] == "skipped")
        errors = {p: v[1] for p, v in results.items() if v[0] == "error"}
        print(f"partitions done={done} skipped={skipped} errors={len(errors)} "
              f"-> {args.checkpoint}")
        for p, msg in errors.items():
            print(f"  error partition={p}: {msg.splitlines()[0][:160]}")
    else:
        out = extract(events)
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
