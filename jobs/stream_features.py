"""spark-submit job: the §2.10 streaming lifecycle, end-to-end.

Completes what the batch jobs (extract_features / learn / classify) do for
the batch path: a runnable readStream -> transform -> writeStream pipeline
over a landing directory of parquet event files — the Spark-first twin of
the reference's prototype live-capture loop
(examples/capture/capture_pkts.py:68-136), which hand-rolls a 600 s flow
timeout and a 1 h max-age eviction around a pcap sniffer.

    spark-submit --driver-memory 48g \
        --py-files dist/netml_spark.zip jobs/stream_features.py \
        --input s3://bucket/landing/events --output s3://bucket/features \
        --checkpoint s3://bucket/stream_ckpt \
        --mode sessions [--gap "600 seconds" --watermark "30 minutes"] \
        [--trigger-interval "30 seconds" | --available-now]

Modes:
  sessions  -> streaming_session_stats: event-time session_window groupBy,
               one STATS row per CLOSED session (append on watermark pass)
  eviction  -> stateful_flow_eviction: applyInPandasWithState flow buffer,
               one row per closed flow with reason in {'max_age','idle'}

Both sinks are exactly-once parquet appends driven by the stream
checkpoint: killing the job and restarting with the same --checkpoint
resumes from the last committed micro-batch (the streaming analogue of
the batch CheckpointManifest). --available-now drains everything currently
in the landing dir then exits — the backfill/catch-up trigger; the default
processing-time trigger runs continuously.

Locally the same file runs under plain ``python`` (it builds its own
session). A pytest drives one availableNow micro-batch cycle end-to-end
(tests/test_streaming.py::test_stream_features_job_e2e).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_query(spark, args):
    """readStream -> transform -> writeStream (not yet started)."""
    from netml_spark.streaming.eviction import stateful_flow_eviction
    from netml_spark.streaming.session_stream import streaming_session_stats

    # file streams need an explicit schema. A continuous job commonly
    # starts BEFORE the first file lands, so --schema (DDL string, e.g.
    # "doc_id string, ts timestamp, token int") takes precedence; without
    # it the schema comes from already-landed files (one footer read, no
    # data scan) — and an empty/missing landing dir is a clear error.
    if getattr(args, "schema", None):
        schema = args.schema
    else:
        try:
            schema = spark.read.parquet(args.input).schema
        except Exception as e:
            raise SystemExit(
                f"no files landed yet under {args.input!r} and no --schema "
                f"given; pass --schema 'col type, ...' to start the stream "
                f"before the first file arrives ({e})"
            )
    entity_cols = tuple(args.entity_cols.split(","))

    stream = spark.readStream.schema(schema)
    if args.max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", args.max_files_per_trigger)
    events = stream.parquet(args.input)

    if args.mode == "sessions":
        out = streaming_session_stats(
            events, entity_cols, args.ts_col, args.token_col,
            gap=args.gap, watermark=args.watermark,
        )
    else:
        out = stateful_flow_eviction(
            events, entity_cols, args.ts_col,
            max_age=args.max_age, idle_timeout=args.idle_timeout,
            watermark=args.watermark,
        )

    writer = (
        out.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
    )
    if args.available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=args.trigger_interval)
    return writer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="landing directory of parquet event files")
    ap.add_argument("--output", required=True, help="parquet sink directory")
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (exactly-once resume)")
    ap.add_argument("--mode", default="sessions",
                    choices=["sessions", "eviction"])
    ap.add_argument("--schema", default=None,
                    help="DDL schema of the event files (lets the stream "
                         "start before the first file lands)")
    ap.add_argument("--entity-cols", default="doc_id")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--token-col", default="token")
    ap.add_argument("--gap", default="600 seconds")
    ap.add_argument("--watermark", default="30 minutes")
    ap.add_argument("--max-age", type=float, default=3600.0)
    ap.add_argument("--idle-timeout", type=float, default=600.0)
    ap.add_argument("--available-now", action="store_true",
                    help="drain currently-landed files then exit (backfill)")
    ap.add_argument("--trigger-interval", default="30 seconds")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-s", type=float, default=None,
                    help="stop after N seconds (smoke runs; default: forever)")
    args = ap.parse_args(argv)

    from netml_spark.session import get_spark

    spark = get_spark("netml-stream-features")
    q = build_query(spark, args).start()
    print(f"streaming {args.mode}: {args.input} -> {args.output} "
          f"(checkpoint {args.checkpoint})")
    if args.timeout_s is not None:
        q.awaitTermination(args.timeout_s)
        q.stop()
        q.awaitTermination()
    else:
        q.awaitTermination()
    progress = q.lastProgress
    if progress:
        print(f"last batch id={progress['batchId']} "
              f"rows/s={progress.get('processedRowsPerSecond', 0):.0f}")
    print("stream stopped")


if __name__ == "__main__":
    main()
