"""Stateful flow tracking with max-age + idle eviction (SURVEY.md §2.10).

Twin of the reference's live-capture buffer management
(examples/capture/capture_pkts.py:100-126): the capture loop keeps one
open flow per key and
  - closes a flow whose age (last - start) exceeds 1 hour
    (capture_pkts.py:121-125: "check flow_buffer and try to reduce its
    size" — the max-age eviction), and
  - restarts a flow whose inter-packet gap exceeds the 600 s TIMEOUT
    (capture_pkts.py:113-118).

Here the open-flow buffer is Spark-managed state in
``applyInPandasWithState`` (event-time timeout): idle flows are evicted by
the watermark clock instead of a hand-rolled scan, and the operator scales
to any key cardinality because state is partitioned by the entity key —
per-key state is O(1) (count, start, last), never the packets.

Output: one row per CLOSED flow (entity..., n_pkts, start_ts, last_ts,
reason in {'max_age', 'idle'}). Still-open flows stay in state.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)


def stateful_flow_eviction(
    events: DataFrame,
    entity_cols: Sequence[str] = ("doc_id",),
    ts_col: str = "ts",
    max_age: float = 3600.0,
    idle_timeout: float = 600.0,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming stateful eviction. ``events`` must be a streaming
    DataFrame; per-entity state is (n_pkts, start, last) in epoch seconds.

    A flow closes with reason 'max_age' as soon as a batch pushes its age
    past ``max_age`` (capture_pkts.py:123: pre_pkt_time - pkt_start_time
    > 1 h), or with reason 'idle' when the event-time watermark passes
    last + ``idle_timeout`` (the capture loop's 600 s TIMEOUT restart,
    capture_pkts.py:113)."""
    entity_cols = list(entity_cols)
    ts = F.col(ts_col)
    if dict(events.dtypes)[ts_col] in ("double", "bigint", "float", "int"):
        events = events.withColumn("_event_time", F.timestamp_seconds(ts))
    else:
        events = events.withColumn("_event_time", ts.cast("timestamp"))
    events = events.withColumn(
        "_evt_sec", F.col("_event_time").cast("double")
    ).withWatermark("_event_time", watermark)

    ent_fields = [events.schema[c] for c in entity_cols]
    out_schema = StructType(
        list(ent_fields)
        + [
            StructField("n_pkts", LongType()),
            StructField("start_ts", DoubleType()),
            StructField("last_ts", DoubleType()),
            StructField("reason", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("start", DoubleType()),
            StructField("last", DoubleType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]
    max_age_s = float(max_age)
    idle_ms = int(float(idle_timeout) * 1000)

    def track(key, pdfs, state):
        rows = []
        if state.hasTimedOut:
            n, start, last = state.get
            rows.append((*key, int(n), float(start), float(last), "idle"))
            state.remove()
        else:
            n, start, last = state.get if state.exists else (0, None, None)
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                t = pdf["_evt_sec"]
                n += len(pdf)
                tmin, tmax = float(t.min()), float(t.max())
                start = tmin if start is None else min(start, tmin)
                last = tmax if last is None else max(last, tmax)
            if n > 0 and last - start > max_age_s:
                rows.append((*key, int(n), float(start), float(last), "max_age"))
                state.remove()
            elif n > 0:
                state.update((int(n), float(start), float(last)))
                # idle eviction rides the watermark clock; the timeout
                # timestamp must sit above the current watermark
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(int(last * 1000) + idle_ms, wm + 1)
                )
        yield pd.DataFrame(rows, columns=cols)

    return (
        events.groupBy(*entity_cols)
        .applyInPandasWithState(
            track, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )
