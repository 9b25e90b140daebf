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


def test_stream_features_job_e2e(spark, tmp_path, event_pdf):
    """jobs/stream_features.py wires the §2.10 surface into a runnable
    file-source -> parquet-sink job (the streaming analogue of
    extract_features): drive one availableNow micro-batch cycle and check
    the emitted sessions against the batch twin, then re-run with the same
    checkpoint and verify exactly-once (no duplicate appends)."""
    import jobs.stream_features as sf

    src = str(tmp_path / "landing")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "stream_ckpt")
    spark.createDataFrame(event_pdf).coalesce(4).write.mode("overwrite").parquet(src)

    # drive through build_query against the shared test session (main()
    # would build its own 32-thread session; the arg surface is the same)
    import argparse

    ns = argparse.Namespace(
        input=src, output=out, checkpoint=ckpt, mode="sessions",
        entity_cols="doc_id", ts_col="ts", token_col="token",
        gap="600 seconds", watermark="30 minutes", max_age=3600.0,
        idle_timeout=600.0, available_now=True,
        trigger_interval="30 seconds", max_files_per_trigger=2,
        timeout_s=None,
    )
    q = sf.build_query(spark, ns).start()
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()

    batch = streaming_session_stats(spark.createDataFrame(event_pdf)).toPandas()
    key = ["doc_id", "session_start"]
    assert len(got) > 0
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got), "sink row the batch twin doesn't have"
    for c in ["num_pkts", "num_bytes", "duration"]:
        np.testing.assert_allclose(merged[f"{c}_s"], merged[f"{c}_b"])

    # exactly-once resume: a second run over the SAME checkpoint sees no
    # new files and appends nothing
    q2 = sf.build_query(spark, ns).start()
    q2.awaitTermination(120)
    again = spark.read.parquet(out).toPandas()
    assert len(again) == len(got)


def test_stream_features_job_streamed_start_e2e(spark, tmp_path, event_pdf):
    """r4 verdict item 8: the continuous-job shape — the stream STARTS
    (with --schema) against an empty landing dir, files land afterwards in
    two micro-batches (a session spans the file split), and the sink
    matches the batch twin exactly-once."""
    import argparse
    import time

    import jobs.stream_features as sf

    src = tmp_path / "landing_cont"
    src.mkdir()  # provisioned, EMPTY — no files landed yet
    out = str(tmp_path / "sink_cont")
    ckpt = str(tmp_path / "ckpt_cont")
    ns = argparse.Namespace(
        input=str(src), output=out, checkpoint=ckpt, mode="sessions",
        schema="doc_id string, ts double, token bigint",
        entity_cols="doc_id", ts_col="ts", token_col="token",
        gap="600 seconds", watermark="2 hours", max_age=3600.0,
        idle_timeout=600.0, available_now=False,
        trigger_interval="1 seconds", max_files_per_trigger=None,
        timeout_s=None,
    )
    q = sf.build_query(spark, ns).start()
    try:
        deadline = time.time() + 180
        # micro-batch 1: first half (sessions split across the file edge)
        half = len(event_pdf) // 2
        (spark.createDataFrame(event_pdf.iloc[:half]).coalesce(1)
         .write.mode("append").parquet(str(src)))
        while time.time() < deadline and not (
            q.lastProgress and q.lastProgress["numInputRows"] > 0
        ):
            time.sleep(1)
        # micro-batch 2: the rest + a far-future row that pushes the
        # watermark past every session's close
        rest = pd.concat([
            event_pdf.iloc[half:],
            pd.DataFrame({"doc_id": ["zz"], "ts": [1_700_100_000.0],
                          "token": [1]}),
        ])
        (spark.createDataFrame(rest).coalesce(1)
         .write.mode("append").parquet(str(src)))

        def sink_rows():
            try:
                return spark.read.parquet(out).count()
            except Exception:
                return 0

        batch = streaming_session_stats(
            spark.createDataFrame(
                pd.concat([event_pdf.iloc[:half], rest])
            )
        ).toPandas()
        want = len(batch) - 1  # zz's own session never passes the watermark
        while time.time() < deadline and sink_rows() < want:
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)

    got = spark.read.parquet(out).toPandas()
    key = ["doc_id", "session_start"]
    assert len(got) >= want > 0
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got), "sink row the batch twin doesn't have"
    assert got.duplicated(key).sum() == 0, "duplicate session emitted"
    for c in ["num_pkts", "num_bytes", "duration"]:
        np.testing.assert_allclose(merged[f"{c}_s"], merged[f"{c}_b"])

    # exactly-once: a drain over the SAME checkpoint sees no new files
    ns.available_now = True
    q2 = sf.build_query(spark, ns).start()
    q2.awaitTermination(120)
    again = spark.read.parquet(out).toPandas()
    assert len(again) == len(got)


class _FakeState:
    """Minimal GroupState stand-in for driving _make_flow_tracker."""

    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _drive(tracker, batches, state):
    """Feed event-time batches (lists of floats) through the kernel,
    returning all emitted rows."""
    rows = []
    for b in batches:
        pdfs = [pd.DataFrame({"_evt_sec": np.asarray(b, dtype=np.float64)})]
        for out in tracker(("K",), iter(pdfs), state):
            rows.extend(out.to_dict("records"))
    return rows


def test_flow_tracker_kernel_corner_cases():
    """Pure-python (no Spark): the eviction kernel's carried-state logic —
    the r4 ADVICE late+on-time-share-a-batch clamp, flow-max gap tests,
    age crossings inside the carried continuation, and the plain-diff
    fallback after the carried flow closes."""
    from netml_spark.streaming.eviction import _make_flow_tracker

    cols = ["doc_id", "n_pkts", "start_ts", "last_ts", "reason"]
    T = 1_700_000_000.0

    def fresh():
        return _make_flow_tracker(cols, 3600.0, 600.0), _FakeState()

    # 1. late + on-time sharing one batch: batch-local gap 640 > 600 but
    #    gap vs flow max (T+100) is 590 — NO split, state carries 4 pkts
    tr, st = fresh()
    rows = _drive(tr, [[T, T + 100], [T + 50, T + 690]], st)
    assert rows == [] and st.get == (4, T, T + 690.0)

    # 2. r3 case: late batch alone must not rewind last
    tr, st = fresh()
    rows = _drive(tr, [[T, T + 100], [T + 50], [T + 690]], st)
    assert rows == [] and st.get == (4, T, T + 690.0)

    # 3. carried flow closes idle at a flow-max gap; remainder is plain
    tr, st = fresh()
    rows = _drive(tr, [[T], [T + 700, T + 1000, T + 1700]], st)
    assert [(r["n_pkts"], r["start_ts"], r["last_ts"], r["reason"])
            for r in rows] == [(1, T, T, "idle"), (2, T + 700, T + 1000, "idle")]
    assert st.get == (1, T + 1700.0, T + 1700.0)

    # 4. age crossing INSIDE the carried continuation: the carried flow
    #    (8 events, 500 s gaps, age 3500) receives a late event (T+3450,
    #    below the flow max) and a crossing one (T+3601): the crossing is
    #    absorbed and the flow closes max_age with n=10
    tr, st = fresh()
    rows = _drive(tr, [[T + 500.0 * i for i in range(8)],
                       [T + 3450, T + 3601]], st)
    assert [(r["n_pkts"], r["start_ts"], r["last_ts"], r["reason"])
            for r in rows] == [(10, T, T + 3601.0, "max_age")]
    assert st.get is None

    # 5. watermark timeout emits the idle close with the carried span
    tr, st = fresh()
    _drive(tr, [[T, T + 10]], st)
    st.hasTimedOut = True
    out = list(tr(("K",), iter([]), st))[0]
    assert out.to_dict("records") == [
        {"doc_id": "K", "n_pkts": 2, "start_ts": T, "last_ts": T + 10.0,
         "reason": "idle"}]
    assert st.get is None

    # 6. timeout timestamp rides max(last + idle, watermark + 1)
    tr, st = fresh()
    st._wm = int((T + 10_000) * 1000)
    _drive(tr, [[T, T + 10]], st)
    assert st.timeout_ts == int((T + 10_000) * 1000) + 1


def test_stateful_eviction_max_age_and_idle(spark, tmp_path):
    """applyInPandasWithState twin of the capture buffer
    (capture_pkts.py:100-126): a flow whose age crosses max_age closes
    with 'max_age' AT the crossing packet; idle gaps WITHIN one batch
    split the flow per packet gap (the reference's per-packet TIMEOUT
    restart — a replay batch holds many restarts); a flow idle across
    batches is evicted by the event-time watermark with 'idle'."""
    from netml_spark.streaming.eviction import stateful_flow_eviction

    t0 = 1_700_000_000.0
    # batch 1:
    #   flowA = 3 quick packets (goes idle, watermark-evicted in batch 2)
    #   flowB = 10 packets every 450 s (gaps < 600 s idle) spanning 4050 s
    #           > max_age: closes max_age at the crossing packet, n=10
    #   flowD = 3 packets 2000 s apart: two intra-batch idle restarts
    #           (n=1 each) inside ONE micro-batch; 3rd segment stays open
    f1 = pd.DataFrame({
        "doc_id": ["A"] * 3 + ["B"] * 10 + ["D"] * 3,
        "ts": [t0, t0 + 1, t0 + 2]
        + [t0 + 450.0 * i for i in range(10)]
        + [t0, t0 + 2000, t0 + 4000],
        "token": list(range(16)),
    })
    # batch 2: a late entity far in the future — pushes the watermark past
    # A's idle deadline so the timeout fires
    f2 = pd.DataFrame({"doc_id": ["C"], "ts": [t0 + 100_000.0], "token": [99]})

    src = str(tmp_path / "evict_src")
    spark.createDataFrame(f1).coalesce(1).write.mode("overwrite").parquet(src)
    # second file written separately so maxFilesPerTrigger=1 -> 2+ batches
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.createDataFrame(f1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_flow_eviction(
        stream, ("doc_id",), "ts", max_age=3600.0, idle_timeout=600.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("evict_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from evict_stream").toPandas()

    b = got[got.doc_id == "B"]
    assert list(b.reason) == ["max_age"]
    assert int(b.n_pkts.iloc[0]) == 10  # crossing packet included
    assert float(b.last_ts.iloc[0]) == t0 + 4050.0

    a = got[got.doc_id == "A"]
    assert list(a.reason) == ["idle"]
    assert int(a.n_pkts.iloc[0]) == 3
    assert float(a.last_ts.iloc[0]) == t0 + 2

    # D: the two leading segments restart per intra-batch gap (round 2
    # merged them via min/max into one open flow — the ADVICE r2 bug);
    # the trailing segment may stay open (watermark-dependent)
    d = got[got.doc_id == "D"].sort_values("start_ts")
    assert len(d) >= 2
    assert list(d.reason)[:2] == ["idle", "idle"]
    assert list(d.n_pkts)[:2] == [1, 1]
    assert list(d.start_ts)[:2] == [t0, t0 + 2000]

    assert "C" not in set(got.doc_id)  # still open in state


def test_stateful_eviction_late_batch_keeps_last_monotone(spark, tmp_path):
    """ADVICE r3: a late micro-batch whose events all precede the carried
    flow's last timestamp must NOT rewind state.last — the later gap test
    compares against the flow's true maximum, so the flow survives a gap
    that only looks idle against the rewound value."""
    from netml_spark.streaming.eviction import stateful_flow_eviction

    t0 = 1_700_000_000.0
    batches = [
        # batch 1: E up to t0+100 (state.last = t0+100)
        pd.DataFrame({"doc_id": ["E", "E"], "ts": [t0, t0 + 100.0], "token": [0, 1]}),
        # batch 2: one LATE event (t0+50 < carried last). Without the clamp
        # state.last regresses to t0+50.
        pd.DataFrame({"doc_id": ["E"], "ts": [t0 + 50.0], "token": [2]}),
        # batch 3: t0+690 — gap vs TRUE last (100) is 590 <= 600 (merge);
        # vs the rewound last (50) it is 640 > 600 (spurious idle split)
        pd.DataFrame({"doc_id": ["E"], "ts": [t0 + 690.0], "token": [3]}),
        # batch 4: far-future entity pushes the watermark past E's idle
        # deadline so the (single, merged) flow closes
        pd.DataFrame({"doc_id": ["C"], "ts": [t0 + 100_000.0], "token": [9]}),
    ]
    src = str(tmp_path / "late_src")
    for i, b in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(b).coalesce(1).write.mode(mode).parquet(src)

    stream = (
        spark.readStream.schema(spark.createDataFrame(batches[0]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # large watermark delay so the late batch is not dropped upstream of
    # the stateful operator (the regression needs the row to ARRIVE)
    out = stateful_flow_eviction(
        stream, ("doc_id",), "ts", max_age=3600.0, idle_timeout=600.0,
        watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_evict_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from late_evict_stream").toPandas()
    e = got[got.doc_id == "E"]
    # exactly ONE merged flow: 4 packets, true span, no spurious idle split
    assert list(e.reason) == ["idle"]
    assert int(e.n_pkts.iloc[0]) == 4
    assert float(e.start_ts.iloc[0]) == t0
    assert float(e.last_ts.iloc[0]) == t0 + 690.0


def test_stateful_eviction_late_and_ontime_share_batch(spark, tmp_path):
    """ADVICE r4: the r3 clamp covered a late batch arriving ALONE; when a
    late and an on-time event share one micro-batch, the batch-local
    np.diff gap (640 s) must not split a flow whose true gap vs the flow
    maximum is 590 s <= idle_timeout."""
    from netml_spark.streaming.eviction import stateful_flow_eviction

    t0 = 1_700_000_000.0
    batches = [
        # batch 1: E up to t0+100 (state.last = t0+100)
        pd.DataFrame({"doc_id": ["E", "E"], "ts": [t0, t0 + 100.0], "token": [0, 1]}),
        # batch 2: ONE micro-batch holding a late event (t0+50) AND an
        # on-time one (t0+690): batch-local gap 640 > 600, true gap vs
        # the flow max (t0+100) is 590 <= 600 — must merge, not split
        pd.DataFrame({"doc_id": ["E", "E"], "ts": [t0 + 50.0, t0 + 690.0], "token": [2, 3]}),
        # batch 3: far-future entity pushes the watermark past E's idle
        # deadline so the (single, merged) flow closes
        pd.DataFrame({"doc_id": ["C"], "ts": [t0 + 100_000.0], "token": [9]}),
    ]
    src = str(tmp_path / "late_share_src")
    for i, b in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(b).coalesce(1).write.mode(mode).parquet(src)

    stream = (
        spark.readStream.schema(spark.createDataFrame(batches[0]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_flow_eviction(
        stream, ("doc_id",), "ts", max_age=3600.0, idle_timeout=600.0,
        watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_share_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from late_share_stream").toPandas()
    e = got[got.doc_id == "E"]
    assert list(e.reason) == ["idle"]
    assert int(e.n_pkts.iloc[0]) == 4
    assert float(e.start_ts.iloc[0]) == t0
    assert float(e.last_ts.iloc[0]) == t0 + 690.0


def test_stateful_eviction_carried_close_then_plain_gaps(spark, tmp_path):
    """Once the carried flow closes inside a batch, LATER events in the
    same batch use plain batch-local gap tests (new flows contain no
    carried packets), even when the carried maximum still dominates."""
    from netml_spark.streaming.eviction import stateful_flow_eviction

    t0 = 1_700_000_000.0
    batches = [
        # batch 1: F at t0 (state: n=1, last=t0)
        pd.DataFrame({"doc_id": ["F"], "ts": [t0], "token": [0]}),
        # batch 2: t0+700 closes the carried flow (gap 700 > 600); then
        # [t0+700, t0+1000, t0+1700] — the 700 s batch-local gap splits
        # the NEW flow even though both sit under t0+700+idle
        pd.DataFrame({
            "doc_id": ["F"] * 3,
            "ts": [t0 + 700.0, t0 + 1000.0, t0 + 1700.0],
            "token": [1, 2, 3],
        }),
        pd.DataFrame({"doc_id": ["C"], "ts": [t0 + 100_000.0], "token": [9]}),
    ]
    src = str(tmp_path / "carried_close_src")
    for i, b in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(b).coalesce(1).write.mode(mode).parquet(src)

    stream = (
        spark.readStream.schema(spark.createDataFrame(batches[0]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_flow_eviction(
        stream, ("doc_id",), "ts", max_age=3600.0, idle_timeout=600.0,
        watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("carried_close_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from carried_close_stream").toPandas()
    f = got[got.doc_id == "F"].sort_values("start_ts")
    # carried single-packet flow closes idle at the head; the new
    # [700,1000] flow closes idle at the intra-batch 700 s gap; the
    # trailing [1700] flow closes on the watermark
    assert list(f.reason) == ["idle", "idle", "idle"]
    assert list(f.n_pkts) == [1, 2, 1]
    assert list(f.start_ts) == [t0, t0 + 700.0, t0 + 1700.0]
    assert list(f.last_ts) == [t0, t0 + 1000.0, t0 + 1700.0]


def test_stream_features_job_starts_before_first_file(spark, tmp_path):
    """ADVICE r3: a continuous job commonly starts BEFORE the first file
    lands. With --schema (DDL) the query builds against an empty landing
    dir; without it the error is explicit, not an AnalysisException."""
    import argparse

    import jobs.stream_features as sf
    import pytest

    landing = tmp_path / "not_landed_yet"
    landing.mkdir()  # dir provisioned, no files landed yet
    ns = argparse.Namespace(
        input=str(landing), output=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"), mode="sessions",
        schema="doc_id string, ts double, token int",
        entity_cols="doc_id", ts_col="ts", token_col="token",
        gap="600 seconds", watermark="30 minutes", max_age=3600.0,
        idle_timeout=600.0, available_now=True,
        trigger_interval="30 seconds", max_files_per_trigger=None,
        timeout_s=None,
    )
    writer = sf.build_query(spark, ns)  # builds; no files needed
    assert writer is not None

    ns.schema = None
    with pytest.raises(SystemExit, match="no files landed"):
        sf.build_query(spark, ns)
