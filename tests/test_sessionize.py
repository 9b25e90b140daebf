"""Parity: Spark sessionization vs numpy oracle (reference parser.py:80-299).

Pins the reference quirks: min-packets pre/post filters, trailing-segment
discard, grid-aligned interval restart (SURVEY.md §5.2 item 3).
"""

import numpy as np
import pandas as pd

from netml_spark import datagen
from netml_spark.operators import sessionize, sessionize_timeout, subflows_interval
from netml_spark.oracle import netml_ref


def _oracle_segments(pdf, thres=2, timeout=600.0):
    flows = datagen.oracle_flows(pdf)
    return netml_ref.pcap2flows(flows, flow_pkts_thres=thres, timeout=timeout)


def _spark_segments(df, key_cols=("doc_id",)):
    rows = df.select("doc_id", "session_id", "ts", "seq", "token").collect()
    segs = {}
    for r in rows:
        segs.setdefault((r.doc_id, r.session_id), []).append((r.ts, r.seq, r.token))
    # re-key sessions to per-doc ordinals: Spark keeps raw cumsum ids after
    # dropping short middle segments; the oracle list is ordinal by nature
    by_doc = {}
    for (doc, sid), v in segs.items():
        by_doc.setdefault(doc, []).append((sid, v))
    out = {}
    for doc, lst in by_doc.items():
        for k, (_, v) in enumerate(sorted(lst)):
            v.sort()  # (ts, seq) order — seq is the tie-breaker
            out[(doc, k)] = (np.array([t for t, _, _ in v]), np.array([s for _, _, s in v]))
    return out


def test_sessionize_timeout_matches_oracle(spark, token_events_df, token_events_pdf):
    got = sessionize_timeout(
        token_events_df, entity_cols=("doc_id",), ts_col="ts",
        timeout=600.0, flow_pkts_thres=2, order_cols=("seq",),
    )
    spark_segs = _spark_segments(got)
    oracle = _oracle_segments(token_events_pdf)
    # oracle segments keyed by (doc_id, per-doc segment ordinal)
    ora = {}
    ordinal = {}
    for fid, t, s in oracle:
        k = ordinal.get(fid, 0)
        ordinal[fid] = k + 1
        ora[(fid, k)] = (t, s)
    # session ids in spark are the cumsum ids of *kept* segments — for a doc
    # with a discarded trailing segment the kept ids are still 0..n-1
    assert set(spark_segs.keys()) == set(ora.keys())
    for k in ora:
        np.testing.assert_allclose(spark_segs[k][0], ora[k][0])
        np.testing.assert_array_equal(spark_segs[k][1], ora[k][1])


def test_sessionize_clean_counts(spark, token_events_df, token_events_pdf):
    got = sessionize(token_events_df, ("doc_id",), "ts", gap=600.0, order_cols=("seq",))
    pdf = got.select("doc_id", "session_id").toPandas()
    # oracle: clean cumsum per doc
    exp = []
    for doc_id, g in token_events_pdf.sort_values(["doc_id", "ts", "seq"]).groupby("doc_id"):
        t = g["ts"].to_numpy()
        sid = np.concatenate([[0], np.cumsum(np.diff(t) > 600.0)])
        exp.append(pd.DataFrame({"doc_id": doc_id, "session_id": sid.astype("int32")}))
    exp = pd.concat(exp)
    got_counts = pdf.groupby(["doc_id", "session_id"]).size().sort_index()
    exp_counts = exp.groupby(["doc_id", "session_id"]).size().sort_index()
    pd.testing.assert_series_equal(got_counts, exp_counts)


def test_subflows_interval_matches_oracle(spark, token_events_df, token_events_pdf):
    # first the timeout pass, then the grid-aligned interval re-split, as the
    # reference pipeline does (parser.py:691-735)
    sess = sessionize_timeout(
        token_events_df, ("doc_id",), "ts", 600.0, 2, order_cols=("seq",)
    )
    interval = 5.0
    got = subflows_interval(
        sess, interval, entity_cols=("doc_id", "session_id"), ts_col="ts",
        flow_pkts_thres=2, order_cols=("seq",),
    )
    rows = got.select("doc_id", "session_id", "subflow_id", "ts", "token").collect()
    segs = {}
    for r in rows:
        segs.setdefault((r.doc_id, r.session_id, r.subflow_id), []).append((r.ts, r.token))

    oracle_sess = _oracle_segments(token_events_pdf)
    oracle_subs = netml_ref.flows2subflows(oracle_sess, interval=interval, flow_pkts_thres=2)
    # compare multiset of (times tuple) segments per doc
    def norm(d):
        out = {}
        for k, v in d.items():
            out.setdefault(k[0], []).append(tuple(np.round(np.sort([t for t, _ in v]), 9)))
        return {k: sorted(v) for k, v in out.items()}

    got_n = norm(segs)
    ora = {}
    for fid, t, s in oracle_subs:
        ora.setdefault(fid, []).append(tuple(np.round(np.sort(t), 9)))
    ora = {k: sorted(v) for k, v in ora.items()}
    assert got_n == ora


def test_trailing_discard_quirk(spark):
    # doc with one >600s gap: two segments, trailing discarded -> only seg 0
    pdf = pd.DataFrame({
        "doc_id": ["a"] * 5,
        "source": ["s"] * 5,
        "ts": [0.0, 1.0, 2.0, 700.0, 701.0],
        "seq": np.arange(5, dtype=np.int32),
        "token": np.arange(5, dtype=np.int32) + 100,
        "proto": np.int32(6),
        "ttl": np.int32(64),
        "tcp_flags": ["A"] * 5,
    })
    df = spark.createDataFrame(pdf)
    got = sessionize_timeout(df, ("doc_id",), "ts", 600.0, 2, ("seq",)).toPandas()
    assert sorted(got["ts"]) == [0.0, 1.0, 2.0]
    # no split -> single segment kept
    pdf2 = pdf.assign(ts=[0.0, 1.0, 2.0, 3.0, 4.0])
    got2 = sessionize_timeout(spark.createDataFrame(pdf2), ("doc_id",), "ts", 600.0, 2, ("seq",)).toPandas()
    assert len(got2) == 5


def test_sessionize_thres1_keeps_entity_bar(spark):
    """r6: the whole-entity pre-filter window is elided for thres >= 2
    (subsumed by the segment filter) but MUST survive for thres < 2,
    where the entity bar is max(2, thres)=2 while segments only need 1
    row (reference parser.py:146 vs :197): a single-row entity is
    dropped even though its segment would pass the size-1 bar."""
    import pandas as pd

    pdf = pd.DataFrame({
        "doc_id": ["solo"] + ["multi"] * 3,
        "ts": [0.0, 0.0, 1.0, 700.0],
        "seq": [0, 0, 1, 2],
        "token": [1, 2, 3, 4],
    })
    df = spark.createDataFrame(pdf)
    got = sessionize_timeout(df, ("doc_id",), "ts", 600.0, 1, ("seq",)).toPandas()
    # 'solo' (1 row < entity bar 2) dropped entirely; 'multi' splits at
    # the 700s gap, trailing segment discarded, first segment (2 rows,
    # >= seg bar 1) kept
    assert sorted(got["doc_id"].unique()) == ["multi"]
    assert sorted(got["ts"]) == [0.0, 1.0]


def test_subflows_groups_spanning_arrow_batches(spark):
    """The batched mapInPandas kernel buffers a group that spans an Arrow
    batch boundary into the next batch. Force pathological batching (5
    rows per batch, groups of 7+) and pin equality against the same call
    under default batching."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from netml_spark.operators.sessionize import subflows_interval

    rng = np.random.default_rng(7)
    rows = []
    for d in range(40):
        n = int(rng.integers(3, 23))
        # gaps that straddle the 50s interval so some groups split
        t = 1_700_000_000.0 + np.cumsum(rng.uniform(1.0, 40.0, n) +
                                        (rng.random(n) < 0.15) * 100.0)
        for i, ts in enumerate(t):
            rows.append((f"e{d:03d}", 0, float(ts), i))
    pdf = pd.DataFrame(rows, columns=["doc_id", "session_id", "ts", "seq"])
    df = spark.createDataFrame(pdf)

    def run():
        out = subflows_interval(df, 50.0, ("doc_id", "session_id"), "ts",
                                2, ("seq",))
        return (out.toPandas()
                .sort_values(["doc_id", "session_id", "ts", "seq"])
                .reset_index(drop=True))

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)
    base = run()
    try:
        spark.conf.set(key, "5")
        tiny = run()
    finally:
        spark.conf.set(key, default)
    pd.testing.assert_frame_equal(tiny, base)
    assert base["subflow_id"].max() >= 1  # splits actually occurred


def test_subflow_mapper_batch_boundary_invariance():
    """Pure-pyarrow (no Spark): _make_subflow_arrow_mapper must produce
    the SAME rows no matter how the sorted partition stream is chopped
    into Arrow record batches — including batch sizes of 1, groups
    spanning dozens of batches, NaN entity keys AND genuine Arrow nulls
    (null-safe grouping, ADVICE r4; Arrow rework r6)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from netml_spark.operators.sessionize import _make_subflow_arrow_mapper

    rng = np.random.default_rng(5)
    rows = []
    for gi, d in enumerate([float("nan")] + list(range(12))):
        n = int(rng.integers(1, 60)) if gi != 3 else 400  # one mega-group
        t = 1000.0 * gi + np.cumsum(rng.uniform(0.5, 20.0, n)
                                    + (rng.random(n) < 0.2) * 100.0)
        for i, ts in enumerate(t):
            rows.append((d, 0, float(ts), i))
    pdf = (pd.DataFrame(rows, columns=["doc_id", "session_id", "ts", "seq"])
           .sort_values(["doc_id", "session_id", "ts", "seq"], na_position="first")
           .reset_index(drop=True))
    # a second variant where the NaN keys are REAL Arrow nulls
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)

    def run(batch_size, table):
        mapper = _make_subflow_arrow_mapper(["doc_id", "session_id"], "ts",
                                            50.0, 2, "subflow_id")
        chunks = table.combine_chunks().to_batches(max_chunksize=batch_size)
        outs = [o for o in mapper(iter(chunks)) if o.num_rows]
        out = pa.Table.from_batches(outs).to_pandas()
        return (out.sort_values(["doc_id", "session_id", "ts", "seq"],
                                na_position="first")
                .reset_index(drop=True))

    base = run(len(pdf), tbl)  # single batch: the trusted DuckDB-gated path
    assert len(base) > 0 and base["subflow_id"].max() >= 1
    assert base["doc_id"].isna().any()  # NaN group survived the filter
    for bs in (1, 3, 7, 64):
        pd.testing.assert_frame_equal(run(bs, tbl), base)
    # Arrow-null keys (what Spark actually ships for SQL NULL): the NaN
    # doubles become nulls; grouping must be identical
    null_key = pa.array(
        [None if (v is not None and np.isnan(v)) else v
         for v in tbl.column("doc_id").to_pylist()],
        type=pa.float64(),
    )
    tbl_null = tbl.set_column(0, "doc_id", null_key)
    base_null = run(len(pdf), tbl_null)
    assert base_null["doc_id"].isna().any()
    for bs in (1, 7, 64):
        pd.testing.assert_frame_equal(run(bs, tbl_null), base_null)


def test_subflows_mega_group_spanning_many_batches(spark):
    """r4 verdict item 4: one mega-group spanning >=50 tiny Arrow batches
    must be buffered as a LIST and concatenated once (the old per-batch
    pd.concat re-copied the whole buffer per batch, O(m*k)); equality vs
    default batching pins the rework."""
    import numpy as np
    import pandas as pd

    from netml_spark.operators.sessionize import subflows_interval

    rng = np.random.default_rng(11)
    n = 400  # 400 rows / 5-row batches = 80 batches for ONE group
    t = 1_700_000_000.0 + np.cumsum(rng.uniform(1.0, 40.0, n) +
                                    (rng.random(n) < 0.1) * 100.0)
    rows = [("mega", 0, float(ts), i) for i, ts in enumerate(t)]
    # neighbors before and after so the mega group has batch-mates
    rows = [("aaa", 0, 1_700_000_000.0 + i, i) for i in range(4)] + rows
    rows += [("zzz", 0, 1_700_000_000.0 + i, i) for i in range(4)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "session_id", "ts", "seq"])
    df = spark.createDataFrame(pdf).coalesce(1)

    def run():
        out = subflows_interval(df, 50.0, ("doc_id", "session_id"), "ts",
                                2, ("seq",))
        return (out.toPandas()
                .sort_values(["doc_id", "session_id", "ts", "seq"])
                .reset_index(drop=True))

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)
    base = run()
    try:
        spark.conf.set(key, "5")
        tiny = run()
    finally:
        spark.conf.set(key, default)
    pd.testing.assert_frame_equal(tiny, base)
    assert (base["doc_id"] == "mega").sum() > 300


def test_subflows_null_keys_one_group(spark):
    """ADVICE r4: adjacent null entity keys must form ONE group (groupBy
    semantics), not per-row singletons via NaN != NaN."""
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from netml_spark.operators.sessionize import subflows_interval

    schema = StructType([
        StructField("doc_id", DoubleType()),   # float key -> null is NaN
        StructField("session_id", LongType()),
        StructField("ts", DoubleType()),
        StructField("seq", LongType()),
    ])
    rows = ([(None, 0, 1_700_000_000.0 + i, i) for i in range(5)]
            + [(1.0, 0, 1_700_000_000.0 + i, i) for i in range(5)])
    df = spark.createDataFrame(rows, schema).coalesce(1)
    out = (subflows_interval(df, 1000.0, ("doc_id", "session_id"), "ts",
                             3, ("seq",))
           .toPandas())
    # both 5-row groups survive the >=3 min-size filter intact; with the
    # NaN bug the null rows would be singletons and all dropped
    assert len(out) == 10
    assert out["doc_id"].isna().sum() == 5
