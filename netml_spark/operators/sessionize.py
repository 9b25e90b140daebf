"""Gap sessionization — the heart of the engine (reference parser.py:80-299).

All variants are declarative window passes over ``(entity, ts)``:

- ``sessionize``          : clean cumulative-sum gap sessionization. Pure
                            Catalyst (lag + cumsum windows) — one shuffle on
                            the entity key, whole-stage-codegen body.
- ``sessionize_timeout``  : the reference's timeout split with its quirks
                            (min-packets pre/post filters, trailing-segment
                            discard) — still pure Catalyst.
- ``subflows_interval``   : the reference's grid-aligned interval re-split
                            (parser.py:209-299). The split anchor depends on
                            grid arithmetic over previous splits — inherently
                            sequential per entity — so it runs as a numpy
                            loop inside ``applyInPandas`` (Arrow-batched, one
                            group per entity-session, vectorized I/O).

Scale notes (100 TB): the only wide exchange is hash partitioning by the
entity key; every window uses the same partitioning so Catalyst reuses the
exchange across the lag/cumsum/max passes (one shuffle total). Heavy-hitter
*sources* do not skew these passes because the partition key is the
fine-grained entity (doc_id); see operators/skew.py for salted fallbacks
when a single entity is itself huge.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netml_spark.util import ts_seconds


def _entity_window(entity_cols: Sequence[str], ts_col: str, order_cols: Sequence[str]):
    return Window.partitionBy(*entity_cols).orderBy(ts_col, *order_cols)


def sessionize(
    df: DataFrame,
    entity_cols: Sequence[str] = ("doc_id",),
    ts_col: str = "ts",
    gap: float = 600.0,
    order_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign ``session_col``: cumulative count of gaps > ``gap`` seconds.

    ``ts_col`` may be double epoch-seconds or timestamp (cast internally).
    Clean semantics (no trailing discard): the streaming
    ``session_window`` twin in streaming/session_stream.py matches this.
    """
    ts_d = ts_seconds(df, ts_col)
    w = _entity_window(entity_cols, ts_col, order_cols)
    gap_expr = ts_d - F.lag(ts_d).over(w)
    brk = F.when(gap_expr > F.lit(float(gap)), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(session_col, F.sum(brk).over(w).cast("int"))


def sessionize_timeout(
    df: DataFrame,
    entity_cols: Sequence[str] = ("doc_id",),
    ts_col: str = "ts",
    timeout: float = 600.0,
    flow_pkts_thres: int = 2,
    order_cols: Sequence[str] = (),
    session_col: str = "session_id",
    defer_seg_filter: bool = False,
) -> DataFrame:
    """Reference-faithful timeout sessionization (parser.py:80-206).

    Semantics transcribed (see oracle netml_ref.pcap2flows):
      1. whole entities with < max(2, thres) rows dropped (parser.py:146)
      2. rows sorted by (ts, *order_cols) per entity (parser.py:151)
      3. split where gap > timeout (parser.py:165,174)
      4. if the entity split at all, its trailing segment is discarded
         (parser.py:188-193)
      5. segments with < thres rows dropped (parser.py:197)

    Implementation (fused — one shuffle, one sort): every per-entity
    scalar rides the SAME (entity, ts-ordered) window spec so Catalyst
    evaluates them in two WindowExec passes over one sorted run:
      pass 1: lag(ts) [gap test] + count over the unbounded frame
              [entity size — replaces the separate unordered window]
      pass 2: running sum(brk) [session id] + total sum(brk) over the
              unbounded frame [== max session id, since the cumsum peaks
              at the last row — replaces max(session_id)]
    The per-(entity, session) size filter (step 5) is the only part that
    needs a second sort. Callers that aggregate by (entity, session)
    anyway should pass ``defer_seg_filter=True`` and apply
    ``count >= flow_pkts_thres`` AFTER their aggregation — dropping whole
    sessions commutes with per-session aggregation, and the plan then has
    exactly one sort (measured 0.52 -> >=0.8 N->4N scaling efficiency on
    the sessionize->STATS chain).
    """
    ts_d = ts_seconds(df, ts_col)
    w = _entity_window(entity_cols, ts_col, order_cols)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    gap_expr = ts_d - F.lag(ts_d).over(w)
    brk = F.when(gap_expr > F.lit(float(timeout)), F.lit(1)).otherwise(F.lit(0))
    out = (
        df.withColumn("_brk", brk)
        .withColumn("_n_entity", F.count(F.lit(1)).over(w_all))
        .withColumn(session_col, F.sum("_brk").over(w).cast("int"))
        .withColumn("_max_sid", F.sum("_brk").over(w_all))
        .filter(F.col("_n_entity") >= max(2, flow_pkts_thres))
        # trailing-segment discard iff any split occurred
        .filter((F.col("_max_sid") == 0) | (F.col(session_col) < F.col("_max_sid")))
        .drop("_brk", "_n_entity", "_max_sid")
    )
    if not defer_seg_filter:
        out = (
            out.withColumn(
                "_n_seg",
                F.count(F.lit(1)).over(Window.partitionBy(*entity_cols, session_col)),
            )
            .filter(F.col("_n_seg") >= flow_pkts_thres)
            .drop("_n_seg")
        )
    return out


def subflows_interval(
    df: DataFrame,
    interval: float,
    entity_cols: Sequence[str] = ("doc_id", "session_id"),
    ts_col: str = "ts",
    flow_pkts_thres: int = 2,
    order_cols: Sequence[str] = ("seq",),
    subflow_col: str = "subflow_id",
) -> DataFrame:
    """Grid-aligned interval re-split (reference parser.py:209-299).

    Quirks preserved (pinned by tests vs the numpy oracle):
      - segment anchor advances on the grid:
        ``start += int((t - start)//interval)*interval`` (parser.py:258,270)
      - a new segment's first element is *recorded at the grid-anchored
        time*, so the next gap test compares against that synthetic time
        (parser.py:256-263)
      - trailing segment discarded iff any split occurred (parser.py:278-283)
      - segments with < max(2, thres) rows dropped (parser.py:289-292).

    Runs as ``applyInPandas`` per entity group. The kernel iterates the
    SPLITS, not the rows (round 2 stepped every row in Python): away from
    a split the recurrence degenerates to ``rec_time = previous row``, so
    the next split is either the row right after a split (tested against
    the synthetic grid anchor) or the first consecutive-gap > interval —
    precomputed once with ``np.diff`` and jumped to with
    ``np.searchsorted``. O(splits log n) Python steps + O(n) numpy;
    splits are rare by construction.
    """
    interval = float(interval)
    thres = max(2, int(flow_pkts_thres))
    schema_fields = df.schema.fields
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in schema_fields]
        + [f"`{subflow_col}` int"]
    )
    entity_cols = list(entity_cols)
    sort_cols = [ts_col, *order_cols]

    def split_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        raw = pdf[ts_col]
        if pd.api.types.is_datetime64_any_dtype(raw):
            # epoch seconds (wall time as UTC — matches util.ts_seconds)
            t = raw.to_numpy().astype("datetime64[ns]").astype(np.int64) / 1e9
        else:
            t = raw.to_numpy(dtype=np.float64)
        n = len(t)
        # natural split candidates: rows whose gap to the PREVIOUS row
        # exceeds the interval (the recurrence away from synthetic anchors)
        cand = np.flatnonzero(np.diff(t) > interval) + 1
        splits = []
        start = t[0]
        j = int(cand[0]) if len(cand) else n
        while j < n:
            # split at row j: anchor advances on the grid (parser.py:258,270)
            start += int((t[j] - start) // interval) * interval
            splits.append(j)
            # row j+1 compares against the synthetic anchor, not t[j]
            if j + 1 < n and t[j + 1] - start > interval:
                j = j + 1
                continue
            # row j+1 absorbed -> rec_time returns to "previous row" from
            # j+2 on; jump to the first natural candidate >= j+2
            k = int(np.searchsorted(cand, j + 2, side="left"))
            j = int(cand[k]) if k < len(cand) else n
        split_flow = bool(splits)
        cur = len(splits)
        ind = np.zeros(n, dtype=np.int32)
        if splits:
            ind[np.asarray(splits, dtype=np.int64)] = 1
        pdf[subflow_col] = np.cumsum(ind, dtype=np.int32)
        if split_flow:
            pdf = pdf[pdf[subflow_col] < cur]  # trailing-segment discard
        # min-size filter per subflow
        counts = pdf.groupby(subflow_col)[subflow_col].transform("size")
        return pdf[counts >= thres]

    return df.groupBy(*entity_cols).applyInPandas(split_group, schema=out_schema)
