"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names from SURVEY.md §2 to (spark, sf_dir) ->
DataFrame callables built on the netml_spark engine; ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL. Column names/aliases match exactly on both
sides; float aggregates that can drift with summation order are either
computed on DECIMAL (exact) or rounded identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DEFAULT = "/root/testdata/sf0.001"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# Temporal core over `events` (entity=user_id, ts, value) — SURVEY.md §2.3/2.4
# ---------------------------------------------------------------------------


def q_sessionize_count(spark, sf_dir):
    """Clean gap sessionization (600 s) -> sessions per user. §2.3."""
    from netml_spark.operators import sessionize

    df = sessionize(_events(spark, sf_dir), ("user_id",), "ts", 600.0, ("event_id",))
    return (
        df.groupBy("user_id")
        .agg(
            (F.max("session_id") + 1).cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SQL_SESSIONIZE_COUNT = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 600
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id,
       CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
"""


def q_netml_sessionize(spark, sf_dir):
    """Reference-faithful timeout sessionize (trailing-discard + min-count
    quirks, parser.py:80-206) -> per-session row/byte counts. §2.3."""
    from netml_spark.operators import sessionize_timeout

    df = sessionize_timeout(
        _events(spark, sf_dir), ("user_id",), "ts", 600.0, 2, ("event_id",)
    )
    return (
        df.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
        .select("user_id", F.col("session_id").cast("long").alias("session_id"),
                "n_events", "sum_value")
    )


SQL_NETML_SESSIONIZE = """
WITH pre AS (
  SELECT user_id, ts, event_id, value,
         COUNT(*) OVER (PARTITION BY user_id) AS n_entity
  FROM events
), g AS (
  SELECT *, CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 600
                 THEN 1 ELSE 0 END AS brk
  FROM pre WHERE n_entity >= 2
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
), t AS (
  SELECT *, MAX(session_id) OVER (PARTITION BY user_id) AS max_sid FROM s
), kept AS (
  SELECT * FROM t WHERE max_sid = 0 OR session_id < max_sid
), sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY user_id, session_id) AS n_seg FROM kept
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM sized WHERE n_seg >= 2
GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def q_session_stats(spark, sf_dir):
    """netml STATS 12-vector per session (parser.py:430-469), native agg. §2.5."""
    from netml_spark.operators import sessionize_timeout
    from netml_spark.operators.stats import stats_features

    sess = sessionize_timeout(
        _events(spark, sf_dir), ("user_id",), "ts", 600.0, 2, ("event_id",)
    )
    s = stats_features(sess, ("user_id", "session_id"), "ts", "value")
    return s.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        F.round("duration", 6).alias("duration"),
        F.round("pkts_rate", 6).alias("pkts_rate"),
        F.round("bytes_rate", 6).alias("bytes_rate"),
        F.round("size_mean", 6).alias("size_mean"),
        F.round("size_std", 6).alias("size_std"),
        F.round("size_q1", 6).alias("size_q1"),
        F.round("size_q2", 6).alias("size_q2"),
        F.round("size_q3", 6).alias("size_q3"),
        F.round("size_min", 6).alias("size_min"),
        F.round("size_max", 6).alias("size_max"),
        "num_pkts",
        F.round("num_bytes", 6).alias("num_bytes"),
    ).orderBy("user_id", "session_id")


SQL_SESSION_STATS = """
WITH pre AS (
  SELECT user_id, ts, event_id, value,
         COUNT(*) OVER (PARTITION BY user_id) AS n_entity
  FROM events
), g AS (
  SELECT *, CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 600
                 THEN 1 ELSE 0 END AS brk
  FROM pre WHERE n_entity >= 2
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
), t AS (
  SELECT *, MAX(session_id) OVER (PARTITION BY user_id) AS max_sid FROM s
), kept AS (
  SELECT * FROM t WHERE max_sid = 0 OR session_id < max_sid
), sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY user_id, session_id) AS n_seg FROM kept
), agg AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         MAX(epoch(ts)) - MIN(epoch(ts)) AS duration,
         CAST(COUNT(*) AS DOUBLE) AS num_pkts,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS num_bytes,
         AVG(value) AS size_mean,
         COALESCE(stddev_pop(value), 0.0) AS size_std,
         quantile_cont(value, 0.25) AS size_q1,
         quantile_cont(value, 0.50) AS size_q2,
         quantile_cont(value, 0.75) AS size_q3,
         MIN(value) AS size_min,
         MAX(value) AS size_max
  FROM sized WHERE n_seg >= 2
  GROUP BY user_id, session_id
)
SELECT user_id, session_id,
       ROUND(duration, 6) AS duration,
       ROUND(CASE WHEN duration = 0 THEN 0.0 ELSE num_pkts / duration END, 6) AS pkts_rate,
       ROUND(CASE WHEN duration = 0 THEN 0.0 ELSE num_bytes / duration END, 6) AS bytes_rate,
       ROUND(size_mean, 6) AS size_mean,
       ROUND(size_std, 6) AS size_std,
       ROUND(size_q1, 6) AS size_q1,
       ROUND(size_q2, 6) AS size_q2,
       ROUND(size_q3, 6) AS size_q3,
       ROUND(size_min, 6) AS size_min,
       ROUND(size_max, 6) AS size_max,
       num_pkts,
       ROUND(num_bytes, 6) AS num_bytes
FROM agg ORDER BY user_id, session_id
"""


def q_gap_lag_lead(spark, sf_dir):
    """Per-event inter-arrival gap + lag/lead of value. §2.3 (IAT relational twin)."""
    df = _events(spark, sf_dir)
    from netml_spark.util import ts_seconds

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsd = ts_seconds(df, "ts")
    return df.select(
        "event_id",
        "user_id",
        F.round(tsd - F.lag(tsd).over(w), 6).alias("gap_s"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    ).orderBy("event_id")


SQL_GAP_LAG_LEAD = """
SELECT event_id, user_id,
       ROUND(epoch(ts) - lag(epoch(ts)) OVER w, 6) AS gap_s,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def q_backfill(spark, sf_dir):
    """Forward-fill (backfill op): last purchase value per user at each event. §2.3."""
    from netml_spark.operators.asof import backfill

    df = _events(spark, sf_dir).withColumn(
        "last_purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    out = backfill(df, ["last_purchase_value"], ("user_id",), "ts", ("event_id",))
    return out.select("event_id", "user_id", "last_purchase_value").orderBy("event_id")


SQL_BACKFILL = """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
FROM events ORDER BY event_id
"""


def q_asof_join(spark, sf_dir):
    """Sort-merge as-of join: most recent purchase (value,ts) per event. §2.4."""
    from netml_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    # dedupe right side to one row per (user_id, ts): max value wins, so the
    # as-of result is well-defined on both engines
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        right,
        on=("user_id",),
        left_ts="ts",
        right_ts="ts",
        value_cols=("purchase_value",),
    )
    return out.select(
        "event_id", "user_id",
        F.round("asof_ts", 6).alias("asof_ts"),
        "purchase_value",
    ).orderBy("event_id")


SQL_ASOF_JOIN = """
WITH r AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id,
       ROUND(epoch(r.ts), 6) AS asof_ts,
       r.purchase_value
FROM events l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def q_sliding_window(spark, sf_dir):
    """Sliding 1 h window per user: trailing event count + value sum. §2.3."""
    from netml_spark.util import ts_seconds

    df = _events(spark, sf_dir)
    tsd = ts_seconds(df, "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(tsd)
        .rangeBetween(-3600, 0)
    )
    return df.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2).alias("sum_1h"),
    ).orderBy("event_id")


SQL_SLIDING_WINDOW = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_json_props(spark, sf_dir):
    """JSON scalar extraction from the props column (§2.8 scalar fns)."""
    df = _events(spark, sf_dir)
    return (
        df.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


SQL_JSON_PROPS = """
SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events ORDER BY event_id
"""


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style aggregate over lineitem (exact DECIMAL sums). §2.5."""
    l = _lineitem(spark, sf_dir)
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double").alias("sum_disc_price"),
            F.sum(d("l_extendedprice") * (one - d("l_discount")) * (one + d("l_tax"))).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference-faithful sessionize + STATS features at sf0.001."""
    return q_session_stats(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sessionize_count": q_sessionize_count,
        "netml_sessionize": q_netml_sessionize,
        "session_stats": q_session_stats,
        "gap_lag_lead": q_gap_lag_lead,
        "backfill": q_backfill,
        "asof_join": q_asof_join,
        "sliding_window": q_sliding_window,
        "json_props": q_json_props,
        "pricing_summary": q_pricing_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "sessionize_count": SQL_SESSIONIZE_COUNT,
        "netml_sessionize": SQL_NETML_SESSIONIZE,
        "session_stats": SQL_SESSION_STATS,
        "gap_lag_lead": SQL_GAP_LAG_LEAD,
        "backfill": SQL_BACKFILL,
        "asof_join": SQL_ASOF_JOIN,
        "sliding_window": SQL_SLIDING_WINDOW,
        "json_props": SQL_JSON_PROPS,
        "pricing_summary": SQL_PRICING_SUMMARY,
    }
