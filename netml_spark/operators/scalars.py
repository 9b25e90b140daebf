"""Scalar functions + the packets-table twin (reference §2.8, parser.py:946-1076).

The reference's ``pcap2pandas`` builds a 13-column packet table then derives
int/normalized columns (parser.py:1058-1076). All derivations here are
native column expressions:

- ``ip_to_int``    : dotted-quad IPv4 -> uint32-as-long, null-safe
                     (parser.py:1062-1066, int(ipaddress.ip_address(x)))
- ``mac_to_int``   : 'aa:bb:cc:dd:ee:ff' -> int48, null-safe
                     (parser.py:1068-1072, int(netaddr.EUI(x)))
- ``time_normed``  : t - min(t) over the whole capture (parser.py:1074)
- ``epoch_to_datetime``: seconds-truncated naive datetime
                     (parser.py:994, datetime.fromtimestamp(int(t)))
- ``packets_table``: applies all of the above + stable column-name sort
                     (parser.py:1076, df.sort_index(axis=1))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ip_to_int(col: Column | str) -> Column:
    """Dotted-quad IPv4 string -> numeric (null for null/malformed).
    aggregate(split(ip,'.'), 0L, (acc, o) -> acc*256 + o). Malformed
    includes octets > 255 ('300.1.2.3' -> null), matching the reference's
    int(ipaddress.ip_address(x)) which rejects them (parser.py:1062)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    val = F.aggregate(
        parts,
        F.lit(0).cast("long"),
        lambda acc, o: acc * 256 + o.cast("long"),
    )
    ok = c.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") & F.forall(
        parts, lambda o: o.cast("int") <= 255
    )
    return F.when(c.isNotNull() & ok, val)


def mac_to_int(col: Column | str) -> Column:
    """MAC 'aa:bb:cc:dd:ee:ff' (or dashes) -> int48 via hex conv, null-safe."""
    c = F.col(col) if isinstance(col, str) else col
    hexstr = F.regexp_replace(c, r"[:\-]", "")
    ok = hexstr.rlike(r"^[0-9a-fA-F]{12}$")
    return F.when(c.isNotNull() & ok, F.conv(hexstr, 16, 10).cast("long"))


def epoch_to_datetime(col: Column | str) -> Column:
    """Epoch seconds (float) -> timestamp truncated to whole seconds —
    reference uses datetime.fromtimestamp(int(t)) (parser.py:994)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(F.floor(c.cast("double")).cast("long"))


def with_time_normed(df: DataFrame, ts_col: str = "time",
                     out_col: str = "time_normed") -> DataFrame:
    """t - min(t) over the whole table (parser.py:1074). Global min via a
    scalar agg broadcast (cheaper at scale than an unpartitioned window)."""
    from netml_spark.util import ts_seconds

    ts_d = ts_seconds(df, ts_col)
    t0 = df.agg(F.min(ts_d).alias("t0"))
    return df.crossJoin(F.broadcast(t0)).withColumn(
        out_col, ts_d - F.col("t0")
    ).drop("t0")


def packets_table(df: DataFrame) -> DataFrame:
    """pcap2pandas twin: derive ip/mac int columns, datetime, time_normed,
    then stable-sort column names (parser.py:1046-1076). Input columns per
    the reference's _pcap_columns (F4 fixture): time, ip_src, ip_dst,
    mac_src, mac_dst, ... (missing columns are skipped)."""
    out = df
    for ipc in ("ip_src", "ip_dst"):
        if ipc in out.columns:
            out = out.withColumn(f"{ipc}_int", ip_to_int(ipc))
    for macc in ("mac_src", "mac_dst"):
        if macc in out.columns:
            out = out.withColumn(f"{macc}_int", mac_to_int(macc))
    if "time" in out.columns:
        if "datetime" not in out.columns:
            out = out.withColumn("datetime", epoch_to_datetime("time"))
        out = with_time_normed(out, "time")
    return out.select(*sorted(out.columns))
