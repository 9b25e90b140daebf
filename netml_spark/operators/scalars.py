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


def with_dns_fields(
    df: DataFrame,
    qname_col: str = "dns_qname",
    rrname_col: str = "dns_rrname",
    rdata_col: str = "dns_rdata",
) -> DataFrame:
    """DNS field extraction twin (parser.py:1018-1041): the reference
    pulls DNSQR.qname / DNSRR.rrname / DNSRR.rdata from the scapy layer
    and utf-8-decodes the bytes; here the raw name/rdata bytes arrive as
    binary (or string) columns — scapy's wire parsing is out of engine
    scope — and the derivations are native expressions:

    - is_dns     = any DNS layer present (qname or rrname non-null;
                   parser.py:1020,1029 both set is_dns=True)
    - dns_query  = utf-8 decode, DNSRR.rrname overriding DNSQR.qname when
                   both exist (the reference's second dict.update wins)
    - dns_resp   = utf-8 decode of rdata (parser.py:1036-1040)

    Missing input columns are treated as all-null (packets without that
    layer)."""
    def dec(col: str):
        if col not in df.columns:
            return F.lit(None).cast("string")
        c = F.col(col)
        if dict(df.dtypes)[col] == "binary":
            c = c.cast("string")  # utf-8 decode
        return c

    q, rr, rd = dec(qname_col), dec(rrname_col), dec(rdata_col)
    return (
        df.withColumn("is_dns", q.isNotNull() | rr.isNotNull())
        .withColumn("dns_query", F.coalesce(rr, q))
        .withColumn("dns_resp", rd)
    )


def packets_table(df: DataFrame) -> DataFrame:
    """pcap2pandas twin: derive ip/mac int columns, datetime, DNS fields,
    time_normed, then stable-sort column names (parser.py:1046-1076).
    Input columns per the reference's _pcap_columns (F4 fixture): time,
    ip_src, ip_dst, mac_src, mac_dst, dns_qname/dns_rrname/dns_rdata
    (raw bytes), ... (missing columns are skipped)."""
    out = df
    for ipc in ("ip_src", "ip_dst"):
        if ipc in out.columns:
            out = out.withColumn(f"{ipc}_int", ip_to_int(ipc))
    for macc in ("mac_src", "mac_dst"):
        if macc in out.columns:
            out = out.withColumn(f"{macc}_int", mac_to_int(macc))
    if any(c in out.columns for c in ("dns_qname", "dns_rrname", "dns_rdata")):
        out = with_dns_fields(out)
    if "time" in out.columns:
        if "datetime" not in out.columns:
            out = out.withColumn("datetime", epoch_to_datetime("time"))
        out = with_time_normed(out, "time")
    return out.select(*sorted(out.columns))
