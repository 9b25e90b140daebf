"""Scalar functions vs python-stdlib oracles (reference parser.py:1058-1076)."""

import ipaddress

import numpy as np
import pandas as pd

from netml_spark.operators.scalars import packets_table


def test_packets_table_scalars(spark):
    pdf = pd.DataFrame(
        {
            "time": [1000.25, 1000.99, 1002.5, 1010.0],
            "ip_src": ["192.168.0.1", "10.0.0.255", None, "not-an-ip"],
            "ip_dst": ["8.8.8.8", None, "255.255.255.255", "1.2.3.4"],
            "mac_src": ["aa:bb:cc:dd:ee:ff", "00-11-22-33-44-55", None, "zz:zz"],
            "length": [60, 1500, 40, 800],
        }
    )
    out = packets_table(spark.createDataFrame(pdf)).toPandas()
    # column-name sorted (parser.py:1076)
    assert list(out.columns) == sorted(out.columns)
    # ip -> int matches ipaddress (parser.py:1062-1066), null-safe
    exp_src = [int(ipaddress.ip_address("192.168.0.1")),
               int(ipaddress.ip_address("10.0.0.255")), None, None]
    got_src = [None if pd.isna(v) else int(v) for v in out["ip_src_int"]]
    assert got_src == exp_src
    # mac -> int48 (parser.py:1068-1072)
    assert int(out["mac_src_int"][0]) == 0xAABBCCDDEEFF
    assert int(out["mac_src_int"][1]) == 0x001122334455
    assert pd.isna(out["mac_src_int"][2]) and pd.isna(out["mac_src_int"][3])
    # datetime truncates to whole seconds (parser.py:994)
    assert out["datetime"][0].second == 40  # 1000 % 60
    assert out["datetime"][0].microsecond == 0
    # time_normed anchored at global min (parser.py:1074)
    np.testing.assert_allclose(sorted(out["time_normed"]), [0.0, 0.74, 2.25, 9.75])


def test_dns_fields(spark):
    """parser.py:1018-1041 twin: is_dns / dns_query (rrname wins) /
    dns_resp utf-8 decodes from raw bytes."""
    from netml_spark.operators.scalars import with_dns_fields

    pdf = pd.DataFrame({
        "time": [1.0, 2.0, 3.0, 4.0],
        "dns_qname": [b"example.com.", b"a.io.", None, None],
        "dns_rrname": [None, b"a.io.", b"rr.only.", None],
        "dns_rdata": [None, b"1.2.3.4", b"5.6.7.8", None],
    })
    out = with_dns_fields(spark.createDataFrame(pdf)).toPandas()
    assert out["is_dns"].tolist() == [True, True, True, False]
    assert out["dns_query"].tolist() == ["example.com.", "a.io.", "rr.only.", None]
    assert out["dns_resp"].tolist() == [None, "1.2.3.4", "5.6.7.8", None]
    # packets_table picks the DNS columns up automatically
    out2 = packets_table(spark.createDataFrame(pdf)).toPandas()
    assert "is_dns" in out2.columns and list(out2.columns) == sorted(out2.columns)


def test_ip_to_int_rejects_out_of_range_octets(spark):
    """ipaddress.ip_address rejects octets > 255 — so must the engine
    (reference parser.py:1062: malformed -> null)."""
    from netml_spark.operators.scalars import ip_to_int

    pdf = pd.DataFrame({"ip": ["300.1.2.3", "256.0.0.1", "255.255.255.255",
                               "0.0.0.0", "1.2.3.999"]})
    out = spark.createDataFrame(pdf).select(ip_to_int("ip").alias("v")).toPandas()
    got = [None if pd.isna(v) else int(v) for v in out["v"]]
    assert got == [None, None, int(ipaddress.ip_address("255.255.255.255")), 0, None]
