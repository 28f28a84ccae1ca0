"""IPv4 lanes: parse/format round trip, malformed → NULL, CIDR math,
first-match classification."""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_ray.functions.net import (
    cidr_range, classify_cidr, ipv4_format, ipv4_parse, subnet_prefix)


def test_ipv4_format_parse_roundtrip():
    rng = np.random.RandomState(3)
    ints = pa.array(rng.randint(0, 2 ** 32, 500, dtype=np.int64))
    s = ipv4_format(ints)
    back = ipv4_parse(s)
    assert back.equals(ints.cast(pa.int64()))
    # known values
    assert ipv4_format(pa.array([0, 0xFFFFFFFF, (10 << 24) + 1],
                                pa.int64())).to_pylist() == \
        ["0.0.0.0", "255.255.255.255", "10.0.0.1"]


def test_ipv4_format_guards_and_nulls():
    out = ipv4_format(pa.array([None, 1], pa.int64()))
    assert out.to_pylist() == [None, "0.0.0.1"]
    with pytest.raises(ValueError, match="outside"):
        ipv4_format(pa.array([2 ** 32], pa.int64()))
    with pytest.raises(ValueError, match="outside"):
        ipv4_format(pa.array([-1], pa.int64()))


def test_ipv4_parse_malformed_to_null():
    s = pa.array(["1.2.3.4", "256.1.1.1", "1.2.3", "1.2.3.4.5",
                  "a.b.c.d", "", None, "01.2.3.4", "1.2.3.4 ",
                  "999.999.999.999"])
    got = ipv4_parse(s).to_pylist()
    assert got == [(1 << 24) + (2 << 16) + (3 << 8) + 4, None, None,
                   None, None, None, None,
                   (1 << 24) + (2 << 16) + (3 << 8) + 4, None, None]


def test_ipv4_parse_no_valid_rows():
    assert ipv4_parse(pa.array(["x", None])).to_pylist() == [None, None]


def test_cidr_range_and_subnet():
    assert cidr_range("10.0.0.0/8") == (10 << 24, (11 << 24) - 1)
    assert cidr_range("172.16.0.0/12") == (
        (172 << 24) + (16 << 16), (172 << 24) + (32 << 16) - 1)
    # base is masked to the prefix
    assert cidr_range("10.1.2.3/8") == (10 << 24, (11 << 24) - 1)
    lo, hi = cidr_range("1.2.3.4/32")
    assert lo == hi == (1 << 24) + (2 << 16) + (3 << 8) + 4
    for bad in ("10.0.0.0", "10.0.0/8", "10.0.0.256/8", "10.0.0.0/33",
                "x/8"):
        with pytest.raises(ValueError, match="malformed"):
            cidr_range(bad)
    sub = subnet_prefix(pa.array([(10 << 24) + 513, None], pa.int64()),
                        24)
    assert sub.to_pylist() == [(10 << 24) + 512, None]
    with pytest.raises(ValueError, match="prefix"):
        subnet_prefix(pa.array([1], pa.int64()), 40)


def test_classify_cidr_first_match_and_default():
    rules = [("loopback", "127.0.0.0/8"), ("private", "10.0.0.0/8"),
             ("private", "172.16.0.0/12"), ("narrow", "10.1.0.0/16")]
    ips = pa.array([(127 << 24) + 1, (10 << 24) + (1 << 16) + 5,
                    (172 << 24) + (20 << 16), (8 << 24), None],
                   pa.int64())
    got = classify_cidr(ips, rules).to_pylist()
    # 10.1.0.5 hits "private" FIRST (rule order), never "narrow"
    assert got == ["loopback", "private", "private", "public", None]
    assert classify_cidr(ips, [], default="x").to_pylist() == \
        ["x", "x", "x", "x", None]
