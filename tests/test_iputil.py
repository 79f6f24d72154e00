"""Java InetAddress parity for parse + getHostAddress echo."""

from logstash_filter_geoip_ray.functions.iputil import host_address, parse_ip


def test_parse_valid():
    assert str(parse_ip("1.2.3.4")) == "1.2.3.4"
    assert parse_ip("2607:f0d0:1002:51::4") is not None


def test_parse_malformed():
    for bad in ("-", "N/A", "1.2,3.4", "123.45.67.89,61.160.232.222", "", "hostname.example"):
        assert parse_ip(bad) is None


def test_ipv6_expanded_zero_echo():
    # geoip_ecs_spec.rb:158 — no '::' compression, unpadded lowercase groups
    assert host_address(parse_ip("2607:f0d0:1002:51::4")) == "2607:f0d0:1002:51:0:0:0:4"
    assert host_address(parse_ip("2a02:d5c0::")) == "2a02:d5c0:0:0:0:0:0:0"
    assert host_address(parse_ip("::1")) == "0:0:0:0:0:0:0:1"


def test_ipv4_mapped_degrades_to_ipv4():
    addr = parse_ip("::ffff:1.2.3.4")
    assert addr.version == 4
    assert host_address(addr) == "1.2.3.4"


def test_ipv4_echo():
    assert host_address(parse_ip("216.160.83.58")) == "216.160.83.58"
