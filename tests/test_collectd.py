"""collectd conformance tests.

Golden strings are the reference's own PluginParentTest assertions,
reproduced byte-for-byte (collectd/src/test/java/timely/collectd/plugin/
PluginParentTest.java:66-433). The Java plugin writes each put line with
a trailing newline; ``to_put_lines`` returns bare lines, so every golden
compare appends "\\n" to our line. Each Java test builds a ValueList with
DataSource type 1 (GAUGE) — here the equivalent MetricData value_pairs.

Beyond the goldens: encode->decode round-trips (the encoder is written
independently of the decoder, sources/collectd.py:154), packet-state
persistence across VALUES parts, corrupt-packet rejection (the repo's
parser-hardening contract), a real-socket UDP end-to-end proving a
collectd datagram lands as points while plain put-line datagrams are
unaffected (WriteTimelyPluginTest.java's live-socket leg), and the
distributed ``decode_collectd_df`` Arrow path.
"""

import math
import socket
import struct
import time

import pytest

from timely_spark.sources.collectd import (
    PART_HOST,
    PART_PLUGIN,
    PART_TIME,
    PART_TYPE,
    PART_TYPE_INSTANCE,
    PART_VALUES,
    MetricData,
    decode_packets,
    encode_value_list,
    is_collectd_packet,
    java_double_str,
    to_put_lines,
)

HOST = "r01n01.test"
TIME = 1456156976840
ADDL = {"addl1": "foo"}  # PluginParentTest.TestPlugin: additionalTags


def _md(plugin, type, type_instance="", plugin_instance="", value=1.0):
    return MetricData(
        timestamp=TIME,
        host=HOST,
        plugin=plugin,
        plugin_instance=plugin_instance,
        type=type,
        type_instance=type_instance,
        value_pairs=[(value, "GAUGE")],
    )


def _one_line(md):
    lines = to_put_lines(md, ADDL)
    assert len(lines) == 1
    return lines[0] + "\n"


# ---------------------------------------------------------------------------
# PluginParentTest goldens, byte-for-byte
# ---------------------------------------------------------------------------

GOLDENS = [
    # testStatsDHadoopFormat:66-82
    (
        _md("statsd", "derive", "DataNode.dfs.datanode.BlocksRead"),
        "put statsd.dfs.BlocksRead 1456156976840 1.0 addl1=foo host=r01n01 instance=DataNode rack=r01 sampleType=GAUGE\n",
    ),
    # testStatsDUnknownFormat:84-100
    (
        _md("statsd", "derive", "baz"),
        "put statsd.baz 1456156976840 1.0 addl1=foo host=r01n01 rack=r01 sampleType=GAUGE\n",
    ),
    # testStatsDUnknownFormat2:102-118
    (
        _md("statsd", "derive", "bar.baz"),
        "put statsd.bar 1456156976840 1.0 addl1=foo host=r01n01 rack=r01 sampleType=GAUGE\n",
    ),
    # testHddTemp:120-136
    (
        _md("hddtemp", "temperature", "sda", value=35.0),
        "put sys.hddtemp.temperature 1456156976840 35.0 addl1=foo host=r01n01 instance=sda rack=r01 sampleType=GAUGE\n",
    ),
    # testSmart1:138-154
    (
        _md("smart", "smart_badsectors", "", "sda", value=0.0),
        "put sys.smart.smart_badsectors 1456156976840 0.0 addl1=foo host=r01n01 instance=sda rack=r01 sampleType=GAUGE\n",
    ),
    # testSmart2:156-173
    (
        _md("smart", "smart_attribute", "raw-read-error-rate", "sda", value=0.0),
        "put sys.smart.raw-read-error-rate 1456156976840 0.0 addl1=foo host=r01n01 instance=sda rack=r01 sampleType=GAUGE\n",
    ),
    # testSmartCode:175-192
    (
        _md("smart", "smart_attribute", "attribute-242", "sda", value=0.0),
        "put sys.smart.Total_LBAs_Read 1456156976840 0.0 addl1=foo code=242 host=r01n01 instance=sda rack=r01 sampleType=GAUGE\n",
    ),
    # testSnmp:194-212
    (
        _md("snmp", "if_octets", "Ethernet1", value=0.0),
        "put sys.snmp.if_octets 1456156976840 0.0 addl1=foo host=r01n01 instance=Ethernet1 rack=r01 sampleType=GAUGE\n",
    ),
    # testSensors:214-231
    (
        _md("sensors", "temperature", "temp1", "coretemp-isa-0000", value=35.0),
        "put sys.sensors.temperature.coretemp-isa-0000 1456156976840 35.0 addl1=foo host=r01n01 instance=1 rack=r01 sampleType=GAUGE\n",
    ),
    # testHAProxy1:233-249
    (
        _md("haproxy", "gauge", "run_queue", value=0.0),
        "put sys.haproxy.run_queue 1456156976840 0.0 addl1=foo host=r01n01 rack=r01 sampleType=GAUGE\n",
    ),
    # testHAProxy2:251-269
    (
        _md(
            "haproxy",
            "gauge",
            "queue_current",
            "[proxy_name=proxy1,service_name=server1]",
            value=0.0,
        ),
        "put sys.haproxy.queue_current 1456156976840 0.0 addl1=foo host=r01n01 proxy_name=proxy1 rack=r01 sampleType=GAUGE service_name=server1\n",
    ),
    # testEthStatNoQueue:271-289
    (
        _md("ethstat", "derive", "tx_comp_queue_full", "eth0", value=6.0),
        "put sys.ethstat.tx_comp_queue_full 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 rack=r01 sampleType=GAUGE\n",
    ),
    # testEthstatWithQueueStyle1:291-318 (three cases)
    (
        _md("ethstat", "derive", "rx_queue_15_bytes", "eth0", value=6.0),
        "put sys.ethstat.rx_queue_bytes 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 queue=15 rack=r01 sampleType=GAUGE\n",
    ),
    (
        _md("ethstat", "derive", "queue_7_tx_bytes", "eth0", value=6.0),
        "put sys.ethstat.queue_tx_bytes 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 queue=7 rack=r01 sampleType=GAUGE\n",
    ),
    (
        _md("ethstat", "derive", "queue_7_rx_xdp_drop", "eth0", value=6.0),
        "put sys.ethstat.queue_rx_xdp_drop 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 queue=7 rack=r01 sampleType=GAUGE\n",
    ),
    # testEthstatWithQueueStyle2:320-343 (two cases)
    (
        _md("ethstat", "derive", "rx-15.bytes", "eth0", value=6.0),
        "put sys.ethstat.rx_queue_bytes 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 queue=15 rack=r01 sampleType=GAUGE\n",
    ),
    (
        _md("ethstat", "derive", "tx15_xdp_err", "eth0", value=6.0),
        "put sys.ethstat.tx_queue_xdp_err 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 queue=15 rack=r01 sampleType=GAUGE\n",
    ),
    # testEthstatWithTrafficClass:345-364
    (
        _md("ethstat", "derive", "veb.tc_15_tx_bytes", "eth0", value=6.0),
        "put sys.ethstat.veb.tc_tx_bytes 1456156976840 6.0 addl1=foo host=r01n01 instance=eth0 rack=r01 sampleType=GAUGE trafficClass=15\n",
    ),
    # testEthstatWithChannel:366-384
    (
        _md("ethstat", "derive", "ch44_events", "eth0", value=6.0),
        "put sys.ethstat.ch_events 1456156976840 6.0 addl1=foo channel=44 host=r01n01 instance=eth0 rack=r01 sampleType=GAUGE\n",
    ),
    # testIpmi:386-404
    (
        _md("ipmi", "temperature", "LAN NIC Temp system_board (3.2)", value=6.0),
        "put sys.ipmi.temperature 1456156976840 6.0 addl1=foo host=r01n01 instance=LAN_NIC_Temp_system_board_(3.2) rack=r01 sampleType=GAUGE\n",
    ),
]


@pytest.mark.parametrize(
    "md,expected", GOLDENS, ids=[g[1].split(" ", 2)[1] + f"#{i}" for i, g in enumerate(GOLDENS)]
)
def test_plugin_parent_goldens(md, expected):
    assert _one_line(md) == expected


def test_exclusions_golden(spark):
    """PluginParentTest.testExclusions:406-433 via the engine-side
    analogue: exclusions are a DataFrame concern here
    (operators/exclusions.apply_exclusions), fed the reference's own
    filteredMetrics.txt / filteredTags.txt rules; the re-rendered line
    must equal the Java golden byte-for-byte."""
    from pyspark.sql import functions as F

    from timely_spark.operators.exclusions import apply_exclusions
    from timely_spark.sources.lineprotocol import parse_lines_df

    lines = to_put_lines(
        _md("ethstat", "derive", "rx_queue_1_bytes", "eth0", value=6.0), ADDL
    )
    # plus one metric matching the filteredMetrics regex -> dropped
    lines += to_put_lines(
        _md("ethstat", "derive", "rx_to_tx_errors", "eth0", value=6.0), ADDL
    )
    assert lines[1].startswith("put sys.ethstat.rx_to_tx_errors ")
    pts = parse_lines_df(
        spark.createDataFrame([(ln,) for ln in lines], "value string")
    )
    # src/test/resources/filteredMetrics.txt + filteredTags.txt
    out = apply_exclusions(
        pts,
        metric_blocklist=[
            "sys.ethstat.*_to_.*",
            "sys.interface.if_packets",
            "sys.interface.if_octets",
        ],
        tag_strips={
            "sys.interface.if_packets": ["sampleType", "instance"],
            "sys.interface.if_octets": ["sampleType", "instance"],
            "sys.ethstat.rx_queue_bytes": ["sampleType", "instance"],
        },
    ).collect()
    assert len(out) == 1  # rx_to_tx_errors excluded entirely
    r = out[0]
    rendered = "put {} {} {} {}\n".format(
        r.metric,
        r.ts,
        java_double_str(r.value),
        " ".join(f"{k}={v}" for k, v in sorted(r.tags.items())),
    )
    assert (
        rendered
        == "put sys.ethstat.rx_queue_bytes 1456156976840 6.0 addl1=foo host=r01n01 queue=1 rack=r01\n"
    )


def test_multi_value_datasource_emits_one_line_per_value():
    """A multi-DS values part emits one put line per (value, sampleType)
    pair (CollectDPluginParent loops value pairs), except `load` which
    keeps only the 1-minute value."""
    md = MetricData(
        timestamp=TIME,
        host=HOST,
        plugin="snmp",
        type="if_octets",
        type_instance="eth0",
        value_pairs=[(1.0, "DERIVE"), (2.0, "DERIVE")],
    )
    lines = to_put_lines(md, {})
    assert len(lines) == 2
    assert [ln.split(" ")[3] for ln in lines] == ["1.0", "2.0"]
    assert all("sampleType=DERIVE" in ln for ln in lines)

    load = MetricData(
        timestamp=TIME,
        host=HOST,
        plugin="load",
        type="load",
        value_pairs=[(0.5, "GAUGE"), (0.4, "GAUGE"), (0.3, "GAUGE")],
    )
    lines = to_put_lines(load, {})
    assert len(lines) == 1 and lines[0].split(" ")[3] == "0.5"


# ---------------------------------------------------------------------------
# Binary protocol: round-trips, state persistence, corruption
# ---------------------------------------------------------------------------


def test_encode_decode_round_trip_all_kinds():
    pkt = encode_value_list(
        host=HOST,
        time_ms=TIME,
        plugin="snmp",
        type="if_octets",
        type_instance="eth0",
        values=[(42.0, 0), (3.5, 1), (-7.0, 2), (2**63, 3)],
        hr_time=True,
    )
    assert is_collectd_packet(pkt)
    mds = decode_packets(pkt)
    assert len(mds) == 1
    md = mds[0]
    assert md.host == HOST
    assert md.timestamp == TIME  # HR 2^-30s units round-trip exactly
    assert md.plugin == "snmp"
    assert md.type == "if_octets"
    assert md.type_instance == "eth0"
    assert md.value_pairs == [
        (42.0, "COUNTER"),
        (3.5, "GAUGE"),
        (-7.0, "DERIVE"),
        (float(2**63), "ABSOLUTE"),
    ]


def test_decode_whole_second_time_part():
    pkt = encode_value_list(
        host=HOST,
        time_ms=1456156976000,
        plugin="hddtemp",
        type="temperature",
        type_instance="sda",
        values=[(35.0, 1)],
    )
    (md,) = decode_packets(pkt)
    assert md.timestamp == 1456156976000
    with pytest.raises(ValueError):
        encode_value_list(
            host=HOST, time_ms=TIME, plugin="p", type="t", values=[(1.0, 1)]
        )


def test_state_persists_across_values_parts():
    """collectd senders only re-send parts that changed: a packet with
    one HOST/TIME/PLUGIN/TYPE prefix and two TYPE_INSTANCE+VALUES pairs
    yields two MetricData sharing the prefix state."""

    def spart(ptype, text):
        body = text.encode() + b"\x00"
        return struct.pack(">HH", ptype, 4 + len(body)) + body

    def vpart(v):
        body = struct.pack(">H", 1) + bytes([1]) + struct.pack("<d", v)
        return struct.pack(">HH", PART_VALUES, 4 + len(body)) + body

    pkt = (
        spart(PART_HOST, HOST)
        + struct.pack(">HHQ", PART_TIME, 12, TIME // 1000)
        + spart(PART_PLUGIN, "hddtemp")
        + spart(PART_TYPE, "temperature")
        + spart(PART_TYPE_INSTANCE, "sda")
        + vpart(35.0)
        + spart(PART_TYPE_INSTANCE, "sdb")
        + vpart(36.0)
    )
    mds = decode_packets(pkt)
    assert [(m.host, m.plugin, m.type, m.type_instance, m.value_pairs[0][0]) for m in mds] == [
        (HOST, "hddtemp", "temperature", "sda", 35.0),
        (HOST, "hddtemp", "temperature", "sdb", 36.0),
    ]
    # new PLUGIN part resets plugin_instance scope; new TYPE resets type_instance
    pkt2 = (
        spart(PART_HOST, HOST)
        + struct.pack(">HHQ", PART_TIME, 12, TIME // 1000)
        + spart(PART_PLUGIN, "hddtemp")
        + spart(PART_TYPE, "temperature")
        + spart(PART_TYPE_INSTANCE, "sda")
        + vpart(35.0)
        + spart(PART_TYPE, "fanspeed")
        + vpart(9.0)
    )
    mds = decode_packets(pkt2)
    assert mds[1].type == "fanspeed" and mds[1].type_instance == ""


def test_corrupt_packets_never_raise():
    good = encode_value_list(
        host=HOST,
        time_ms=TIME,
        plugin="hddtemp",
        type="temperature",
        type_instance="sda",
        values=[(35.0, 1)],
        hr_time=True,
    )
    # truncation at every byte boundary: clean termination, no raise
    for cut in range(len(good)):
        decode_packets(good[:cut])
    # part length overruns the datagram
    bad_len = struct.pack(">HH", PART_HOST, 500) + b"x" * 8
    assert decode_packets(bad_len) == []
    # part length below the 4-byte header
    assert decode_packets(struct.pack(">HH", PART_HOST, 2) + b"ab") == []
    # VALUES count claims more pairs than the body carries
    vbody = struct.pack(">H", 5) + bytes([1]) + struct.pack("<d", 1.0)
    pkt = struct.pack(">HH", PART_VALUES, 4 + len(vbody)) + vbody
    assert decode_packets(pkt) == []
    # random noise
    assert decode_packets(b"\xff" * 64) == []
    assert decode_packets(b"") == []


def test_is_collectd_packet_sniff():
    assert not is_collectd_packet(b"put sys.cpu.user 1 1.0 t=v\n")
    assert not is_collectd_packet(b"")
    assert not is_collectd_packet(b"pu")
    good = encode_value_list(
        host=HOST, time_ms=TIME, plugin="p", type="t", values=[(1.0, 1)], hr_time=True
    )
    assert is_collectd_packet(good)


# ---------------------------------------------------------------------------
# Java Double.toString parity (put lines embed value.toString())
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "v,s",
    [
        (1.0, "1.0"),
        (35.0, "35.0"),
        (0.0, "0.0"),
        (-0.0, "-0.0"),
        (6.0, "6.0"),
        (123456.789, "123456.789"),
        (0.001, "0.001"),
        (1e-4, "1.0E-4"),
        (1e7, "1.0E7"),
        (9999999.0, "9999999.0"),
        (-2.5, "-2.5"),
        (1.23e-5, "1.23E-5"),
        (float("inf"), "Infinity"),
        (float("-inf"), "-Infinity"),
    ],
)
def test_java_double_str(v, s):
    assert java_double_str(v) == s


def test_java_double_str_nan():
    assert java_double_str(float("nan")) == "NaN"
    assert java_double_str(math.nan) == "NaN"


# ---------------------------------------------------------------------------
# UDP end-to-end + distributed decode
# ---------------------------------------------------------------------------


def test_udp_collectd_and_put_lines_coexist(spark, tmp_path):
    """WriteTimelyPluginTest's live-socket leg, receiver-side: a binary
    collectd datagram lands as points under the plugin naming rules AND
    plain put-line datagrams on the same port are unaffected."""
    from timely_spark.api import TimelyEngine
    from timely_spark.tcp_facade import TimelyUdpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyUdpServer(
        eng, flush_seconds=60, collectd_tags={"addl1": "foo"}
    ).start()
    try:
        pkt = encode_value_list(
            host=HOST,
            time_ms=TIME,
            plugin="hddtemp",
            type="temperature",
            type_instance="sda",
            values=[(35.0, 1)],
            hr_time=True,
        )
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as sock:
            sock.sendto(pkt, (srv.host, srv.port))
            sock.sendto(
                f"put sys.cpu.user {TIME} 1.0 tag1=value1\n".encode(),
                (srv.host, srv.port),
            )
        deadline = time.time() + 30
        total = 0
        while time.time() < deadline and total < 2:
            total += srv.flush()
            if total < 2:
                time.sleep(0.2)
        assert total == 2
        rows = {r.metric: r for r in eng.points(now_ms=TIME).collect()}
        assert set(rows) == {"sys.hddtemp.temperature", "sys.cpu.user"}
        cd = rows["sys.hddtemp.temperature"]
        assert cd.value == 35.0 and cd.ts == TIME
        assert dict(cd.tags) == {
            "addl1": "foo",
            "host": "r01n01",
            "instance": "sda",
            "rack": "r01",
            "sampleType": "GAUGE",
        }
        assert rows["sys.cpu.user"].tags["tag1"] == "value1"
    finally:
        srv.stop()


def test_decode_collectd_df(spark):
    """Distributed packet-lake decode: binary column -> points via
    mapInPandas + the pure-Column line parser."""
    from timely_spark.sources.collectd import decode_collectd_df

    pkts = [
        encode_value_list(
            host=HOST,
            time_ms=TIME,
            plugin="hddtemp",
            type="temperature",
            type_instance=f"sd{c}",
            values=[(30.0 + i, 1)],
            hr_time=True,
        )
        for i, c in enumerate("abc")
    ]
    df = spark.createDataFrame([(bytearray(p),) for p in pkts], "data binary")
    out = decode_collectd_df(df, additional_tags={"addl1": "foo"})
    rows = sorted(out.collect(), key=lambda r: r.tags["instance"])
    assert [r.metric for r in rows] == ["sys.hddtemp.temperature"] * 3
    assert [r.value for r in rows] == [30.0, 31.0, 32.0]
    assert [r.ts for r in rows] == [TIME] * 3
    assert rows[0].tags["addl1"] == "foo" and rows[0].tags["rack"] == "r01"
