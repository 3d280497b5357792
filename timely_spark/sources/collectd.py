"""collectd ingest: binary network protocol -> Timely ``put`` lines.

Reference scope (SURVEY.md §2.1 S5): the reference ships collectd WRITER
plugins that run inside collectd and translate its ValueLists into put
lines (collectd/src/main/java/timely/collectd/plugin/
CollectDPluginParent.java:110-360 — the plugin-family naming switch;
MetricData.java:113-126 — COUNTER/GAUGE/DERIVE/ABSOLUTE sample types;
SMARTCodeMapping.java — the public S.M.A.R.T. attribute table). Earlier
rounds scoped S5 out as an external emitter; this module closes the gap
from the RECEIVING side instead: Timely-Spark accepts collectd's native
**binary network protocol** (the part-framed datagram format of
collectd's network plugin — a public wire format: 2-byte part type +
2-byte length, string/numeric/values parts) directly on the UDP facade
and applies the reference plugin's exact naming rules, so a fleet
pointed at us with collectd's stock ``network`` plugin lands the same
metric names, tags and values the reference's write plugin would have
emitted. Golden strings in tests/test_collectd.py are the reference's
own PluginParentTest assertions, reproduced byte-for-byte.

Scale path: datagram decode is driver-light (a packet is <=64 KB and
yields put lines that ride the existing buffered ``put_lines`` batch
ingest); bulk/backfill decode of captured packet lakes runs distributed
via ``decode_collectd_df`` (Arrow ``mapInPandas`` over a binary column,
one Python pass per packet batch — the same pattern as WARC ingest in
sources/corpus.py), feeding the pure-Column line-protocol parser, so
Catalyst sees one scan -> decode -> parse pipeline with no driver loop.
"""

from __future__ import annotations

import math
import re
import struct
from dataclasses import dataclass, field
from typing import Iterable, Iterator

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Binary network protocol (public wire format of collectd's network plugin)
# ---------------------------------------------------------------------------

PART_HOST = 0x0000
PART_TIME = 0x0001
PART_PLUGIN = 0x0002
PART_PLUGIN_INSTANCE = 0x0003
PART_TYPE = 0x0004
PART_TYPE_INSTANCE = 0x0005
PART_VALUES = 0x0006
PART_INTERVAL = 0x0007
PART_TIME_HR = 0x0008
PART_INTERVAL_HR = 0x0009
PART_MESSAGE = 0x0100
PART_SEVERITY = 0x0101
PART_SIGNATURE = 0x0200
PART_ENCRYPTED = 0x0210

_STRING_PARTS = {
    PART_HOST,
    PART_PLUGIN,
    PART_PLUGIN_INSTANCE,
    PART_TYPE,
    PART_TYPE_INSTANCE,
    PART_MESSAGE,
}

#: value-type byte -> sample-type tag value (MetricData.java:113-126)
SAMPLE_TYPES = {0: "COUNTER", 1: "GAUGE", 2: "DERIVE", 3: "ABSOLUTE"}


@dataclass
class MetricData:
    """One decoded ValueList (MetricData.java:11-56). ``timestamp`` ms."""

    timestamp: int | None = None
    host: str = ""
    plugin: str = ""
    plugin_instance: str = ""
    type: str = ""
    type_instance: str = ""
    #: (value, sample_type) pairs, one per data source in the values part
    value_pairs: list[tuple[float, str]] = field(default_factory=list)


def decode_packets(data: bytes) -> list[MetricData]:
    """Walk one datagram's parts; emit a MetricData per VALUES part.

    Protocol state (host/time/plugin/...) persists across VALUES parts
    within the packet, as collectd's network plugin relies on — senders
    only re-send parts that changed. Signed/encrypted parts and unknown
    part types are skipped (we neither verify nor decrypt; plaintext
    parity matches the reference's UDP put path). Truncated parts
    terminate the walk cleanly rather than raising: ingest is
    fire-and-forget like the line-protocol socket.
    """
    out: list[MetricData] = []
    st = MetricData()
    off, n = 0, len(data)
    while off + 4 <= n:
        ptype, plen = struct.unpack_from(">HH", data, off)
        if plen < 4 or off + plen > n:
            break
        body = data[off + 4 : off + plen]
        off += plen
        if ptype in _STRING_PARTS:
            text = body.split(b"\x00", 1)[0].decode("utf-8", errors="replace")
            if ptype == PART_HOST:
                st.host = text
            elif ptype == PART_PLUGIN:
                st.plugin = text
                st.plugin_instance = ""  # new plugin scope
            elif ptype == PART_PLUGIN_INSTANCE:
                st.plugin_instance = text
            elif ptype == PART_TYPE:
                st.type = text
                st.type_instance = ""
            elif ptype == PART_TYPE_INSTANCE:
                st.type_instance = text
        elif ptype == PART_TIME and len(body) >= 8:
            st.timestamp = struct.unpack(">Q", body[:8])[0] * 1000
        elif ptype == PART_TIME_HR and len(body) >= 8:
            # 2^-30 s units -> ms, floor like the 1.073741824e9 divide
            st.timestamp = (struct.unpack(">Q", body[:8])[0] * 1000) >> 30
        elif ptype == PART_VALUES and len(body) >= 2:
            (cnt,) = struct.unpack_from(">H", body, 0)
            if len(body) < 2 + cnt * 9:
                break
            kinds = body[2 : 2 + cnt]
            pairs: list[tuple[float, str]] = []
            for i in range(cnt):
                raw = body[2 + cnt + 8 * i : 2 + cnt + 8 * (i + 1)]
                kind = kinds[i]
                if kind == 1:  # gauge: x86 little-endian double
                    val = struct.unpack("<d", raw)[0]
                elif kind == 2:  # derive: signed BE
                    val = float(struct.unpack(">q", raw)[0])
                else:  # counter/absolute: unsigned BE
                    val = float(struct.unpack(">Q", raw)[0])
                pairs.append((val, SAMPLE_TYPES.get(kind, "GAUGE")))
            md = MetricData(
                timestamp=st.timestamp,
                host=st.host,
                plugin=st.plugin,
                plugin_instance=st.plugin_instance,
                type=st.type,
                type_instance=st.type_instance,
                value_pairs=pairs,
            )
            out.append(md)
        # INTERVAL/SEVERITY/SIGNATURE/ENCRYPTED/unknown: skipped
    return out


def encode_value_list(
    *,
    host: str,
    time_ms: int,
    plugin: str,
    type: str,
    plugin_instance: str = "",
    type_instance: str = "",
    values: Iterable[tuple[float, int]] = (),
    hr_time: bool = False,
) -> bytes:
    """Independently-written encoder (tests + fixtures; the decoder is
    never exercised against its own output alone — goldens come from the
    reference's PluginParentTest). ``values`` = (value, kind) with kind
    in 0..3 per SAMPLE_TYPES."""

    def spart(ptype: int, text: str) -> bytes:
        body = text.encode("utf-8") + b"\x00"
        return struct.pack(">HH", ptype, 4 + len(body)) + body

    parts = [spart(PART_HOST, host)]
    if hr_time:
        # integer ceil-div: time_ms * 2^30 overflows double precision
        t = -(-time_ms * (1 << 30) // 1000)
        parts.append(struct.pack(">HHQ", PART_TIME_HR, 12, t))
    else:
        if time_ms % 1000:
            raise ValueError("non-HR time part carries whole seconds")
        parts.append(struct.pack(">HHQ", PART_TIME, 12, time_ms // 1000))
    parts.append(spart(PART_PLUGIN, plugin))
    if plugin_instance:
        parts.append(spart(PART_PLUGIN_INSTANCE, plugin_instance))
    parts.append(spart(PART_TYPE, type))
    if type_instance:
        parts.append(spart(PART_TYPE_INSTANCE, type_instance))
    vals = list(values)
    body = struct.pack(">H", len(vals)) + bytes(k for _, k in vals)
    for v, k in vals:
        if k == 1:
            body += struct.pack("<d", v)
        elif k == 2:
            body += struct.pack(">q", int(v))
        else:
            if v < 0:  # COUNTER/ABSOLUTE are unsigned on the wire
                raise ValueError(f"kind {k} value must be >= 0, got {v}")
            body += struct.pack(">Q", int(v))
    parts.append(struct.pack(">HH", PART_VALUES, 4 + len(body)) + body)
    return b"".join(parts)


def is_collectd_packet(data: bytes) -> bool:
    """Datagram sniff for the UDP facade: every collectd packet opens
    with a part header whose type is a known 16-bit id — text put lines
    start with ``b"put "`` (0x7075). A HOST part first is the stock
    network-plugin layout."""
    if len(data) < 4:
        return False
    ptype, plen = struct.unpack_from(">HH", data, 0)
    return ptype == PART_HOST and 4 < plen <= len(data)


# ---------------------------------------------------------------------------
# Java Double.toString (put lines embed value.toString();
# CollectDPluginParent.java:350)
# ---------------------------------------------------------------------------


def java_double_str(v: float) -> str:
    """Java's decimal-vs-scientific switch over Python's shortest digits.

    Java prints plain decimal for 1e-3 <= |v| < 1e7 and ``d.dddEn``
    outside; both runtimes pick shortest round-trip digits, so the digit
    strings agree (pre-JDK19 FloatingDecimal had rare extra-digit
    anomalies on values no collectd plugin emits; disclosed boundary).
    """
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0:
        return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
    sign = "-" if v < 0 else ""
    s = repr(abs(v))
    if "e" in s:
        mant, _, exp_s = s.partition("e")
        exp = int(exp_s)
    else:
        mant, exp = s, 0
    ip, _, fp = mant.partition(".")
    digits = (ip + fp).lstrip("0")
    # exponent of the leading significant digit (value = 0.digits * 10^p)
    p = len(ip) + exp - (len(ip + fp) - len((ip + fp).lstrip("0")))
    digits = digits.rstrip("0") or "0"
    if -3 < p <= 7:  # plain decimal: 1e-3 <= |v| < 1e7
        if p <= 0:
            return f"{sign}0.{'0' * -p}{digits}"
        if p >= len(digits):
            return f"{sign}{digits}{'0' * (p - len(digits))}.0"
        return f"{sign}{digits[:p]}.{digits[p:]}"
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{p - 1}"


# ---------------------------------------------------------------------------
# Naming rules (CollectDPluginParent.java:110-360)
# ---------------------------------------------------------------------------

#: public S.M.A.R.T. attribute ids -> names (the same Wikipedia table the
#: reference cites, SMARTCodeMapping.java:16-107; where the table lists
#: several names per id the reference's pick is kept so metric names match)
SMART_ATTRIBUTES = {
    1: "Read_Error_Rate",
    2: "Throughput_Performance",
    3: "Spin_Up_Time",
    4: "Start_Stop_Count",
    5: "Reallocated_Sectors_Count",
    6: "Read_Channel_Margin",
    7: "Seek_Error_Rate",
    8: "Seek_Time_Performance",
    9: "Power_On_Hours",
    10: "Spin_Retry_Count",
    11: "Calibration_Retry_Count",
    12: "Power_Cycle_Count",
    13: "Soft_Read_Error_Rate",
    22: "Current_Helium_Level",
    170: "Available_Reserved_Space",
    171: "SSD_Program_Fail_Count",
    172: "SSD_Erase_Fail_Count",
    173: "SSD_Wear_Leveling_Count",
    174: "Unexpected_power_loss_count",
    175: "Power_Loss_Protection_Failure",
    176: "Erase_Fail_Count",
    177: "Wear_Range_Delta",
    179: "Used_Reserved_Block_Count_Total",
    180: "Unused_Reserved_Block_Count_Total",
    181: "Program_Fail_Count_Total",
    182: "Erase_Fail_Count",
    183: "SATA_Downshift_Error_Count",
    184: "End_to_End_error",
    185: "Head_Stability",
    186: "Induced_Op_Vibration_Detection",
    187: "Reported_Uncorrectable_Errors",
    188: "Command_Timeout",
    189: "High_Fly_Writes",
    190: "Temperature_Difference_from_100",
    191: "G_sense_Error_Rate",
    192: "Unsafe_Shutdown_Count",
    193: "Load_Unload_Cycle_Count",
    194: "Temperature_Celsius",
    195: "Hardware_ECC_Recovered",
    196: "Reallocation_Event_Count",
    197: "Current_Pending_Sector_Count",
    198: "Uncorrectable_Sector_Count",
    199: "UltraDMA_CRC_Error_Count",
    200: "Write_Error_Rate",
    201: "Soft_Read_Error_Rate",
    202: "Data_Address_Mark_errors",
    203: "Run_Out_Cancel",
    204: "Soft_ECC_Correction",
    205: "Thermal_Asperity_Rate",
    206: "Flying_Height",
    207: "Spin_High_Current",
    208: "Spin_Buzz",
    209: "Offline_Seek_Performance",
    210: "Vibration_During_Write",
    211: "Vibration_During_Write",
    212: "Shock_During_Write",
    220: "Disk_Shift",
    221: "G_Sense_Error_Rate",
    222: "Loaded_Hours",
    223: "Load_Unload_Retry_Count",
    224: "Load_Friction",
    225: "Load_Unload_Cycle_Count",
    226: "Load_In_time",
    227: "Torque_Amplification_Count",
    228: "Power_Off_Retract_Cycle",
    230: "Drive_Life_Protection_Status",
    231: "Temperature",
    232: "Endurance_Remaining",
    233: "Power_On_Hours",
    234: "Average_erase_count",
    235: "Good_Block_Count",
    240: "Head_Flying_Hours",
    241: "Total_LBAs_Written",
    242: "Total_LBAs_Read",
    243: "Total_LBAs_Written_Expanded",
    244: "Total_LBAs_Read_Expanded",
    249: "NAND_Writes_1GiB",
    250: "Read_Error_Retry_Rate",
    251: "Minimum_Spares_Remaining",
    252: "Newly_Added_Bad_Flash_Block",
    254: "Free_Fall_Protection",
}

_HADOOP_CONTEXTS = {
    "NameNode",
    "DataNode",
    "JobManager",
    "NodeManager",
    "JobHistoryServer",
    "ResourceManager",
    "MRAppMaster",
}
# the reference's [\w-_] classes: \w plus literal '-' ('_' is in \w)
_STATSD_3 = re.compile(r"([\w\-]+)\.([\w\-]+)\.([\w\-]+)$")
_STATSD_4 = re.compile(r"([\w\-]+)\.([\w\-]+)\.([\w\-]+)\.([\w\-]+)$")
_STATSD_6 = re.compile(
    r"([\w\-]+)\.([\w\-]+)\.([\w\-]+)\.([\w\-]+)\.([\w\-#]+)\.([\w\-]+)$"
)
_ETH_QUEUE1 = re.compile(r"([\w\-]*)queue_([0-9]+)_([\w\-]+)$")
_ETH_QUEUE2 = re.compile(r"([\w\-.]*)(tx|rx)([-_]?)([0-9]+)([._])([\w\-]+)$")
_ETH_TC = re.compile(r"([\w\-.]*)(tc)([-_]?)([0-9]+)([._])([\w\-]+)$")
_ETH_CH = re.compile(r"(ch)([0-9]+)([._])([\w\-]+)$")
_HAPROXY = re.compile(r"\[([\w\-=]+),([\w\-=]+)\]$")


def _add_tag(tags: dict[str, str], k: str | None, v: str | None) -> None:
    if k and k.strip() and v and v.strip():
        tags[k.replace("=", ":").strip()] = v.replace("=", ":").strip()


def _add_tag_kv(tags: dict[str, str], kv: str | None) -> None:
    if kv and kv.strip():
        parts = kv.split("=")
        if len(parts) == 2:
            _add_tag(tags, parts[0], parts[1])


def to_put_lines(
    md: MetricData, additional_tags: dict[str, str] | None = None
) -> list[str]:
    """MetricData -> ``put`` lines with the reference's naming rules.

    One line per value pair; tags render TreeMap-sorted and the metric's
    spaces fold to underscores (CollectDPluginParent.java:339-357).
    Metric/tag exclusions stay a DataFrame concern downstream
    (operators/exclusions.apply_exclusions — the engine-side analogue of
    the plugin's Exclusions files).
    """
    tags: dict[str, str] = {}
    host = md.host or ""
    dot = host.find(".")
    _add_tag(tags, "host", host[:dot] if dot != -1 else host)
    first_label = host.split(".")[0]
    n_idx = first_label.rfind("n")
    if n_idx != -1:
        _add_tag(tags, "rack", first_label[:n_idx])
    for k, v in (additional_tags or {}).items():
        _add_tag(tags, k, v)

    plugin = md.plugin or ""
    plugin_instance = md.plugin_instance or ""
    typ = md.type or ""
    type_instance = md.type_instance or ""
    values = list(md.value_pairs)
    metric = ""

    if plugin == "statsd":
        instance = None
        default_case = False
        if not type_instance.startswith("nsq"):
            parts = type_instance.split(".")
            if len(parts) >= 4 and parts[0] in _HADOOP_CONTEXTS:
                # Hadoop Metrics2 StatsDSink without the host name:
                # serviceName.contextName.recordName.metricName
                instance = parts[0]
                context = parts[1]
                first = type_instance.find(".")
                last = type_instance.rfind(".")
                metric_name = type_instance[last + 1 :]
                record = type_instance[first + 1 : last]
                metric = f"statsd.{context}."
                for split in record.split("."):
                    if split.lower() in (context.lower(), instance.lower()):
                        continue
                    if split.startswith("NNTopUserOpCounts") and "windowMs=" in split:
                        metric += "NNTopUserOpCounts."
                        _add_tag_kv(tags, split[split.index("windowMs=") :])
                    elif "=" in split:
                        _add_tag_kv(tags, split)
                    else:
                        _add_tag(tags, "record", split)
                metric += metric_name
            elif len(parts) >= 2 and parts[1] == "dwquery":
                # Datawave QueryIterator metrics: first part is queryId
                metric = "statsd." + type_instance[type_instance.find(".") + 1 :]
                _add_tag(tags, "queryId", parts[0])
            elif len(parts) >= 1:
                # EtsyStatsD: metric.(tagName.tagValue)*
                metric = f"statsd.{parts[0]}"
                for x in range(1, len(parts) - 1, 2):
                    _add_tag(tags, parts[x], parts[x + 1])
            else:
                default_case = True
        else:
            if m := _STATSD_3.match(type_instance):
                metric = f"statsd.nsq.{m.group(2)}.{m.group(3)}"
            elif m := _STATSD_4.match(type_instance):
                metric = f"statsd.nsq.{m.group(2)}.{m.group(4)}"
                instance = m.group(3)
            elif m := _STATSD_6.match(type_instance):
                metric = f"statsd.nsq.{m.group(4)}.{m.group(6)}"
                instance = m.group(5)
            else:
                default_case = True
        if default_case:
            period = type_instance.find(".")
            if period == -1:
                metric = f"statsd.{type_instance}"
            else:
                instance = type_instance[:period]
                metric = f"statsd.{type_instance[period + 1 :]}"
        if instance is not None:
            _add_tag(tags, "instance", instance)
    elif plugin == "ethstat":
        metric = "sys.ethstat."
        if m := _ETH_QUEUE1.match(type_instance):
            metric += f"{m.group(1)}queue_{m.group(3)}"
            _add_tag(tags, "queue", m.group(2))
        elif m := _ETH_QUEUE2.match(type_instance):
            metric += f"{m.group(1)}{m.group(2)}_queue_{m.group(6)}"
            _add_tag(tags, "queue", m.group(4))
        elif m := _ETH_TC.match(type_instance):
            metric += f"{m.group(1)}{m.group(2)}{m.group(5)}{m.group(6)}"
            _add_tag(tags, "trafficClass", m.group(4))
        elif m := _ETH_CH.match(type_instance):
            metric += f"{m.group(1)}_{m.group(4)}"
            _add_tag(tags, "channel", m.group(2))
        else:
            metric += type_instance
        _add_tag(tags, "instance", plugin_instance)
    elif plugin == "hddtemp":
        metric = f"sys.hddtemp.{typ}"
        _add_tag(tags, "instance", type_instance)
    elif plugin == "smart":
        code = -1
        name = None
        if type_instance.startswith("attribute-"):
            code = int(type_instance[type_instance.index("-") + 1 :])
            name = SMART_ATTRIBUTES.get(code)
        if code == -1:
            metric = f"sys.smart.{type_instance or typ}"
        else:
            metric = f"sys.smart.{name}"  # unknown id renders 'None' loudly
            _add_tag(tags, "code", str(code))
        _add_tag(tags, "instance", plugin_instance)
    elif plugin == "sensors":
        if type_instance.startswith("temp"):
            _add_tag(tags, "instance", type_instance[4:])
        metric = f"sys.sensors.{typ}.{plugin_instance}"
    elif plugin == "haproxy":
        metric = f"sys.haproxy.{type_instance}"
        if m := _HAPROXY.match(plugin_instance):
            _add_tag_kv(tags, m.group(1))
            _add_tag_kv(tags, m.group(2))
    elif plugin in ("ipmi", "snmp"):
        metric = f"sys.{plugin}.{typ}"
        _add_tag(tags, "instance", type_instance.replace(" ", "_"))
    elif plugin == "load":
        metric = f"sys.load.{plugin}.{typ}"
        # 1/5/15-min triple: keep the 1-min value, Timely downsamples
        values = values[:1]
    elif plugin == "GenericJMX":
        metric = f"sys.{plugin}.{typ}.{type_instance}"
        inst_split = plugin_instance.split("-")
        if inst_split and inst_split[0]:
            _add_tag(tags, "instance", inst_split[0].replace(" ", "_"))
        if len(inst_split) > 1:
            _add_tag(tags, "name", inst_split[1].replace(" ", "_"))
    else:
        if typ and type_instance and plugin and plugin_instance:
            metric = f"sys.{plugin}.{typ}.{type_instance}"
            _add_tag(tags, "instance", plugin_instance.replace(" ", "_"))
        elif typ and type_instance and plugin:
            metric = f"sys.{plugin}.{typ}.{type_instance}"
        elif typ and plugin and plugin_instance:
            metric = f"sys.{plugin}.{typ}"
            _add_tag(tags, "instance", plugin_instance.replace(" ", "_"))
        elif typ and plugin:
            metric = f"sys.{plugin}.{typ}"
        else:
            return []  # unhandled metric: dropped, like the WARN path

    metric = metric.replace(" ", "_")
    out: list[str] = []
    for value, sample_type in values:
        _add_tag(tags, "sampleType", sample_type)
        if not metric or md.timestamp is None or value is None:
            continue
        tag_str = " ".join(f"{k}={v}" for k, v in sorted(tags.items()))
        out.append(f"put {metric} {md.timestamp} {java_double_str(value)} {tag_str}")
    return out


# ---------------------------------------------------------------------------
# Distributed decode (packet lakes / backfill)
# ---------------------------------------------------------------------------


def decode_collectd_df(
    packets: DataFrame,
    data_col: str = "data",
    additional_tags: dict[str, str] | None = None,
) -> DataFrame:
    """packets(data: binary) -> points, via the line-protocol parser.

    Arrow-batched ``mapInPandas`` emits put lines (one Python pass per
    packet, naming rules above), then ``parse_lines_df`` keeps the
    rest pure-Column — same composition as the reference, where the
    plugin writes lines into the put socket.
    """
    import pandas as pd

    from .lineprotocol import parse_lines_df

    tags = dict(additional_tags or {})

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines: list[str] = []
            for raw in pdf[data_col]:
                if raw is None:
                    continue
                for md in decode_packets(bytes(raw)):
                    lines.extend(to_put_lines(md, tags))
            yield pd.DataFrame({"value": lines})

    line_df = packets.mapInPandas(emit, "value string")
    return parse_lines_df(line_df)
