"""Parsers: line protocol, downsample spec, tag-predicate classification.

These reproduce the reference's ingest / query mini-languages:

- ``put <metric> <ts> <value> <k=v> ...`` line protocol
  (common/src/main/java/timely/model/parse/MetricParser.java:17-30) with
  ``=``/``,`` escaping in tag values (TagListParser.java:20-33).
- downsample spec ``"<duration><unit>-<aggregator>"``, units ms/s/m/h/d
  (server/.../sample/iterators/DownsampleIterator.java:161-185).
- tag-value regex detection: a value that is not ``^\\w+$`` is treated as a
  regex (DataStore.java:107,860-862); ``a|b`` alternation and ``.*``
  wildcard fall out of that rule.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_UNIT_MS = {"ms": 1, "s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}
# An optional third "-<fillpolicy>" segment (OpenTSDB "1m-avg-nan", sent by
# the Grafana datasource backend when a fill policy is configured,
# grafana/timely-datasource/backend/datasource.go:417-423) is accepted and
# ignored: the reference splits on "-" and reads only parts[0]/parts[1]
# (DownsampleIterator.java:167-175).
_SPEC_RE = re.compile(r"^(\d+)(ms|s|m|h|d)-(\w+?)(?:-\w+)?$")
_PLAIN_VALUE_RE = re.compile(r"^\w+$")


@dataclass
class DownsampleSpec:
    period_ms: int
    aggregator: str  # avg | sum | min | max | count | dev | none

    @classmethod
    def parse(cls, spec: str) -> "DownsampleSpec":
        m = _SPEC_RE.match(spec.strip())
        if not m:
            raise ValueError(f"bad downsample spec: {spec!r} (want e.g. '5m-avg')")
        n, unit, agg = m.groups()
        period = int(n) * _UNIT_MS[unit]
        if period <= 0:
            raise ValueError(f"non-positive downsample period in {spec!r}")
        return cls(period_ms=period, aggregator=agg.lower())


def is_tag_regex(value: str) -> bool:
    """True when a query tag value must be treated as a regex.

    Mirrors DataStore.java:860-862 — anything that is not a plain
    ``\\w+`` literal (so ``.*``, ``h0.*``, ``value1|value2``) is regex.
    """
    return _PLAIN_VALUE_RE.match(value) is None


@dataclass
class ParsedMetric:
    metric: str
    ts: int  # epoch ms
    value: float
    tags: dict[str, str] = field(default_factory=dict)
    viz: str | None = None


def _unescape_tag(s: str) -> str:
    return s.replace("\\,", ",").replace("\\=", "=")


_TAG_SPLIT_RE = re.compile(r"(?<!\\)=")


def parse_put_line(line: str) -> ParsedMetric:
    """Parse one ``put`` line. Raises ValueError on malformed input.

    Timestamps may be seconds or milliseconds; values < 10^12 are treated
    as seconds and normalized to ms (Value.java:40-46).
    """
    parts = line.strip().split(" ")
    if len(parts) < 4 or parts[0] != "put":
        raise ValueError(f"malformed put line: {line!r}")
    metric = parts[1]
    try:
        ts = int(parts[2])
    except ValueError as e:
        raise ValueError(f"non-numeric timestamp in {line!r}") from e
    if ts < 1_000_000_000_000:  # seconds -> ms normalization
        ts *= 1000
    try:
        value = float(parts[3])
    except ValueError as e:
        raise ValueError(f"non-numeric value in {line!r}") from e
    tags: dict[str, str] = {}
    viz: str | None = None
    for pair in parts[4:]:
        if not pair:
            continue
        kv = _TAG_SPLIT_RE.split(pair, maxsplit=1)
        if len(kv) != 2 or not kv[0]:
            raise ValueError(f"malformed tag {pair!r} in {line!r}")
        k, v = _unescape_tag(kv[0]), _unescape_tag(kv[1])
        if k == "viz":
            viz = v  # reserved tag, stripped from the tag set (MetricAdapter.java:152-167)
        else:
            tags[k] = v
    return ParsedMetric(metric=metric, ts=ts, value=value, tags=tags, viz=viz)


def format_put_line(m: ParsedMetric) -> str:
    """Inverse of parse_put_line (used by the load generator and tests)."""
    tags = dict(m.tags)
    if m.viz is not None:
        tags["viz"] = m.viz
    tag_str = " ".join(
        f"{k.replace('=', chr(92) + '=')}={v.replace('=', chr(92) + '=').replace(',', chr(92) + ',')}"
        for k, v in sorted(tags.items())
    )
    val = repr(m.value) if m.value != int(m.value) else str(int(m.value)) + ".0"
    return f"put {m.metric} {m.ts} {val} {tag_str}".rstrip()
