"""The query IR — OpenTSDB-compatible request objects.

The reference has no logical plan: the JSON request object IS the IR
(common/.../api/request/timeseries/QueryRequest.java:219-380). We parse the
same JSON shape into dataclasses; plans/builder.py compiles them to
DataFrame plans (where Catalyst becomes the optimizer the reference never
had — SURVEY.md §3.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..operators.rate import RateOptions
from ..parse import DownsampleSpec


@dataclass
class SubQuery:
    metric: str
    aggregator: str = "avg"
    downsample: str | None = None  # e.g. "5m-avg"; None -> no downsample
    tags: dict[str, str] = field(default_factory=dict)  # value may be literal or regex
    rate: bool = False
    rate_options: RateOptions = field(default_factory=RateOptions)
    # non-grouping predicates (Filter.groupBy=false): filter the scan but
    # do NOT join the projected tag set / series identity
    filters: dict[str, str] = field(default_factory=dict)
    # tsuid list (GET ?tsuid=agg:id,id — QueryRequest.java:615-627);
    # carried for API parity, matched against series_id at execution
    tsuids: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "SubQuery":
        ro = RateOptions.from_dict(d.get("rateOptions"))
        # Go's json.Marshal emits nil maps/slices as literal null (the
        # Grafana backend's TimelyQuery.Tags when the form carried no
        # tags, datasource.go convertTimelyQuery) — `or {}` tolerates it
        tags = dict(d.get("tags") or {})
        filters: dict[str, str] = {}
        # JSON filters array (QueryRequest.Filter:138-171): groupBy=true
        # behaves as a queried tag (grouping + predicate), groupBy=false
        # as predicate-only. NOTE a reference quirk: DataStore.query only
        # consumes getTags() (DataStore.java:704-705,743) — parsed filters
        # never reach execution there. We honor the documented intent.
        for f in d.get("filters", []) or []:
            if f.get("groupBy"):
                tags[f["tagk"]] = f["filter"]
            else:
                filters[f["tagk"]] = f["filter"]
        return cls(
            metric=d["metric"],
            aggregator=d.get("aggregator", "avg"),
            downsample=d.get("downsample"),
            tags=tags,
            rate=bool(d.get("rate", False)),
            rate_options=ro,
            filters=filters,
            tsuids=list(d.get("tsuids", []) or []),
        )

    def downsample_spec(self) -> DownsampleSpec | None:
        return DownsampleSpec.parse(self.downsample) if self.downsample else None


@dataclass
class QueryRequest:
    start: int  # epoch ms (QueryRequest normalizes s->ms like Value.java:40-46)
    end: int
    queries: list[SubQuery]
    ms_resolution: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "QueryRequest":
        start, end = int(d["start"]), int(d.get("end", 0))
        if 0 < start < 1_000_000_000_000:
            start *= 1000
        if 0 < end < 1_000_000_000_000:
            end *= 1000
        if end <= 0:
            # QueryRequest.java:371 initializes end = System.currentTimeMillis();
            # an omitted end means "up to now" (the Grafana last-N-minutes shape),
            # not "ts <= 0" (which silently returns nothing).
            import time

            end = int(time.time() * 1000)
        return cls(
            start=start,
            end=end,
            queries=[SubQuery.from_dict(q) for q in d.get("queries", [])],
            ms_resolution=bool(d.get("msResolution", False)),
        )


def _parse_m(m: str) -> SubQuery:
    """One ``m=`` expression -> SubQuery, per the GET mini-language
    (QueryRequest.parseQueryParameters, QueryRequest.java:515-627):

        <agg>:[rate[{counter[,interval[,counterMax[,resetValue]]]}]:]
              [<downsample>:]<metric>[{groupTags}[{filterTags}]]

    The first ``{}`` group are groupBy filters (grouping tags), the
    optional second ``{}`` group are non-grouping tags.
    """
    parts = m.split(":")
    if len(parts) < 2:
        raise ValueError("Too few parameters for metric query")
    if len(parts) > 5:
        raise ValueError("Too many parameters for metric query")

    sub = SubQuery(metric="", aggregator=parts[0])
    for seg in parts[1:-1]:
        if seg.startswith("rate"):
            sub.rate = True
            if seg != "rate":
                # rate{counter,interval,counterMax,resetValue}
                opts = seg[5:-1].split(",")
                d: dict = {}
                for i, o in enumerate(opts):
                    if i == 0:
                        d["counter"] = o.endswith("counter")
                    elif i == 1 and o:
                        d["interval"] = o
                    elif i == 2 and o:
                        d["counterMax"] = int(o)
                    elif i == 3 and o:
                        d["resetValue"] = int(o)
                sub.rate_options = RateOptions.from_dict(d)
        else:
            sub.downsample = seg

    metric_and_tags = parts[-1]
    brace = metric_and_tags.find("{")
    if brace == -1:
        sub.metric = metric_and_tags
        return sub
    sub.metric = metric_and_tags[:brace]
    if not metric_and_tags.endswith("}"):
        raise ValueError("Tag section does not end with '}'")
    groups = metric_and_tags[brace:].split("}")
    for gi, grp in enumerate(g for g in groups if g):
        for tag in grp[1:].split(","):
            k, eq, v = tag.partition("=")
            if not eq or not k:
                # the reference indexes tParts[1] unconditionally -> a
                # tag without '=' (including the empty "{}" group) fails
                # the request (QueryRequest.java:592-607)
                raise ValueError(f"Invalid tag spec {tag!r}")
            if gi == 0:
                sub.tags[k] = v  # groupBy filters
            else:
                sub.filters[k] = v  # non-grouping tags
    return sub


def render_m(sub: SubQuery) -> str:
    """SubQuery -> the GET ``m=`` mini-language string (the inverse of
    ``_parse_m``; rate options use the reference's positional encoding
    ``rate{counter,interval,counterMax,resetValue}`` with empty slots for
    unset middle options, QueryRequest.java:536-560)."""
    parts = [sub.aggregator]
    if sub.rate:
        ro = sub.rate_options
        if ro == RateOptions():
            parts.append("rate")
        else:
            opts = [
                "counter" if ro.counter else "",
                f"{ro.interval_ms}ms" if ro.interval_ms is not None else "",
                str(ro.counter_max) if ro.counter_max is not None else "",
                str(ro.reset_value) if ro.reset_value else "",
            ]
            while opts and opts[-1] == "":
                opts.pop()
            parts.append("rate{" + ",".join(opts) + "}")
    if sub.downsample:
        parts.append(sub.downsample)
    tail = sub.metric
    if sub.tags:
        tail += "{" + ",".join(f"{k}={v}" for k, v in sub.tags.items()) + "}"
        if sub.filters:
            tail += "{" + ",".join(f"{k}={v}" for k, v in sub.filters.items()) + "}"
    parts.append(tail)
    return ":".join(parts)


def parse_get_query(params: dict) -> QueryRequest:
    """GET /api/query?start=..&end=..&m=..[&m=..][&tsuid=agg:id,..] ->
    QueryRequest (QueryRequest.java:515-627). ``params`` values may be a
    single string or a list (repeated params)."""

    def many(key: str) -> list[str]:
        v = params.get(key)
        if v is None:
            return []
        return v if isinstance(v, list) else [v]

    queries = [_parse_m(m) for m in many("m")]
    for ts in many("tsuid"):
        colon = ts.find(":")
        sub = SubQuery(
            metric="",
            aggregator=ts[:colon] if colon != -1 else "avg",
            tsuids=ts[colon + 1 :].split(","),
        )
        queries.append(sub)
    d: dict = {"start": int(many("start")[0]), "queries": []}
    if many("end"):
        d["end"] = int(many("end")[0])
    # flag param, both spellings (?ms / ?msResolution[=true]); bare
    # presence means true, like the OpenTSDB GET API
    flag = (many("msResolution") or many("ms") or [None])[0]
    if flag is not None:
        d["msResolution"] = flag == "" or flag.lower() == "true"
    req = QueryRequest.from_dict(d)
    req.queries = queries
    return req
