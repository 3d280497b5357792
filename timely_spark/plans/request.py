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

    @classmethod
    def from_dict(cls, d: dict) -> "SubQuery":
        ro = RateOptions.from_dict(d.get("rateOptions"))
        return cls(
            metric=d["metric"],
            aggregator=d.get("aggregator", "avg"),
            downsample=d.get("downsample"),
            tags=dict(d.get("tags", {})),
            rate=bool(d.get("rate", False)),
            rate_options=ro,
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
        return cls(
            start=start,
            end=end,
            queries=[SubQuery.from_dict(q) for q in d.get("queries", [])],
            ms_resolution=bool(d.get("msResolution", False)),
        )
