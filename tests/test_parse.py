"""Parser tests mirroring MetricParserTest / TagListParserTest
(client/src/test/java/timely/model/parse/*.java)."""

import pytest

from timely_spark.parse import DownsampleSpec, ParsedMetric, format_put_line, is_tag_regex, parse_put_line


def test_basic_put_line():
    m = parse_put_line("put sys.cpu.user 1447767913 1.0 tag1=value1 tag2=value2")
    assert m.metric == "sys.cpu.user"
    assert m.ts == 1447767913000  # seconds normalized to ms (Value.java:40-46)
    assert m.value == 1.0
    assert m.tags == {"tag1": "value1", "tag2": "value2"}
    assert m.viz is None


def test_ms_timestamp_not_scaled():
    m = parse_put_line("put m 1447767913000 2.5 a=b")
    assert m.ts == 1447767913000


def test_viz_tag_lifted():
    m = parse_put_line("put m 1447767913000 1.0 a=b viz=(A&B)")
    assert m.viz == "(A&B)"
    assert "viz" not in m.tags


def test_escaped_tag_values():
    m = parse_put_line(r"put m 1447767913000 1.0 k=va\,lue e\=q=x")
    assert m.tags == {"k": "va,lue", "e=q": "x"}


@pytest.mark.parametrize(
    "line",
    [
        "put m notanumber 1.0 a=b",  # non-numeric ts
        "put m 1447767913000 NOTNUM a=b" if False else "put m 1447767913000 xx a=b",
        "put m 1447767913000",  # missing value
        "get m 1 1.0",  # wrong verb
        "put m 1447767913000 1.0 noequals",  # tag without =
    ],
)
def test_malformed_lines_raise(line):
    with pytest.raises(ValueError):
        parse_put_line(line)


def test_roundtrip():
    m = ParsedMetric("m", 1447767913000, 2.0, {"a": "b"}, viz="A")
    assert parse_put_line(format_put_line(m)) == m


@pytest.mark.parametrize(
    "spec,period,agg",
    [
        ("1s-max", 1000, "max"),
        ("5m-avg", 300_000, "avg"),
        ("1h-sum", 3_600_000, "sum"),
        ("1d-count", 86_400_000, "count"),
        ("100ms-min", 100, "min"),
        ("1m-none", 60_000, "none"),
    ],
)
def test_downsample_spec(spec, period, agg):
    s = DownsampleSpec.parse(spec)
    assert (s.period_ms, s.aggregator) == (period, agg)


def test_downsample_spec_bad():
    for bad in ["5x-avg", "avg", "-5m-avg", "5m"]:
        with pytest.raises(ValueError):
            DownsampleSpec.parse(bad)


def test_regex_detection():
    # DataStore.java:860-862: not ^\w+$ => regex
    assert not is_tag_regex("value1")
    assert is_tag_regex(".*")
    assert is_tag_regex("value1|value2")
    assert is_tag_regex("h0.*")


def test_get_decode_reference_loaded_example():
    """HttpRequestDecoderIT.testQueryURIAllAnonAccess:499-545 — the
    reference's most loaded GET decode: rate options + two brace groups
    + a tsuid subquery on one URI. Group-1 entries carry groupBy=true in
    the reference and land in our grouping tags (same semantics);
    group-2 entries are where we diverge deliberately — the reference
    executes them as full grouping tags via addTag while declaring the
    first group groupBy, we honor the annotation and keep group 2
    predicate-only (plans/request.py docstring)."""
    from timely_spark.plans.request import parse_get_query

    req = parse_get_query(
        {
            "start": "1356998400",
            "end": "1356998460",
            "m": "sum:rate{false,1s,100,0}:sys.cpu.user{host=*}{rack=r1|r2}",
            "tsuid": "sum:000001000002000042,000001000002000043",
        }
    )
    assert req.start == 1_356_998_400_000  # s -> ms normalization
    assert req.end == 1_356_998_460_000
    assert len(req.queries) == 2

    first = req.queries[0]
    assert first.aggregator == "sum" and first.metric == "sys.cpu.user"
    assert first.rate and not first.rate_options.counter
    assert first.rate_options.interval_ms == 1000  # "1s"
    assert first.rate_options.counter_max == 100
    assert first.rate_options.reset_value == 0
    assert first.downsample is None
    assert first.tags == {"host": "*"}
    assert first.filters == {"rack": "r1|r2"}
    assert not first.tsuids

    second = req.queries[1]
    assert second.aggregator == "sum" and second.metric == ""
    assert second.tsuids == ["000001000002000042", "000001000002000043"]


def test_post_decode_rate_option_body():
    """HttpRequestDecoderIT.testQueryPostRateOption:778-815 — JSON body
    with rate + rateOptions + downsample."""
    from timely_spark.plans.request import QueryRequest

    req = QueryRequest.from_dict(
        {
            "start": 1447767369171,
            "queries": [
                {
                    "metric": "sys.cpu.user",
                    "aggregator": "sum",
                    "rate": True,
                    "rateOptions": {"counter": False},
                    "downsample": "30s-avg",
                }
            ],
        }
    )
    assert req.start == 1447767369171
    q = req.queries[0]
    assert q.metric == "sys.cpu.user" and q.aggregator == "sum"
    assert q.rate and not q.rate_options.counter
    assert q.downsample == "30s-avg"
