"""Property-based tests (hypothesis): operators vs plain-Python models.

Each property generates a whole dataset, runs ONE Spark job over it, and
compares against an independent Python model — so hypothesis shrinks over
data, while Spark invocations stay batched and fast.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from timely_spark.parse import DownsampleSpec, parse_put_line

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ------------------------------------------------------------------ parsers

_tag_key = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,8}", fullmatch=True)
# tag values may contain escaped '=' and ',' (TagListParser.java:20-33)
_tag_val = st.from_regex(r"[a-zA-Z0-9_.:/\\-]{1,12}", fullmatch=True)


@given(
    metric=st.from_regex(r"[a-zA-Z][a-zA-Z0-9_.]{0,20}", fullmatch=True),
    ts=st.integers(min_value=1_000_000_000_000, max_value=2_000_000_000_000),
    value=st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
    ),
    tags=st.dictionaries(_tag_key, _tag_val, min_size=0, max_size=4),
)
@settings(**SETTINGS)
def test_put_line_roundtrip(metric, ts, value, tags):
    """format -> parse is the identity (MetricParser.java:17-30)."""
    tag_str = " ".join(f"{k}={v}" for k, v in tags.items())
    line = f"put {metric} {ts} {value!r} {tag_str}".rstrip()
    if not tags:
        # reference requires at least one tag; parser tolerates none
        line = f"put {metric} {ts} {value!r}"
    p = parse_put_line(line)
    assert p.metric == metric
    assert p.ts == ts
    assert p.value == pytest.approx(value, rel=1e-12)
    assert {k: v for k, v in p.tags.items() if k != "viz"} == {
        k: v for k, v in tags.items() if k != "viz"
    }


@given(
    n=st.integers(min_value=1, max_value=10_000),
    unit=st.sampled_from(["ms", "s", "m", "h", "d"]),
    agg=st.sampled_from(["avg", "sum", "min", "max", "count", "dev", "none"]),
)
@settings(**SETTINGS)
def test_downsample_spec_parse(n, unit, agg):
    """'<n><unit>-<agg>' parses to exact milliseconds
    (DownsampleIterator.getTimeInMillis:161-169)."""
    ms = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}[unit]
    spec = DownsampleSpec.parse(f"{n}{unit}-{agg}")
    assert spec.period_ms == n * ms
    assert spec.aggregator == agg


# -------------------------------------------------------- bucket alignment


@given(
    start=st.integers(min_value=0, max_value=10_000_000),
    period=st.sampled_from([1000, 5000, 60_000, 300_000]),
    offsets=st.lists(
        st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=40
    ),
)
@settings(**SETTINGS)
def test_downsample_bucket_alignment(spark, start, period, offsets):
    """Bucket = start + floor((ts-start)/period)*period after the builder
    floors start to the period (Downsample.java:31-42,
    DataStore.java:693-695) — property-checked against integer math."""
    from pyspark.sql import functions as F

    from timely_spark.operators.downsample import downsample
    from timely_spark.parse import DownsampleSpec

    floored = start - (start % period)
    rows = [("m", floored + o, 1.0, {}, None) for o in offsets]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, tags map<string,string>, viz string"
    )
    spec = DownsampleSpec(period_ms=period, aggregator="count")
    got = {
        r["bucket_ts"]: r["value"]
        for r in downsample(df, spec, start_ms=floored).collect()
    }
    expect: dict[int, float] = {}
    for o in offsets:
        b = floored + ((o // period) * period)
        expect[b] = expect.get(b, 0.0) + 1.0
    assert got == expect


# ------------------------------------------------------------------- rate


@given(
    series=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3_600),  # second offsets
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda p: p[0],
    )
)
@settings(**SETTINGS)
def test_rate_matches_model(spark, series):
    """rate = (v2-v1)/(t2-t1)*interval per consecutive pair
    (RateIterator.java:23-55), vs a Python diff model."""
    from timely_spark.operators.rate import RateOptions, rate

    base = 1_447_767_913_000
    pts = sorted((base + s * 1000, v) for s, v in series)
    df = spark.createDataFrame(
        [("m", t, v, {"h": "1"}, None) for t, v in pts],
        "metric string, ts long, value double, tags map<string,string>, viz string",
    )
    got = {
        r["ts"]: r["value"]
        for r in rate(df, RateOptions(interval_ms=1000)).collect()
    }
    expect = {
        t2: (v2 - v1) / (t2 - t1) * 1000.0
        for (t1, v1), (t2, v2) in zip(pts, pts[1:])
    }
    assert set(got) == set(expect)
    for t in expect:
        assert got[t] == pytest.approx(expect[t], rel=1e-9, abs=1e-9)


# ------------------------------------------------------------- visibility


def _viz_exprs():
    token = st.sampled_from(["A", "B", "C", "D"])

    def extend(children):
        return st.builds(
            lambda op, kids: (op, tuple(kids)),
            st.sampled_from(["&", "|"]),
            st.lists(children, min_size=2, max_size=3),
        )

    return st.recursive(token, extend, max_leaves=6)


def _render(node) -> str:
    if isinstance(node, str):
        return node
    op, kids = node
    return "(" + op.join(_render(k) for k in kids) + ")"


def _model_eval(node, auths) -> bool:
    if isinstance(node, str):
        return node in auths
    op, kids = node
    results = [_model_eval(k, auths) for k in kids]
    return all(results) if op == "&" else any(results)


@given(
    exprs=st.lists(_viz_exprs(), min_size=1, max_size=8),
    auths=st.sets(st.sampled_from(["A", "B", "C", "D"]), max_size=4),
)
@settings(**SETTINGS)
def test_viz_filter_matches_model(spark, exprs, auths):
    """The driver-side expression evaluator + isin filter agrees with a
    recursive boolean model on arbitrary &/| trees (ColumnVisibility
    semantics, F5)."""
    from timely_spark.functions.viz import viz_filter

    rows = [("m", 1, float(i), {}, _render(e)) for i, e in enumerate(exprs)]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, tags map<string,string>, viz string"
    )
    got = {r["value"] for r in viz_filter(df, auths).collect()}
    expect = {float(i) for i, e in enumerate(exprs) if _model_eval(e, auths)}
    assert got == expect


# ---------------------------------------------------------- dev aggregator


@given(
    values=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=2,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_dev_is_rms_not_stddev(spark, values):
    """Timely's dev = sqrt(sum(x^2)/(n-1)) — no mean subtraction
    (Dev.java:1-21). Property-check the exact formula."""
    from pyspark.sql import functions as F

    from timely_spark.operators.aggregators import agg_expr

    df = spark.createDataFrame([(v,) for v in values], "value double")
    got = df.agg(agg_expr("dev").alias("d")).collect()[0]["d"]
    expect = math.sqrt(sum(v * v for v in values) / (len(values) - 1))
    assert got == pytest.approx(expect, rel=1e-9)


# ------------------------------------------------------------------- FIR


@given(
    weights=st.lists(
        st.floats(min_value=-2, max_value=2, allow_nan=False), min_size=1, max_size=6
    ),
    values=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
)
@settings(**SETTINGS)
def test_fir_matches_convolution_model(spark, weights, values):
    """FIR output at point i = dot(weights, values[i-F+1..i]) once the
    window fills (TimeSeriesGroupingIterator.java:215-247), vs a plain
    Python sliding dot product."""
    from timely_spark.operators.fir import fir_filter

    base = 1_447_767_913_000
    df = spark.createDataFrame(
        [("m", base + i * 1000, v, {"h": "1"}, None) for i, v in enumerate(values)],
        "metric string, ts long, value double, tags map<string,string>, viz string",
    )
    got = {r["ts"]: r["value"] for r in fir_filter(df, weights).collect()}
    n = len(weights)
    expect = {}
    for i in range(n - 1, len(values)):
        window = values[i - n + 1 : i + 1]
        # same left-to-right add order as the lag-sum expression:
        # current term (weights[-1]) first, then older lags
        acc = window[-1] * weights[-1]
        for lag in range(1, n):
            acc += window[-1 - lag] * weights[-1 - lag]
        expect[base + i * 1000] = acc
    assert set(got) == set(expect)
    for t in expect:
        assert got[t] == pytest.approx(expect[t], rel=1e-9, abs=1e-9)


# --------------------------------------------------------------------------
# GET m= mini-language round-trip (QueryRequest.java:515-627)
# --------------------------------------------------------------------------

_ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,11}", fullmatch=True)
_metric = st.from_regex(r"[A-Za-z][A-Za-z0-9_.]{0,15}", fullmatch=True).filter(
    lambda s: not s.startswith("rate")
)
# tag values: literals or simple regexes; must avoid the structural
# chars , } = : the grammar reserves
_tagval = st.from_regex(r"[A-Za-z0-9_.*|()\[\]\\-]{1,12}", fullmatch=True)
_tags = st.dictionaries(_ident, _tagval, max_size=3)


@st.composite
def _rate_options(draw):
    from timely_spark.operators.rate import RateOptions

    return RateOptions(
        counter=draw(st.booleans()),
        interval_ms=draw(st.none() | st.integers(1, 10**6)),
        counter_max=draw(st.none() | st.integers(1, 10**9)),
        reset_value=draw(st.sampled_from([0]) | st.integers(1, 10**9)),
    )


@st.composite
def _subqueries(draw):
    from timely_spark.operators.rate import RateOptions
    from timely_spark.plans.request import SubQuery

    rate = draw(st.booleans())
    tags = draw(_tags)
    return SubQuery(
        metric=draw(_metric),
        aggregator=draw(st.sampled_from(["avg", "sum", "min", "max", "count", "dev", "none"])),
        downsample=draw(
            st.none()
            | st.builds(
                lambda n, u, a: f"{n}{u}-{a}",
                st.integers(1, 60),
                st.sampled_from(["s", "m", "h", "d"]),
                st.sampled_from(["avg", "sum", "min", "max", "count"]),
            )
        ),
        tags=tags,
        rate=rate,
        rate_options=draw(_rate_options()) if rate else RateOptions(),
        # the grammar can only express filters after a groupBy section
        filters=draw(_tags) if tags else {},
    )


@given(sub=_subqueries())
@settings(max_examples=300, deadline=None)
def test_m_language_roundtrip(sub):
    """parse(render(sub)) == sub over the whole documented grammar —
    aggregator, positional rate options, downsample, groupBy vs filter
    tag sections (QueryRequest.java:515-627)."""
    from timely_spark.plans.request import _parse_m, render_m

    m = render_m(sub)
    again = _parse_m(m)
    assert again == sub, m
    # and rendering is a fixed point
    assert render_m(again) == m


@pytest.mark.parametrize(
    "bad",
    [
        "sys.cpu.user",  # too few sections
        "avg:1m-avg:rate:extra:still:sys.cpu.user",  # too many sections
        "avg:sys.cpu.user{tag1=value1",  # unterminated tag section
        "avg:sys.cpu.user{}",  # empty tag group (tParts[1] AIOOBE parity)
        "avg:sys.cpu.user{noequals}",  # tag without '='
    ],
)
def test_m_language_rejects(bad):
    """Corner cases the reference rejects (exception paths in
    QueryRequest.parseQueryParameters)."""
    from timely_spark.plans.request import _parse_m

    with pytest.raises(ValueError):
        _parse_m(bad)


def test_m_language_reference_examples():
    """Literal shapes from the reference's own tests/docs."""
    from timely_spark.plans.request import _parse_m

    s = _parse_m("max:1s-max:sys.cpu.idle{tag3=value3}")
    assert (s.aggregator, s.downsample, s.metric) == ("max", "1s-max", "sys.cpu.idle")
    assert s.tags == {"tag3": "value3"} and not s.rate

    s = _parse_m("avg:rate{counter,1000ms,100,50}:m{a=b}{c=d}")
    assert s.rate and s.rate_options.counter
    assert s.rate_options.interval_ms == 1000
    assert s.rate_options.counter_max == 100 and s.rate_options.reset_value == 50
    assert s.tags == {"a": "b"} and s.filters == {"c": "d"}

    s = _parse_m("sum:rate:m")  # bare rate, defaults
    assert s.rate and s.rate_options.interval_ms is None


# ------------------------------------------------------------------ packing


@given(
    lens=st.lists(st.integers(0, 40), min_size=1, max_size=60),
    seq_len=st.integers(4, 64),
    bucket_docs=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_seq_pack_matches_python_scan(spark, lens, seq_len, bucket_docs):
    """seq_pack == a plain running-total model, for any doc lengths,
    sequence length, and bucket size (the two-phase scan must be
    invisible)."""
    from timely_spark.operators.pack import seq_pack

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(lens)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_units"], r["pack_first"], r["pack_last"], r["pack_offset"])
        for r in seq_pack(
            docs, seq_len=seq_len, bucket_docs=bucket_docs
        ).collect()
    }
    cum = 0
    for i, n in enumerate(lens):
        units = n + 1  # EOS
        expect = (
            units,
            cum // seq_len,
            (cum + units - 1) // seq_len,
            cum % seq_len,
        )
        assert got[i] == expect, (i, got[i], expect)
        cum += units


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
        min_size=1,
        max_size=12,
    ),
    chunk_tokens=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_chunk_dedup_matches_python_model(spark, docs, chunk_tokens):
    """chunk_dedup == a dict-of-sets Python model for any corpus and
    chunk size (distinct chunk hashes per doc; shared = seen in >1 doc)."""
    from timely_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_shared_chunks"])
        for r in chunk_dedup(df, chunk_tokens=chunk_tokens).collect()
    }
    # python model
    per_doc: dict[int, set] = {}
    for i, toks in enumerate(docs):
        chunks = {
            " ".join(toks[j : j + chunk_tokens])
            for j in range(0, len(toks), chunk_tokens)
        }
        if toks:
            per_doc[i] = chunks
    counts: dict[str, int] = {}
    for chunks in per_doc.values():
        for ch in chunks:
            counts[ch] = counts.get(ch, 0) + 1
    want = {
        i: (len(chunks), sum(1 for ch in chunks if counts[ch] > 1))
        for i, chunks in per_doc.items()
    }
    assert got == want


# ------------------------------------------------------------------ URLs


def _py_canonical(u: str) -> str:
    """Independent Python model of canonical_url's spec."""
    import re

    raw = u
    u = re.sub(r"#.*$", "", u)
    # degenerate guard: no scheme://host match -> input passes through
    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", u):
        return raw
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    hm = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", u)
    host = (hm.group(1).lower() if hm else "")
    host = re.sub(r"^www\.", "", host)
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    pm = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = pm.group(1) if pm else ""
    path = path or "/"
    if path != "/" and path.endswith("/"):
        path = re.sub(r"/$", "", path)
    qm = re.search(r"\?(.*)$", u)
    parts = [
        p
        for p in (qm.group(1) if qm else "").split("&")
        if p and not re.match(r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=", p)
    ]
    q = "&".join(sorted(parts))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


@given(
    urls=st.lists(
        st.one_of(
            # degenerate forms a real crawl emits: protocol-relative,
            # scheme-less, mailto, bare path — all must pass through
            st.sampled_from(
                [
                    "example.com/a",
                    "other.org/b?x=1#frag",
                    "mailto:user@example.com",
                    "/relative/path",
                    "//proto-relative.example.com/x",
                    "javascript:void(0)",
                    "",
                ]
            ),
            st.builds(
            lambda scheme, www, host, port, path, slash, params, frag: (
                f"{scheme}://{'www.' if www else ''}{host}"
                + (f":{port}" if port else "")
                + path
                + ("/" if slash else "")
                + ("?" + "&".join(params) if params else "")
                + (f"#{frag}" if frag is not None else "")
            ),
            scheme=st.sampled_from(["http", "https", "HTTP"]),
            www=st.booleans(),
            host=st.sampled_from(["Example.com", "a-b.org", "x.y.z.net"]),
            port=st.sampled_from([None, "80", "443", "8080"]),
            path=st.sampled_from(["", "/p", "/a/b.html", "/d/"]),
            slash=st.booleans(),
            params=st.lists(
                st.sampled_from(
                    ["a=1", "b=2", "utm_source=x", "gclid=z", "ref=r", "c=3"]
                ),
                max_size=4,
            ),
                frag=st.sampled_from([None, "sec", "sec?x=1", ""]),
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_canonical_url_matches_python_model(spark, urls):
    from timely_spark.operators.text import canonical_url

    df = spark.createDataFrame(list(enumerate(urls)), ["i", "url"])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _py_canonical(u), (u, got[i], _py_canonical(u))


# ------------------------------------------------------- global shuffle


@given(
    ids=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    docs_per_shard=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_global_shuffle_matches_python_sort(spark, ids, docs_per_shard):
    """The two-phase bucketed rank == a plain python sort by
    (md5(seed:id), id), for any id set and shard size."""
    import hashlib

    from timely_spark.operators.pack import global_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["pos"], r["shard"], r["pos_in_shard"])
        for r in global_shuffle(
            df, seed="s", docs_per_shard=docs_per_shard
        ).collect()
    }
    order = sorted(
        ids, key=lambda i: (hashlib.md5(f"s:{i}".encode()).hexdigest(), i)
    )
    want = {
        i: (p, p // docs_per_shard, p % docs_per_shard)
        for p, i in enumerate(order)
    }
    assert got == want


# --------------------------------------------------- token-budget subset


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                  # domain
            st.integers(min_value=0, max_value=100),      # score percent
            st.integers(min_value=0, max_value=50),       # tokens
        ),
        min_size=1,
        max_size=40,
    ),
    budget=st.integers(min_value=0, max_value=300),
)
@settings(**SETTINGS)
def test_token_budget_matches_python_greedy(spark, rows, budget):
    """The banded two-phase cumsum == a plain python per-domain greedy
    scan ordered by (score DESC, md5(id), id), for any score/token mix
    (including band-boundary ties and zero-token docs)."""
    import hashlib
    from collections import defaultdict

    from timely_spark.operators.mixture import token_budget_subset

    data = [
        (i, dom, sp / 100.0, n) for i, (dom, sp, n) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, source string, p_keep double, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["cum_tokens_before"], r["kept"])
        for r in token_budget_subset(df, budget=budget, bands=10).collect()
    }
    by_dom = defaultdict(list)
    for i, dom, s, n in data:
        by_dom[dom].append((i, s, n))
    want = {}
    for dom, docs in by_dom.items():
        docs.sort(
            key=lambda t: (
                -t[1],
                hashlib.md5(str(t[0]).encode()).hexdigest(),
                t[0],
            )
        )
        cum = 0
        for i, _s, n in docs:
            want[i] = (cum, cum < budget)
            cum += n
    assert got == want


# ----------------------------------------------------------- WARC parser


@given(
    records=st.lists(
        st.tuples(
            st.from_regex(r"https?://[a-z]{1,8}\.example\.com/[a-z0-9]{0,10}", fullmatch=True),
            st.binary(max_size=200),
        ),
        min_size=1,
        max_size=6,
    ),
    gzip_members=st.booleans(),
    cut=st.integers(min_value=0, max_value=10_000),
)
@settings(**SETTINGS)
def test_warc_parser_roundtrip_and_truncation(records, gzip_members, cut):
    """make_warc -> parse_warc_records is the identity on any record set
    (arbitrary binary bodies, both layouts), and a truncated payload
    never raises — it yields a prefix of the records."""
    from timely_spark.sources.corpus import make_warc, parse_warc_records

    payload = make_warc(records, gzip_members=gzip_members)
    parsed = list(parse_warc_records(payload))
    assert len(parsed) == len(records)
    http_prefix = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    for (uri, body), (headers, got) in zip(records, parsed):
        assert headers["warc-target-uri"] == uri
        assert headers["warc-type"] == "response"
        assert got == http_prefix + body
    # truncation tolerance: parse of any prefix yields a record prefix
    part = list(parse_warc_records(payload[: min(cut, len(payload))]))
    assert len(part) <= len(records)
    for (uri, _b), (headers, _g) in zip(records, part):
        assert headers["warc-target-uri"] == uri


# ------------------------------------------------------------------ bloom


@given(
    data=st.lists(
        st.text(alphabet="abcdefgh ", min_size=8, max_size=60),
        min_size=1,
        max_size=12,
    ),
    split=st.integers(min_value=0, max_value=11),
    fpp=st.sampled_from([0.2, 0.01]),
)
@settings(**SETTINGS)
def test_bloom_decontaminate_never_false_negative(spark, data, split, fpp):
    """For ANY corpus/bench split and fpp, bloom + confirm-join output
    equals the exact operator's output exactly — the no-false-negative
    guarantee that makes the two interchangeable."""
    from timely_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    rows = [(i, t) for i, t in enumerate(data)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench_rows = rows[: max(1, split % (len(rows) + 1))]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    want = sorted(map(tuple, ngram_decontaminate(docs, bench, n=3).collect()))
    got = sorted(
        map(tuple, bloom_decontaminate(docs, bench, n=3, fpp=fpp).collect())
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab \n\ré", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_dedup_lines_matches_python_model(spark, texts):
    """dedup_lines == the obvious pure-Python first-occurrence model on
    arbitrary text (empty lines, \\r remnants, unicode)."""
    from timely_spark.operators.text import dedup_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    d = dedup_lines("text")
    got = {
        r["doc_id"]: (r["c"], r["n"], r["rm"])
        for r in docs.select(
            "doc_id", d["cleaned"].alias("c"), d["n_lines"].alias("n"),
            d["n_removed"].alias("rm"),
        ).collect()
    }
    for i, t in enumerate(texts):
        lines = t.split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert got[i] == ("\n".join(kept), len(lines), len(lines) - len(kept))


@given(
    ref_texts=st.lists(
        st.text(alphabet="ab c1'", min_size=2, max_size=30),
        min_size=1,
        max_size=5,
    ),
    doc_texts=st.lists(
        st.text(alphabet="ab c1'", min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    ),
)
@settings(**SETTINGS)
def test_lm_perplexity_matches_python_model(spark, ref_texts, doc_texts):
    """String-mode lm_log_ppl equals an independent pure-Python Lidstone
    bigram model on arbitrary text (apostrophes, digits, empty docs) —
    or raises the documented error when the reference has no positions."""
    import math
    import re

    from timely_spark.operators.perplexity import lm_log_ppl

    tok = lambda t: [x for x in re.split(r"[^a-z0-9']+", t.lower()) if x]
    ref_pos = [(v, w) for t in ref_texts for v, w in zip(tok(t), tok(t)[1:])]
    ref = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ref_texts)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        list(enumerate(doc_texts)), "doc_id long, text string"
    )
    if not ref_pos:
        with pytest.raises(ValueError, match="no scoring positions"):
            lm_log_ppl(docs, ref).collect()
        return
    from collections import Counter

    c2, c1, vocab = Counter(), Counter(), set()
    for v, w in ref_pos:
        c2[(v, w)] += 1
        c1[v] += 1
        vocab.update((v, w))
    V = len(vocab)
    out = {r["doc_id"]: r for r in lm_log_ppl(docs, ref).collect()}
    for i, t in enumerate(doc_texts):
        ts = tok(t)
        lps = [
            math.log((c2[(v, w)] + 1.0) / (c1[v] + 1.0 * V))
            for v, w in zip(ts, ts[1:])
        ]
        want = round(-sum(lps) / len(lps), 4) if lps else 0.0
        assert out[i]["n_pos"] == len(lps)
        assert abs(out[i]["log_ppl"] - want) < 1e-9


@given(
    buckets=st.lists(
        st.tuples(
            st.sampled_from([-1, 0, 1]),          # dd_sign
            st.integers(min_value=-40, max_value=40),  # dd_idx
            st.integers(min_value=1, max_value=9),     # cnt
        ),
        min_size=1,
        max_size=12,
    ),
    q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_ddsketch_quantile_walk_matches_python_model(spark, buckets, q):
    """The value-ordered cumulative walk + rank selection equals a
    brute-force Python model that materializes every represented value
    and indexes the exact rank — for ANY (sign, idx, cnt) sketch."""
    from timely_spark.operators.rollup import DD_GAMMA, ddsketch_quantile

    # collapse duplicate (sign, idx) buckets like a real sketch would
    agg = {}
    for sgn, idx, cnt in buckets:
        key = (sgn, idx if sgn else 0)
        agg[key] = agg.get(key, 0) + cnt
    rows = [("m", 0, sgn, idx, cnt) for (sgn, idx), cnt in agg.items()]
    partials = spark.createDataFrame(
        rows,
        "metric string, bucket_ts long, dd_sign int, dd_idx int, cnt long",
    )
    pcol = f"p{int(round(q * 100)):02d}"
    got = ddsketch_quantile(partials, 1000, 1000, qs=(q,)).collect()[0]

    rep = lambda sgn, idx: (
        0.0 if sgn == 0 else sgn * (2.0 * DD_GAMMA ** idx / (DD_GAMMA + 1.0))
    )
    vals = sorted(
        v
        for (sgn, idx), cnt in agg.items()
        for v in [rep(sgn, idx)] * cnt
    )
    import math

    want = round(vals[math.floor(q * (len(vals) - 1))] + 0.0, 4)
    assert got["n"] == len(vals)
    assert got[pcol] == pytest.approx(want, abs=1e-9)


# ------------------------------------------------ stride-1 substring dedup


def _py_span_model(docs: list[tuple[int, list[str]]], window: int):
    """Independent Python model of repeated_span_stats AND the rewrite's
    keeper rule: dict id -> (n_tokens, spans[(s, e, is_first)]) where a
    span's is_first means it holds the globally-first occurrence of at
    least one of its member windows."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for did, toks in docs:
        for p in range(len(toks) - window + 1):
            occ.setdefault(tuple(toks[p : p + window]), []).append((did, p))
    dup_pos: dict[int, list[tuple[int, bool]]] = {}
    for w, places in occ.items():
        if len(places) > 1:
            first = min(places)
            for did, p in places:
                dup_pos.setdefault(did, []).append((p, (did, p) == first))
    out = {}
    for did, toks in docs:
        spans = []
        for p, isf in sorted(dup_pos.get(did, [])):
            if spans and p <= spans[-1][1] + 1:
                s, e, f = spans[-1]
                spans[-1] = (s, max(e, p + window - 1), f or isf)
            else:
                spans.append((p, p + window - 1, isf))
        out[did] = (len(toks), spans)
    return out


_doc_tokens = st.lists(
    st.sampled_from([f"w{i}" for i in range(8)]),  # tiny vocab => repeats
    min_size=0,
    max_size=24,
)


@given(docs=st.lists(_doc_tokens, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_substring_stats_and_rewrite_match_model(spark, docs):
    """repeated_span_stats and substring_dedup_rewrite vs the
    independent Python model, over adversarial tiny-vocab corpora where
    within-doc repeats, overlapping windows, and cross-doc claims all
    occur: span counts, duplicated token mass, and the rewrite's
    removed-token mass (non-keeper span lengths) must agree exactly."""
    import hashlib

    from timely_spark.operators.dedup import (
        repeated_span_stats,
        substring_dedup_rewrite,
    )

    W = 4
    data = [(i, toks) for i, toks in enumerate(docs)]
    model = _py_span_model(data, W)
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in data],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in repeated_span_stats(df, window=W).collect()}
    rewr = {r["doc_id"]: r for r in substring_dedup_rewrite(df, window=W).collect()}
    for did, toks in data:
        nt, spans = model[did]
        assert stats[did]["n_tokens"] == nt
        assert stats[did]["n_dup_spans"] == len(spans), (did, spans)
        dup_toks = sum(e - s + 1 for s, e, _ in spans)
        assert stats[did]["dup_tokens"] == dup_toks
        removed = sorted(
            (s, e) for s, e, isf in spans if not isf
        )
        n_removed = sum(e - s + 1 for s, e in removed)
        assert rewr[did]["n_removed_tokens"] == n_removed, (did, spans)
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i <= e for s, e in removed)
        ]
        want_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert rewr[did]["dedup_md5"] == want_md5, (did, spans)


@given(
    docs=st.lists(_doc_tokens, min_size=1, max_size=6),
    seps=st.lists(st.sampled_from([" ", ", ", "; ", " -- ", "!\n"]),
                  min_size=1, max_size=8),
    cases=st.lists(st.sampled_from(["lower", "upper", "title"]),
                   min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_excise_original_text_matches_model(spark, docs, seps, cases):
    """excise_spans_original_text vs the model: documents rendered with
    varied casing and punctuation separators (so token->char mapping is
    non-trivial), expected output built from char offsets tracked
    INDEPENDENTLY at construction time — every non-keeper span's exact
    character range disappears, everything else stays byte-verbatim."""
    from timely_spark.operators.dedup import excise_spans_original_text

    W = 4
    data = [(i, toks) for i, toks in enumerate(docs)]
    model = _py_span_model(data, W)

    def surface(tok, j):
        mode = cases[j % len(cases)]
        return tok.upper() if mode == "upper" else (
            tok.capitalize() if mode == "title" else tok
        )

    rendered = {}
    offsets = {}  # did -> [(start, end) per token]
    for did, toks in data:
        parts, offs, pos = [], [], 0
        for j, t in enumerate(toks):
            s = surface(t, j)
            offs.append((pos, pos + len(s)))
            parts.append(s)
            pos += len(s)
            sep = seps[(did + j) % len(seps)]
            parts.append(sep)
            pos += len(sep)
        rendered[did] = "".join(parts)
        offsets[did] = offs
    df = spark.createDataFrame(
        [(did, rendered[did]) for did, _ in data], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in excise_spans_original_text(df, window=W).collect()}
    for did, toks in data:
        _, spans = model[did]
        removed = sorted((s, e) for s, e, isf in spans if not isf)
        text = rendered[did]
        if not removed:
            assert got[did]["text"] == text
            assert not got[did]["excised"]
            continue
        pieces, prev = [], 0
        for s, e in removed:
            cs, ce = offsets[did][s][0], offsets[did][e][1]
            pieces.append(text[prev:cs])
            prev = max(prev, ce)
        pieces.append(text[prev:])
        assert got[did]["text"] == "".join(pieces), (did, removed)
        assert got[did]["excised"]


# ------------------------------------------------------------- collectd wire

_cd_text = st.from_regex(r"[a-zA-Z0-9_.\- ]{1,24}", fullmatch=True)


@given(
    host=_cd_text,
    plugin=_cd_text,
    plugin_instance=st.one_of(st.just(""), _cd_text),
    type_=_cd_text,
    type_instance=st.one_of(st.just(""), _cd_text),
    time_ms=st.integers(min_value=1, max_value=4_000_000_000_000),
    values=st.lists(
        st.integers(min_value=0, max_value=3).flatmap(
            lambda k: st.tuples(
                st.floats(
                    allow_nan=False,
                    allow_infinity=False,
                    # COUNTER/ABSOLUTE are unsigned on the wire; the
                    # encoder rejects negatives loudly (tested below)
                    min_value=0.0 if k in (0, 3) else -1e15,
                    max_value=1e15,
                ),
                st.just(k),
            )
        ),
        min_size=1,
        max_size=5,
    ),
)
@settings(**SETTINGS)
def test_collectd_encode_decode_roundtrip(
    host, plugin, plugin_instance, type_, type_instance, time_ms, values
):
    """encode -> decode is the identity over the whole ValueList space
    (collectd's part-framed wire format; the encoder and decoder are
    independently written, sources/collectd.py). Non-gauge kinds carry
    integers on the wire, so their floats are truncated going in."""
    from timely_spark.sources.collectd import decode_packets, encode_value_list

    pkt = encode_value_list(
        host=host,
        time_ms=time_ms,
        plugin=plugin,
        plugin_instance=plugin_instance,
        type=type_,
        type_instance=type_instance,
        values=values,
        hr_time=True,
    )
    mds = decode_packets(pkt)
    assert len(mds) == 1
    md = mds[0]
    assert (md.host, md.plugin, md.plugin_instance, md.type, md.type_instance) == (
        host, plugin, plugin_instance, type_, type_instance
    )
    assert md.timestamp == time_ms  # HR 2^-30 s units round-trip exactly
    kinds = {0: "COUNTER", 1: "GAUGE", 2: "DERIVE", 3: "ABSOLUTE"}
    for (got_v, got_k), (v, k) in zip(md.value_pairs, values):
        assert got_k == kinds[k]
        if k == 1:
            assert got_v == v  # doubles are bit-exact on the wire
        else:  # integer kinds truncate toward zero going in
            assert got_v == float(int(v))


@given(
    data=st.binary(min_size=0, max_size=200),
)
@settings(**SETTINGS)
def test_collectd_decoder_total_on_noise(data):
    """decode_packets never raises on arbitrary bytes (the ingest
    fire-and-forget contract), and the sniff never claims a put line."""
    from timely_spark.sources.collectd import decode_packets, is_collectd_packet

    decode_packets(data)  # must not raise
    assert not is_collectd_packet(b"put " + data)


def test_collectd_encoder_rejects_negative_unsigned():
    from timely_spark.sources.collectd import encode_value_list

    with pytest.raises(ValueError, match="must be >= 0"):
        encode_value_list(
            host="h", time_ms=1, plugin="p", type="t",
            values=[(-1.0, 0)], hr_time=True,
        )


# --------------------------------------------------- hashed text embedding


@given(docs=st.lists(_doc_tokens, min_size=1, max_size=5))
@settings(**SETTINGS)
def test_hashed_text_embedding_matches_model(spark, docs):
    """hashed_text_embedding vs an independent Python model of the
    md5-sign arithmetic: exact integer norm2 and bit-exact normalized
    coordinates for every doc, including zero-token docs."""
    import hashlib
    import math

    from timely_spark.operators.similarity import hashed_text_embedding

    DIM = 32
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hashed_text_embedding(df, dim=DIM).collect()}
    for did, toks in enumerate(docs):
        s = [0] * DIM
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for d in range(DIM):
                s[d] += 1 - 2 * ((h >> d) & 1)
        n2 = sum(x * x for x in s)
        assert got[did]["norm2"] == n2, (did, toks)
        if n2 == 0:
            assert set(got[did]["embedding"]) == {0.0}
        else:
            root = math.sqrt(float(n2))
            for d in range(DIM):
                assert got[did]["embedding"][d] == s[d] / root, (did, d)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),   # doc_id seed
            st.integers(min_value=0, max_value=5_000),    # weight
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    target=st.integers(min_value=0, max_value=50),
)
@settings(**SETTINGS)
def test_weighted_sample_matches_python_model(spark, rows, target):
    """weighted_hash_sample_flag vs a pure-Python reimplementation of
    the integer predicate (md5_32(id)*sum_w < target*w*2^32) — exact
    flag agreement for arbitrary ids/weights/targets, including
    all-zero weights (nothing sampled) and weights big enough that
    min(1, .) saturates."""
    import hashlib

    from timely_spark.operators.text import weighted_hash_sample_flag

    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = {
        r["doc_id"]: r["sampled"]
        for r in weighted_hash_sample_flag(df, "weight", target).collect()
    }
    total = sum(w for _i, w in rows)
    want = {}
    for i, w in rows:
        if total <= 0:
            want[i] = False
        else:
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            want[i] = h * total < target * w * (2**32)
    assert got == want
    # saturation sanity: a weight >= sum_w/target is always kept
    if total > 0 and target > 0:
        for i, w in rows:
            if w * target >= total:
                assert got[i]


@given(
    old=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.text(alphabet="abc", max_size=3),
        max_size=30,
    ),
    new=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.text(alphabet="abc", max_size=3),
        max_size=30,
    ),
)
@settings(**SETTINGS)
def test_snapshot_diff_matches_python_model(spark, old, new):
    """snapshot_diff vs the four-way set model over arbitrary id->text
    maps (hypothesis drives overlaps, disjoint ids, equal and unequal
    texts)."""
    from timely_spark.operators.versioning import snapshot_diff

    if not old and not new:
        return
    schema = "doc_id long, text string"
    odf = spark.createDataFrame(list(old.items()) or [], schema)
    ndf = spark.createDataFrame(list(new.items()) or [], schema)
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(odf, ndf).collect()
    }
    want = {}
    for i in set(old) | set(new):
        if i not in old:
            want[i] = "added"
        elif i not in new:
            want[i] = "removed"
        elif old[i] == new[i]:
            want[i] = "unchanged"
        else:
            want[i] = "changed"
    assert got == want


# ------------------------------------------------- persistent minhash index

# small alphabet + short docs => high natural collision rate, so random
# corpora genuinely exercise near-dup pairs across the split
_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@given(
    texts=st.lists(_doc, min_size=2, max_size=14),
    split_bits=st.integers(min_value=0, max_value=2**14 - 1),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_minhash_index_screen_matches_union_dedup(
    spark, tmp_path_factory, texts, split_bits, threshold
):
    """MinHashIndex.screen == minhash_dedup(corpus ∪ batch) restricted
    to cross pairs, for ARBITRARY corpora and splits — the identity the
    registry row pins on planted data, generalized: same banding, same
    verify join, byte-identical jaccard, through a save/load round
    trip. Docs assigned to the batch side by the random split mask;
    ids disjoint by construction."""
    from pyspark.sql import functions as F

    from timely_spark.operators.ann_index import MinHashIndex
    from timely_spark.operators.dedup import minhash_dedup

    corpus_rows, batch_rows = [], []
    for i, t in enumerate(texts):
        if (split_bits >> i) & 1:
            batch_rows.append((1000 + i, t))
        else:
            corpus_rows.append((i, t))
    if not corpus_rows or not batch_rows:
        return
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    p = str(tmp_path_factory.mktemp("mh_prop"))
    MinHashIndex.build(
        corpus, threshold=threshold, num_hashes=32, bands=16
    ).save(p)
    got = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in MinHashIndex.load(spark, p).screen(batch).collect()
    )
    union = corpus.unionByName(batch)
    want = sorted(
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b), round(r.jaccard, 9))
        for r in minhash_dedup(
            union, threshold=threshold, num_hashes=32, bands=16
        )
        .filter((F.col("id_a") < 1000) != (F.col("id_b") < 1000))
        .collect()
    )
    assert got == want
