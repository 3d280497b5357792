"""timely_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
NationalSecurityAgency/timely (a secure time-series database: OpenTSDB-style
HTTP query API over Accumulo scan-time iterators), re-expressed as idiomatic
Spark DataFrame / SQL / Structured Streaming plans over time-partitioned
Parquet.

Layout
------
- ``model``      : the point schema (metric, ts, value, tags, viz) + adapters
- ``parse``      : line-protocol / downsample-spec / tag-predicate parsers
- ``functions``  : column-expression helpers (time bucketing, visibility)
- ``operators``  : downsample, rate, FIR filter, meta catalog, retention,
                   dedup, similarity search, text analysis, multimodal
- ``plans``      : OpenTSDB-style QueryRequest -> DataFrame builder
- ``sources``    : ingest (line protocol batch/stream) and the Parquet store
- ``streaming``  : subscriptions (tail-follow) and summarization job
- ``auth``       : login sessions, JWT, X509 DNs, proxied entity chains
- ``tls``        : one-way / two-way SSL contexts for every listener
- ``client``     : TCP/UDP/HTTP/WS-subscription client library
- ``http_facade``/``ws_facade``/``tcp_facade`` : the literal network
                   transports (HTTP API + CORS/HSTS/static, RFC 6455 WS
                   subscriptions, TCP/UDP put listeners)

Reference parity citations use ``file:line`` relative to the studied repo
(see SURVEY.md).
"""

__version__ = "0.1.0"
