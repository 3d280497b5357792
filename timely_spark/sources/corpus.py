"""Document-corpus sources: JSON-lines and WARC (ISO 28500).

Web-scale training corpora arrive as JSONL shards or WARC crawls
(CommonCrawl). Both readers land rows in the ``documents`` table shape
(doc_id, text, lang, source, n_chars) so every downstream operator
(dedup, screens, packing, ...) runs unchanged.

Scale notes:
- JSONL goes through ``spark.read.json`` — splittable, predicate-
  prunable, the native path.
- WARC is a concatenated-record format with no built-in Spark reader;
  records parse from whole files read as binary (``binaryFile``), with
  the gzip member-per-record variant handled via ``zlib``. Whole-file
  granularity means parallelism = number of WARC files — CommonCrawl
  ships ~1 GB segments by the tens of thousands, so file-level
  parallelism is the real-world unit; one segment must fit an executor.
- Document ids are content-derived (xxhash64 of source + position +
  text) so re-reading the same crawl yields the same ids on any cluster
  layout — the determinism contract every dedup/sampling op relies on.
"""

from __future__ import annotations

import io
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION_PREFIXES = (b"WARC/1.0", b"WARC/1.1")


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    source_field: str | None = None,
    default_source: str = "jsonl",
) -> DataFrame:
    """JSONL shards -> documents shape. Ids derive from (file, text)
    content hashing, not row order, so they are layout-stable."""
    from pyspark.sql import Window

    raw = spark.read.json(path)
    # existence-guard BOTH fields: a shard where no row carries the text
    # field infers no such column, and an unguarded F.col would raise an
    # unresolved-column AnalysisException instead of empty-text rows
    text = (
        F.coalesce(F.col(text_field).cast("string"), F.lit(""))
        if text_field in raw.columns
        else F.lit("")
    )
    src = (
        F.coalesce(F.col(source_field).cast("string"), F.lit(default_source))
        if source_field and source_field in raw.columns
        else F.lit(default_source)
    )
    base = raw.select(
        F.xxhash64(F.input_file_name(), text).alias("__h"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        src.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    # identical rows hash identically — disambiguate with a per-hash
    # row number so doc_id is UNIQUE (downstream joins key on it). The
    # copies are byte-identical, so which copy gets which sub-id is
    # immaterial; the id SET is layout-stable. Window partitions are
    # duplicate groups (tiny).
    rn = F.row_number().over(Window.partitionBy("__h").orderBy("__h"))
    return base.select(
        F.xxhash64(F.col("__h"), rn).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )


def parse_warc_records(payload: bytes):
    """Yield (headers: dict, body: bytes) per WARC record.

    Handles plain concatenated records and the per-record-gzip-member
    layout CommonCrawl uses (each record its own gzip stream). Pure
    stdlib; tolerant of trailing garbage (stops).
    """
    if payload[:2] == b"\x1f\x8b":
        # gzip members: decompress one member at a time
        out = []
        pos = 0
        while pos < len(payload) and payload[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                out.append(d.decompress(payload[pos:]))
            except zlib.error:
                break  # corrupted member: keep what decoded, stop here
            consumed = len(payload) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
        payload = b"".join(out)

    buf = io.BytesIO(payload)
    while True:
        line = buf.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(WARC_VERSION_PREFIXES):
            return  # desynchronized: stop rather than guess
        headers: dict[str, str] = {}
        terminated = False
        while True:
            h = buf.readline()
            if not h:
                break
            if h in (b"\r\n", b"\n"):
                terminated = True
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        if not terminated:
            return  # truncated mid-headers: never yield a half-parsed record
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        body = buf.read(length)
        if len(body) < length:
            return  # truncated mid-body: complete records only
        yield headers, body
        buf.readline()  # record separator CRLFs
        buf.readline()


_TAG_RE = r"<[^>]+>"


def read_warc_documents(
    spark: SparkSession, path: str, default_source: str = "warc",
    main_content: bool = False
) -> DataFrame:
    """WARC/WET files -> documents shape.

    ``response`` records (classic crawl WARCs) carry HTML: the HTTP
    header block is stripped and the body goes through tag-strip or the
    jusText-lite extractor. ``conversion`` records (WET — CommonCrawl's
    pre-extracted text sidecars, ISO 28500 §6.8) carry plain text
    already: no HTTP header, no markup — they bypass extraction and get
    only whitespace normalization. Other record types (warcinfo,
    request, metadata) are skipped.

    Whole files arrive via ``binaryFile``; records parse in an Arrow
    batch (one Python pass per file). ``main_content=False`` (default)
    keeps the naive tag-strip for response records;
    ``main_content=True`` runs the jusText-lite extractor
    (``operators.boilerplate.main_text``: block segmentation +
    link-density classification), dropping nav/footer/script junk —
    the curation-grade path. Ids hash (target-uri, position, RAW body)
    either way — layout-stable and extraction-version-independent.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                for i, (headers, body) in enumerate(
                    parse_warc_records(bytes(payload))
                ):
                    rtype = headers.get("warc-type")
                    if rtype not in ("response", "conversion"):
                        continue
                    uri = headers.get("warc-target-uri", "")
                    # strip the HTTP response header block if present —
                    # RESPONSE records only: a WET conversion body is
                    # already extracted text and may legitimately START
                    # with 'HTTP/' (e.g. an HTTP-tutorial page)
                    if rtype == "response" and body[:5] in (b"HTTP/",):
                        sep = body.find(b"\r\n\r\n")
                        if sep >= 0:
                            body = body[sep + 4 :]
                    text = body.decode("utf-8", "replace")
                    rows.append((fpath, uri, i, rtype == "response", text))
            yield pd.DataFrame(
                rows, columns=["path", "uri", "pos", "is_html", "raw"]
            )

    parsed = files.select("path", "content").mapInPandas(
        parse, "path string, uri string, pos int, is_html boolean, raw string"
    )
    plain = F.trim(F.regexp_replace("raw", r"\s+", " "))
    if main_content:
        from ..operators.boilerplate import main_text

        html_text = main_text("raw")
    else:
        html_text = F.trim(
            F.regexp_replace(F.regexp_replace("raw", _TAG_RE, " "), r"\s+", " ")
        )
    # WET conversion records are ALREADY extracted text: markup-strip
    # would eat literal angle-bracket content and jusText would misread
    # the blockless stream, so they take the plain path unconditionally
    text = F.when(F.col("is_html"), html_text).otherwise(plain)
    # file identity in the id: re-shipped duplicate segments must get
    # DISTINCT ids (downstream joins key on doc_id); stable for a fixed
    # directory layout, like the JSONL reader's input_file_name
    return parsed.select(
        F.xxhash64("path", "uri", "pos", "raw").alias("doc_id"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        # regexp_extract yields '' (not NULL) on no match — when() it
        F.when(
            F.regexp_extract("uri", r"https?://([^/]+)", 1) != "",
            F.regexp_extract("uri", r"https?://([^/]+)", 1),
        ).otherwise(F.lit(default_source)).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def make_warc(
    records: list[tuple[str, bytes]],
    gzip_members: bool = False,
    record_type: str = "response",
) -> bytes:
    """Build a WARC file for tests: one record per (uri, body), each
    optionally one gzip member (the CommonCrawl layout). ``response``
    records get an HTTP header block (crawl WARC shape);
    ``conversion`` records carry the body bare (WET shape)."""
    import gzip as _gzip

    out = []
    for uri, body in records:
        payload = body
        if record_type == "response":
            payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        rec = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {record_type}\r\n".encode()
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
