"""TimelyEngine — the user-facing facade.

Binds the whole engine together behind the reference's API surface so a
user of the reference can switch: ``put`` (ingest), ``query`` (the
OpenTSDB-style read, POST /api/query), ``suggest``, ``search_lookup``,
``metrics``, ``aggregators``, ``version``, ``cache_status``, plus the
maintenance entry points (retention, compaction) and subscriptions.

Reference endpoint inventory: SURVEY.md §2.8/§3; the annotated request
classes under common/src/main/java/timely/api/request/.
"""

from __future__ import annotations

import json
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import METRIC_SCHEMA
from .operators.exclusions import apply_exclusions
from .operators.meta import build_meta, metrics_dump, search_lookup, suggest
from .operators.retention import ageoff_filter, retention_delete_plan
from .parse import parse_put_line
from .plans.builder import run_query
from .plans.request import QueryRequest
from .plans.response import to_query_response
from .sources.lineprotocol import parse_lines_df
from .sources.store import compact_partitions, read_points, write_points

VERSION = "0.0.3"  # parity with VersionRequest.java


class _AllAuths:
    """Sentinel: explicitly bypass visibility enforcement (superuser scans,
    maintenance jobs). Distinct from ``None``/omitted, which fails CLOSED —
    the reference always applies the visibility filter, and an anonymous
    caller holds an empty auth set that can only read unlabeled data
    (AnonymousUserDetails / ConfigurableVisibilityFilter)."""

    def __repr__(self) -> str:  # pragma: no cover
        return "ALL_AUTHS"


ALL_AUTHS = _AllAuths()


class NoMatchingTagsError(ValueError):
    """A SubQuery matched zero series. The reference fails the whole
    request with HTTP 400 "No matching tags" (DataStore.java:939); the
    HTTP facade maps this exception onto that status. Library callers get
    the lenient empty-list behavior unless they pass ``strict=True``."""


class TimelyEngine:
    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        meta_path: str | None = None,
        default_visibility: str | None = None,
        metric_blocklist: list[str] | None = None,
        tag_strips: dict[str, list[str]] | None = None,
        ttls: dict[str, int] | None = None,
        default_ttl_ms: int | None = None,
        promote_tags: list[str] | None = None,
        bucket_metrics: int | None = None,
        series_table: str | None = None,
    ):
        self.spark = spark
        self.store_path = store_path
        # series-bucketed durable tier (sources/store.write_points_bucketed):
        # when named, points() reads this saveAsTable catalog table instead
        # of the partitioned-Parquet path, and ingest appends into it. The
        # materialized series_key column rides into the query pipeline, so
        # per-series window stages (rate W1) run with zero Exchange straight
        # through engine.query() — the 100x lever of SCALE.md §2 available
        # on the full request path, not just the operator API.
        self.series_table = series_table
        self.meta_path = meta_path or store_path.rstrip("/") + "_meta"
        self.default_visibility = default_visibility
        self.metric_blocklist = metric_blocklist or []
        self.tag_strips = tag_strips or {}
        self.ttls = ttls or {}
        self.default_ttl_ms = default_ttl_ms
        # hot-tag column promotion (SURVEY §4 / store.with_promoted_tags):
        # list the deployment's high-selectivity tag keys once at engine
        # construction; every write materializes them as pushdown columns
        self.promote_tags = promote_tags or []
        # metric-bucketed layout (>100k metric names, SCALE.md §1):
        # explicit for new stores, else discovered from the layout sidecar
        from .sources.store import read_layout

        sidecar = read_layout(store_path).get("bucket_metrics")
        if bucket_metrics is None:
            bucket_metrics = sidecar
        else:
            # an explicit bucket_metrics over an existing store with a
            # different layout would append metric_bucket=*/dt=* dirs next
            # to metric=*/dt=* ones; Spark partition discovery then fails
            # on conflicting partition columns and every read of the store
            # breaks. Validate against the sidecar / existing dirs instead.
            import glob
            import os

            existing = sidecar
            if existing is None and glob.glob(os.path.join(store_path, "metric=*")):
                existing = 0  # unbucketed partition dirs already present
            if existing is not None and existing != bucket_metrics:
                raise ValueError(
                    f"store {store_path!r} has layout bucket_metrics="
                    f"{existing or None}; refusing to write a mixed layout "
                    f"with bucket_metrics={bucket_metrics}"
                )
        self.bucket_metrics = bucket_metrics
        self._hot = None  # optional recent-window tier (enable_hot_cache)
        # distinct viz-expression catalog (sidecar of the meta side-write):
        # queries evaluate visibility against this driver-cached set instead
        # of a per-query distinct scan over the point store
        self._viz_path = self.meta_path.rstrip("/") + "_viz"
        self._viz_exprs: set[str] | None = None

    # ------------------------------------------------------------- ingest

    def put_lines(self, lines: Iterable[str]) -> int:
        """Ingest line-protocol strings (TCP/UDP put analogue, S1/S2).

        Returns the number of points stored. Fire-and-forget semantics on
        malformed lines (dropped), like TcpPutHandler.
        """
        df = self.spark.createDataFrame([(l,) for l in lines], ["value"])
        pts = parse_lines_df(df)
        return self._store(pts)

    def put_json(self, payloads: Iterable[str | dict]) -> int:
        """HTTP POST /api/put analogue (S3): JSON Metric objects
        {"metric": ..., "timestamp": ms, "value": v, "tags": {...}}."""
        rows = []
        for p in payloads:
            d = json.loads(p) if isinstance(p, str) else p
            tags = dict(d.get("tags", {}))
            viz = tags.pop("viz", None)
            ts = int(d["timestamp"])
            if ts < 1_000_000_000_000:
                ts *= 1000
            rows.append((d["metric"], ts, float(d["value"]), tags, viz))
        pts = self.spark.createDataFrame(rows, METRIC_SCHEMA)
        return self._store(pts)

    def put_flatbuffers(self, frames: Iterable[bytes]) -> int:
        """FlatBuffers Metrics-batch ingest (S1 binary variant,
        MetricsBufferDecoder.java:21-60): one frame per TCP read."""
        from .sources.flatbuf import parse_flatbuffers_df

        df = self.spark.createDataFrame(
            [(bytearray(f),) for f in frames], "payload binary"
        )
        return self._store(parse_flatbuffers_df(df))

    def _store(self, pts: DataFrame) -> int:
        pts = apply_exclusions(pts, self.metric_blocklist, self.tag_strips)
        if self.default_visibility:
            # default-visibility injection (DataStore.java:402-407)
            pts = pts.withColumn(
                "viz", F.coalesce(F.col("viz"), F.lit(self.default_visibility))
            )
        # localCheckpoint, not cache(): the batch may DERIVE from this very
        # store (e.g. the summarization write-back loop), and the append
        # below auto-invalidates any cache reading the store path — a plain
        # cache would then re-evaluate the batch against its own output
        # (observed as a duplicate 'sample' tag). Truncating lineage pins
        # the batch contents; it stays distributed (executor blocks).
        pts = pts.localCheckpoint(eager=True)
        # one stats job covers the emptiness check AND the hot tier's
        # window anchor, so the cache refresh below issues zero jobs
        stats = pts.agg(
            F.count(F.lit(1)).alias("n"), F.max("ts").alias("hi")
        ).collect()[0]
        n = stats["n"]
        if n:
            if self.series_table is not None:
                from .sources.store import write_points_bucketed

                write_points_bucketed(pts, self.series_table, mode="append")
            else:
                write_points(
                    pts,
                    self.store_path,
                    promote_tags=self.promote_tags or None,
                    bucket_metrics=self.bucket_metrics,
                )
            # meta side-write (DataStore.java:415-433)
            build_meta(pts).write.mode("append").parquet(self.meta_path)
            self._record_viz(pts)
            if self._hot is not None:
                # cache append analogue (DataStoreCache.store:635-644)
                self._hot.refresh(self._durable_points(), now_ms=stats["hi"])
        return n

    # ----------------------------------------------------------- hot tier

    def enable_hot_cache(
        self,
        window_ms: int = 2 * 3_600_000,
        non_cached_metrics: tuple[str, ...] | list[str] = (),
        max_unique_tag_sets: int | None = None,
    ) -> None:
        """Pin the trailing window in executor memory (the Gorilla-cache
        analogue, S7); queries transparently read cache+store hybrid
        (DataStore.java:655-690). ``non_cached_metrics`` /
        ``max_unique_tag_sets`` are the F9 admission controls
        (DataStoreCache.java:607-633, 355-372) — rejected metrics'
        recent rows route to the cold scan, results never change."""
        from .sources.hot_cache import HotCache

        self._hot = HotCache(
            self.spark,
            window_ms,
            non_cached_metrics=non_cached_metrics,
            max_unique_tag_sets=max_unique_tag_sets,
        )
        try:
            self._hot.refresh(self._durable_points())
        except Exception:
            pass  # empty store: first ingest will refresh

    def attach_hot_cache(self, cache) -> None:
        """Adopt an existing HotCache — the restart path: a cache
        restored from its S10 archive (HotCache.restore) serves this
        engine's hybrid reads without replaying ingest. An already
        attached/enabled cache is closed first so its pinned DataFrame
        does not linger in executor memory for the session lifetime."""
        if getattr(self, "_hot", None) is not None and self._hot is not cache:
            self._hot.close()
        self._hot = cache

    # -------------------------------------------------------------- reads

    def _durable_points(self) -> DataFrame:
        """The durable tier, whichever layout backs it: the series-bucketed
        catalog table (series_key column rides along) or the partitioned
        Parquet path."""
        if self.series_table is not None:
            return self.spark.table(self.series_table)
        return read_points(self.spark, self.store_path)

    def points(self, now_ms: int | None = None,
               dynamic_now: bool = False) -> DataFrame:
        """Stored points with the query-time age-off guard applied
        (DataStoreCache.java:747-750). ``now_ms`` is injectable so tests
        and replays can pin the clock; defaults to wall time.
        ``dynamic_now`` binds the clock as ``current_timestamp()`` so a
        LONG-LIVED frame (a registered SQL view) ages rows off at query
        time instead of freezing the registration-time clock."""
        df = self._durable_points()
        if self._hot is not None:
            df = self._hot.hybrid(df)
        if self.default_ttl_ms is not None:
            import time

            if dynamic_now:
                now = F.unix_millis(F.current_timestamp())
            else:
                now = now_ms if now_ms is not None else int(time.time() * 1000)
            df = ageoff_filter(
                df,
                now_ms=now,
                ttls=self.ttls,
                default_ttl_ms=self.default_ttl_ms,
            )
        return df

    def meta(self) -> DataFrame:
        m = self.spark.read.parquet(self.meta_path)
        return m.groupBy("metric", "tag_key", "tag_value").agg(
            F.max("last_seen").alias("last_seen")
        )

    def register_views(self, prefix: str = "timely", auths=None) -> list[str]:
        """Expose the lake to plain ``spark.sql``: temp views
        ``<prefix>_points`` and ``<prefix>_meta``. SQL users get the
        same Catalyst pushdown AND the same enforcement the query path
        gets: visibility is applied under ``auths`` with the fail-closed
        default (omitted = anonymous = unlabeled rows only; pass
        ``ALL_AUTHS`` to bypass explicitly, exactly like query()), and
        the age-off clock binds to current_timestamp() so the view ages
        rows off at QUERY time, not registration time. Returns the view
        names."""
        from .functions.viz import viz_filter

        names = [f"{prefix}_points", f"{prefix}_meta"]
        pts = self.points(dynamic_now=True)
        if auths is not ALL_AUTHS:  # the explicit bypass, like query()
            known = self._viz_known()
            pts = viz_filter(
                pts,
                auths or set(),
                known_exprs=sorted(known) if known is not None else None,
            )
        pts.createOrReplaceTempView(names[0])
        self.meta().createOrReplaceTempView(names[1])
        return names

    def query(self, request: dict, auths=None, strict: bool = False) -> list[dict]:
        """POST /api/query: OpenTSDB JSON in, OpenTSDB JSON out.

        ``auths``: the caller's authorization set. Omitted/None = anonymous
        (empty auth set — only unlabeled data, fail closed). Pass
        ``timely_spark.api.ALL_AUTHS`` to bypass enforcement explicitly.
        ``strict``: raise :class:`NoMatchingTagsError` when a SubQuery
        matches zero series (the reference's HTTP behavior).
        """
        req = QueryRequest.from_dict(request)
        return self._run(req, auths, strict=strict)

    def query_get(self, params: dict, auths=None, strict: bool = False) -> list[dict]:
        """GET /api/query?start=..&m=agg:[rate:][ds:]metric{tags} — the
        OpenTSDB mini-language (QueryRequest.java:515-627). Same ``auths``
        semantics as :meth:`query`."""
        from .plans.request import parse_get_query

        return self._run(parse_get_query(params), auths, strict=strict)

    def build_rollup(self, level_ms: int, now_ms: int | None = None) -> DataFrame:
        """Continuous-aggregate partials of this store at ``level_ms``:
        (metric, __series, tags, bucket_ts, n, vsum, vmin, vmax) — the
        hypertable tier (operators/rollup.py) at per-series grain, ready
        for :meth:`query_rollup`. Persist it (parquet, partitioned like
        the store) in a real deployment; the frame is also usable lazily
        for tests/oracles."""
        from .model import series_id

        pts = self.points(now_ms=now_ms)
        bucket = (F.col("ts") - F.col("ts") % F.lit(level_ms)).alias("bucket_ts")
        return (
            pts.withColumn("__series", series_id())
            .groupBy("metric", "__series", bucket)
            .agg(
                F.first("tags").alias("tags"),
                F.count("value").alias("n"),
                F.sum(F.col("value").cast("decimal(38,10)")).alias("vsum"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
        )

    _ROLLUP_AGGS = {"avg", "sum", "min", "max", "count"}

    def query_rollup(
        self,
        request: dict,
        partials: DataFrame,
        level_ms: int,
        auths=None,
    ) -> list[dict]:
        """Answer an OpenTSDB query from a rollup tier instead of raw
        points — the hypertable promise on the REAL request path: a
        downsample query whose period the level divides touches
        period/level-x fewer rows and never rescans the store.

        Eligibility (ValueError otherwise — callers fall back to
        :meth:`query`): no rate, no tsuids, downsample aggregator and
        cross-series aggregator both in avg/sum/min/max/count, period a
        multiple of ``level_ms``. Visibility: partials pre-aggregate
        rows, so per-row viz enforcement is impossible here — requires
        ALL_AUTHS (or a store with no labeled rows, which is the
        caller's contract to know)."""
        req = QueryRequest.from_dict(request)
        outs = self.query_rollup_frames(request, partials, level_ms, auths)
        out: list[dict] = []
        for r in outs:
            out.extend(to_query_response(r, ms_resolution=req.ms_resolution))
        return out

    def query_rollup_frames(
        self,
        request: dict,
        partials: DataFrame,
        level_ms: int,
        auths=None,
    ) -> list[DataFrame]:
        """One result DataFrame per SubQuery from the rollup tier,
        BEFORE response shaping — the Spark-native / plan-auditable
        entry (VERDICT r11 #3), with :meth:`query_rollup`'s exact
        eligibility rules and semantics."""
        from .operators.downsample import combine_series
        from .plans.builder import _tag_predicates
        from .plans.request import QueryRequest

        if auths is not ALL_AUTHS:
            raise ValueError(
                "query_rollup bypasses per-row visibility; pass "
                "auths=ALL_AUTHS or use query()"
            )
        req = QueryRequest.from_dict(request)
        outs = []
        for q in req.queries:
            spec = q.downsample_spec()
            if (
                q.rate
                or q.tsuids
                or spec is None
                or spec.period_ms % level_ms != 0
                or spec.aggregator not in self._ROLLUP_AGGS
                or q.aggregator not in self._ROLLUP_AGGS
            ):
                raise ValueError(
                    f"SubQuery not rollup-eligible (metric={q.metric!r}); "
                    "use query()"
                )
            if (req.end + 1) % level_ms != 0:
                # partials cannot cut inside a level bucket: an unaligned
                # end would silently include points past it (query()
                # filters raw ts <= end exactly)
                raise ValueError(
                    f"SubQuery not rollup-eligible: end={req.end} does not "
                    f"align to the level boundary (end = k*{level_ms} - 1); "
                    "use query()"
                )
            period = spec.period_ms
            start = req.start - (req.start % period)
            df = partials.filter(F.col("metric") == q.metric).filter(
                (F.col("bucket_ts") >= start) & (F.col("bucket_ts") <= req.end)
            )
            df = _tag_predicates(df, q.tags)
            df = _tag_predicates(df, q.filters)
            off = F.col("bucket_ts") - F.lit(start)
            pb = (F.lit(start) + (off - off % F.lit(period))).alias("bucket_ts")
            merged = df.groupBy("metric", "__series", pb).agg(
                F.first("tags").alias("tags"),
                F.sum("n").alias("n"),
                F.sum("vsum").alias("vsum"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
            def _value(agg):
                return {
                    "avg": (F.col("vsum") / F.col("n")).cast("double"),
                    "sum": F.col("vsum").cast("double"),
                    "min": F.col("vmin"),
                    "max": F.col("vmax"),
                    "count": F.col("n").cast("double"),
                }[agg]

            if q.aggregator == spec.aggregator:
                # match build_subquery's single-aggregation collapse:
                # equal downsample/combine aggregators act over ALL
                # points per (projected tags, bucket) — avg is the
                # WEIGHTED average, count counts points, not series.
                # Partials re-merge across series first, then the value.
                from .model import series_id

                keys = F.array(*[F.lit(k) for k in sorted(q.tags.keys())])
                projected = F.map_filter(
                    "tags", lambda k, _v: F.array_contains(keys, k)
                )
                pre = merged.withColumn("tags", projected).withColumn(
                    "__gkey", series_id()
                )
                flat = pre.groupBy("__gkey", "bucket_ts").agg(
                    F.first("metric").alias("metric"),
                    F.first("tags").alias("tags"),
                    F.sum("n").alias("n"),
                    F.sum("vsum").alias("vsum"),
                    F.min("vmin").alias("vmin"),
                    F.max("vmax").alias("vmax"),
                )
                outs.append(
                    flat.select(
                        "metric", "tags", "bucket_ts",
                        _value(q.aggregator).alias("value"),
                    )
                )
                continue
            ds = merged.select(
                "metric", "tags", "bucket_ts", _value(spec.aggregator).alias("value")
            )
            outs.append(combine_series(ds, sorted(q.tags.keys()), q.aggregator))
        return outs

    def _record_viz(self, pts: DataFrame) -> None:
        """Fold the batch's distinct viz expressions into the sidecar
        catalog (one tiny job on the already-checkpointed batch; queries
        then never scan the store for them)."""
        batch = {
            r[0]
            for r in pts.select("viz").filter(F.col("viz").isNotNull()).distinct().collect()
        }
        known = self._viz_known()
        new = batch - (known or set())
        if new or known is None:
            # the write also *establishes* the catalog on first ingest, so
            # an all-unlabeled store is "known empty", not "unknown"
            self.spark.createDataFrame(
                [(e,) for e in sorted(new)], "viz string"
            ).coalesce(1).write.mode("append").parquet(self._viz_path)
        self._viz_exprs = (known or set()) | new

    def _viz_known(self) -> set[str] | None:
        """The catalog's distinct viz expressions, or None when this store
        has no sidecar (populated outside the engine) — callers then fall
        back to viz_filter's distinct scan."""
        if self._viz_exprs is None:
            import os

            if os.path.isdir(self._viz_path):
                self._viz_exprs = {
                    r[0] for r in self.spark.read.parquet(self._viz_path).collect()
                }
        return self._viz_exprs

    def _catalog_has_tags(self, q) -> bool:
        """True iff the meta catalog holds a series matching the SubQuery's
        metric + tag predicates. The reference's "No matching tags" check
        consults the META table, not the query result (DataStore.java:
        938-941): a matching-tags query over an empty time window is a
        valid 200/empty response, never a 400. Runs only on the
        strict+empty-result path, against the tiny meta table."""
        from .parse import is_tag_regex

        if q.tsuids:
            return True  # tsuid SubQueries name series directly, no tag check
        base = self.meta().filter(F.col("metric") == q.metric)
        if not base.limit(1).take(1):
            return False  # unknown metric
        for k, v in {**q.tags, **q.filters}.items():
            m = base.filter(F.col("tag_key") == k)
            if v not in ("*", ".*"):
                if is_tag_regex(v):
                    m = m.filter(F.col("tag_value").rlike(f"^(?:{v})$"))
                else:
                    m = m.filter(F.col("tag_value") == v)
            if not m.limit(1).take(1):
                return False
        return True

    def query_frames(self, request: dict, auths=None) -> list[DataFrame]:
        """One result DataFrame per SubQuery BEFORE response shaping —
        the Spark-native entry (same pipeline as :meth:`query`: request
        parse -> pruned hybrid scan -> tag predicates -> rate ->
        downsample -> combine). This is the frame a Spark-native caller
        composes further, and the frame the plan audit inspects
        (VERDICT r11 #3: the engine-path plans are the ones a user
        actually runs — auditing the response-shaped rows was a blind
        spot). Columns: (metric, tags, bucket_ts, value)."""
        return self._frames(QueryRequest.from_dict(request), auths)

    def _frames(self, req: QueryRequest, auths) -> list[DataFrame]:
        eff = None if auths is ALL_AUTHS else set(auths or ())
        known = self._viz_known() if eff else None
        viz_exprs = sorted(known) if known is not None else None
        return run_query(
            self.points(),
            req,
            auths=eff,
            viz_exprs=viz_exprs,
            bucket_metrics=self.bucket_metrics,
        )

    def _run(self, req: QueryRequest, auths, strict: bool = False) -> list[dict]:
        results = self._frames(req, auths)
        out: list[dict] = []
        for q, r in zip(req.queries, results):
            part = to_query_response(r, ms_resolution=req.ms_resolution)
            if strict and not part and not self._catalog_has_tags(q):
                raise NoMatchingTagsError("No matching tags")
            out.extend(part)
        return out

    def suggest(self, q: str, kind: str = "metrics", max_results: int = 25,
                tag: str | None = None) -> list[str]:
        rows = suggest(self.meta(), q, kind, max_results, tag=tag).collect()
        return [r["suggestion"] for r in rows]

    def search_lookup(self, metric: str | None = None, tag_key: str | None = None,
                      tag_value_pattern: str | None = None, limit: int = 25) -> dict:
        ordered, total = search_lookup(
            self.meta(), metric, tag_key, tag_value_pattern, limit
        )
        return {
            "results": [r.asDict() for r in ordered.collect()],
            "totalResults": total.collect()[0]["total_results"],
        }

    def metrics(self, ignored_tags: list[str] | None = None) -> list[dict]:
        return [r.asDict() for r in metrics_dump(self.meta(), ignored_tags).collect()]

    @staticmethod
    def aggregators() -> list[str]:
        from .operators.aggregators import ADVERTISED

        return list(ADVERTISED)

    @staticmethod
    def version() -> str:
        return VERSION

    def cache_status(self) -> dict:
        """/api/cache analogue (DataStoreCache.java:911-922): oldest/newest
        ts + metric names currently stored. With the hot tier enabled this
        reports the cached window, like the reference."""
        if self._hot is not None:
            return self._hot.status()
        agg = self.points().agg(
            F.min("ts").alias("oldest"), F.max("ts").alias("newest")
        ).collect()[0]
        names = [r["metric"] for r in self.points().select("metric").distinct().orderBy("metric").collect()]
        return {"oldestTs": agg["oldest"], "newestTs": agg["newest"], "metrics": names}

    # -------------------------------------------------------- maintenance

    def run_retention(self, now_ms: int) -> list[str]:
        """Drop wholly-expired point partitions AND age off the meta
        catalog (F6/F7 as one maintenance job — MetricAgeOffIterator +
        MetaAgeOffIterator).

        Series-bucketed tier: the catalog table carries no dt partitions
        to drop, so age-off is a filtered REWRITE of the table — the
        documented trade of that layout (query-time ageoff_filter keeps
        results correct between maintenance runs either way)."""
        import shutil

        from .sources.store import compact_meta_with_cutoff

        if self.series_table is not None:
            doomed = [f"table:{self.series_table} rewrite"]
            self._rewrite_series_table(
                ageoff_filter(
                    self.spark.table(self.series_table),
                    now_ms=now_ms,
                    ttls=self.ttls,
                    default_ttl_ms=self.default_ttl_ms or 7 * 86_400_000,
                )
            )
        else:
            doomed = retention_delete_plan(
                self.spark,
                self.store_path,
                now_ms,
                self.ttls,
                self.default_ttl_ms or 7 * 86_400_000,
            )
            for p in doomed:
                shutil.rmtree(p, ignore_errors=True)
        compact_meta_with_cutoff(
            self.spark,
            self.meta_path,
            now_ms,
            self.ttls,
            self.default_ttl_ms or 7 * 86_400_000,
        )
        return doomed

    def _rewrite_series_table(self, rows: DataFrame) -> None:
        """Overwrite the series-bucketed table with ``rows`` (which may
        derive from the table itself — localCheckpoint pins the contents
        before the overwrite truncates the source)."""
        from .sources.store import write_points_bucketed

        pinned = rows.drop("series_key").localCheckpoint(eager=True)
        write_points_bucketed(pinned, self.series_table, mode="overwrite")

    def compact(self) -> None:
        """Fold small append files (S6 maintenance). Series-bucketed tier:
        appends stack one file set per batch inside each bucket; a rewrite
        restores one sorted file per bucket."""
        if self.series_table is not None:
            self._rewrite_series_table(self.spark.table(self.series_table))
        else:
            compact_partitions(self.spark, self.store_path)
