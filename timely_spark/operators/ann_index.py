"""Persistent ANN index lifecycle — build / save / load / append.

The r11 verdict's last 100 TB asymmetry: every ``emb_*`` ANN row derived
its index (PQ codebooks, IVF centroids, encoded codes) inside the run,
so a daily 100 TB curation loop would re-pay the training sample, the
centroid pick and — the real cost — the full-corpus encode pass on every
run. This module gives the FAISS-IVFADC-shaped index (the composition
``similarity.ivfpq_topk`` runs) a durable lifecycle:

- ``IvfPqIndex.build(corpus, ...)``  — train + encode (one Arrow pass),
- ``idx.save(path)``                 — codes as a Parquet TABLE via the
  Spark writer (shared-filesystem safe: hdfs://, s3a://) + a one-row
  model sidecar carrying codebooks/centroids/params — exactly the
  archive/restore pattern ``sources/hot_cache.py`` established for S10,
- ``IvfPqIndex.load(spark, path)``   — re-open in a fresh session; query
  time no longer includes the build,
- ``idx.append(new_docs[, path])``   — encode ONLY the new rows with the
  FROZEN codebooks/centroids and (optionally) append just those files
  to the saved codes table — the daily-increment path: cost is
  new-rows-sized, never corpus-sized.

No reference analogue (the reference has no vector tier — SURVEY §2
extension set); the lifecycle shape mirrors FAISS ``write_index`` /
``read_index`` / ``add`` re-expressed as Spark tables.

Scale notes: the model sidecar is ``m*ksub*dsub + ncells*dim`` doubles
(~160 KB at m=16/ksub=256/dim=64/ncells=64) — one row, broadcastable;
the codes table is the only corpus-sized artifact (8 + ~m bytes/vector,
~24 B at m=16 vs 512 B of raw float64 — the 20x scan-side compression
that makes the ADC path pay). Query plans are identical to the
in-session composition: scan(codes) -> broadcast LUT join -> salted
window top-k; the scan side of a restored index reads Parquet instead
of recomputing the encode mapInPandas stage, which is the whole point.

Frozen-model caveat (FAISS semantics too): ``append`` quantizes new
vectors with the ORIGINAL codebooks/centroids. Recall on appended data
holds while it is distribution-similar to the training sample (pinned
by tests/test_similarity.py's append recall-floor test); a drifted
corpus wants a rebuild, which is a policy decision, not an index bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import per_query_topk, pq_train_codebooks


def _compact_table(spark: SparkSession, path: str, rows_per_file: int) -> None:
    """Rewrite one saved index table into right-sized files — the
    small-file repair for append-heavy indexes (every ``append(path)``
    lands one file set; a year of daily increments is ~365 tiny files
    per table, the store-probe small-file cliff measured in SCALE.md).
    Maintenance job, never inline with queries (readers between the
    swap renames see a missing table).

    Swap goes through the Hadoop FileSystem API (shared-FS safe) in a
    RECOVERABLE order: current -> ``__old``, compacted tmp -> current,
    delete ``__old`` — a crash mid-swap leaves the data in ``__old``
    instead of deleted (delete-first would not)."""
    df = spark.read.parquet(path)
    n = max(1, -(-df.count() // rows_per_file))
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    cur, tmp_p = hpath(path), hpath(tmp)
    old = hpath(path.rstrip("/") + "__old")
    fs = cur.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(old, True)  # stale leftover from a crashed prior swap
    if not fs.rename(cur, old):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(tmp_p, cur):
        raise IOError(
            f"compact: swap failed; previous table preserved at {old}"
        )
    fs.delete(old, True)


def _encode_cells_codes(
    corpus: DataFrame, books, C, id_col: str, vec_col: str
) -> DataFrame:
    """ONE Arrow pass: coarse cell assignment (argmax cosine over the
    centroid matrix) + PQ sub-codebook indices per vector. The model
    rides the task closure (numpy arrays, ~160 KB — the pq_encode
    shipping contract: never Catalyst literal trees)."""
    m, ksub, dsub = books.shape

    def encode(batches):
        import numpy as np

        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cells = (X @ C.T).argmax(1).astype("int64")
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d2 = ((Xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d2.argmin(1)
            yield pdf[[id_col]].assign(cell_id=cells, codes=list(codes))

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, cell_id long, codes array<int>"
    )


class IvfPqIndex:
    """A built IVF+PQ index: frozen model (codebooks + centroids) and a
    distributed codes table. Construct via :meth:`build` or :meth:`load`."""

    def __init__(
        self,
        spark: SparkSession,
        books,
        centroids,
        codes: DataFrame,
        dim: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        import numpy as np

        self.spark = spark
        self.books = np.asarray(books, dtype=np.float64)
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.codes = codes
        self.dim = dim
        self.id_col = id_col
        self.vec_col = vec_col
        self.m, self.ksub, self.dsub = self.books.shape
        self.ncells = len(self.centroids)

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        dim: int,
        m: int = 16,
        ksub: int = 64,
        ncells: int = 64,
        sample: int = 2048,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfPqIndex":
        """Train on the deterministic hash-ordered sample (the
        pq_train_codebooks / ivf centroid idiom — no RNG, no stored
        randomness) and encode the full corpus in one Arrow pass."""
        import numpy as np

        books = pq_train_codebooks(
            corpus, dim, m=m, ksub=ksub, sample=sample,
            id_col=id_col, vec_col=vec_col,
        )
        cent_rows = (
            corpus.select(F.col(vec_col))
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(ncells)
            .collect()
        )
        C = np.array([r[0] for r in cent_rows], dtype=np.float64)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        codes = _encode_cells_codes(corpus, books, C, id_col, vec_col)
        return cls(corpus.sparkSession, books, C, codes, dim, id_col, vec_col)

    def materialize(self) -> "IvfPqIndex":
        """Pin the encoded codes in block storage (eager localCheckpoint
        — lineage TRUNCATED, unlike persist(), per the BASELINE.md
        lineage lessons) so that save() plus any number of topk() calls
        pay the Arrow encode pass exactly once. Codes are ~(8 + m*4)
        bytes/vector, so the pinned footprint is code-sized, never
        vector-sized."""
        self.codes = self.codes.localCheckpoint(eager=True)
        return self

    def release(self) -> None:
        """Unpersist the ``materialize()`` pin (no-op when not pinned).

        Deterministic lifecycle (VERDICT r12 item 1): call when the
        index object is done serving — after ``save()`` when the caller
        continues against the RELOADED on-disk index, or when a
        transient in-session index goes out of scope. Do NOT call while
        a lazy frame derived from ``topk()`` is still unmaterialized
        (the pin's lineage is truncated; see ``timely_spark.pins``).
        """
        from ..pins import unpin

        unpin(self.codes)

    # ----------------------------------------------------------- persist

    def save(self, path: str) -> None:
        """Codes -> ``path/codes`` (Parquet, overwrite); model ->
        ``path/model.json`` (driver-side JSON sidecar through the
        Hadoop FS API — r12: the one-row-parquet sidecar cost a full
        Spark job on each side of the lifecycle for a handful of
        parameters; the JSON file keeps the same shared-FS semantics
        at zero jobs, see ``fsutil``)."""
        from ..fsutil import sidecar_delete, sidecar_write_json

        self.codes.write.mode("overwrite").parquet(path + "/codes")
        sidecar_write_json(
            self.spark,
            path + "/model.json",
            {
                "dim": int(self.dim),
                "m": int(self.m),
                "ksub": int(self.ksub),
                "ncells": int(self.ncells),
                "id_col": self.id_col,
                "vec_col": self.vec_col,
                "codebooks": [
                    [list(map(float, c)) for c in b] for b in self.books
                ],
                "centroids": [list(map(float, c)) for c in self.centroids],
            },
        )
        sidecar_delete(self.spark, path + "/model")  # pre-r12 layout

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfPqIndex":
        """Re-open a saved index: the codes table stays a lazy Parquet
        scan (corpus-sized data never touches the driver); the model
        sidecar is a driver-side JSON read (pre-r12 one-row-parquet
        sidecars still load via the fallback)."""
        import numpy as np

        from ..fsutil import sidecar_read_json

        row = sidecar_read_json(spark, path + "/model.json")
        if row is None:  # pre-r12 layout
            row = spark.read.parquet(path + "/model").collect()[0]
        books = np.array(row["codebooks"], dtype=np.float64)
        C = np.array(row["centroids"], dtype=np.float64)
        codes = spark.read.parquet(path + "/codes")
        return cls(
            spark, books, C, codes, int(row["dim"]),
            row["id_col"], row["vec_col"],
        )

    # ------------------------------------------------------------ append

    def append(self, new_docs: DataFrame, path: str | None = None) -> "IvfPqIndex":
        """Incremental encode: ONLY ``new_docs`` pass through the Arrow
        encode stage, with the FROZEN codebooks/centroids (FAISS
        ``add`` semantics). Returns a new index whose codes view is the
        union; with ``path``, the new codes also land as appended files
        in the saved codes table (no rewrite of existing files — the
        daily-increment cost is new-rows-sized)."""
        fresh = _encode_cells_codes(
            new_docs, self.books, self.centroids, self.id_col, self.vec_col
        )
        if path is not None:
            fresh.write.mode("append").parquet(path + "/codes")
            fresh = self.spark.read.parquet(path + "/codes")
            return IvfPqIndex(
                self.spark, self.books, self.centroids, fresh,
                self.dim, self.id_col, self.vec_col,
            )
        return IvfPqIndex(
            self.spark, self.books, self.centroids,
            self.codes.unionByName(fresh),
            self.dim, self.id_col, self.vec_col,
        )

    @classmethod
    def compact(
        cls, spark: SparkSession, path: str, rows_per_file: int = 4_000_000
    ) -> "IvfPqIndex":
        """Rewrite the saved codes table into right-sized files after
        many appends (codes are ~8 + 4*m bytes/row, so the default
        packs ~300 MB files at m=16). Model sidecar untouched. Returns
        the reloaded index; answers are byte-identical (pinned in
        tests)."""
        _compact_table(spark, path + "/codes", rows_per_file)
        return cls.load(spark, path)

    # ------------------------------------------------------------- query

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 16,
        query_id_col: str = "query_id",
        exclude_self: bool = True,
    ) -> DataFrame:
        """ADC top-k against the codes table (Jegou et al. 2011): each
        query probes its ``nprobe`` nearest cells; candidates score via
        per-subspace lookup tables inside ONE Arrow stage (the LUT
        tensor rides the task closure, probe pruning is a boolean
        gather). Plan: codes scan -> MapInPandas (skinny
        query/id/score rows out) -> salted two-phase window top-k —
        one Python stage, one shuffle, no per-row LUT materialization.

        ``exclude_self`` drops the id == query_id match (the registry
        rows query corpus members; recall@k is over the OTHER
        neighbors)."""
        import numpy as np

        m, dsub = self.m, self.dsub
        C = self.centroids
        lut_rows = []
        for r in queries.select(F.col(query_id_col), F.col(self.vec_col)).collect():
            qv = np.asarray(r[self.vec_col], dtype=np.float64)
            qv /= max(float(np.linalg.norm(qv)), 1e-12)
            probes = np.argsort(-(C @ qv))[:nprobe]
            # r12: vectorized LUT build (one matvec per subspace replaces
            # ksub np.dot calls — m*ksub interpreted rounds per query was
            # the measured driver cost of every topk call); the per-entry
            # Python round(.., 9) is kept, and the rounded LUTs are
            # verified identical to the dot-loop's on the real sf0.01 +
            # sf0.1 embeddings (205k entries, zero mismatches).
            luts = [
                [
                    round(float(v), 9)
                    for v in self.books[s] @ qv[s * dsub : (s + 1) * dsub]
                ]
                for s in range(m)
            ]
            lut_rows.append(
                (r[query_id_col], [int(c) for c in probes], luts)
            )
        # r13: the broadcast cell join + zip_with/aggregate fold became
        # one Arrow stage with the LUT tensor in the task closure — the
        # JVM form materialized each scored row's m x ksub LUT array in
        # unsafe row format (~32 KB/row of pure churn) before the
        # interpreted fold read 16 entries of it. The probe pruning is
        # a per-query boolean gather inside the stage; scores are
        # bitwise identical (same 0.0-seeded left fold, parity
        # test-pinned). See similarity.adc_scores_arrow.
        from .similarity import adc_scores_arrow

        scored = adc_scores_arrow(
            self.codes, lut_rows, m, id_col=self.id_col,
            query_id_col=query_id_col, cell_col="cell_id",
            ncells=len(C),
        )
        if exclude_self:
            scored = scored.filter(F.col(self.id_col) != F.col(query_id_col))
        return per_query_topk(
            scored, k, "adc_score",
            query_id_col, self.id_col,
        ).select(query_id_col, self.id_col, "adc_score", "rank")

    def rerank_topk(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        k: int = 10,
        rerank: int = 8,
        nprobe: int = 16,
        query_id_col: str = "query_id",
    ) -> DataFrame:
        """ADC prune to ``k * rerank`` candidates, exact-cosine refine
        against the full vectors (the FAISS ``IVFPQ,Refine`` shape —
        quantization error affects candidate SELECTION, never the final
        ordering). The candidate set is |Q|*k*rerank rows — broadcast;
        the vector fetch is a broadcast semi-join, no corpus shuffle."""
        from .similarity import cosine_similarity_col

        cands = self.topk(queries, k * rerank, nprobe, query_id_col)
        qv = F.broadcast(
            queries.select(F.col(query_id_col), F.col(self.vec_col).alias("__qvec"))
        )
        ex = (
            corpus.select(self.id_col, self.vec_col)
            .join(F.broadcast(cands.select(query_id_col, self.id_col)), self.id_col)
            .join(qv, query_id_col)
            .withColumn(
                "cosine",
                F.round(
                    cosine_similarity_col(F.col(self.vec_col), F.col("__qvec")), 6
                ),
            )
        )
        return per_query_topk(ex, k, "cosine", query_id_col, self.id_col).select(
            query_id_col, self.id_col, "cosine", "rank"
        )


# ------------------------------------------------------- decon index


class DeconIndex:
    """Persistent paraphrase-decontamination index — the lifecycle for
    :func:`similarity.semantic_decontaminate_blocked`'s benchmark-side
    structure (VERDICT r11 #1 named it: the blocked screen persist()s
    its index only for the session, yet a daily curation loop screens
    a GROWING corpus against a FROZEN benchmark suite — the index over
    the benchmark is the reusable half).

    Contents: the cell-assigned benchmark sign-sum table (bench-sized,
    stays distributed), the unit centroid matrix (ncells x dim) and the
    per-cell angular radii — saved as a Parquet cells table + a one-row
    model sidecar (the IvfPqIndex / hot_cache archive pattern).

    ``screen(docs)`` reproduces :func:`semantic_decontaminate_blocked`'s
    exact output (same probe bound, same `_integer_hit` integer verdict
    — candidate generation is complete by the triangle-inequality proof
    on the operator, so restored == live == broadcast, byte-identical),
    paying only the corpus-side work per run."""

    def __init__(
        self,
        spark: SparkSession,
        cent,
        radii: dict,
        cells: DataFrame,
        threshold: float,
        dim: int,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        import numpy as np

        self.spark = spark
        self.cent = (
            None if cent is None else np.asarray(cent, dtype=np.float64)
        )
        self.radii = {int(k): float(v) for k, v in (radii or {}).items()}
        self.cells = cells  # (__bid, __b0.., __n2, __cell, __ang)
        self.threshold = float(threshold)
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col

    @property
    def empty(self) -> bool:
        return self.cent is None

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        bench: DataFrame,
        threshold: float = 0.8,
        dim: int = 32,
        ncells: int = 16,
        text_col: str = "text",
        id_col: str = "doc_id",
        lloyd_iters: int = 0,
    ) -> "DeconIndex":
        from .similarity import _decon_cell_index, _hashed_sums

        bs = _hashed_sums(bench, dim, text_col, id_col).select(
            F.col(id_col).alias("__bid"),
            *[F.col(f"__s{d}").alias(f"__b{d}") for d in range(dim)],
        )
        # r12: rendered SQL (one F.expr) — same greatest(abs(...)) tree
        nonzero = F.expr(
            "greatest("
            + ", ".join(f"abs(__b{d})" for d in range(dim))
            + ") > 0"
        )
        bs = bs.filter(nonzero)
        index = _decon_cell_index(bs, dim, ncells, lloyd_iters)
        if index is None:  # empty / all-zero benchmark
            return cls(
                bench.sparkSession, None, {}, None, threshold, dim,
                text_col, id_col,
            )
        b_assigned, cent, radii = index
        return cls(
            bench.sparkSession, cent, radii, b_assigned, threshold, dim,
            text_col, id_col,
        )

    def release(self) -> None:
        """Unpersist the cells cache a ``build()`` left behind (no-op on
        a loaded/empty index). Unlike the localCheckpoint pins this is a
        plain persist() — lineage intact, so releasing early merely
        costs a recompute, never correctness. Call when the handle is
        done serving (e.g. after ``save()`` when the caller continues
        against the reloaded on-disk index)."""
        if self.cells is not None:
            self.cells.unpersist()

    # ----------------------------------------------------------- persist

    def save(self, path: str) -> None:
        """Cells table -> ``path/cells``; centroids/radii/params ->
        ``path/model.json`` (driver-side JSON sidecar via the Hadoop FS
        API — r12 zero-job sidecar, see ``fsutil``). An EMPTY index
        saves a model with ncells=0 and no cells table — restore
        reproduces the nothing-can-contaminate behavior."""
        import json as _json

        from ..fsutil import sidecar_delete, sidecar_write_json

        if not self.empty:
            self.cells.write.mode("overwrite").parquet(path + "/cells")
        sidecar_write_json(
            self.spark,
            path + "/model.json",
            {
                "threshold": float(self.threshold),
                "dim": int(self.dim),
                "text_col": self.text_col,
                "id_col": self.id_col,
                "ncells": 0 if self.empty else len(self.cent),
                "centroids": (
                    []
                    if self.empty
                    else [list(map(float, c)) for c in self.cent]
                ),
                "radii": _json.dumps(self.radii),
            },
        )
        sidecar_delete(self.spark, path + "/model")  # pre-r12 layout

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DeconIndex":
        import json as _json

        import numpy as np

        from ..fsutil import sidecar_read_json

        row = sidecar_read_json(spark, path + "/model.json")
        if row is None:  # pre-r12 layout
            row = spark.read.parquet(path + "/model").collect()[0]
        if row["ncells"] == 0:
            return cls(
                spark, None, {}, None, row["threshold"], row["dim"],
                row["text_col"], row["id_col"],
            )
        cent = np.array(row["centroids"], dtype=np.float64)
        radii = {int(k): v for k, v in _json.loads(row["radii"]).items()}
        cells = spark.read.parquet(path + "/cells")
        return cls(
            spark, cent, radii, cells, row["threshold"], row["dim"],
            row["text_col"], row["id_col"],
        )

    # ------------------------------------------------------------ screen

    def screen(self, docs: DataFrame) -> DataFrame:
        """(id, n_bench_hits, contaminated) — byte-identical to
        :func:`similarity.semantic_decontaminate_blocked` over the same
        benchmark; only the corpus side is computed per call."""
        import math

        from .similarity import (
            _bal_sql,
            _decon_probes,
            _hashed_sums,
            _hits_shape,
            _integer_hit,
            _tau_pq,
        )

        id_col, dim = self.id_col, self.dim
        ds = _hashed_sums(docs, dim, self.text_col, id_col)
        if self.empty:
            return _hits_shape(
                docs,
                ds.select(
                    id_col, F.lit(0).cast("long").alias("n_bench_hits")
                ).limit(0),
                id_col,
            )
        p, q = _tau_pq(self.threshold)
        probes = _decon_probes(
            ds, self.cent, self.radii, math.acos(self.threshold), 1e-6,
            id_col,
        )
        # r12: rendered SQL sum (one F.expr, _bal_sql bracketing)
        dot = F.expr(
            _bal_sql([f"(__s{d} * __b{d})" for d in range(dim)])
        )
        hits = (
            probes.join(self.cells, "__cell")
            .filter(_integer_hit(dot, F.col("__n1"), F.col("__n2"), p, q))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bench_hits"))
        )
        return _hits_shape(docs, hits, id_col)


# ----------------------------------------------------- minhash index


class MinHashIndex:
    """Persistent LEXICAL near-dup index — the third lifecycle family
    (vector :class:`IvfPqIndex`, semantic :class:`DeconIndex`, and now
    MinHash+LSH). A daily curation loop near-dedups each incoming batch
    against the ACCUMULATED corpus; without a persisted index every run
    re-tokenizes, re-shingles and re-signs the whole history just to
    band it again. This index stores the two derived relations the
    screen actually joins on:

    - ``bands``    — (id, band, bucket), the exact
      :func:`dedup.minhash_bands` relation (one 64-bit bucket per band),
    - ``shingles`` — (id, array<long> distinct shingle hashes), the
      verify side :func:`dedup.minhash_dedup` joins back in.

    Both are hash-only: RAW TEXT NEVER PERSISTS in the index (the
    shingle store is ~8 B per distinct shingle — same order as the text
    it summarizes but shareable where the text itself may not be).
    Saved via the Spark writer as Parquet tables + a one-row model
    sidecar (the hot_cache/IvfPqIndex archive pattern; shared-FS safe).

    ``append(batch)`` is trivially frozen-model (the "permutations" are
    compile-time multiply-add constants — nothing trains), so unlike
    PQ codebooks there is no drift caveat: append == rebuild, exactly.

    ``screen(batch)`` emits verified cross pairs (index doc, batch doc,
    jaccard >= threshold). Identity contract (pinned in tests):
    screening a batch against index(corpus) returns exactly
    :func:`dedup.minhash_dedup`(corpus ∪ batch) restricted to cross
    pairs — same banding, same verify join, byte-identical jaccard.

    Scale shape: the per-run cost is batch-sized (batch bands +
    shingles) plus one join against the bands table keyed on
    (band, bucket) — candidate-bounded, never corpus-rescanning; the
    verify join fetches index shingle arrays for SURVIVING candidates
    only. Batch-side relations are small => AQE broadcasts them."""

    def __init__(
        self,
        spark: SparkSession,
        bands_df: DataFrame,
        shingles: DataFrame,
        threshold: float,
        num_hashes: int,
        bands: int,
        shingle_n: int,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.bands_df = bands_df  # (id_col, band, bucket)
        self.shingles = shingles  # (id_col, sh: array<long>)
        self.threshold = float(threshold)
        self.num_hashes = int(num_hashes)
        self.bands = int(bands)
        self.shingle_n = int(shingle_n)
        self.text_col = text_col
        self.id_col = id_col

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        threshold: float = 0.7,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "MinHashIndex":
        from .dedup import _shingle_hashes, minhash_bands_from_shingles

        # ONE text derivation (r12): the shingle-hash relation is the
        # index's verify side AND the sufficient input for the banding
        # relation (signature = mins over the same hashes), so bands
        # derive FROM the shingles frame instead of re-running the
        # tokenize/shingle pass — materialize() then pays the text pass
        # exactly once for the whole lifecycle.
        sh = corpus.select(
            F.col(id_col), _shingle_hashes(text_col, shingle_n).alias("sh")
        )
        bdf = minhash_bands_from_shingles(sh, id_col, num_hashes, bands)
        idx = cls(
            corpus.sparkSession, bdf, sh, threshold, num_hashes, bands,
            shingle_n, text_col, id_col,
        )
        idx._bands_derive_from_shingles = True
        return idx

    def materialize(self) -> "MinHashIndex":
        """Pin both derived relations (eager localCheckpoint — lineage
        truncated) so save() plus any number of screen() calls pay the
        tokenize/shingle/sign pass exactly once. When bands derive from
        shingles (a :meth:`build` index), the shingles checkpoint runs
        FIRST and bands re-derive from it — the banding aggregation then
        reads pinned hash arrays instead of re-tokenizing the corpus
        (r12: was two full text passes, now one)."""
        from .dedup import minhash_bands_from_shingles

        self.shingles = self.shingles.localCheckpoint(eager=True)
        if getattr(self, "_bands_derive_from_shingles", False):
            self.bands_df = minhash_bands_from_shingles(
                self.shingles, self.id_col, self.num_hashes, self.bands
            )
        self.bands_df = self.bands_df.localCheckpoint(eager=True)
        return self

    def release(self) -> None:
        """Unpersist the ``materialize()`` pins (no-op when not pinned).
        Same contract as ``IvfPqIndex.release``: only call once nothing
        derived from ``screen()`` remains unmaterialized."""
        from ..pins import unpin

        unpin(self.bands_df)
        unpin(self.shingles)

    # ----------------------------------------------------------- persist

    def save(self, path: str) -> None:
        """bands -> ``path/bands``, shingles -> ``path/shingles``
        (Parquet, overwrite); params -> ``path/model.json``
        (driver-side JSON sidecar via the Hadoop FS API — r12 zero-job
        sidecar, see ``fsutil``)."""
        from ..fsutil import sidecar_delete, sidecar_write_json

        self.bands_df.write.mode("overwrite").parquet(path + "/bands")
        self.shingles.write.mode("overwrite").parquet(path + "/shingles")
        sidecar_write_json(self.spark, path + "/model.json", self._params())
        sidecar_delete(self.spark, path + "/model")  # pre-r12 layout

    def _params(self) -> dict:
        return {
            "threshold": float(self.threshold),
            "num_hashes": int(self.num_hashes),
            "bands": int(self.bands),
            "shingle_n": int(self.shingle_n),
            "text_col": self.text_col,
            "id_col": self.id_col,
        }

    @classmethod
    def _read_params(cls, spark: SparkSession, path: str) -> dict | None:
        """The model sidecar as a dict (JSON first, pre-r12 one-row
        parquet as fallback); ``None`` when neither exists — shared by
        :meth:`load` and the streaming history-dedup loop's per-batch
        params check (which this turns from a Spark job into a driver
        file read)."""
        from ..fsutil import sidecar_read_json

        row = sidecar_read_json(spark, path + "/model.json")
        if row is not None:
            return row
        from ..session import error_condition

        try:
            prow = spark.read.parquet(path + "/model").collect()[0]
        except Exception as e:  # missing either way -> None
            first = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
            msg = str(e)
            if not (
                error_condition(e).startswith(first)
                or "PATH_NOT_FOUND" in msg
                or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg
            ):
                raise
            return None
        return {k: prow[k] for k in prow.__fields__}

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MinHashIndex":
        """Re-open: both relations stay lazy Parquet scans (corpus-sized
        data never touches the driver); the model sidecar is a
        driver-side JSON read."""
        row = cls._read_params(spark, path)
        if row is None:
            # message carries the "Path does not exist" marker the
            # existence-probe callers (curate bootstrap) match on — the
            # same contract the parquet reader's PATH_NOT_FOUND gave
            # them before the sidecar moved off parquet (r12)
            raise FileNotFoundError(
                f"Path does not exist: {path}/model.json "
                "(no index model sidecar)"
            )
        return cls(
            spark,
            spark.read.parquet(path + "/bands"),
            spark.read.parquet(path + "/shingles"),
            row["threshold"],
            row["num_hashes"],
            row["bands"],
            row["shingle_n"],
            row["text_col"],
            row["id_col"],
        )

    # ------------------------------------------------------------ append

    def append(self, new_docs: DataFrame, path: str | None = None) -> "MinHashIndex":
        """Incremental: ONLY ``new_docs`` pass the tokenize/shingle/sign
        stages. With ``path``, the new rows land as appended files in
        the saved tables (no rewrite of existing files); without, the
        returned index unions in-session. No frozen-model caveat: the
        hash 'permutations' are constants, so append == full rebuild,
        byte-identically (pinned in tests)."""
        from .dedup import _shingle_hashes, minhash_bands_from_shingles

        fs = new_docs.select(
            F.col(self.id_col),
            _shingle_hashes(self.text_col, self.shingle_n).alias("sh"),
        )
        if path is not None:
            # pin the batch's shingle hashes once (r12): both appended
            # tables derive from them, so the tokenize/shingle pass runs
            # once per increment instead of once per table — the
            # daily-increment cost this verb exists to bound
            from ..pins import pin, unpin

            fs = pin(fs)
        fb = minhash_bands_from_shingles(
            fs, self.id_col, self.num_hashes, self.bands
        )
        if path is not None:
            fb.write.mode("append").parquet(path + "/bands")
            fs.write.mode("append").parquet(path + "/shingles")
            # both appended tables are on disk and re-read below: the
            # increment pin is fully consumed — release it so a daily
            # append loop holds zero pins per round (VERDICT r12 item 1)
            unpin(fs)
            fb = self.spark.read.parquet(path + "/bands")
            fs = self.spark.read.parquet(path + "/shingles")
        else:
            fb = self.bands_df.unionByName(fb)
            fs = self.shingles.unionByName(fs)
        return MinHashIndex(
            self.spark, fb, fs, self.threshold, self.num_hashes,
            self.bands, self.shingle_n, self.text_col, self.id_col,
        )

    @classmethod
    def compact(
        cls,
        spark: SparkSession,
        path: str,
        bands_rows_per_file: int = 8_000_000,
        shingle_rows_per_file: int = 1_000_000,
    ) -> "MinHashIndex":
        """Rewrite both saved tables into right-sized files after many
        appends (bands rows are 3 longs; shingle rows carry the hash
        array — hence the asymmetric defaults). Model sidecar
        untouched. Returns the reloaded index; screen output is
        byte-identical (pinned in tests).

        NOT for a STREAMING-maintained index (``__batch``-partitioned
        layout): the unpartitioned rewrite followed by a partitioned
        batch write is a conflicting directory layout. Use
        ``streaming.dedup.compact_history_index`` there."""
        _compact_table(spark, path + "/bands", bands_rows_per_file)
        _compact_table(spark, path + "/shingles", shingle_rows_per_file)
        return cls.load(spark, path)

    # ------------------------------------------------------------ screen

    def screen(
        self,
        batch: DataFrame,
        exclude_self: bool = True,
        shingles: DataFrame | None = None,
    ) -> DataFrame:
        """Verified near-dup cross pairs of ``batch`` against the index:
        (id_a = index doc, id_b = batch doc, jaccard >= threshold).

        Plan: batch bands (batch-sized) join index bands on
        (band, bucket) -> distinct candidate pairs -> verify join
        fetching the stored index shingle array + the batch's computed
        one -> exact hashed-shingle Jaccard filter. ``exclude_self``
        drops id_a == id_b rows (a batch overlapping the index would
        otherwise report each overlap as its own trivial dup).

        r13 (guide §2.4): the batch's tokenize/shingle/sign pass used
        to run TWICE per call — once under the banding aggregation and
        once for the verify side. It now runs exactly once: the
        (id, sh) relation is pinned and BOTH sides derive from the pin
        (batch-sized hash arrays, same weight class as the
        ``minhash_dedup`` verify pin). Callers that loop release it via
        ``release_pins`` on the consumed output; callers that already
        hold the batch's shingle relation (the streaming history loop,
        which also writes it to the index) pass it as ``shingles``
        ((id_col, sh) shape) and no internal pin is created."""
        from ..pins import pin
        from .dedup import _shingle_hashes, minhash_bands_from_shingles

        id_col = self.id_col
        if shingles is None:
            shingles = pin(
                batch.select(
                    F.col(id_col),
                    _shingle_hashes(self.text_col, self.shingle_n).alias(
                        "sh"
                    ),
                )
            )
        qb = minhash_bands_from_shingles(
            shingles, id_col, self.num_hashes, self.bands
        ).withColumnRenamed(id_col, "__qid")
        cands = (
            self.bands_df.join(qb, ["band", "bucket"])
            .select(
                F.col(id_col).alias("id_a"), F.col("__qid").alias("id_b")
            )
            .distinct()
        )
        if exclude_self:
            cands = cands.filter(F.col("id_a") != F.col("id_b"))
        qsh = shingles.select(
            F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
        )
        j = cands.join(
            self.shingles.select(
                F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
            ),
            "id_a",
        ).join(qsh, "id_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        return (
            j.withColumn("jaccard", inter / union)
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b", "jaccard")
        )
