"""Distributed BM25 top-k over the packed block index.

Query lifecycle (Spark mapping of SURVEY.md §3.1):
1. normalize the raw query with the SAME function as the oracle
   (functions.text.normalize_query — CLI parity, client_CLI.py:30-32)
2. look up df/term_bucket for the query terms (tiny scan of term_stats,
   predicate pushed down) → idf per term, candidate bucket list
3. read ONLY the matching ``term_bucket=`` partitions of the blocks table
   (directory-level partition pruning — the scalable replacement for the
   reference's 27-table routing) with a pushed-down term filter
4. per doc-shard: block-max WAND (or exhaustive) local top-k inside one
   Arrow-batched applyInPandas group — each head term's postings are split
   across all shards, so no task sees more than df/n_shards postings
5. global ``orderBy(score desc, doc_id).limit(k)`` → TakeOrderedAndProject
   (no full sort), then metadata joins AFTER the limit (J3 pattern).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import normalize_query
from ..oracle.refscore import bm25_idf
from ..plans.index_build import IndexPaths
from .wand import exhaustive_topk, wand_topk

_RESULT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


_TSTATS_SCHEMA = ("term string, df bigint, gen bigint, term_bucket int")


class BM25Index:
    """Reader over an index directory produced by plans.index_build.

    **Snapshot semantics**: a BM25Index is a frozen CONSISTENT snapshot at
    the committed derived generation. meta.json (n_docs/avgdl/
    derived_max_doc_id) is read once at construction, and both derived
    scans are bounded to that generation — blocks to ``max_doc_id <=
    derived_max_doc_id`` and delta term_stats rows to ``gen <=
    derived_max_doc_id`` (pushed-down row-group filters, no extra job). A
    reader constructed MID-refresh (between the delta appends and the meta
    commit) therefore serves exactly the pre-refresh index rather than the
    torn state the appends alone would expose (new blocks scored under old
    n_docs/avgdl and a wrong avgdl0 rescale; ADVICE r5). Construct a new
    reader to observe a later generation."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 tstats_mode: str = "memory",
                 reader_shuffle_partitions: int | None = None):
        """``tstats_mode``:

        - "memory" (default, single-node/bench): persist the whole
          term_stats table — hot, one row per term, fine while it fits.
        - "pruned" (the 10^12-doc path): term_stats stays on disk
          (partitioned by term_bucket at build time); each query computes
          its terms' buckets and reads ONLY those partitions — the df/idf
          lookup cost is bounded by the query's buckets, not the vocabulary.

        ``reader_shuffle_partitions``: reduce-side task count for query
        jobs (the per-shard WAND stage and top-k windows). Default: HALF
        the parent session's shuffle partitions, floor 8 — a top-k
        query's reduce side is shards × k tiny rows plus a ms-scale
        kernel per shard, so two shards per task halves the scheduling
        overhead that dominates short queries (measured at sf0.1:
        p50 451→352 ms, batch1000 268→325 qps; BENCH notes r5). Pass the
        parent's value (or n_shards) when per-shard kernel work is the
        bottleneck instead — e.g. scans of very hot terms on huge
        corpora."""
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        from ..plans import fsio
        self.meta = fsio.read_json(spark, self.paths.meta)
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        self.term_buckets = int(self.meta.get("term_buckets", 64))
        # Query jobs are short multi-stage pipelines over pruned, small
        # inputs; AQE's per-stage re-optimization round-trips cost more
        # than they save there (measured: sequential p50 525→375 ms, p95
        # 866→430 ms, batch1000 2-3× — BENCH notes r4). Run ALL reader
        # jobs in a sibling session with AQE off; index BUILD jobs keep
        # the parent session's AQE (skew-join handling matters there).
        # newSession shares the SparkContext and table cache, so nothing
        # is re-read, and cross-session joins with caller frames work.
        self._qspark = spark.newSession()
        self._qspark.conf.set("spark.sql.adaptive.enabled", "false")
        if reader_shuffle_partitions is None:
            try:
                parent = int(spark.conf.get("spark.sql.shuffle.partitions"))
            except (TypeError, ValueError):
                parent = 200
            reader_shuffle_partitions = max(8, parent // 2)
        self._qspark.conf.set("spark.sql.shuffle.partitions",
                              str(int(reader_shuffle_partitions)))
        # the committed snapshot bound (see class docstring); None for a
        # pre-delta meta, where no uncommitted generation can exist
        self._committed_max = (int(self.meta["derived_max_doc_id"])
                               if "derived_max_doc_id" in self.meta else None)
        # build the readers once: the partitioned-dir file listing and
        # parquet footers are amortized across queries
        self.tstats_mode = tstats_mode
        if tstats_mode == "memory":
            # coalesce before persisting: the on-disk table has one-plus
            # partitions per term_bucket, so every df lookup launched ~32
            # tasks over a vocabulary that fits in memory anyway —
            # measured p50 of a fresh-term lookup 313 -> 149 ms at sf0.1
            # with 4 cached partitions (BENCH notes r5). Memory mode is
            # by definition the fits-in-memory path; "pruned" mode is the
            # big-vocabulary path and keeps the partitioned layout.
            self._tstats = self._read_term_stats().coalesce(4).persist()
        elif tstats_mode == "pruned":
            self._tstats = None
        else:
            raise ValueError(f"unknown tstats_mode {tstats_mode!r}")
        blocks = self._qspark.read.parquet(self.paths.blocks)
        if self._committed_max is not None:
            # excludes exactly an in-flight refresh's delta blocks (every
            # committed block's doc range is <= the committed high-water
            # mark); row-group stats prune, so steady state cost is zero
            blocks = blocks.filter(
                F.col("max_doc_id") <= F.lit(self._committed_max))
        if "avgdl0" in blocks.columns:
            # blocks appended incrementally (refresh_derived_delta) were
            # packed under the avgdl of THEIR refresh; the corpus avgdl has
            # moved since. tfnorm(avgdl_b)/tfnorm(avgdl_a) ≤ avgdl_b/avgdl_a
            # for avgdl_b ≥ avgdl_a (the dl term dominates the ratio), so
            # scaling the stored bound by max(1, avgdl_now/avgdl0) restores
            # a VALID block-max upper bound — WAND stays exact, merely a
            # little looser on stale blocks. Same-generation blocks scale
            # by exactly 1.0 (bit-identical behavior).
            blocks = blocks.withColumn(
                "max_tfnorm",
                F.col("max_tfnorm")
                * F.greatest(F.lit(1.0),
                             F.lit(float(self.meta["avgdl"]))
                             / F.col("avgdl0")))
        self._blocks = blocks
        self._doc_map = None
        self._doc_meta = None
        self._domain_scores = None
        # per-term (df, bucket) memo — a BM25Index is a snapshot reader
        # (n_docs/avgdl frozen at construction), so term stats are immutable
        # for its lifetime; repeated terms skip the lookup job entirely
        self._term_memo: dict[str, tuple[int, int] | None] = {}

    def _read_term_stats(self) -> DataFrame:
        """term_stats scan bounded to the committed generation. The
        explicit schema forces the optional ``gen`` column (absent in
        base-rebuild files, present in delta files) to resolve as null
        rather than depending on which footer Spark samples."""
        scan = (self._qspark.read.schema(_TSTATS_SCHEMA)
                .parquet(self.paths.term_stats))
        if self._committed_max is not None:
            scan = scan.filter(
                F.col("gen").isNull()
                | (F.col("gen") <= F.lit(self._committed_max)))
        return scan

    # -- query plumbing ----------------------------------------------------
    def query_terms(self, raw_query: str) -> list[str]:
        """Unique engine-mode terms, first-appearance order."""
        return list(dict.fromkeys(t for t in normalize_query(raw_query) if t))

    # above this many lookup terms, switch from isin literals to a
    # broadcast join: a 30k-literal In expression is a pathological
    # Catalyst tree (parse/optimize cost grows with the batch), while a
    # broadcast hash join of a tiny terms frame is flat
    _ISIN_MAX = 256

    def _buckets_of(self, terms: list[str]) -> list[int]:
        """term_bucket of each query term, computed DRIVER-SIDE with the
        pure-Python twin of the JVM bucket hash (functions.xxh, parity
        pinned by test) — zero Spark jobs, which is what makes the
        single-action search path possible."""
        from ..functions.xxh import term_bucket
        return sorted({term_bucket(t, self.term_buckets) for t in terms})

    def _filter_terms(self, df: DataFrame, terms: list[str]) -> DataFrame:
        """term ∈ terms — isin literals for small sets, broadcast join for
        big batches (10k-query batches union tens of thousands of terms)."""
        if len(terms) <= self._ISIN_MAX:
            return df.filter(F.col("term").isin(terms))
        tdf = self.spark.createDataFrame([(t,) for t in sorted(set(terms))],
                                         "term string")
        return df.join(F.broadcast(tdf), "term")

    def _term_meta(self, terms: list[str]) -> list[tuple[str, int, int]]:
        """[(term, df, term_bucket)] for terms present in the index."""
        if not terms:
            return []
        missing = [t for t in terms if t not in self._term_memo]
        if missing:
            if self._tstats is not None:
                scan = self._tstats
            else:
                # pruned mode: directory-level pruning to the query's buckets
                scan = self._read_term_stats().filter(
                    F.col("term_bucket").isin(self._buckets_of(missing)))
            rows = self._filter_terms(scan, missing).collect()
            # SUM df across rows: an incrementally-refreshed index holds
            # one base row plus one row per delta refresh for a term (same
            # term_bucket — it's a pure hash of the term)
            found: dict[str, tuple[int, int]] = {}
            for r in rows:
                df0 = found.get(r["term"], (0, 0))[0]
                found[r["term"]] = (df0 + int(r["df"]),
                                    int(r["term_bucket"]))
            for t in missing:
                self._term_memo[t] = found.get(t)  # None = absent, memoized
        return [(t, *self._term_memo[t]) for t in terms
                if self._term_memo[t] is not None]

    def search(self, raw_query: str, k: int = 10,
               mode: str = "wand") -> DataFrame:
        """→ DataFrame(doc_id, score) — global top-k, (score desc, doc_id asc).

        Plan shape (measured in BENCH notes r5): term df/idf comes from the
        MEMOIZED driver lookup (zero jobs for seen terms, one tiny collect
        for new ones) and rides the kernel closure; bucket routing is
        driver-side hashing (functions.xxh — no job). A single-action
        variant that broadcast-joined a df frame into the block scan was
        tried and REVERTED: the extra agg + broadcast-build stages cost
        more scheduling latency per query than the collect they replaced
        (p50 533 → 812 ms at sf0.1)."""
        terms = self.query_terms(raw_query)
        tmeta = self._term_meta(terms)
        if not tmeta:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        idfs = {t: bm25_idf(self.n_docs, df) for t, df, _ in tmeta}
        buckets = sorted({b for _, _, b in tmeta})
        term_list = [t for t, _, _ in tmeta]

        blocks = (self._blocks
                  .filter(F.col("term_bucket").isin(buckets))
                  .filter(F.col("term").isin(term_list)))

        avgdl = self.avgdl
        kernel = wand_topk if mode == "wand" else exhaustive_topk
        term_order = {t: i for i, t in enumerate(term_list)}

        def shard_topk(pdf: pd.DataFrame) -> pd.DataFrame:
            # max_doc_id, not block_no, is the doc-order key once delta
            # blocks exist: a delta append restarts block_no at 0 but its
            # doc range lies strictly above every base block's
            pdf = pdf.sort_values(["term", "max_doc_id"], kind="mergesort")
            per_term: dict[str, list] = {}
            for term, max_doc, max_tfn, buf in zip(
                    pdf["term"], pdf["max_doc_id"], pdf["max_tfnorm"], pdf["block"]):
                per_term.setdefault(term, []).append(
                    (int(max_doc), float(max_tfn), bytes(buf)))
            tb = sorted(per_term.items(), key=lambda kv: term_order[kv[0]])
            top = kernel([(idfs[t], blks) for t, blks in tb], k, avgdl)
            return pd.DataFrame(top, columns=["doc_id", "score"])

        local = blocks.groupBy("shard").applyInPandas(shard_topk, _RESULT_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_many(self, raw_queries: list[str], k: int = 10,
                    mode: str = "wand") -> DataFrame:
        """Batched top-k for MANY queries in ONE Spark job →
        (query, doc_id, score), per query (score desc, doc_id asc), ≤ k rows
        each.

        Duplicate raw queries are deduplicated: the result has ONE group per
        DISTINCT query string (callers fan results back out by joining on
        the query column) — len(set(raw_queries)) groups, not
        len(raw_queries).

        Throughput path: a 1000-executor cluster amortizes scheduling and
        the block scan across the whole batch — one term_stats lookup for
        the union of terms, one pruned block read for the union of
        (bucket, term), one applyInPandas pass per shard running every
        query's WAND against the blocks it already holds, then a per-query
        window top-k over shards × k × queries rows (tiny). The
        query→terms map and idf table ride a Spark broadcast variable, not
        closure capture, so a 10k-query batch is shipped to each executor
        once instead of being pickled into every task."""
        from pyspark.sql import Window

        per_query = {q: self.query_terms(q) for q in raw_queries}
        all_terms = sorted({t for ts in per_query.values() for t in ts})
        tmeta = self._term_meta(all_terms)
        present = {t for t, _, _ in tmeta}
        idfs = {t: bm25_idf(self.n_docs, df) for t, df, _ in tmeta}
        buckets = sorted({b for _, _, b in tmeta})
        qterms = {q: [t for t in ts if t in present]
                  for q, ts in per_query.items()}
        live = {q: ts for q, ts in qterms.items() if ts}
        schema = T.StructType([T.StructField("query", T.StringType(), False),
                               *_RESULT_SCHEMA.fields])
        if not live:
            return self.spark.createDataFrame([], schema)

        blocks = self._filter_terms(
            self._blocks.filter(F.col("term_bucket").isin(buckets)),
            sorted(present))
        avgdl = self.avgdl
        kernel = wand_topk if mode == "wand" else exhaustive_topk
        batch_bc = self.spark.sparkContext.broadcast(
            {"live": live, "idfs": idfs})

        def shard_topk_many(pdf: pd.DataFrame) -> pd.DataFrame:
            payload = batch_bc.value
            b_live, b_idfs = payload["live"], payload["idfs"]
            # doc-order by max_doc_id: correct across base + delta blocks
            pdf = pdf.sort_values(["term", "max_doc_id"], kind="mergesort")
            per_term: dict[str, list] = {}
            for term, max_doc, max_tfn, buf in zip(
                    pdf["term"], pdf["max_doc_id"], pdf["max_tfnorm"],
                    pdf["block"]):
                per_term.setdefault(term, []).append(
                    (int(max_doc), float(max_tfn), bytes(buf)))
            out = []
            for q, terms in b_live.items():
                tb = [(b_idfs[t], per_term[t]) for t in terms if t in per_term]
                if not tb:
                    continue
                for doc, score in kernel(tb, k, avgdl):
                    out.append((q, doc, score))
            return pd.DataFrame(out, columns=["query", "doc_id", "score"])

        local = blocks.groupBy("shard").applyInPandas(shard_topk_many, schema)
        w = Window.partitionBy("query").orderBy(F.desc("score"),
                                                F.asc("doc_id"))
        return (local.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= k)
                .drop("_rn")
                .orderBy("query", F.desc("score"), F.asc("doc_id")))

    def search_with_urls(self, raw_query: str, k: int = 10,
                         mode: str = "wand") -> DataFrame:
        """Top-k + url — metadata join AFTER the limit (tiny broadcast)."""
        top = self.search(raw_query, k, mode)
        if self._doc_map is None:
            self._doc_map = self._qspark.read.parquet(self.paths.doc_map)
        return (top.join(self._doc_map, "doc_id", "left")
                .orderBy(F.desc("score"), F.asc("doc_id")))

    def search_with_meta(self, raw_query: str, k: int = 10,
                         mode: str = "wand") -> DataFrame:
        """Top-k + url + title + description — full J3 parity with the
        reference result page (src/modules/pagerank.py:119-126,
        document_search_client_CLI.py:57-61). Both joins happen AFTER the
        ``limit(k)``: k rows against a broadcast lookup, never a wide join."""
        with_urls = self.search_with_urls(raw_query, k, mode)
        if self._doc_meta is None:
            self._doc_meta = self._qspark.read.parquet(self.paths.doc_meta)
        meta = self._doc_meta.select("doc_id", "title", "description")
        return (with_urls.join(meta, "doc_id", "left")
                .select("doc_id", "url", "score", "title", "description")
                .orderBy(F.desc("score"), F.asc("doc_id")))

    def search_blended(self, raw_query: str, k: int = 10,
                       mode: str = "wand", alpha: float = 0.1,
                       candidates: int | None = None,
                       with_meta: bool = False) -> DataFrame:
        """BM25 × domain-authority blend — the engine-mode counterpart of
        the reference's backlink-score pass (backlink_analyser.py +
        document_score_calculator authority term).

        Takes the BM25 top-C (C = ``candidates`` or max(10k, 100)), joins
        each hit's base URL against the persisted ``domain_scores`` table
        (plans.backlinks.refresh_domain_scores), and re-ranks by
        ``bm25 * (1 + alpha * ln(1 + authority))`` — a multiplicative boost
        so zero-authority domains keep their BM25 order and alpha=0 is
        exactly plain BM25. Missing scores table → authority 0 everywhere
        (detected by attempting the read — not a local-FS isdir probe — so
        hdfs://, s3:// index roots blend too; the fallback is logged).

        → (doc_id, url, score, bm25, authority), (score desc, doc_id asc).
        The candidate set is k-bounded, the scores table is one row per
        domain: both joins are post-limit broadcasts."""
        from ..functions.urlfns import base_url_col

        c = candidates or max(10 * k, 100)
        top = self.search_with_urls(raw_query, c, mode) \
            .withColumnRenamed("score", "bm25")
        if self._domain_scores is None:
            # attempt the read and catch ONLY the missing-path error (works
            # for any Hadoop filesystem, unlike an os.path.isdir probe):
            # a corrupt or unreadable table must RAISE, not silently serve
            # authority=0. Not memoized as missing: the table may appear
            # after a later backlinks_job run and the next query picks it up
            from pyspark.errors import AnalysisException
            try:
                scores_df = self._qspark.read.parquet(self.paths.domain_scores)
                scores_df.schema  # force resolution now, not at join time
                self._domain_scores = scores_df
            except AnalysisException as e:
                cond = (e.getCondition() if hasattr(e, "getCondition")
                        else e.getErrorClass())
                if (cond or "") != "PATH_NOT_FOUND":
                    raise
                import logging
                logging.getLogger(__name__).warning(
                    "domain_scores table missing at %s — search_blended "
                    "falling back to plain BM25 (authority=0)",
                    self.paths.domain_scores)
        top = top.withColumn("_base", base_url_col(F.col("url")))
        if self._domain_scores is not None:
            scores = self._domain_scores.select(
                F.col("domain").alias("_base"), F.col("score").alias("_auth"))
            top = top.join(F.broadcast(scores), "_base", "left")
        else:
            top = top.withColumn("_auth", F.lit(None).cast("double"))
        blended = (top
                   .withColumn("authority", F.coalesce("_auth", F.lit(0.0)))
                   .withColumn("score",
                               F.col("bm25") *
                               (1.0 + F.lit(alpha) * F.log1p(F.col("authority")))))
        out = (blended
               .select("doc_id", "url", "score", "bm25", "authority")
               .orderBy(F.desc("score"), F.asc("doc_id"))
               .limit(k))
        if not with_meta:
            return out
        # title/description AFTER the limit, like search_with_meta
        if self._doc_meta is None:
            self._doc_meta = self._qspark.read.parquet(self.paths.doc_meta)
        meta = self._doc_meta.select("doc_id", "title", "description")
        return (out.join(meta, "doc_id", "left")
                .select("doc_id", "url", "score", "bm25", "authority",
                        "title", "description")
                .orderBy(F.desc("score"), F.asc("doc_id")))
