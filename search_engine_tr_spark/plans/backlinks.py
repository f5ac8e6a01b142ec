"""Standing backlink → domain-authority pipeline.

Reference: ``backlink_analyser.py:29-62`` re-scores every domain from the
backlinks table every 20 minutes (``task_scheduler.py:10-11``): +1 to the
target's base URL per cross-domain backlink, same-domain and
same-subdomain edges skipped. Here that loop is one aggregate over the
``links`` table that ``build_index`` materializes, with an optional
PageRank upgrade, persisted as a ``domain_scores`` table that both the
parity ranker (``operators.refrank.reference_rank``) and the BM25 engine
mode (``BM25Index.search_blended``) consume.

Scale notes: links → edges is map-only; indegree is one groupBy with
map-side partial aggregation; pagerank is the iterative join plan in
``operators.pagerank`` (lineage cut per iteration). The scores table is
one row per domain — tiny relative to the corpus, always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pagerank import (cross_domain_edges, indegree_authority,
                                  pagerank)
from .index_build import IndexPaths


def external_links(links: DataFrame) -> DataFrame:
    """Backlink rows: EXTERNAL hrefs only — the reference stores only
    crawlable absolute links as backlinks; INTERNAL edges would be dropped
    by the same-domain rule anyway and relative hrefs have no host."""
    return links.filter(F.col("link_type") == "EXTERNAL")


def domain_scores_from_links(links: DataFrame,
                             mode: str = "indegree",
                             damping: float = 0.85,
                             max_iter: int = 20) -> DataFrame:
    """→ (domain, score). ``indegree`` is reference parity; ``pagerank``
    runs the damped power iteration over the base-URL graph."""
    ext = external_links(links)
    if mode == "indegree":
        return indegree_authority(ext)
    if mode == "pagerank":
        edges = (cross_domain_edges(ext)
                 .select(F.col("_sb").alias("src"), F.col("_tb").alias("dst")))
        return (pagerank(edges, damping=damping, max_iter=max_iter)
                .select(F.col("node").alias("domain"),
                        F.col("rank").alias("score")))
    raise ValueError(f"unknown mode {mode!r}")


def refresh_domain_scores(spark: SparkSession, index_dir: str,
                          mode: str = "indegree",
                          damping: float = 0.85,
                          max_iter: int = 20) -> dict:
    """Read ``links`` under ``index_dir``, write ``domain_scores``.

    The batch equivalent of the reference's 20-minute rescore loop — run it
    on whatever cadence the deployment wants; every run fully replaces the
    scores (the reference also zeroes before re-adding,
    backlink_analyser.py:36-40)."""
    paths = IndexPaths(index_dir)
    links = spark.read.parquet(paths.links)
    scores = domain_scores_from_links(links, mode, damping, max_iter)
    scores.write.mode("overwrite").parquet(paths.domain_scores)
    out = spark.read.parquet(paths.domain_scores)
    return {"mode": mode, "n_domains": out.count()}
