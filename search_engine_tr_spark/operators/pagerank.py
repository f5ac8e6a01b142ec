"""Link-graph authority: parity in-degree counting + power-iteration PageRank.

Parity mode (``indegree_authority``) reproduces backlink_analyser.py:29-62:
drop same-domain and same-subdomain edges, +1 per remaining edge to the
target's base URL — as one aggregate-then-join instead of the reference's
per-edge point lookups (J4 → A5).

Engine mode (``pagerank``) is the north-star upgrade: damped power iteration
r = (1-d)/N + d·(Σ_in r/outdeg + dangling/N) as DataFrame joins, with
localCheckpoint every few iterations to cut lineage growth. Edges are
deduplicated and the rank/out-degree join is partitioned on src — the
iteration reuses one shuffle partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlfns import base_url_col, registrable_suffix_col


def cross_domain_edges(links: DataFrame) -> DataFrame:
    """Filter F8: drop same-domain and same-subdomain (last-2-labels) edges."""
    return (links
            .withColumn("_sb", base_url_col(F.col("source_url")))
            .withColumn("_tb", base_url_col(F.col("target_url")))
            .withColumn("_ss", registrable_suffix_col(F.col("source_url")))
            .withColumn("_ts", registrable_suffix_col(F.col("target_url")))
            .filter((F.col("_sb") != F.col("_tb")) & (F.col("_ss") != F.col("_ts"))))


def indegree_authority(links: DataFrame, domains: DataFrame | None = None) -> DataFrame:
    """→ (domain, score): +1 per cross-domain backlink to the target's base
    URL. If ``domains`` (domain:string) is given, only scores domains present
    there (the reference skips targets missing from the IP table,
    backlink_analyser.py:50-52) and returns 0 for unlinked ones."""
    counts = (cross_domain_edges(links)
              .groupBy(F.col("_tb").alias("domain"))
              .agg(F.count("*").cast("double").alias("score")))
    if domains is None:
        return counts
    return (domains.join(counts, "domain", "left")
            .select("domain", F.coalesce("score", F.lit(0.0)).alias("score")))


def pagerank(links: DataFrame, damping: float = 0.85, max_iter: int = 20,
             tol: float = 1e-6, checkpoint_every: int = 1,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """→ (node, rank), Σ rank = 1. Dangling mass redistributed uniformly."""
    spark = links.sparkSession
    edges = links.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct()
             .repartition("node")
             .cache())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg")).cache()
    # out_deg is a per-edge constant: attach it to the cached edge table
    # once instead of re-joining it every iteration (round 6, guide §2.4)
    edges = edges.join(out_deg, "src").repartition("src").cache()
    edges.count()
    # the dangling-node SET is iteration-invariant (graph structure, not
    # rank) — compute it once instead of left-joining the full out_deg
    # table every iteration just to find its nulls (round 6, guide §2.4)
    dangling = (nodes.join(out_deg, nodes["node"] == out_deg["src"],
                           "left_anti").cache())

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(max_iter):
        # dangling mass rides the plan as a broadcast 1-row aggregate —
        # no driver collect per iteration; arithmetic order matches the
        # previous literal form bit-for-bit:
        # ((1-d)/n + d*dangling/n) + d*in_mass
        dang = (ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")))
        contribs = (edges.join(ranks, edges["src"] == ranks["node"])
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("out_deg")).alias("c")))
        summed = contribs.groupBy("node").agg(F.sum("c").alias("in_mass"))
        new_ranks = (nodes.join(summed, "node", "left")
                     .crossJoin(F.broadcast(dang))
                     .select("node",
                             (F.lit((1.0 - damping) / n)
                              + F.lit(damping) * F.col("_dang") / F.lit(float(n))
                              + F.lit(damping) *
                              F.coalesce(F.col("in_mass"), F.lit(0.0))).alias("rank")))
        if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
            new_ranks = new_ranks.localCheckpoint()
        if tol > 0:
            # convergence check costs one extra job per iteration — tol=0
            # (fixed-iteration mode, e.g. the gate oracle) skips it
            delta = (new_ranks.alias("n")
                     .join(ranks.alias("o"), "node")
                     .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank")))
                          .alias("l1"))
                     .collect()[0]["l1"])
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
