"""Distributed reference-parity ranker — the reference's §3.1 pipeline as
DataFrame operations, rank-identical to the oracle.

Replicates, fully distributed (quirks from SURVEY.md §8):
- Q3 first-match survivorship: per (doc, query word) only the first index
  row in scan order survives. Scan order = (partition_rank(word), page_seq,
  first-occurrence-of-word-in-doc, location); within a (doc, word) group
  that minimum is simply (positions[0], tags[0]) of the flat posting.
- Q2 candidate-relative TF-IDF with the duplicate-query-word double count:
  a word with multiplicity m in the query gets counts[w] = m²·df_w and its
  term added m times → contribution m · tf · log10(N / (m²·df_w)).
- Q4 pinned argmax by the FIRST matched query word's tf, first-maximal in
  candidate order (doc order = first appearance in scan order).
- Q5 sequential z-score re-rank over candidates minus the pinned doc:
  authority pass REPLACES the score (0.8·z(idf) + 0.1·z(auth)), then
  += 0.3·z(tag weights), += 0.5·z(proximity); population σ.
- Q6 ties: (score desc, doc_order asc) — the oracle's stable-sort outcome.

Floating point: scores match the scalar oracle to ~1 ulp (distributed sums
reassociate); ranks are identical except for engineered sub-ulp near-ties,
which the fixtures (and the reference's own data) do not produce — exact
ties stay exactly tied and break identically by doc_order.

Scale shape: the candidate set stays distributed end-to-end; normalization
stats are single-row aggregates broadcast back (functions.normalize);
proximity is per-row array math (no self-join); the only global operations
are two ``orderBy().limit()`` top-k's (TakeOrderedAndProject, no full sort).
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normalize import z_score_col
from ..functions.text import normalize_query
from ..functions.urlfns import base_url_col
from ..oracle.htmltext import TAG_WEIGHTS
from ..oracle.refscore import preprocess_words

_EMPTY_SCHEMA = "rank int, url string, score double, pinned boolean"


def _partition_rank_col(term):
    """word.lower()[0] → 0..25 for a..z else 26 ('default') — db.py:105-109."""
    pairs = [x for i, c in enumerate(string.ascii_lowercase)
             for x in (F.lit(c), F.lit(i))]
    m = F.create_map(*pairs)
    return F.coalesce(m[F.substring(F.lower(term), 1, 1)], F.lit(26))


def page_seq_map(pages: DataFrame) -> DataFrame:
    """(url, page_seq): crawl/insertion-order surrogate = warc_ts order.

    Parity-mode helper; the global window is acceptable at parity-test scale
    (the engine's BM25 mode never needs a global insertion order).
    """
    return pages.select(
        "url",
        (F.row_number().over(Window.orderBy("warc_ts", "url")) - 1).alias("page_seq"))


def reference_rank(postings: DataFrame, doc_meta: DataFrame, raw_query: str,
                   domain_scores: DataFrame | None = None, k: int = 10,
                   tag_weights: dict[str, float] | None = None) -> DataFrame:
    """→ DataFrame(rank, url, score, pinned) — top-k, reference semantics.

    postings: (doc_id, term, tf, positions, tags) flat logical index
    doc_meta: (doc_id, url, page_seq)
    domain_scores: (domain, score), domain = base URL ('scheme://host')
    """
    spark = postings.sparkSession
    tag_weights = tag_weights or TAG_WEIGHTS
    qpp = preprocess_words(normalize_query(raw_query))
    if not qpp:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    mult: dict[str, int] = {}
    first_pos: dict[str, int] = {}
    for i, w in enumerate(qpp):
        mult[w] = mult.get(w, 0) + 1
        first_pos.setdefault(w, i)
    terms_df = F.broadcast(spark.createDataFrame(
        [(t, mult[t], first_pos[t]) for t in mult], "term string, m int, qpos int"))

    # candidate wf rows: Q3 first match per (doc, word) = (positions[0], tags[0])
    cand = (postings.join(terms_df, "term")
            .select("doc_id", "term", "tf", "m", "qpos",
                    F.element_at("positions", 1).alias("first_loc"),
                    F.element_at("tags", 1).alias("tag"))
            .withColumn("part_rank", _partition_rank_col(F.col("term"))))
    # candidate-relative df: one row per (doc, term) → count per term (Q2)
    cand = cand.join(F.broadcast(
        cand.groupBy("term").agg(F.count("*").alias("df_w"))), "term").cache()

    n_docs = cand.agg(F.countDistinct("doc_id")).collect()[0][0]
    if not n_docs:
        cand.unpersist()
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    tw_map = F.create_map(*[F.lit(x) for kv in tag_weights.items() for x in kv])
    contrib = (F.col("m") * F.col("tf") *
               F.log10(F.lit(float(n_docs)) /
                       (F.col("m") * F.col("m") * F.col("df_w"))))

    per_doc = (cand
               .withColumn("_contrib", contrib)
               .groupBy("doc_id")
               .agg(
                   F.sum("_contrib").alias("idf_score"),
                   F.min(F.struct("part_rank", "first_loc")).alias("_scan0"),
                   F.min(F.struct("qpos", "tf")).alias("_firstwf"),
                   (F.sum(F.col("m") * F.coalesce(tw_map[F.col("tag")], F.lit(1.0)))
                    / F.sum("m")).alias("tag_mean"),
                   F.sort_array(F.collect_list(
                       F.struct("qpos", "first_loc"))).alias("_locs"),
               )
               .join(doc_meta, "doc_id")
               .withColumn("doc_order", F.struct(
                   F.col("_scan0.part_rank"), F.col("page_seq"),
                   F.col("_scan0.first_loc")))
               .withColumn("first_tf", F.col("_firstwf.tf")))

    # proximity: min pairwise |loc_i − loc_j| across different query words
    locs = F.col("_locs.first_loc")
    per_doc = per_doc.withColumn(
        "prox_min",
        F.when(F.size("_locs") < 2, F.lit(None)).otherwise(
            F.array_min(F.flatten(F.transform(
                F.sequence(F.lit(0), F.size(locs) - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size(locs) - 1),
                    lambda j: F.abs(F.element_at(locs, i + 1)
                                    - F.element_at(locs, j + 1))))))))
    per_doc = per_doc.withColumn(
        "proximity",
        F.when(F.col("prox_min").isNull(), F.lit(1.0))
         .otherwise(F.lit(1.0) / (F.lit(1.0) + F.col("prox_min"))))

    # domain authority (J2): left join on base URL, missing → 0
    per_doc = per_doc.withColumn("_base", base_url_col(F.col("url")))
    if domain_scores is not None:
        per_doc = (per_doc.join(
            F.broadcast(domain_scores
                        .withColumnRenamed("domain", "_base")
                        .withColumnRenamed("score", "_auth")),
            "_base", "left")
            .withColumn("authority", F.coalesce(F.col("_auth"), F.lit(0.0))))
    else:
        per_doc = per_doc.withColumn("authority", F.lit(0.0))

    per_doc = per_doc.select("doc_id", "url", "idf_score", "first_tf",
                             "doc_order", "tag_mean", "proximity",
                             "authority").cache()

    # Q4: pinned = argmax(first_tf), first-maximal in doc_order
    pinned_rows = (per_doc.orderBy(F.desc("first_tf"), F.asc("doc_order"))
                   .limit(1).collect())
    pinned = pinned_rows[0]

    rest = per_doc.filter(F.col("doc_id") != pinned["doc_id"])
    # Q5: sequential z-score passes (population σ) over the rest
    rest = z_score_col(rest, "idf_score", "z_idf")
    rest = z_score_col(rest, "authority", "z_auth")
    rest = z_score_col(rest, "tag_mean", "z_tag")
    rest = z_score_col(rest, "proximity", "z_prox")
    rest = rest.withColumn(
        "score",
        F.lit(0.8) * F.col("z_idf") + F.lit(0.1) * F.col("z_auth")
        + F.lit(0.3) * F.col("z_tag") + F.lit(0.5) * F.col("z_prox"))

    topk = (rest.orderBy(F.desc("score"), F.asc("doc_order"))
            .limit(max(k - 1, 0))
            .select("url", "score")
            .collect())
    out = [(0, pinned["url"], float(pinned["idf_score"]), True)] + [
        (i + 1, r["url"], float(r["score"]), False) for i, r in enumerate(topk)
    ]
    cand.unpersist()
    per_doc.unpersist()
    return spark.createDataFrame(out, _EMPTY_SCHEMA)
