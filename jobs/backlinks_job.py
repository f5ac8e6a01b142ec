#!/usr/bin/env python
"""spark-submit entrypoint: refresh domain authority scores from the links
table of a built index (the batch form of the reference's 20-minute
backlink rescore loop, task_scheduler.py:10-11).

Usage:
    spark-submit --py-files dist/search_engine_tr_spark.zip \
        jobs/backlinks_job.py <index_dir> [--mode indegree|pagerank] \
        [--damping 0.85] [--max-iter 20] [--delta]

--delta (indegree only): data-proportional refresh — read only link files
appended since the last run and merge their counts into the scores
(plans.backlinks.refresh_domain_scores for the crash/compaction fallback
rules).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--mode", choices=("indegree", "pagerank"),
                    default="indegree")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--delta", action="store_true",
                    help="incremental indegree refresh (new link files only)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("setr-backlinks").getOrCreate()
    from search_engine_tr_spark.plans.backlinks import refresh_domain_scores

    out = refresh_domain_scores(spark, args.index_dir, mode=args.mode,
                                damping=args.damping, max_iter=args.max_iter,
                                delta=args.delta)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
