#!/usr/bin/env python
"""spark-submit entrypoint: streaming ingestion of page files into the
queryable block index (cold-start bootstrap + exactly-once appends).

Usage:
    spark-submit --py-files dist/search_engine_tr_spark.zip \
        jobs/ingest_stream_job.py <pages_dir> <index_dir> <checkpoint_dir> \
        [--shards 32] [--term-buckets 64]

Run it on a cadence (cron / workflow scheduler): each run drains the new
page files with trigger(availableNow), folds them into the index, and
refreshes the derived tables when the staleness check (doc_map count vs
meta.json) says they lag — so a crash after a committed batch heals on
the next run. The stream checkpoint makes file delivery exactly-once
across runs and crashes; the doc_map anti-join + intent-marker rollback
inside make replayed batches exact no-ops (doc_map is appended LAST as
the batch's commit record — see incremental_index_update). Pair with
jobs/compact_job.py to fold the appended small files back to target-size
parquet.

Sidecar files (meta.json, the ingest-intent marker) go through
plans.fsio, so index_dir may be any Hadoop-supported filesystem.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pages_dir")
    ap.add_argument("index_dir")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--refresh-scores", action="store_true",
                    help="also delta-refresh domain_scores after the drain")
    args = ap.parse_args()

    from search_engine_tr_spark.session import get_spark
    from search_engine_tr_spark.streaming.incremental import \
        stream_ingest_index

    spark = get_spark(app="ingest-stream")
    stats = stream_ingest_index(spark, args.pages_dir, args.index_dir,
                                args.checkpoint_dir, n_shards=args.shards,
                                term_buckets=args.term_buckets,
                                refresh_scores=args.refresh_scores)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
