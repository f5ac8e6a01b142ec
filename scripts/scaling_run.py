#!/usr/bin/env python
"""Two-cluster-size scaling evidence (sandbox protocol, SURVEY.md §5.7).

The north rule's ≥0.8 scaling-efficiency criterion is evidenced by running
the SAME index-build + query job on the SAME parquet input at two
parallelism levels (local[8] vs local[32] — N and 4N cores), in separate
JVMs, and reporting throughput at both plus efficiency = (T_8/T_32)/4.

Usage: python scripts/scaling_run.py [n_pages] → writes BENCH/BASELINE.md
Worker mode (one measurement in a fresh JVM):
       python scripts/scaling_run.py --worker <cores> <pages_path> <out_dir>
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, pages_path: str, out_dir: str) -> None:
    from search_engine_tr_spark.operators.query_bm25 import BM25Index
    from search_engine_tr_spark.plans.index_build import build_index
    from search_engine_tr_spark.session import get_spark
    from search_engine_tr_spark.sources.synth import reference_queries

    spark = get_spark(app=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores)
    pages = spark.read.parquet(pages_path)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    metrics = build_index(spark, pages, out_dir, n_shards=cores,
                          term_buckets=64, collect_metrics=False)
    build_sec = time.monotonic() - t0
    idx = BM25Index(spark, out_dir)
    idx.search("haber").collect()  # warm
    lat = []
    for q in reference_queries():
        t0 = time.monotonic()
        idx.search(q, k=10, mode="wand").collect()
        lat.append(time.monotonic() - t0)
    n_pages = pages.count()
    print("WORKER_RESULT " + json.dumps({
        "cores": cores,
        "build_sec": build_sec,
        "docs_per_sec": n_pages / build_sec,
        "postings_per_sec": metrics["total_postings"] / build_sec,
        "total_postings": metrics["total_postings"],
        "n_pages": n_pages,
        "query_p50_ms": statistics.median(lat) * 1000,
        "query_p95_ms": sorted(lat)[max(0, int(len(lat) * 0.95) - 1)] * 1000,
    }))
    spark.stop()


def run_worker(cores: int, pages_path: str, out_dir: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cores),
         pages_path, out_dir],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(f"worker {cores} failed:\n{proc.stdout[-2000:]}\n"
                       f"{proc.stderr[-2000:]}")


def main(n_pages: int) -> None:
    from search_engine_tr_spark.session import get_spark
    from search_engine_tr_spark.sources.synth import pages_df_dist

    pages_path = f"/tmp/scaling_pages_{n_pages}"
    if not os.path.exists(pages_path):
        spark = get_spark(app="scaling-gen", cores=32)
        pages_df_dist(spark, n_pages, seed=42).write.mode(
            "overwrite").parquet(pages_path)
        spark.stop()

    r8 = run_worker(8, pages_path, "/tmp/scaling_index_8")
    r32 = run_worker(32, pages_path, "/tmp/scaling_index_32")
    eff = (r8["build_sec"] / r32["build_sec"]) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

Protocol (north rule, sandbox form): identical index-build + BM25-query job
on the SAME {n_pages}-page synthetic input at two parallelism levels in
separate JVMs. Efficiency = speedup / core-ratio = (T_8 / T_32) / 4.

| metric | local[8] | local[32] |
|---|---|---|
| build wall (s) | {r8['build_sec']:.2f} | {r32['build_sec']:.2f} |
| docs/s | {r8['docs_per_sec']:.1f} | {r32['docs_per_sec']:.1f} |
| postings/s | {r8['postings_per_sec']:.0f} | {r32['postings_per_sec']:.0f} |
| BM25 top-10 p50 (ms) | {r8['query_p50_ms']:.0f} | {r32['query_p50_ms']:.0f} |
| BM25 top-10 p95 (ms) | {r8['query_p95_ms']:.0f} | {r32['query_p95_ms']:.0f} |

- total postings: {r8['total_postings']:,}
- **scaling efficiency (8→32 cores): {eff:.3f}** (target ≥ 0.8)

Raw: ```{json.dumps({'r8': r8, 'r32': r32})}```
""")
    print(json.dumps({"efficiency": eff, "r8": r8, "r32": r32}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 12000)
