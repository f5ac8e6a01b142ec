#!/usr/bin/env python
"""Measurement-only scaled fixture builder (optimization round 6).

The driver's round-end bench may run at a larger driver-generated scale
factor (BENCH_r05 ran at sf=1.0) whose data this sandbox no longer has.
This script builds an APPROXIMATE larger scale factor by stacking K
key-shifted copies of /root/testdata/sf0.1 — key columns are offset per
replica so joins keep their per-key fan-out and groupBys get K× more
groups, which is how the real generator scales too.

Used ONLY to time heavy queries while optimizing (bench_extra.py); the
frozen bench.py and the driver's own measurement are untouched. Output
goes under /root/scaled/ (never /root/testdata — that tree is read-only
per TESTDATA.md).

Usage: python scripts/make_scaled_sf.py [K] [out_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/scaled/sf1.0"

# per-table key columns to shift, with per-replica offsets chosen far above
# the sf0.1 key ranges; join partners share the same offset so the join
# graph scales instead of cross-wiring replicas
OFF = 10_000_000
SHIFTS = {
    "customer": {"c_custkey": OFF},
    "orders": {"o_orderkey": OFF, "o_custkey": OFF},
    "lineitem": {"l_orderkey": OFF, "l_partkey": OFF, "l_suppkey": OFF},
    "part": {"p_partkey": OFF},
    "supplier": {"s_suppkey": OFF},
    "documents": {"doc_id": OFF},
    "events": {"event_id": OFF, "user_id": OFF},
    "embeddings": {"vec_id": OFF},
    "nation": {},   # fixed dims: single copy
    "region": {},
}


def main() -> None:
    from pyspark.sql import functions as F
    from search_engine_tr_spark.session import get_spark

    spark = get_spark(app="make_scaled_sf")
    os.makedirs(OUT, exist_ok=True)
    for name, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        if not shifts:  # dimension table: copy once
            src.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
            continue
        parts = []
        for r in range(K):
            df = src
            for col, off in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(r * off))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
        print(name, "->", out.count())
    spark.stop()


if __name__ == "__main__":
    main()
