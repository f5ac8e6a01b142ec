#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): per-query
isolation with the noop sink so computation is timed separately from the
driver-side ``.collect()`` that bench.py (frozen) pays, plus
``.explain("formatted")`` capture for plan audits.

Usage:
  python bench_extra.py noop  q1 q2 ...   # time with noop sink
  python bench_extra.py coll  q1 q2 ...   # time with .collect() (bench parity)
  python bench_extra.py plan  q1 q2 ...   # dump formatted plans to plans/r06/
  python bench_extra.py rows  q1 q2 ...   # row counts

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
Never used by the driver; numbers are cited in OPTIMIZATION_r06.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_DIR", "/dev/shm/spark-bench")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.environ.get("PLAN_DIR", "plans/r06")
PLAN_SUFFIX = os.environ.get("PLAN_SUFFIX", "before")


def main() -> None:
    import __spark_entry__ as entry_mod
    from search_engine_tr_spark.session import get_spark

    mode = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app="bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    qreg = entry_mod.queries()
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{mode}:{name}")
        t0 = time.monotonic()
        df = qreg[name](spark, SF_DIR)
        if mode == "plan":
            os.makedirs(PLAN_DIR, exist_ok=True)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(PLAN_DIR, f"{name}_{PLAN_SUFFIX}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
            continue
        if mode == "noop":
            df.write.format("noop").mode("overwrite").save()
        elif mode == "coll":
            df.collect()
        elif mode == "rows":
            print(name, df.count())
            continue
        out[name] = round(time.monotonic() - t0, 3)
        print(name, out[name], flush=True)
    if out:
        print(json.dumps({"mode": mode, "sf": SF_DIR, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
