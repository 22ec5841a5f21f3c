#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (bench.py is
frozen for driver measurement; this file is builder-side instrumentation
only — guide §1).

Usage:
  python bench_extra.py time  <query> [query...]   # best-of-N wall secs, count() like bench.py
  python bench_extra.py noop  <query> [query...]   # noop-sink full-materialization secs (guide §1.4)
  python bench_extra.py plan  <query> [query...]   # write .explain("formatted") to plans/r06/<q>_<tag>.txt
  python bench_extra.py all   <query> [query...]   # time + plan

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), BENCH_EXTRA_REPS (default 2), BENCH_EXTRA_TAG (plan file
suffix, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    from bench import build_spark

    spark = build_spark(CPUS)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        if mode in ("plan", "all"):
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, SF_DIR)
            p = f"plans/r06/{name}_{TAG}.txt"
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {p}", file=sys.stderr)
        if mode in ("time", "all"):
            spark.sparkContext.setJobDescription(f"time:{name}")
            best, samples = float("inf"), []
            for _ in range(REPS):
                t0 = time.time()
                n = fn(spark, SF_DIR).count()
                dt = time.time() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
            out[name] = {"best": round(best, 3), "samples": samples, "rows": n}
            spark.sparkContext.setJobDescription(None)
        if mode == "noop":
            spark.sparkContext.setJobDescription(f"noop:{name}")
            best, samples = float("inf"), []
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
            out[name] = {"best": round(best, 3), "samples": samples}
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    if out:
        print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
