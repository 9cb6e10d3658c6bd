"""Extra benchmarks for optimization work (guide §1) — NOT the driver bench.

Times individual __spark_entry__ queries with exactly bench.py's methodology
(build + .count(), min-of-N in one session) so numbers are comparable to
BENCH_r*.json, at any SF dir. Optionally also times a noop-sink run
(df.write.format("noop")) to isolate computation from count()'s pruning,
and dumps .explain("formatted") to plans/.

Usage:
  python bench_extra.py [query ...]            # default: all queries
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 BENCH_TRIALS=3 \
      python bench_extra.py dedup_ngram_jaccard clean_corpus
Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_TRIALS        (default 3)
  BENCH_NOOP=1        also time a noop-sink write per query
  BENCH_PLANS=dir     dump explain("formatted") per query into dir
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = max(1, int(os.environ.get("BENCH_TRIALS", "3")))
NOOP = os.environ.get("BENCH_NOOP", "0") == "1"
PLANS_DIR = os.environ.get("BENCH_PLANS", "")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("paraocr_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("PARAOCR_ARROW_BATCH", "1024"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_q = entrymod.queries()
    names = sys.argv[1:] or list(all_q)
    out: dict[str, dict] = {}
    try:
        for name in names:
            fn = all_q[name]
            walls, noops = [], []
            for t in range(TRIALS):
                spark.sparkContext.setJobDescription(f"{name} count t{t}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                walls.append(time.perf_counter() - t0)
            if NOOP:
                for t in range(TRIALS):
                    spark.sparkContext.setJobDescription(f"{name} noop t{t}")
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                    noops.append(time.perf_counter() - t0)
            if PLANS_DIR:
                os.makedirs(PLANS_DIR, exist_ok=True)
                plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(os.path.join(PLANS_DIR, f"{name}.txt"), "w") as f:
                    f.write(plan)
            rec = {"min": round(min(walls), 3),
                   "all": [round(w, 3) for w in walls]}
            if noops:
                rec["noop_min"] = round(min(noops), 3)
                rec["noop_all"] = [round(w, 3) for w in noops]
            out[name] = rec
            print(json.dumps({name: rec}), flush=True)
        print(json.dumps({"sf_dir": SF_DIR, "trials": TRIALS, "results": out}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
