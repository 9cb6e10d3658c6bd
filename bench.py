"""Benchmark harness (driver-run per round; see BASELINE.md).

Headline: extraction throughput (docs/sec) over a deterministic synthetic
pages table (generated in-executor, materialized untimed to parquet, then
timed read -> extract -> parquet write — the real pipeline shape). Plus
per-query wall times for every __spark_entry__ query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ..., ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_DOCS (default 20000) synthetic extraction corpus size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "20000"))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from paraocr_spark.pipeline import PipelineConfig, run_and_write
    from paraocr_spark.sources.pages import pages_df

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("paraocr_spark_bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="paraocr_bench_")
    try:
        # ---- headline: extraction pipeline over synthetic pages ----------
        pages_path = os.path.join(workdir, "pages")
        pages_df(spark, N_DOCS, CPUS * 2).write.mode("overwrite").parquet(pages_path)

        pages = spark.read.parquet(pages_path)
        t0 = time.perf_counter()
        metrics = run_and_write(
            spark, pages,
            os.path.join(workdir, "extracted"),
            os.path.join(workdir, "lineage"),
            PipelineConfig(run_id="bench"),
        )
        extract_wall = time.perf_counter() - t0

        # ---- per-query timings at SF_DIR ---------------------------------
        qtimes: dict[str, float] = {}
        for name, fn in entrymod.queries().items():
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).count()
                qtimes[name] = round(time.perf_counter() - t0, 3)
            except Exception:
                qtimes[name] = -1.0

        total = round(extract_wall + sum(v for v in qtimes.values() if v > 0), 3)
        out = {
            "metric": "extract_pipeline_plus_queries_wall",
            "value": total,
            "unit": "sec",
            "queries": {"extract_synthetic": round(extract_wall, 3), **qtimes},
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "bench_docs": N_DOCS,
            "cpus": CPUS,
            "docs_per_sec": round(metrics["docs_per_sec"], 2),
            "extract_rows": metrics["rows"],
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
