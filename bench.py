"""Benchmark harness (driver-run per round; see BASELINE.md).

TIMED-SECTION DEFINITION (pinned round 3; BENCH_DOCS default raised
20k -> 100k in round 4 — VERDICT r3 #5 — so the headline tracks the
kernel again; the timing boundaries themselves are unchanged, and 20k
numbers remain reproducible via BENCH_DOCS=20000):

  * ``extract_synthetic`` / ``docs_per_sec``: wall of ONE
    ``run_and_write`` over BENCH_DOCS synthetic pages (pages parquet is
    materialized UNTIMED first) with ``PipelineConfig(run_id="bench")``
    defaults — covers resume anti-join (no-op), salting, kernel, shard
    reassembly, the (run_id, warc_bucket=64) partitioned output write, and
    the accumulator-fused lineage append (round 5: the former read-back +
    write jobs are gone). docs_per_sec = rows / that wall. At 20k
    docs ~8-10 s of FIXED machinery dominated, so the headline moved with
    scheduling noise (+-15% run-to-run); at 100k the fixed share is
    amortized and docs_per_sec reproduces to +-3% (measured r4:
    5375/5680). Note the Python kernel is ~15% of this wall at 32 cores
    (87.8 kernel-cpu-s / 32 vs ~18 s wall) — the rest is scan, Arrow IPC,
    and the partitioned parquet write, which scale WITH docs, so no
    BENCH_DOCS makes the kernel >50% of wall; docs_per_sec is the ENGINE
    throughput headline, kernel_cpu_sec below is the kernel signal.
  * ``kernel_cpu_sec``: sum(wall_time_s) from the run's lineage table —
    pure Python-kernel seconds across all tasks, the number the 100 TB
    constant factor scales with. Stable to +-5% and moves 1:1 with kernel
    changes. Round-over-round comparisons at the 20k basis: r2 27.5 ->
    r3 21.7 -> r4 16.1 (scale linearly for other BENCH_DOCS).
  * per-query seconds: build + ``.count()`` of each __spark_entry__ query
    at $SPARK_GRAFT_SF_DIR, run sequentially in one session in dict order.
    Queries are independent: nothing persisted outlives its query (round
    2's numbers were NOT independent — a leaked persist inside dedup fed
    later queries via CacheManager plan matching; since round 4 the dedup
    queries persist shingles ONLY inside a scoped shingle_cache that is
    released before the query returns).

Prints ONE JSON line:
  {"metric": "...", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ..., ...}

TRIAL HYGIENE (round 5 — VERDICT r4 #4): every timed section runs
BENCH_TRIALS times (default 3) and reports the MIN (host noise on this
shared-kernel sandbox is strictly additive — see BENCH/BASELINE.md
forensics — so min estimates true capacity); medians ride along in
``queries_median`` so a reader can judge spread. Round <=4 numbers were
single trials.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_DOCS (default 100000) synthetic extraction corpus size,
     BENCH_TRIALS (default 3) trials per timed section.
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
N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))
TRIALS = max(1, int(os.environ.get("BENCH_TRIALS", "3")))


def _median(vals: list) -> float:
    s = sorted(vals)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2.0


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
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("PARAOCR_ARROW_BATCH", "1024"))
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
        ex_walls, ex_metrics = [], []
        for trial in range(TRIALS):
            tdir = os.path.join(workdir, f"t{trial}")
            t0 = time.perf_counter()
            m = run_and_write(
                spark, pages,
                os.path.join(tdir, "extracted"),
                os.path.join(tdir, "lineage"),
                PipelineConfig(run_id="bench"),
            )
            ex_walls.append(time.perf_counter() - t0)
            ex_metrics.append(m)
            shutil.rmtree(tdir, ignore_errors=True)  # bound disk across trials
        best_i = min(range(TRIALS), key=lambda i: ex_walls[i])
        extract_wall = ex_walls[best_i]
        metrics = ex_metrics[best_i]
        kernel_cpu = metrics["kernel_cpu_s"]

        # ---- per-query timings at SF_DIR ---------------------------------
        qtimes: dict[str, float] = {}
        qmedian: dict[str, float] = {}
        for name, fn in entrymod.queries().items():
            walls = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                try:
                    fn(spark, SF_DIR).count()
                    walls.append(time.perf_counter() - t0)
                except Exception:
                    walls.append(-1.0)
                    break
            if any(w < 0 for w in walls):
                qtimes[name] = qmedian[name] = -1.0
            else:
                qtimes[name] = round(min(walls), 3)
                qmedian[name] = round(_median(walls), 3)

        total = round(extract_wall + sum(v for v in qtimes.values() if v > 0), 3)
        out = {
            "metric": "extract_pipeline_plus_queries_wall",
            "value": total,
            "unit": "sec",
            "queries": {"extract_synthetic": round(extract_wall, 3), **qtimes},
            "queries_median": {
                "extract_synthetic": round(_median(ex_walls), 3), **qmedian
            },
            "trials": TRIALS,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "bench_docs": N_DOCS,
            "cpus": CPUS,
            "docs_per_sec": round(metrics["docs_per_sec"], 2),
            "docs_per_sec_trials": [
                round(m["docs_per_sec"], 2) for m in ex_metrics
            ],
            "extract_rows": metrics["rows"],
            "kernel_cpu_sec": round(kernel_cpu or 0.0, 3),
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
