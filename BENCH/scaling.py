"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8 at N->4N).

This runs a REAL multi-executor Spark standalone cluster on this machine:
a master plus 4 workers (8 cores / 20g each), then submits the identical
spark-submit job (paraocr_spark/job.py, shipped via --py-files) twice over
the SAME pre-generated pages parquet:

    N  executors: --conf spark.cores.max=8   (1 executor  x 8 cores)
    4N executors: --conf spark.cores.max=32  (4 executors x 8 cores)

Separate executor JVMs with bounded task threads mirror real cluster
topology (and avoid the single-JVM local[32] thread-oversubscription
pathology that makes thread-count scaling unmeasurable). Efficiency =
(docs_per_sec_4N / docs_per_sec_N) / 4. Results land in
BENCH/scaling_results.json and BENCH/BASELINE.md.

Usage:  python3 BENCH/scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7077"
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 48000


def make_zip(tmp: str) -> str:
    """Package the library for --py-files, as the north rule requires."""
    zpath = os.path.join(tmp, "paraocr_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for p in (REPO / "paraocr_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    return zpath


def cluster_up() -> bool:
    r = subprocess.run(["bash", "-c", "ps aux | grep -c '[d]eploy.worker.Worker'"],
                       capture_output=True, text=True)
    return int(r.stdout.strip() or 0) >= 4


def start_cluster() -> None:
    if cluster_up():
        return
    env = dict(os.environ, SPARK_HOME=SPARK_HOME)
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh", "-h", "127.0.0.1",
                    "-p", "7077"], env=env, capture_output=True)
    time.sleep(3)
    subprocess.run([f"{SPARK_HOME}/sbin/start-worker.sh", MASTER,
                    "-c", "8", "-m", "20g"],
                   env=dict(env, SPARK_WORKER_INSTANCES="4"), capture_output=True)
    time.sleep(5)
    if not cluster_up():
        raise SystemExit("standalone cluster failed to start")


def gen_pages(tmp: str) -> str:
    """Pre-generate the shared input once (untimed, like the reference
    excluding model downloads from its timings, tests/benchmark.md:8)."""
    path = os.path.join(tmp, "pages")
    code = (
        "import sys; sys.path.insert(0, r'%s')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[32]')"
        ".config('spark.driver.memory','32g')"
        ".config('spark.ui.enabled','false')"
        ".config('spark.ui.showConsoleProgress','false').getOrCreate())\n"
        "from paraocr_spark.sources.pages import pages_df\n"
        "pages_df(spark, %d, 64).write.mode('overwrite').parquet(r'%s')\n"
        "spark.stop()\n" % (REPO, N_DOCS, path)
    )
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True)
    return path


def run_level(cores_max: int, zpath: str, pages: str, tmp: str) -> dict:
    out = os.path.join(tmp, f"out_{cores_max}")
    lin = os.path.join(tmp, f"lin_{cores_max}")
    cmd = [
        f"{SPARK_HOME}/bin/spark-submit",
        "--master", MASTER,
        "--driver-memory", "8g", "--executor-memory", "20g",
        "--conf", "spark.executor.cores=8",
        "--conf", f"spark.cores.max={cores_max}",
        "--conf", f"spark.sql.shuffle.partitions={cores_max * 2}",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=512",
        "--py-files", zpath,
        str(REPO / "paraocr_spark" / "job.py"),
        "--input", pages,
        "--output", out, "--lineage", lin,
        "--partitions", str(cores_max * 2),
        "--run-id", f"scale{cores_max}",
        "--warmup",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"level {cores_max} failed")
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="paraocr_scale_")
    try:
        start_cluster()
        zpath = make_zip(tmp)
        pages = gen_pages(tmp)
        res8 = run_level(8, zpath, pages, tmp)
        res32 = run_level(32, zpath, pages, tmp)
        eff = (res32["docs_per_sec"] / res8["docs_per_sec"]) / 4.0
        result = {
            "n_docs": N_DOCS,
            "cluster": "standalone, 4 workers x 8 cores x 20g on one host",
            "levels": {
                "N (1 executor x 8 cores)": res8,
                "4N (4 executors x 8 cores)": res32,
            },
            "throughput_docs_per_sec": {
                "N=8": round(res8["docs_per_sec"], 2),
                "4N=32": round(res32["docs_per_sec"], 2),
            },
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
            "pass": eff >= 0.8,
        }
        (REPO / "BENCH" / "scaling_results.json").write_text(
            json.dumps(result, indent=2) + "\n"
        )
        print(json.dumps(result, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
