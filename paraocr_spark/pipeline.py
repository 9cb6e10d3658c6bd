"""End-to-end batch extraction pipeline (the engine's `run`).

Spark re-expression of the reference's OCRRunner.run five-stage engine
(parallel.py:214-597) as one declarative plan:

    read pages -> resume anti-join (cli.py:227-231 analog)
               -> salt giant docs (skew; SURVEY.md §4.2 gap fix)
               -> mapInPandas extract kernel (stages 2-4 of the reference)
               -> shard reassembly (A1/A3 analog, deterministic ordering)
               -> append extracted (S5) + lineage (S7) tables

Everything before and after the kernel is Catalyst-visible: the resume
anti-join broadcasts when small, lang/url prefilters push to the parquet
scan, and AQE handles post-shuffle sizing at any scale.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paraocr_spark.operators.extract import extract_pages
from paraocr_spark.operators.lineage import config_fingerprint, lineage_rollup
from paraocr_spark.operators.resume import filter_unprocessed
from paraocr_spark.sources import io as pio

EXTRACTED_COLS = [
    "url", "warc_ts", "lang", "extracted_text", "spans", "method", "error",
    "features",
]


@dataclass
class PipelineConfig:
    """Job knobs — the OCRConfig analog (config.py:22-62), spark-submit args.

    ``backend`` selects the extractor strategy by registry name or dotted
    module.Class path (backends.py) — the --ocr-backend analog
    (cli.py:101-123). It feeds the fingerprint, so swapping backends
    invalidates resume checkpoints like the reference's cache_version bump.
    ``ignore_url_keywords``: documents whose url matches any keyword
    (case-insensitive substring) are skipped BEFORE extraction — the
    --ignore-keywords analog (cli.py:249-251), pushed into the source scan.
    """
    run_id: str = "run0"
    salt: bool = True
    min_partitions: int | None = None
    backend: str = "default"
    backend_kwargs: dict = field(default_factory=dict)
    ignore_url_keywords: list = field(default_factory=list)
    #: optional parquet path for SHARD-level partial-result reuse on giant
    #: docs — the analog of the reference's per-page txt cache
    #: (parallel.py:431-448): a killed run's finished shards are never
    #: re-extracted on resume
    shard_cache_path: str | None = None
    #: bucket(warc_ts) fan-out of the output layout (Iceberg bucket(N)
    #: analog): size to the table, not the cluster — hundreds at 100 TB,
    #: ~2x cores for small runs
    warc_buckets: int = 64
    extra: dict = field(default_factory=dict)

    @property
    def fingerprint(self) -> str:
        return config_fingerprint(
            {
                "salt": self.salt,
                "version": 1,
                "backend": self.backend,
                "backend_kwargs": self.backend_kwargs,
                "ignore_url_keywords": sorted(self.ignore_url_keywords),
                **self.extra,
            }
        )


def ignore_keyword_filter(pages: DataFrame, keywords: list) -> DataFrame:
    """Drop pages whose url contains any keyword, case-insensitive — the
    S3 ignore-keyword filter (cli.py:249-251 analog). A plain Catalyst
    filter sitting directly above the scan: evaluated JVM-side before any
    Python ever sees the row."""
    if not keywords:
        return pages
    low = F.lower(F.col("url"))
    cond = F.lit(False)
    for k in keywords:
        cond = cond | low.contains(k.lower())
    return pages.where(~cond)


def extract_with_shard_cache(
    spark: SparkSession, todo: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Extraction with SHARD-granular partial-result reuse for giant docs.

    The reference resumes at page granularity via its txt cache
    (parallel.py:431-448): pages finished before a crash are never redone.
    Spark's parquet job commit is all-or-nothing per WRITE, so whole-doc
    resume (the url anti-join) loses every finished shard of an interrupted
    run. This path closes that gap for the expensive rows: giant-doc shards
    are extracted first and appended to a cache table keyed by
    (url, shard_id, config_fp); reassembly always reads from the cache, and
    a resumed run anti-joins against it so only MISSING shards pay the
    kernel. Normal docs keep whole-doc granularity — they are small, and a
    per-doc cache write for 99% of the corpus would double the write volume.

    NOTE eager: appending fresh shards to the cache is an ACTION (runs the
    giant kernel when called); the returned DataFrame is lazy only in the
    normal-doc branch + reassembly. Reused shards keep their original
    _pid/_doc_bytes/_wall_s, so a resumed run's lineage attributes cached
    work to the invocation that actually did it.
    """
    from paraocr_spark.operators.extract import (
        _merge_shards_relational,
        extract_kernel,
        split_normal_giants,
    )
    from paraocr_spark.operators.skew import salt_pages

    import os

    # recover a gc_shard_cache swap that crashed between its two renames:
    # the __old backup IS the pre-GC cache — restore it rather than
    # silently re-extracting every giant shard
    _backup = cfg.shard_cache_path.rstrip("/") + "__old"
    if os.path.isdir(_backup) and not os.path.isdir(cfg.shard_cache_path):
        os.rename(_backup, cfg.shard_cache_path)

    normal, giant_pages = split_normal_giants(todo)
    shards = salt_pages(giant_pages)
    cache: DataFrame | None = None
    try:
        cache = spark.read.parquet(cfg.shard_cache_path)
    except Exception:
        cache = None  # first run: no cache yet
    shards_todo = shards
    if cache is not None:
        done_keys = (
            cache.where(F.col("config_fp") == cfg.fingerprint)
            .select("url", "shard_id")
        )
        shards_todo = shards.join(done_keys, ["url", "shard_id"], "left_anti")
    # skip the append entirely on a fully-cached resume: the emptiness probe
    # runs only the (kernel-free) salt + anti-join plan, while an
    # unconditional append would run a write job per resume and accumulate
    # zero-row files the compactor never covers
    if cache is None or not shards_todo.isEmpty():
        fresh = extract_kernel(
            shards_todo, cfg.backend, cfg.backend_kwargs
        ).withColumn("config_fp", F.lit(cfg.fingerprint))
        fresh.write.mode("append").parquet(cfg.shard_cache_path)

    relevant = (
        spark.read.parquet(cfg.shard_cache_path)
        .where(F.col("config_fp") == cfg.fingerprint)
        # this run's giants only (the cache may hold other runs' urls), and
        # one row per shard even if an at-least-once append duplicated any
        .join(giant_pages.select("url").distinct(), "url", "left_semi")
        .dropDuplicates(["url", "shard_id"])
        .drop("config_fp")
    )
    singles = extract_kernel(normal, cfg.backend, cfg.backend_kwargs).drop(
        "shard_id", "n_shards"
    )
    return singles.unionByName(_merge_shards_relational(relevant))


def gc_shard_cache(spark: SparkSession, cache_path: str, keep_fp: str,
                   target_file_mb: int = 256) -> dict:
    """Shard-cache maintenance: drop stale config_fp generations (rows whose
    fingerprint no longer matches any live config) and compact the small
    files that incremental appends accumulate. Staging-dir + rename swap,
    same object-store caveat as sources/io.compact_table.

    Crash safety: a prior run may have died between the two renames (cache
    gone, data stranded at ``__old``) or left a stale ``__gc``/``__old``
    dir. Both are reconciled up front: a leftover backup with no live cache
    is renamed back (nothing is ever lost — the backup IS the pre-GC
    cache), and stale staging/backup dirs are removed so this run's
    renames cannot collide with them. MUST NOT run concurrently with
    extract_with_shard_cache — the swap is not snapshot-isolated (use the
    Iceberg branch for that)."""
    import math
    import os
    import pathlib
    import shutil

    staging = cache_path.rstrip("/") + "__gc"
    backup = cache_path.rstrip("/") + "__old"
    if os.path.isdir(backup) and not os.path.isdir(cache_path):
        os.rename(backup, cache_path)  # crashed mid-swap: restore backup
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)

    try:
        df = spark.read.parquet(cache_path)
    except Exception:
        return {"files_before": 0, "files_after": 0, "rows_kept": 0}
    files_before = len(list(pathlib.Path(cache_path).rglob("*.parquet")))
    keep = (
        df.where(F.col("config_fp") == keep_fp)
        .dropDuplicates(["url", "shard_id"])
    )
    total = sum(
        f.stat().st_size for f in pathlib.Path(cache_path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    keep.repartition(n_files).write.mode("overwrite").parquet(staging)
    os.rename(cache_path, backup)
    os.rename(staging, cache_path)
    shutil.rmtree(backup, ignore_errors=True)
    kept = spark.read.parquet(cache_path)
    files_after = len(list(pathlib.Path(cache_path).rglob("*.parquet")))
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows_kept": kept.count(),
    }


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    done: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (extracted, lineage) DataFrames — lazily, caller writes/acts.

    ``done`` is the prior output for resume (None = fresh run).
    """
    from paraocr_spark.backends import preflight_backend

    cfg = cfg or PipelineConfig()
    preflight_backend(cfg.backend, cfg.backend_kwargs)  # fail fast on driver
    pages = ignore_keyword_filter(pages, cfg.ignore_url_keywords)
    todo = filter_unprocessed(pages, done, cfg.fingerprint)
    if cfg.min_partitions:
        # round-robin spread: evens out HTML-size skew without a key shuffle
        todo = todo.repartition(cfg.min_partitions)
    out = extract_pages(todo, salt=cfg.salt, backend=cfg.backend,
                        backend_kwargs=cfg.backend_kwargs)
    out = out.withColumn("config_fp", F.lit(cfg.fingerprint))
    extracted = out.select(*EXTRACTED_COLS, "config_fp")
    lineage = lineage_rollup(out, cfg.run_id, cfg.fingerprint)
    return extracted, lineage


def run_and_write(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    lineage_path: str,
    cfg: PipelineConfig | None = None,
    done: DataFrame | None = None,
) -> dict:
    """Execute and append to the extracted + lineage tables; returns metrics."""
    import uuid

    from paraocr_spark.backends import preflight_backend

    cfg = cfg or PipelineConfig()
    preflight_backend(cfg.backend, cfg.backend_kwargs)  # fail fast on driver
    # unique per INVOCATION: a resume that reuses the user-facing run_id
    # (the natural way to resume, and the default 'run0') must not roll
    # prior appends' rows into this invocation's lineage/metrics
    invocation_id = f"{cfg.run_id}-{uuid.uuid4().hex[:12]}"
    pages = ignore_keyword_filter(pages, cfg.ignore_url_keywords)
    todo = filter_unprocessed(pages, done, cfg.fingerprint)
    if cfg.min_partitions:
        todo = todo.repartition(cfg.min_partitions)
    # ONE kernel pass, ONE Spark job: the lineage rollup rides the write
    # action itself via a replace-merge accumulator (each kernel task sends
    # its partition totals once, idempotent under retries —
    # operators/lineage.LineageAccParam), and the resulting handful of rows
    # is appended to the lineage table from the driver with pyarrow. The
    # previous shape (write job, then a read-back scan of the written table
    # for the rollup, then a third job to write it) paid two extra
    # scheduler/commit round-trips per run — the dominant share of the
    # f≈27.5 s Amdahl fixed cost that capped 1x2->4x2 scaling in the r4
    # ladder decomposition. The read-back path survives below for the
    # shard-cache route, where reused shards never run the kernel this
    # invocation and so never reach the accumulator.
    from paraocr_spark.operators.lineage import (
        LineageAccParam,
        lineage_rows_from_acc,
    )

    use_cache_path = bool(cfg.shard_cache_path and cfg.salt)
    acc = None if use_cache_path else spark.sparkContext.accumulator(
        {}, LineageAccParam()
    )
    t0 = time.perf_counter()  # before plan build: the shard-cache path is eager
    extracted_df = (
        extract_with_shard_cache(spark, todo, cfg)
        if use_cache_path
        else extract_pages(todo, salt=cfg.salt, backend=cfg.backend,
                           backend_kwargs=cfg.backend_kwargs, lineage_acc=acc)
    )
    out = (
        extracted_df
        .withColumn("config_fp", F.lit(cfg.fingerprint))
        .withColumn("run_id", F.lit(cfg.run_id))
        .withColumn("invocation_id", F.lit(invocation_id))
    )
    pio.write_extracted(out, out_path, n_buckets=cfg.warc_buckets)
    t_write = time.perf_counter() - t0
    if acc is not None:
        lin_rows = lineage_rows_from_acc(
            acc.value, cfg.run_id, cfg.fingerprint, invocation_id
        )
    else:
        # shard-cache invocations: reused shards carry their ORIGINAL
        # metric columns in the written table, so the exact rollup needs
        # the read-back scan. run_id prunes to this run's partition dirs;
        # invocation_id (constant per file) lets parquet stats skip earlier
        # resumes' files without reading their pages.
        written = pio.read_table(spark, out_path).where(
            (F.col("run_id") == cfg.run_id)
            & (F.col("invocation_id") == invocation_id)
        )
        lin = lineage_rollup(written, cfg.run_id, cfg.fingerprint,
                             invocation_id)
        lin_rows = [r.asDict() for r in lin.collect()]
    n = sum(r["doc_count"] for r in lin_rows)
    pio.write_lineage_rows(lin_rows, lineage_path)
    wall = time.perf_counter() - t0
    return {
        "rows": n,
        "wall_s": wall,
        "docs_per_sec": (n / wall if wall > 0 else 0.0),
        # total Python-kernel seconds across all tasks — lets scaling
        # harnesses decompose "did the KERNEL scale" from wall-clock
        # effects (fixed tails, host walls)
        "kernel_cpu_s": sum(r["wall_time_s"] for r in lin_rows),
        "invocation_id": invocation_id,
        # phase decomposition: everything after the write action is
        # per-run fixed cost — watch it stay negligible
        "phase_s": {
            "write_job": round(t_write, 3),
            "lineage": round(wall - t_write, 3),
        },
    }
