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
    """Job knobs — the OCRConfig analog (config.py:22-62), spark-submit args."""
    run_id: str = "run0"
    salt: bool = True
    min_partitions: int | None = None
    extra: dict = field(default_factory=dict)

    @property
    def fingerprint(self) -> str:
        return config_fingerprint(
            {"salt": self.salt, "version": 1, **self.extra}
        )


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    done: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (extracted, lineage) DataFrames — lazily, caller writes/acts.

    ``done`` is the prior output for resume (None = fresh run).
    """
    cfg = cfg or PipelineConfig()
    todo = filter_unprocessed(pages, done, cfg.fingerprint)
    if cfg.min_partitions:
        # round-robin spread: evens out HTML-size skew without a key shuffle
        todo = todo.repartition(cfg.min_partitions)
    out = extract_pages(todo, salt=cfg.salt)
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
    cfg = cfg or PipelineConfig()
    todo = filter_unprocessed(pages, done, cfg.fingerprint)
    if cfg.min_partitions:
        todo = todo.repartition(cfg.min_partitions)
    # ONE kernel pass, NO driver-side cache: write the kernel output
    # (including the per-row metric columns) straight to the sink, then
    # derive the lineage rollup and the row count from the WRITTEN table —
    # a column-pruned parquet scan of three metric columns. Persisting the
    # full corpus in executor memory would not survive 100 TB; re-deriving
    # lineage from the logical plan would re-run the extraction.
    out = (
        extract_pages(todo, salt=cfg.salt)
        .withColumn("config_fp", F.lit(cfg.fingerprint))
        .withColumn("run_id", F.lit(cfg.run_id))
    )
    t0 = time.perf_counter()
    pio.write_extracted(out, out_path)
    # this run's slice of the (append-mode) table: partition-pruned by the
    # run_id predicate, column-pruned to the metric columns. ONE action:
    # the lineage rollup is tiny (a row per partition), so collect it, get
    # the row count from it, and write it back from the driver — instead of
    # separate count + lineage jobs.
    written = pio.read_table(spark, out_path).where(F.col("run_id") == cfg.run_id)
    lin = lineage_rollup(written, cfg.run_id, cfg.fingerprint)
    lin_rows = lin.collect()
    n = sum(r.doc_count for r in lin_rows)
    pio.write_lineage(
        spark.createDataFrame(lin_rows, schema=lin.schema), lineage_path
    )
    wall = time.perf_counter() - t0
    return {"rows": n, "wall_s": wall, "docs_per_sec": (n / wall if wall > 0 else 0.0)}
