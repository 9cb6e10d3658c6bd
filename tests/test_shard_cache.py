"""Shard-level partial-result reuse for giant docs — the analog of the
reference's per-page txt cache resume (parallel.py:431-448)."""

import pytest
from pyspark.sql import functions as F

from paraocr_spark.operators.extract import extract_pages
from paraocr_spark.pipeline import PipelineConfig, run_and_write
from paraocr_spark.sources.pages import pages_df

N = 200  # includes giant layout docs at i=9 and i=169 (i%160==9)


def _result_map(df):
    return {
        r.url: (r.extracted_text, r.method, r.error,
                tuple((s["start"], s["end"]) for s in r.spans))
        for r in df.collect()
    }


@pytest.fixture()
def paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("out1", "out2", "lin", "cache")}


def test_shard_cache_identical_results(spark, paths):
    pages = pages_df(spark, N, 4)
    cfg = PipelineConfig(run_id="sc", shard_cache_path=paths["cache"])
    m = run_and_write(spark, pages, paths["out1"], paths["lin"], cfg)
    assert m["rows"] == N
    got = _result_map(
        spark.read.parquet(paths["out1"]).select(
            "url", "extracted_text", "method", "error", "spans")
    )
    exp = _result_map(
        extract_pages(pages).select(
            "url", "extracted_text", "method", "error", "spans")
    )
    assert got == exp


def test_shard_cache_skips_finished_shards(spark, paths):
    """Populate the cache from a one-giant run; the full run must extract
    only the OTHER giant's shards (finished shards never pay the kernel
    again), and a same-config re-run appends nothing."""
    pages = pages_df(spark, N, 4)
    giant9 = pages.where(F.col("url").endswith("/9"))
    cfg = PipelineConfig(run_id="sc", shard_cache_path=paths["cache"])
    run_and_write(spark, giant9, paths["out1"], paths["lin"], cfg)
    cache1 = spark.read.parquet(paths["cache"])
    shards_giant9 = cache1.count()
    assert shards_giant9 > 1, "giant must have been split into shards"

    run_and_write(spark, pages, paths["out2"], paths["lin"], cfg)
    cache2 = spark.read.parquet(paths["cache"])
    # giant 9's shard rows were REUSED, not re-extracted: their count (and
    # first-run partition ids) are unchanged
    assert cache2.where(F.col("url").endswith("/9")).count() == shards_giant9
    # the only additions are the other giant's shards
    added = cache2.count() - shards_giant9
    n_169 = cache2.where(F.col("url").endswith("/169")).count()
    assert added == n_169 and n_169 > 1

    # same config re-run over the same pages: zero new cache rows
    run_and_write(spark, pages, paths["out2"], paths["lin"], cfg,
                  done=spark.read.parquet(paths["out2"]))
    assert spark.read.parquet(paths["cache"]).count() == cache2.count()


def test_shard_cache_invalidated_by_config_change(spark, paths):
    """A different config_fp must NOT reuse cached shards (the reference's
    cache_version semantics)."""
    pages = pages_df(spark, N, 4).where(F.col("url").endswith("/9"))
    cfg_a = PipelineConfig(run_id="a", shard_cache_path=paths["cache"],
                           extra={"v": 1})
    cfg_b = PipelineConfig(run_id="b", shard_cache_path=paths["cache"],
                           extra={"v": 2})
    run_and_write(spark, pages, paths["out1"], paths["lin"], cfg_a)
    n_a = spark.read.parquet(paths["cache"]).count()
    run_and_write(spark, pages, paths["out2"], paths["lin"], cfg_b)
    cache = spark.read.parquet(paths["cache"])
    assert cache.count() == 2 * n_a  # re-extracted under the new fp
    assert cache.select("config_fp").distinct().count() == 2
