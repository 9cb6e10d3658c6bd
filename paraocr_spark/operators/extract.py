"""The vectorized Arrow-batch extraction kernel (the engine's hot path).

Re-expresses the reference's five-stage multiprocessing engine
(parallel.py:214-597: scan -> dispatch -> route -> render+OCR pools ->
merge/write) as ONE ``mapInPandas`` over Arrow batches:

  * routing (fast-path gate, layout-vs-html dispatch, error tagging) is
    fully vectorized — pandas ``.str`` ops and numpy masks, the analogs of
    ``worker_dispatcher`` (processors.py:24-59) and the native-text gate
    (parallel.py:295-334);
  * the heavy per-document parse (DOM tokenize / layout decode) runs only on
    the rows each mask selects — the analog of the reference's render+OCR
    inner kernel (processors.py:63-115, gpu_worker.py:56-106). Parsing a
    document is inherently a per-document operation; the win over the
    reference is that batches stream through executors with no process
    pools, no temp files, and no driver coordination;
  * errors stay in-band (``error`` column), never dropped or thrown —
    parallel.py:565-569 semantics;
  * per-batch wall time is attributed evenly across the batch's rows
    (exactly the reference's attribution, parallel.py:42-49) and rolled up
    per partition into the lineage table required by the north rule.

Scale notes (100 TB / 1000 executors): the kernel is embarrassingly
parallel — no shuffle at all for non-giant docs; giant layout docs are
salted into shards upstream (operators/skew.py) and reassembled with one
small groupBy over only the giant urls. Input partitioning is whatever the
scan gives (maxPartitionBytes); Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paraocr_spark import PAGE_BREAK
from paraocr_spark.core.reference import METHOD_ERROR, METHOD_LAYOUT

from paraocr_spark.core.features import (FEATURE_CAP, FEATURES_DDL,
                                          compute_features_batch)

EXTRACTED_SCHEMA_DDL = (
    "url string, warc_ts timestamp, lang string, extracted_text string, "
    "spans array<struct<start:long,end:long>>, method string, error string, "
    f"features {FEATURES_DDL}"
)

_KERNEL_SCHEMA_DDL = (
    EXTRACTED_SCHEMA_DDL
    + ", shard_id int, n_shards int, _pid int, _doc_bytes long, _wall_s double"
)


def _spans_struct(spans: list[tuple[int, int]]) -> list[dict]:
    return [{"start": s, "end": e} for s, e in spans]


def _extract_batch(pdf: pd.DataFrame, pid: int, backend_spec: str,
                   backend_kwargs: dict | None) -> pd.DataFrame:
    """Backend extraction + engine-side bookkeeping (features, metrics).

    The route/parse logic lives in the backend (backends.py registry,
    default: core/routes.py:RoutedExtractorBackend — resolved ONCE per
    Python worker); this wrapper owns what every backend shares: span
    structification, per-doc features, shard passthrough, and the lineage
    metric columns."""
    from paraocr_spark.backends import get_backend

    t0 = time.perf_counter()
    n = len(pdf)
    res = get_backend(backend_spec, backend_kwargs).extract_batch(pdf)
    ext = res["extracted_text"].to_numpy(dtype=object)
    spans = np.empty(n, dtype=object)
    spans[:] = [_spans_struct(sp) for sp in res["spans"]]

    html_vals = pdf["html"].to_numpy(dtype=object)
    doc_bytes = np.fromiter(
        (len(h) if isinstance(h, (bytes, bytearray)) else 0 for h in html_vals),
        dtype=np.int64, count=n,
    )
    is_shard = (pdf["n_shards"].to_numpy() > 1) if "n_shards" in pdf else np.zeros(n, bool)

    # per-doc training-data features, same pass (no second scan / job);
    # shards of giants get theirs after reassembly (_merge_shards_relational).
    # Batched kernel: simhash + rolling hash run as one numpy pass over the
    # whole Arrow batch (bit-identical to per-doc compute_features).
    feats = compute_features_batch(
        [None if is_shard[i] else ext[i] for i in range(n)]
    )
    features = np.empty(n, dtype=object)
    features[:] = [None if is_shard[i] else feats[i] for i in range(n)]

    wall = time.perf_counter() - t0
    return pd.DataFrame(
        {
            "url": pdf["url"].to_numpy(),
            "warc_ts": pdf["warc_ts"].to_numpy(),
            "lang": pdf["lang"].to_numpy(),
            "extracted_text": ext,
            "spans": spans,
            "method": res["method"].to_numpy(dtype=object),
            "error": res["error"].to_numpy(dtype=object),
            "features": features,
            "shard_id": pdf["shard_id"].to_numpy() if "shard_id" in pdf else 0,
            "n_shards": pdf["n_shards"].to_numpy() if "n_shards" in pdf else 1,
            "_pid": pid,
            "_doc_bytes": doc_bytes,
            # even attribution across the batch — parallel.py:42-49 analog
            "_wall_s": wall / max(n, 1),
        }
    )


def extract_kernel(df: DataFrame, backend: str = "default",
                   backend_kwargs: dict | None = None,
                   lineage_acc=None) -> DataFrame:
    """mapInPandas wrapper. Input needs url/warc_ts/html/text/lang
    (+optional shard_id/n_shards from salt_pages). ``backend`` is a
    registry name or dotted module.Class path (backends.py); only the
    strings travel in the closure — workers resolve them locally.

    ``lineage_acc`` (a LineageAccParam accumulator) fuses the per-partition
    lineage rollup into THIS action: each task sends one
    {(stage, pid): (docs, bytes, kernel_wall)} update at completion, so the
    caller gets lineage without a second read-back job over the written
    table — the Amdahl fixed cost that capped 1x2->4x2 scaling (r4 ladder:
    f≈27.5 s/run). Docs are counted on shard_id==0 rows only, so a salted
    giant counts once (its reassembled output row), matching the read-back
    rollup's row count exactly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        t_docs = t_bytes = 0
        t_wall = 0.0
        for b in batches:
            if len(b):
                out = _extract_batch(b, pid, backend, backend_kwargs)
                if lineage_acc is not None:
                    t_docs += int((out["shard_id"].to_numpy() == 0).sum())
                    t_bytes += int(out["_doc_bytes"].sum())
                    t_wall += float(out["_wall_s"].sum())
                yield out
        if lineage_acc is not None and ctx is not None:
            lineage_acc.add({(ctx.stageId(), pid): (t_docs, t_bytes, t_wall)})

    return df.mapInPandas(run, schema=_KERNEL_SCHEMA_DDL)


def _merge_shards_relational(kernel_out: DataFrame) -> DataFrame:
    """Reassemble giant-doc shards WITHOUT moving bytes through Python.

    groupBy(url) + array_sort(collect_list(struct(shard_id, ...))) gives a
    deterministic shard order (never shuffle order — SURVEY.md §7); the
    merged text is a JVM-side concat_ws, and span offsets shift via a
    higher-order aggregate() that carries a running offset. Only the final
    per-doc feature computation touches Python — as a scalar pandas_udf fed
    the JVM-side substring(text, 1, FEATURE_CAP) prefix plus length(text),
    so the merged giant text itself (tens of MB per doc) NEVER crosses
    Arrow: every feature field except n_chars derives from the capped
    prefix by construction (core/features.py docstring), and n_chars rides
    in as the JVM length. The previous mapInPandas form round-tripped the
    full merged text through Python twice per giant.
    """
    pb = F.lit(PAGE_BREAK)
    grouped = kernel_out.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("shard_id", "extracted_text", "spans", "error"))
        ).alias("arr"),
        F.first("warc_ts").alias("warc_ts"),
        F.first("lang").alias("lang"),
        F.min("_pid").alias("_pid"),
        F.sum("_doc_bytes").alias("_doc_bytes"),
        F.sum("_wall_s").alias("_wall_s"),
    )
    any_err = F.exists("arr", lambda x: x["error"].isNotNull())
    first_err = F.filter("arr", lambda x: x["error"].isNotNull())[0]["error"]
    merged_text = F.array_join(
        F.transform("arr", lambda x: x["extracted_text"]), PAGE_BREAK
    )
    # running-offset span shift: acc = (offset so far, spans so far)
    merged_spans = F.aggregate(
        "arr",
        F.struct(
            F.lit(0).cast("long").alias("off"),
            F.expr("array()").cast("array<struct<start:long,end:long>>").alias("sp"),
        ),
        lambda acc, x: F.struct(
            (acc["off"] + F.length(x["extracted_text"]) + F.length(pb)).alias("off"),
            F.concat(
                acc["sp"],
                F.transform(
                    x["spans"],
                    lambda s: F.struct(
                        (s["start"] + acc["off"]).alias("start"),
                        (s["end"] + acc["off"]).alias("end"),
                    ),
                ),
            ).alias("sp"),
        ),
        lambda acc: acc["sp"],
    )
    merged = grouped.select(
        "url", "warc_ts", "lang",
        F.when(any_err, F.lit(None).cast("string")).otherwise(merged_text).alias("extracted_text"),
        F.when(any_err, F.expr("array()").cast("array<struct<start:long,end:long>>"))
         .otherwise(merged_spans).alias("spans"),
        F.when(any_err, F.lit(METHOD_ERROR)).otherwise(F.lit(METHOD_LAYOUT)).alias("method"),
        F.when(any_err, first_err).otherwise(F.lit(None).cast("string")).alias("error"),
        "_pid", "_doc_bytes", "_wall_s",
    )

    @F.pandas_udf(FEATURES_DDL)
    def giant_features(prefix: pd.Series, n_chars: pd.Series) -> pd.DataFrame:
        # prefix is already text[:FEATURE_CAP] (JVM substring; both count
        # code points) — compute_features_batch re-caps it, a no-op. Its
        # n_chars is len(prefix); override with the uncapped JVM length
        # (null text -> null length -> keep the zero-features 0).
        feats = compute_features_batch(list(prefix))
        for f, n in zip(feats, n_chars):
            if not pd.isna(n):
                f["n_chars"] = int(n)
        return pd.DataFrame(feats)

    return merged.select(
        "url", "warc_ts", "lang", "extracted_text", "spans", "method",
        "error",
        giant_features(
            F.substring("extracted_text", 1, FEATURE_CAP),
            F.length("extracted_text"),
        ).alias("features"),
        "_pid", "_doc_bytes", "_wall_s",
    )





def extract_pages(pages: DataFrame, *, salt: bool = True,
                  backend: str = "default",
                  backend_kwargs: dict | None = None,
                  lineage_acc=None, fanout: bool = True) -> DataFrame:
    """Full extraction: optional skew salting -> kernel -> shard reassembly.

    Returns EXTRACTED_SCHEMA plus metric cols (_pid, _doc_bytes, _wall_s);
    callers project them away or roll them into lineage
    (operators/lineage.py). Exactly one output row per input url.

    Plan shape (scale-critical): the normal and giant branches split at the
    SOURCE, so the expensive kernel runs exactly once per row. Splitting
    after the kernel would re-execute the whole kernel DAG once per branch
    (Spark does not auto-cache a diamond). Giants are rare (<3%), so the
    second source scan — whose filter discards everything else before any
    Python — is cheap; the alternative (persisting the kernel output) would
    materialize the full corpus at 100 TB.

    ``fanout`` (default True) applies ensure_min_parallelism to the kernel
    input: a small input (one parquet row group -> 1-2 scan splits) would
    otherwise run the whole Python kernel on 1-2 cores (measured 4.6 s ->
    1.0 s at 50k docs/local[32]). At scale the scan has >= cores splits
    and NO Exchange is added, preserving the shuffle-free kernel plan
    (tests assert both shapes). Pass False to pin the input partitioning
    (e.g. when the caller already repartitioned).
    """
    from paraocr_spark.operators.skew import ensure_min_parallelism, salt_pages

    base_cols = ["url", "warc_ts", "html", "text", "lang"]
    if not salt:
        prepped = pages.select(
            *base_cols, F.lit(0).alias("shard_id"), F.lit(1).alias("n_shards"),
        )
        if fanout:
            prepped = ensure_min_parallelism(prepped)
        return extract_kernel(prepped, backend, backend_kwargs,
                              lineage_acc).drop("shard_id", "n_shards")

    normal, giant_pages = split_normal_giants(pages)
    if fanout:
        normal = ensure_min_parallelism(normal)
    singles = extract_kernel(normal, backend, backend_kwargs,
                             lineage_acc).drop("shard_id", "n_shards")
    sharded = _merge_shards_relational(
        extract_kernel(salt_pages(giant_pages), backend, backend_kwargs,
                       lineage_acc)
    )
    return singles.unionByName(sharded)


def split_normal_giants(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(normal_prepped, giant_pages): the gate-aware giant split.

    A giant layout payload accompanied by gate-PASSING native text must
    resolve native_text (the serial oracle checks fastpath_ok(text) FIRST,
    core/reference.py:43) — but the shard path never applies the gate. So
    only docs whose text DEFINITELY fails the gate (null or too short — a
    cheap Catalyst-visible sufficient-fail predicate) are sharded; the rare
    long-text giant falls through to the normal kernel, which applies the
    exact gate and can still layout-extract the whole doc correctly, just
    unsalted."""
    from paraocr_spark.core.quality import MIN_NATIVE_TEXT_CHARS
    from paraocr_spark.operators.skew import giant_condition

    base_cols = ["url", "warc_ts", "html", "text", "lang"]
    text_cant_fastpath = F.col("text").isNull() | (
        F.length("text") < F.lit(MIN_NATIVE_TEXT_CHARS)
    )
    giant_cond = giant_condition() & text_cant_fastpath
    normal = pages.where(~F.coalesce(giant_cond, F.lit(False))).select(
        *base_cols, F.lit(0).alias("shard_id"), F.lit(1).alias("n_shards"),
    )
    giants = pages.where(F.coalesce(giant_cond, F.lit(False))).select(*base_cols)
    return normal, giants
