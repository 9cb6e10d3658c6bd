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
from paraocr_spark.core import htmlx, layout, quality
from paraocr_spark.core.reference import (
    METHOD_ERROR,
    METHOD_HTML,
    METHOD_LAYOUT,
    METHOD_NATIVE,
)

EXTRACTED_SCHEMA_DDL = (
    "url string, warc_ts timestamp, lang string, extracted_text string, "
    "spans array<struct<start:long,end:long>>, method string, error string"
)

_KERNEL_SCHEMA_DDL = (
    EXTRACTED_SCHEMA_DDL
    + ", shard_id int, n_shards int, _pid int, _doc_bytes long, _wall_s double"
)


def _spans_struct(spans: list[tuple[int, int]]) -> list[dict]:
    return [{"start": s, "end": e} for s, e in spans]


def _assign_obj(target: np.ndarray, mask: np.ndarray, values: list) -> None:
    """Assign a list of python objects into target[mask] without numpy
    trying to broadcast list-of-lists into a 2-D array."""
    tmp = np.empty(len(values), dtype=object)
    tmp[:] = values
    target[mask] = tmp


def _extract_batch(pdf: pd.DataFrame, pid: int) -> pd.DataFrame:
    t0 = time.perf_counter()
    n = len(pdf)
    url = pdf["url"].to_numpy()
    html_vals = pdf["html"].to_numpy(dtype=object)
    text_vals = pdf["text"]

    ext = np.empty(n, dtype=object)
    spans = np.empty(n, dtype=object)
    method = np.empty(n, dtype=object)
    error = np.full(n, None, dtype=object)
    doc_bytes = np.fromiter(
        (len(h) if isinstance(h, (bytes, bytearray)) else 0 for h in html_vals),
        dtype=np.int64, count=n,
    )

    # --- vectorized routing masks (P2/P3/P4 analogs) ---------------------
    # fast path: pre-extracted text passes the two-stage gate
    is_shard = (pdf["n_shards"].to_numpy() > 1) if "n_shards" in pdf else np.zeros(n, bool)
    fast = quality.fastpath_ok_series(text_vals).to_numpy() & ~is_shard
    has_html = np.fromiter(
        (isinstance(h, (bytes, bytearray)) and len(h) > 0 for h in html_vals),
        dtype=bool, count=n,
    )
    magic = np.fromiter(
        (isinstance(h, (bytes, bytearray)) and h[:8] == layout.MAGIC for h in html_vals),
        dtype=bool, count=n,
    )
    no_content = ~fast & ~has_html
    route_layout = ~fast & has_html & magic
    route_html = ~fast & has_html & ~magic

    # --- fast path (parallel.py:295-334) ----------------------------------
    if fast.any():
        ftxt = text_vals.to_numpy(dtype=object)[fast]
        ext[fast] = ftxt
        _assign_obj(spans, fast, [_spans_struct([(0, len(t))]) for t in ftxt])
        method[fast] = METHOD_NATIVE

    # --- in-band errors (parallel.py:565-569) ------------------------------
    if no_content.any():
        ext[no_content] = None
        _assign_obj(spans, no_content, [[] for _ in range(int(no_content.sum()))])
        method[no_content] = METHOD_ERROR
        error[no_content] = "no_content"

    # --- heavy per-document extract (the inner kernel) ---------------------
    for idx in np.flatnonzero(route_layout):
        try:
            merged, sp = layout.extract_layout(bytes(html_vals[idx]))
            ext[idx], spans[idx], method[idx] = merged, _spans_struct(sp), METHOD_LAYOUT
        except ValueError as e:
            ext[idx], spans[idx] = None, []
            method[idx], error[idx] = METHOD_ERROR, f"layout_error: {e}"

    for idx in np.flatnonzero(route_html):
        raw = bytes(html_vals[idx])
        try:
            markup = raw.decode("utf-8")
        except UnicodeDecodeError:
            ext[idx], spans[idx] = None, []
            method[idx], error[idx] = METHOD_ERROR, "invalid_utf8"
            continue
        try:
            merged, sp = htmlx.extract_html(markup)
            ext[idx], spans[idx], method[idx] = merged, _spans_struct(sp), METHOD_HTML
        except Exception as e:  # per-doc isolation (easyocr_backend.py:260-263)
            ext[idx], spans[idx] = None, []
            method[idx], error[idx] = METHOD_ERROR, f"html_error: {e!r}"

    wall = time.perf_counter() - t0
    out = pd.DataFrame(
        {
            "url": url,
            "warc_ts": pdf["warc_ts"].to_numpy(),
            "lang": pdf["lang"].to_numpy(),
            "extracted_text": ext,
            "spans": spans,
            "method": method,
            "error": error,
            "shard_id": pdf["shard_id"].to_numpy() if "shard_id" in pdf else 0,
            "n_shards": pdf["n_shards"].to_numpy() if "n_shards" in pdf else 1,
            "_pid": pid,
            "_doc_bytes": doc_bytes,
            # even attribution across the batch — parallel.py:42-49 analog
            "_wall_s": wall / max(n, 1),
        }
    )
    return out


def extract_kernel(df: DataFrame) -> DataFrame:
    """mapInPandas wrapper. Input needs url/warc_ts/html/text/lang
    (+optional shard_id/n_shards from salt_pages)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for b in batches:
            if len(b):
                yield _extract_batch(b, pid)

    return df.mapInPandas(run, schema=_KERNEL_SCHEMA_DDL)


def _merge_shard_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reassemble one giant doc's shards (deterministic shard_id order).

    Byte-identical to the serial extractor on the unsplit doc: each shard's
    pages are PAGE_BREAK-joined already, and shards re-join with PAGE_BREAK,
    so merged text == extract_layout(all pages). Span offsets shift by the
    running length.
    """
    pdf = pdf.sort_values("shard_id")
    err_rows = pdf[pdf["error"].notna()]
    first = pdf.iloc[0]
    if len(err_rows):
        e = err_rows.iloc[0]
        return pd.DataFrame([{
            "url": first["url"], "warc_ts": first["warc_ts"], "lang": first["lang"],
            "extracted_text": None, "spans": [], "method": METHOD_ERROR,
            "error": e["error"],
            "_pid": int(first["_pid"]), "_doc_bytes": int(pdf["_doc_bytes"].sum()),
            "_wall_s": float(pdf["_wall_s"].sum()),
        }])
    texts = list(pdf["extracted_text"])
    merged = PAGE_BREAK.join(texts)
    out_spans: list[dict] = []
    offset = 0
    for txt, sp in zip(texts, pdf["spans"]):
        for s in sp:
            out_spans.append({"start": int(s["start"]) + offset, "end": int(s["end"]) + offset})
        offset += len(txt) + len(PAGE_BREAK)
    return pd.DataFrame([{
        "url": first["url"], "warc_ts": first["warc_ts"], "lang": first["lang"],
        "extracted_text": merged, "spans": out_spans, "method": METHOD_LAYOUT,
        "error": None,
        "_pid": int(first["_pid"]), "_doc_bytes": int(pdf["_doc_bytes"].sum()),
        "_wall_s": float(pdf["_wall_s"].sum()),
    }])


_MERGED_SCHEMA_DDL = EXTRACTED_SCHEMA_DDL + ", _pid int, _doc_bytes long, _wall_s double"


def extract_pages(pages: DataFrame, *, salt: bool = True) -> DataFrame:
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
    """
    from paraocr_spark.operators.skew import giant_condition, salt_pages

    base_cols = ["url", "warc_ts", "html", "text", "lang"]
    if not salt:
        prepped = pages.select(
            *base_cols, F.lit(0).alias("shard_id"), F.lit(1).alias("n_shards"),
        )
        return extract_kernel(prepped).drop("shard_id", "n_shards")

    giant_cond = giant_condition()
    normal = pages.where(~F.coalesce(giant_cond, F.lit(False))).select(
        *base_cols, F.lit(0).alias("shard_id"), F.lit(1).alias("n_shards"),
    )
    singles = extract_kernel(normal).drop("shard_id", "n_shards")

    giants = salt_pages(pages.where(F.coalesce(giant_cond, F.lit(False))))
    sharded = (
        extract_kernel(giants)
        .groupBy("url")
        .applyInPandas(_merge_shard_group, schema=_MERGED_SCHEMA_DDL)
    )
    return singles.unionByName(sharded)
