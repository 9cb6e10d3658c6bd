"""The default extraction backend: vectorized routing + per-route parsing.

This is the route logic the reference hard-wires across worker_dispatcher
(processors.py:24-59), the native-text gate (parallel.py:295-334) and the
render/OCR inner kernel (processors.py:63-115), packaged as the ``default``
entry of the pluggable backend registry (paraocr_spark/backends.py) so a
user can swap the whole strategy — e.g. a trafilatura-style DOM scorer —
with one config string, exactly like the reference swaps OCR engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from paraocr_spark.backends import ExtractorBackend
from paraocr_spark.core import htmlx, layout, quality
from paraocr_spark.core.reference import (
    METHOD_ERROR,
    METHOD_HTML,
    METHOD_LAYOUT,
    METHOD_NATIVE,
)


def assign_obj(target: np.ndarray, mask: np.ndarray, values: list) -> None:
    """Assign a list of python objects into target[mask] without numpy
    trying to broadcast list-of-lists into a 2-D array."""
    tmp = np.empty(len(values), dtype=object)
    tmp[:] = values
    target[mask] = tmp


class RoutedExtractorBackend(ExtractorBackend):
    """fast-path gate -> layout/html dispatch -> in-band errors."""

    @staticmethod
    def _parse_html(markup: str) -> tuple[str, list[tuple[int, int]]]:
        """HTML-parser hook: the C-path backend overrides just this."""
        return htmlx.extract_html(markup)

    def extract_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        html_vals = pdf["html"].to_numpy(dtype=object)
        text_vals = pdf["text"]

        ext = np.empty(n, dtype=object)
        spans = np.empty(n, dtype=object)
        method = np.empty(n, dtype=object)
        error = np.full(n, None, dtype=object)

        # --- vectorized routing masks (P2/P3/P4 analogs) ------------------
        # fast path: pre-extracted text passes the two-stage gate; shard
        # rows (text=None by construction) can never fast-path, the mask
        # keeps that explicit
        is_shard = (
            (pdf["n_shards"].to_numpy() > 1) if "n_shards" in pdf
            else np.zeros(n, bool)
        )
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

        # --- fast path (parallel.py:295-334) -------------------------------
        if fast.any():
            ftxt = text_vals.to_numpy(dtype=object)[fast]
            ext[fast] = ftxt
            assign_obj(spans, fast, [[(0, len(t))] for t in ftxt])
            method[fast] = METHOD_NATIVE

        # --- in-band errors (parallel.py:565-569) ---------------------------
        if no_content.any():
            ext[no_content] = None
            assign_obj(spans, no_content, [[] for _ in range(int(no_content.sum()))])
            method[no_content] = METHOD_ERROR
            error[no_content] = "no_content"

        # --- heavy per-document extract (the inner kernel) ------------------
        for idx in np.flatnonzero(route_layout):
            try:
                merged, sp = layout.extract_layout(bytes(html_vals[idx]))
                ext[idx], spans[idx], method[idx] = merged, sp, METHOD_LAYOUT
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
                merged, sp = self._parse_html(markup)
                ext[idx], spans[idx], method[idx] = merged, sp, METHOD_HTML
            except Exception as e:  # per-doc isolation (easyocr_backend.py:260-263)
                ext[idx], spans[idx] = None, []
                method[idx], error[idx] = METHOD_ERROR, f"html_error: {e!r}"

        return pd.DataFrame(
            {"extracted_text": ext, "spans": spans, "method": method, "error": error},
            index=pdf.index,
        )


class LxmlRoutedExtractorBackend(RoutedExtractorBackend):
    """Same routing, C-accelerated HTML parse (lxml). Instantiation fails
    with a clear ImportError where lxml is absent — surfaced at driver
    preflight (backends.preflight_backend), never inside tasks."""

    def __init__(self):
        from paraocr_spark.core import htmlx_lxml  # raises if lxml missing

        self._extract = htmlx_lxml.extract_html_lxml

    def _parse_html(self, markup: str) -> tuple[str, list[tuple[int, int]]]:
        return self._extract(markup)
