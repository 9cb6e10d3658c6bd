"""Synthetic binary layout payloads + reading-order extraction.

The reference's heavy path renders PDF pages and merges recognized lines in
layout order (``pdf_processor.py:37-59``: blocks sorted with ``sort=True``,
text blocks joined with ``\\n``; pages merged with the literal separator at
``parallel.py:658``). This module defines a deterministic binary "layout
document" format standing in for PDFs (FIXTURES.md §1 "binary layout
payload") and the parser that re-creates that semantics:

  * per page, lines carry (x, y) positions and arrive out of document order;
  * extraction sorts lines by (y, x) — reading order — and joins with "\\n";
  * pages are merged with PAGE_BREAK, byte-identical to the reference.

Format (little-endian):
    magic   8 bytes  b"PLAYOUT1"
    n_pages u16
    per page:  n_lines u16
    per line:  x f32, y f32, len u16, utf-8 bytes
"""

from __future__ import annotations

import struct

from paraocr_spark import PAGE_BREAK

MAGIC = b"PLAYOUT1"


def encode_layout(pages: list[list[tuple[float, float, str]]]) -> bytes:
    """Serialize pages of (x, y, text) lines into the binary layout format."""
    out = [MAGIC, struct.pack("<H", len(pages))]
    for lines in pages:
        out.append(struct.pack("<H", len(lines)))
        for x, y, text in lines:
            raw = text.encode("utf-8")
            out.append(struct.pack("<ffH", float(x), float(y), len(raw)))
            out.append(raw)
    return b"".join(out)


_H = struct.Struct("<H")
_FFH = struct.Struct("<ffH")


def decode_layout(payload: bytes) -> list[list[tuple[float, float, str]]]:
    """Parse the binary format back into pages of (x, y, text) lines.

    Raises ValueError on truncation/corruption — callers turn that into an
    in-band error row (analog of parallel.py:565-569).

    Hot path (every layout doc decodes here): precompiled Structs, one
    unpack per line, bounds enforced by struct.error + the final
    end-of-buffer check (r4 — the per-field take() closure was ~45% of
    layout extraction: 3 struct calls + a bounds branch per line).
    """
    if not payload.startswith(MAGIC):
        raise ValueError("bad magic")
    n = len(payload)
    off = len(MAGIC)
    pages: list[list[tuple[float, float, str]]] = []
    try:
        (n_pages,) = _H.unpack_from(payload, off)
        off += 2
        for _ in range(n_pages):
            (n_lines,) = _H.unpack_from(payload, off)
            off += 2
            lines = []
            append = lines.append
            unpack = _FFH.unpack_from
            for _ in range(n_lines):
                x, y, ln = unpack(payload, off)
                off += 10
                end = off + ln
                if end > n:
                    raise ValueError("truncated layout payload")
                append((x, y, payload[off:end].decode("utf-8")))
                off = end
            pages.append(lines)
    except struct.error:
        raise ValueError("truncated layout payload") from None
    return pages


def extract_layout(payload: bytes) -> tuple[str, list[tuple[int, int]]]:
    """Reading-order extraction: (merged_text, per-page char spans).

    Lines sorted by (y, x) per page (pdf_processor.py:47 ``sort=True``
    analog), joined with "\\n"; pages joined with PAGE_BREAK
    (parallel.py:657-660). Spans cover each page's text in the merged doc.
    """
    from operator import itemgetter

    pages = decode_layout(payload)
    _yx = itemgetter(1, 0)  # C-level key: sort by (y, x)
    page_texts = [
        "\n".join([t for _, _, t in sorted(lines, key=_yx)])
        for lines in pages
    ]
    spans: list[tuple[int, int]] = []
    pos = 0
    for i, pt in enumerate(page_texts):
        if i > 0:
            pos += len(PAGE_BREAK)
        spans.append((pos, pos + len(pt)))
        pos += len(pt)
    return PAGE_BREAK.join(page_texts), spans


def _page_offsets(payload: bytes) -> list[int]:
    """Byte offsets of each page record (no text decode — pure scan)."""
    if not payload.startswith(MAGIC):
        raise ValueError("bad magic")
    off = len(MAGIC)
    try:
        (n_pages,) = _H.unpack_from(payload, off)
        off += 2
        offsets = []
        for _ in range(n_pages):
            offsets.append(off)
            (n_lines,) = _H.unpack_from(payload, off)
            off += 2
            for _ in range(n_lines):
                (ln,) = _H.unpack_from(payload, off + 8)
                off += 10 + ln
                if off > len(payload):
                    raise ValueError("truncated layout payload")
    except struct.error:
        raise ValueError("truncated layout payload") from None
    offsets.append(off)
    return offsets


def split_layout_pages(payload: bytes, pages_per_shard: int) -> list[bytes]:
    """Slice a layout doc into shard docs of <= pages_per_shard pages.

    This is the skew salting primitive (SURVEY.md §7 step 5): a giant
    multi-page document is split into independently-extractable shards which
    the pipeline reassembles with a groupBy on url — fixing the reference's
    one-file-serializes gap (its batch attribution at parallel.py:42-49
    gives one giant PDF to one worker). Splitting slices the ORIGINAL bytes
    (offset scan only, no string decode/re-encode) so the salt pass is
    cheap even for multi-MB documents.
    """
    offs = _page_offsets(payload)
    n_pages = len(offs) - 1
    if n_pages <= pages_per_shard:
        return [payload]
    shards = []
    for i in range(0, n_pages, pages_per_shard):
        j = min(i + pages_per_shard, n_pages)
        shards.append(
            MAGIC + struct.pack("<H", j - i) + payload[offs[i] : offs[j]]
        )
    return shards
