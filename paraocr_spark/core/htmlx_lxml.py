"""C-accelerated HTML block segmentation via lxml (optional fast path).

The pure-Python regex tokenizer (htmlx.py) is the extraction kernel's cost
center (~0.2 ms/doc): at 100 TB that constant factor IS the bill. This
module reimplements the same block segmentation + link-density scoring over
lxml's C parser, exposed as the ``lxml`` entry of the backend registry
(backends.py) — real deployments flip one config string; this sandbox has
no lxml wheel, so importing raises and the regex path stays the oracle.

Semantics: identical to htmlx.extract_html on well-formed HTML (the
skipif-gated identity test asserts it when lxml is present). On MALFORMED
markup lxml's recovering parser may repair the tree differently from the
regex tokenizer — a disclosed, inherent difference between a DOM repairer
and a token stream; swapping backends changes config_fp, so outputs are
never mixed within a table.
"""

from __future__ import annotations

try:
    from lxml import etree
except ImportError as e:  # pragma: no cover - sandbox has no lxml wheel
    raise ImportError(
        "the 'lxml' extraction backend requires the lxml package; install "
        "lxml or use the default regex backend"
    ) from e

from paraocr_spark.core.htmlx import (
    BLOCK_TAGS,
    DROP_CONTAINERS,
    MAX_LINK_DENSITY,
    MIN_BLOCK_WORDS,
)

#: subtrees stripped wholesale, mirroring htmlx._SCRIPT_STYLE_RE
SKIP_SUBTREES = frozenset({"script", "style", "svg", "noscript"})


def extract_html_lxml(markup: str) -> tuple[str, list[tuple[int, int]]]:
    """(merged_text, spans) with htmlx.extract_html's exact block semantics,
    parsed by lxml's C HTML parser instead of the regex tokenizer."""
    parser = etree.HTMLParser(recover=True, no_network=True)
    root = etree.fromstring(markup or "<html/>", parser)
    if root is None:  # nothing parseable at all
        return "", []

    kept: list[str] = []
    buf: list[str] = []
    anchor_chars = 0
    total_chars = 0
    drop_depth = 0
    anchor_depth = 0

    def text_run(txt: str | None) -> None:
        nonlocal anchor_chars, total_chars
        if not txt:
            return
        stripped = txt.strip()
        if stripped:
            buf.append(txt)
            k = len(stripped)
            total_chars += k
            if anchor_depth > 0:
                anchor_chars += k
        elif buf:
            buf.append(" ")

    def flush() -> None:
        nonlocal anchor_chars, total_chars
        if buf:
            if drop_depth == 0:
                text = " ".join("".join(buf).split())
                if (
                    text
                    and text.count(" ") + 1 >= MIN_BLOCK_WORDS
                    and not (
                        total_chars > 0
                        and anchor_chars / total_chars > MAX_LINK_DENSITY
                    )
                ):
                    kept.append(text)
            buf.clear()
            anchor_chars = 0
            total_chars = 0

    walker = etree.iterwalk(root, events=("start", "end"))
    for event, el in walker:
        tag = el.tag if isinstance(el.tag, str) else None  # Comment/PI -> None
        if event == "start":
            if tag is None or tag in SKIP_SUBTREES:
                walker.skip_subtree()  # tail still arrives with the end event
                continue
            if tag in BLOCK_TAGS:
                flush()
                if tag in DROP_CONTAINERS:
                    drop_depth += 1
            elif tag == "a":
                anchor_depth += 1
            text_run(el.text)
        else:  # end
            if tag is None or tag in SKIP_SUBTREES:
                text_run(el.tail)
                continue
            if tag in BLOCK_TAGS:
                flush()
                if tag in DROP_CONTAINERS and drop_depth > 0:
                    drop_depth -= 1
            elif tag == "a" and anchor_depth > 0:
                anchor_depth -= 1
            # tail text belongs to the PARENT's context (depths just restored)
            text_run(el.tail)
    flush()

    spans: list[tuple[int, int]] = []
    pos = 0
    for i, t in enumerate(kept):
        if i > 0:
            pos += 2  # "\n\n"
        spans.append((pos, pos + len(t)))
        pos += len(t)
    return "\n\n".join(kept), spans
