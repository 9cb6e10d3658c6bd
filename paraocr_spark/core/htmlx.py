"""From-scratch HTML main-content extractor (Boilerpipe/Readability-style).

No lxml/selectolax in this environment, so the DOM tokenizer is a regex
stream over the raw markup: a single pass that tracks boilerplate-container
depth (<nav>/<header>/<footer>/<aside>/<head>), anchor depth (<a>), and
flushes text buffers into *blocks* at block-level tag boundaries. Each block
then gets text-density / link-density scoring; kept blocks are merged with
"\\n\\n" and per-block character spans are recorded.

This is the Spark-first re-expression of the reference's fast native-text
path + layout dispatch (pdf_processor.py:37-59 block extraction;
processors.py:24-59 page classifier; utils.py:107-138 quality gate) applied
to web pages per BASELINE.json's input_hint. The same function is the serial
oracle AND the per-document kernel inside the Arrow batch (tests assert the
Spark output is byte-identical to calling this directly).
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass

# Strip non-content subtrees wholesale before tokenizing.
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style|svg|noscript)\b[^>]*>.*?</\1\s*>", re.I | re.S
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DOCTYPE_RE = re.compile(r"<!DOCTYPE[^>]*>", re.I)

# One token = a tag or a text run.
_TOK_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*)>|([^<]+)")

# Tags whose open OR close flushes the current text buffer into a block.
BLOCK_TAGS = frozenset(
    """html head body article section div p h1 h2 h3 h4 h5 h6 ul ol li dl dt dd
    table thead tbody tr th td blockquote pre figure figcaption main form
    fieldset hr br title nav header footer aside""".split()
)

# Containers whose entire subtree is boilerplate.
DROP_CONTAINERS = frozenset("nav header footer aside head".split())

# Scoring thresholds (tuned once, frozen; tests pin behavior).
MAX_LINK_DENSITY = 0.50   # FIXTURES.md: >60%-anchor blocks must drop
MIN_BLOCK_WORDS = 2       # density floor for a standalone block
_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"\S+")


@dataclass
class Block:
    text: str           # whitespace-normalized block text
    anchor_chars: int   # chars contributed from inside <a>
    total_chars: int    # chars before normalization (content only)
    in_drop: bool       # inside nav/header/footer/aside/head
    tag: str            # nearest enclosing block tag at flush time


def segment_blocks(markup: str) -> list[Block]:
    """Single-pass tokenizer -> list of text blocks with link statistics."""
    markup = _DOCTYPE_RE.sub("", markup)
    markup = _COMMENT_RE.sub("", markup)
    markup = _SCRIPT_STYLE_RE.sub("", markup)

    blocks: list[Block] = []
    buf: list[str] = []
    anchor_chars = 0
    total_chars = 0
    drop_depth = 0
    anchor_depth = 0
    tag_stack: list[str] = []

    def flush() -> None:
        nonlocal anchor_chars, total_chars
        if not buf:  # ~2/3 of block-tag boundaries carry no pending text
            return   # (counters are only nonzero when buf is nonempty)
        raw = "".join(buf)
        # identical to _WS_RE.sub(" ", raw).strip(), ~3x faster
        text = " ".join(raw.split())
        if text:
            blocks.append(
                Block(
                    text=text,
                    anchor_chars=anchor_chars,
                    total_chars=total_chars,
                    in_drop=drop_depth > 0,
                    tag=tag_stack[-1] if tag_stack else "",
                )
            )
        buf.clear()  # in place: the loop holds a bound buf.append
        anchor_chars = 0
        total_chars = 0

    buf_append = buf.append
    for m in _TOK_RE.finditer(markup):
        if m.lastindex == 4:  # text run (only group 4 participated)
            txt = m.group(4)
            text = _htmlmod.unescape(txt) if "&" in txt else txt
            stripped = text.strip()
            if stripped:
                buf_append(text)
                n = len(stripped)
                total_chars += n
                if anchor_depth > 0:
                    anchor_chars += n
            elif buf:
                buf_append(" ")
            continue
        closing, name = m.group(1) == "/", m.group(2).lower()
        if name == "a":
            if closing:
                anchor_depth = max(0, anchor_depth - 1)
            else:
                anchor_depth += 1
            continue
        if name in BLOCK_TAGS:
            flush()
            if name in DROP_CONTAINERS:
                if closing:
                    drop_depth = max(0, drop_depth - 1)
                else:
                    drop_depth += 1
            if name in ("br", "hr"):
                continue
            if closing:
                if name in tag_stack:
                    while tag_stack and tag_stack.pop() != name:
                        pass
            else:
                tag_stack.append(name)
    flush()
    return blocks


def keep_block(b: Block) -> bool:
    """Boilerplate classifier: drop chrome containers and link-dense blocks.

    The link-density rule is the web analog of the reference's dictionary
    quality gate (utils.py:107-138): a block dominated by anchor text is
    navigation, not content.
    """
    if b.in_drop:
        return False
    words = len(b.text.split())  # == len(_WORD_RE.findall(...)), faster
    if words < MIN_BLOCK_WORDS:
        return False
    if b.total_chars > 0 and (b.anchor_chars / b.total_chars) > MAX_LINK_DENSITY:
        return False
    return True


# extract_html doesn't need Block objects, the tag field, or a second
# keep_block pass — _kept_texts fuses tokenize + score + keep into one
# scanner loop with the flush inlined (the kernel's hot path; tests assert
# it equals the segment_blocks + keep_block composition exactly).
_RELEVANT = frozenset(BLOCK_TAGS | {"a"})

# Anchored tag matcher for the scanner: tried at the char AFTER a '<'. Same
# grammar as _TOK_RE's tag branch (quote-aware attrs that may contain '>'
# or '<'); on failure the '<' is skipped, exactly like _TOK_RE's behavior.
_TAG_AT_RE = re.compile(
    r"(/?)([a-zA-Z][a-zA-Z0-9]*)(?:[^>'\"]|'[^']*'|\"[^\"]*\")*>"
)


def _kept_texts(markup: str) -> list[str]:
    """Fused fast path: kept block texts, identical to
    [b.text for b in segment_blocks(m) if keep_block(b)].

    Index-based scanner: text runs are C-level find('<') + slice (no match
    object), only tags pay a (small, anchored) regex match.
    """
    markup = _DOCTYPE_RE.sub("", markup)
    markup = _COMMENT_RE.sub("", markup)
    markup = _SCRIPT_STYLE_RE.sub("", markup)

    kept: list[str] = []
    kept_append = kept.append
    buf: list[str] = []
    buf_append = buf.append
    anchor_chars = 0
    total_chars = 0
    drop_depth = 0
    anchor_depth = 0
    unescape = _htmlmod.unescape
    find = markup.find
    tag_match = _TAG_AT_RE.match
    n_markup = len(markup)
    pos = 0

    while pos < n_markup:
        lt = find("<", pos)
        if lt != pos:  # leading text run up to the next tag (or the end)
            txt = markup[pos:lt] if lt != -1 else markup[pos:]
            text = unescape(txt) if "&" in txt else txt
            stripped = text.strip()
            if stripped:
                buf_append(text)
                k = len(stripped)
                total_chars += k
                if anchor_depth > 0:
                    anchor_chars += k
            elif buf:
                buf_append(" ")
            if lt == -1:
                break
        m = tag_match(markup, lt + 1)
        if m is None:  # not a tag: skip the '<' (same as _TOK_RE)
            pos = lt + 1
            continue
        pos = m.end()
        name = m.group(2)
        if name not in _RELEVANT:  # most tags are already lowercase
            name = name.lower()
            if name not in _RELEVANT:
                continue  # inline tag (span/b/em/...): no flush, no depth
        if name == "a":
            if m.group(1):
                if anchor_depth > 0:
                    anchor_depth -= 1
            else:
                anchor_depth += 1
            continue
        # block tag boundary: inlined flush (keep decision fused in)
        if buf:
            if drop_depth == 0:  # dropped containers skip the normalize
                text = " ".join("".join(buf).split())
                if (
                    text
                    and text.count(" ") + 1 >= MIN_BLOCK_WORDS
                    and not (
                        total_chars > 0
                        and anchor_chars / total_chars > MAX_LINK_DENSITY
                    )
                ):
                    kept_append(text)
            buf.clear()
            anchor_chars = 0
            total_chars = 0
        if name in DROP_CONTAINERS:
            if m.group(1):
                if drop_depth > 0:
                    drop_depth -= 1
            else:
                drop_depth += 1
    if buf and drop_depth == 0:
        text = " ".join("".join(buf).split())
        if (
            text
            and text.count(" ") + 1 >= MIN_BLOCK_WORDS
            and not (
                total_chars > 0
                and anchor_chars / total_chars > MAX_LINK_DENSITY
            )
        ):
            kept_append(text)
    return kept


def extract_html(markup: str) -> tuple[str, list[tuple[int, int]]]:
    """Main-content extraction: (merged_text, per-kept-block char spans).

    Kept blocks joined with "\\n\\n"; span invariant:
    ``merged[start:end] == block.text`` for every span.
    """
    kept = _kept_texts(markup)
    spans: list[tuple[int, int]] = []
    pos = 0
    for i, t in enumerate(kept):
        if i > 0:
            pos += 2  # "\n\n"
        spans.append((pos, pos + len(t)))
        pos += len(t)
    return "\n\n".join(kept), spans
