"""Pure-Python core semantics: quality gate, layout codec, HTML extractor.

No Spark needed here — these pin the oracle itself (SURVEY.md §5: the serial
extractor is the analog of the reference's vanilla benchmark scripts).
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from paraocr_spark import PAGE_BREAK
from paraocr_spark.core import htmlx, layout, quality
from paraocr_spark.core.reference import extract_document


# ---------------------------------------------------------------- quality
WORDS = st.lists(
    st.sampled_from(sorted(quality.DICTIONARY)[:50] + ["zzgibberish", "qqq", "xkcd"]),
    min_size=0, max_size=60,
)


@given(WORDS)
@settings(max_examples=200, deadline=None)
def test_quality_serial_matches_vectorized(words):
    text = " ".join(words)
    serial = quality.quality_ok(text)
    vec = bool(quality.quality_ok_series(pd.Series([text])).iloc[0])
    assert serial == vec


@given(st.lists(st.one_of(st.none(), st.text(max_size=200)), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_fastpath_serial_matches_vectorized(texts):
    s = pd.Series(texts, dtype=object)
    vec = quality.fastpath_ok_series(s)
    for t, v in zip(texts, vec):
        assert quality.fastpath_ok(t) == bool(v), repr(t)


def test_gate_thresholds():
    # 100-char rule (config.py:56 analog)
    good = ("the and of to in on with from " * 8).strip()
    assert quality.fastpath_ok(good)
    assert not quality.fastpath_ok(good[:80])
    # dictionary ratio rule (config.py:57 analog)
    assert not quality.quality_ok("zzz qqq xxx yyy www vvv uuu ttt sss rrr")
    # char-validity rule (utils.py:125 analog)
    assert not quality.quality_ok(chr(0) * 50 + " the and of to in")


# ---------------------------------------------------------------- layout
def test_layout_roundtrip_and_reading_order():
    pages = [
        [(10.0, 24.0, "second line"), (5.0, 12.0, "first line")],
        [(0.0, 0.0, "page two")],
    ]
    payload = layout.encode_layout(pages)
    text, spans = layout.extract_layout(payload)
    assert text == "first line\nsecond line" + PAGE_BREAK + "page two"
    for (s, e), expected in zip(spans, ["first line\nsecond line", "page two"]):
        assert text[s:e] == expected


def test_layout_truncation_raises():
    payload = layout.encode_layout([[(0.0, 0.0, "hello world")]])
    with pytest.raises(ValueError):
        layout.decode_layout(payload[:-4])


def test_layout_shard_split_merges_identically():
    pages = [[(0.0, float(j), f"p{i}l{j}") for j in range(3)] for i in range(10)]
    payload = layout.encode_layout(pages)
    whole, _ = layout.extract_layout(payload)
    shards = layout.split_layout_pages(payload, 3)
    assert len(shards) == 4
    merged = PAGE_BREAK.join(layout.extract_layout(s)[0] for s in shards)
    assert merged == whole


# ---------------------------------------------------------------- html
def test_html_drops_chrome_and_link_blocks():
    markup = (
        "<html><head><title>ignored</title></head><body>"
        "<nav><a href='/'>home</a> <a href='/b'>blog</a></nav>"
        "<article><p>real content paragraph survives here</p></article>"
        "<div><a href='x'>all anchor text block dropped</a> y</div>"
        "<footer>copyright note</footer></body></html>"
    )
    text, spans = htmlx.extract_html(markup)
    assert text == "real content paragraph survives here"
    assert spans == [(0, len(text))]


def test_html_span_invariant():
    markup = "<body><p>alpha beta</p><p>gamma delta epsilon</p></body>"
    text, spans = htmlx.extract_html(markup)
    assert text == "alpha beta\n\ngamma delta epsilon"
    for s, e in spans:
        assert text[s:e] in ("alpha beta", "gamma delta epsilon")


def test_html_entities_and_whitespace_normalization():
    markup = "<p>a&amp;b   c\n\t d</p>"
    text, _ = htmlx.extract_html(markup)
    assert text == "a&b c d"


# ---------------------------------------------------------------- routing
def test_extract_document_routing_and_errors():
    assert extract_document(None, None).error == "no_content"
    assert extract_document(b"\xff\xfeZZ", None).error == "invalid_utf8"
    assert extract_document(layout.MAGIC + b"\x00", None).error.startswith("layout_error")
    fast = ("the and of to in on with from " * 8).strip()
    r = extract_document(b"<p>html ignored on fast path</p>", fast)
    assert r.method == "native_text" and r.extracted_text == fast
    assert r.spans == [(0, len(fast))]


# --------------------------------------------- fused fast path equivalence
_HTML_ALPHABET = "<>/ab p&;'\"= \n"


@given(st.text(alphabet=_HTML_ALPHABET, max_size=200))
@settings(max_examples=300, deadline=None)
def test_fused_extract_equals_segment_keep_composition(markup):
    """extract_html's fused scanner must equal the segment_blocks +
    keep_block reference composition on ARBITRARY input (the scanner skips
    Block objects and inlines the flush; this pins the refactor)."""
    kept = [b.text for b in htmlx.segment_blocks(markup) if htmlx.keep_block(b)]
    assert htmlx._kept_texts(markup) == kept


def test_fused_extract_edge_cases():
    cases = [
        "", "plain text no tags at all",
        "<div title='attr with > inside'>quoted gt content here</div>",
        "<div a<b>weird attr lt content here</div>",
        "5 < 6 loose angle words here",
        "trailing lt <",
        "<<p>double open words here</p>",
        "</>empty close words here",
        "<A HREF='x'>UPPER anchor</A><P>UPPER BLOCK words</P>",
        "<p>text<nav>dropme dropme</nav>after words</p>",
        "<div class='unclosed>no close quote words</div>",
    ]
    for m in cases:
        kept = [b.text for b in htmlx.segment_blocks(m) if htmlx.keep_block(b)]
        assert htmlx._kept_texts(m) == kept, repr(m)


# ------------------------------------------------- lxml optional fast path
def _lxml_present() -> bool:
    try:
        import lxml  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _lxml_present(), reason="lxml not installed")
def test_lxml_backend_identity_on_wellformed():
    """When lxml exists, the C path must equal the regex oracle on
    well-formed markup (malformed markup is disclosed as parser-dependent)."""
    from paraocr_spark.core.htmlx_lxml import extract_html_lxml
    from paraocr_spark.sources.pages import gen_page

    for i in range(400):
        p = gen_page(i)
        h = p.get("html")
        if not isinstance(h, (bytes, bytearray)) or h[:4] == b"%LAY":
            continue
        markup = h.decode("utf-8")
        assert extract_html_lxml(markup) == htmlx.extract_html(markup)


@pytest.mark.skipif(_lxml_present(), reason="lxml installed: import succeeds")
def test_lxml_backend_fails_preflight_with_clear_message():
    """Without lxml the registry entry must fail at DRIVER preflight with an
    actionable ImportError, never inside executor tasks."""
    from paraocr_spark.backends import preflight_backend

    with pytest.raises(ImportError, match="lxml"):
        preflight_backend("lxml")
