"""Property-based checks (hypothesis) for codecs and span invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from paraocr_spark import PAGE_BREAK
from paraocr_spark.core import htmlx, layout
from paraocr_spark.core.features import compute_features
from paraocr_spark.core.reference import extract_document

LINE = st.tuples(
    st.floats(0, 1000, allow_nan=False, width=32),
    st.floats(0, 1000, allow_nan=False, width=32),
    st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s),
)
PAGES = st.lists(st.lists(LINE, max_size=8), min_size=0, max_size=6)


@given(PAGES)
@settings(max_examples=150, deadline=None)
def test_layout_codec_roundtrip(pages):
    payload = layout.encode_layout(pages)
    decoded = layout.decode_layout(payload)
    assert len(decoded) == len(pages)
    for orig, back in zip(pages, decoded):
        assert [t for _, _, t in sorted(orig, key=lambda l: (l[1], l[0]))] == [
            t for _, _, t in sorted(back, key=lambda l: (l[1], l[0]))
        ]


@given(PAGES, st.integers(1, 5))
@settings(max_examples=100, deadline=None)
def test_layout_shard_split_always_merges_identically(pages, per_shard):
    payload = layout.encode_layout(pages)
    whole, _ = layout.extract_layout(payload)
    merged = PAGE_BREAK.join(
        layout.extract_layout(s)[0] for s in layout.split_layout_pages(payload, per_shard)
    )
    assert merged == whole


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_extract_never_raises_on_garbage(blob):
    r = extract_document(blob, None)
    assert r.method in ("html_extract", "layout_extract", "error")
    if r.extracted_text is not None:
        for s, e in r.spans:
            assert 0 <= s <= e <= len(r.extracted_text)


@given(st.text(max_size=2000))
@settings(max_examples=150, deadline=None)
def test_html_span_invariant_any_markup(markup):
    text, spans = htmlx.extract_html(markup)
    pos = -1
    for s, e in spans:
        assert 0 <= s <= e <= len(text)
        assert s > pos  # sorted, non-overlapping
        pos = e
        seg = text[s:e]
        assert seg == seg.strip()


@given(st.one_of(st.none(), st.text(max_size=500)))
@settings(max_examples=150, deadline=None)
def test_features_total_and_bounds(text):
    f = compute_features(text)
    assert f["n_chars"] == (len(text) if text is not None else 0)
    assert 0.0 <= f["alpha_ratio"] <= 1.0
    assert 0.0 <= f["stop_ratio"] <= 1.0
    assert f["lang_pred"] in ("en", "de", "es", "fr", "und")
    assert -(1 << 63) <= f["simhash"] < (1 << 63)
