"""Text analytics over document tables — pure Spark built-ins.

These are the training-data-pipeline scalar ops (language-ID, quality
scoring, token counting, fingerprinting) expressed entirely with
``pyspark.sql.functions`` so they stay inside WholeStageCodegen — no Python
in the hot path. Each has an exact DuckDB-SQL oracle in
``__spark_entry__.py``.

The quality-score family generalizes the reference's two-stage text gate
(utils.py:107-138 in /root/reference) from a boolean to a graded score.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Stopword marker sets per language for the n-gram/stopword lang-ID
# heuristic. Deterministic tie-break: first language in this order wins.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "it", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "los", "que", "y", "un", "por", "con", "las", "del"),
    "fr": ("le", "les", "et", "des", "une", "du", "dans", "est", "pour", "sur"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("a", "as", "on", "at", "by", "an", "be", "or")


def tokens(col: Column) -> Column:
    """Word tokens (letters+digits runs)."""
    return F.regexp_extract_all(col, F.lit(WORD_RE), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation marks."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def alpha_ratio(col: Column) -> Column:
    """Share of alphabetic characters (0 for empty strings)."""
    alpha = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    return F.when(F.length(col) > 0, alpha / F.length(col)).otherwise(F.lit(0.0))


def _marker_hits(col: Column, markers: tuple[str, ...]) -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(col: Column) -> Column:
    n = token_count(col)
    hits = _marker_hits(col, STOPWORDS_EN)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Graded [0,1] quality score: mean of alpha ratio and stopword ratio,
    rounded to 4dp (rounding pins cross-engine float agreement)."""
    return F.round((alpha_ratio(col) + stopword_ratio(col)) / 2.0, 4)


def quality_gate(col: Column) -> Column:
    """Relational re-expression of the reference's boolean gate: length >=
    100, valid-char ratio >= 0.85, dictionary(stopword) ratio >= 0.30.
    (The Arrow-kernel gate in core/quality.py is richer; this variant is
    Catalyst-visible so it pushes into scans as a plain filter.)"""
    valid = F.length(F.regexp_replace(col, r"[^A-Za-z0-9\s\.,;:!\?\-'\"\(\)]", ""))
    valid_ratio = F.when(F.length(col) > 0, valid / F.length(col)).otherwise(F.lit(0.0))
    return (
        (F.length(col) >= 100)
        & (valid_ratio >= 0.85)
        & (stopword_ratio(col) >= 0.30)
    )


def gopher_signals(col: Column) -> Column:
    """Gopher-style per-document repetition/quality signals (Rae et al.
    2021, Table A1 lineage) as ONE struct of pure JVM expressions — the
    standard pre-training filter battery, Catalyst-visible so it rides the
    scan with zero Python:

      n_words            whitespace-delimited word count
      mean_word_len      avg word length, 4dp
      max_word_len       longest word
      distinct_ratio     distinct words / words (the repetition signal —
                         Gopher's duplicate-line fraction generalized to
                         the unit arbitrary text always has), 4dp
      alpha_word_ratio   words containing >= 1 [A-Za-z], 4dp
      stop_hits          DISTINCT stop words present from a small English
                         stop set — the published Gopher rule ("contains at
                         least two of a set of stop words"), so 'the the'
                         counts once (ADVICE r4: occurrence counting
                         over-passed repetitive docs)
    """
    ws = F.split(F.trim(col), "\\s+")
    n = F.size(ws)
    has_words = (F.length(F.trim(col)) > 0) & (n > 0)
    tot_len = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    stops = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    stop_hits = F.size(F.array_distinct(
        F.filter(F.transform(ws, F.lower), lambda w: F.array_contains(stops, w))
    ))
    return F.struct(
        F.when(has_words, n).otherwise(F.lit(0)).alias("n_words"),
        F.when(has_words, F.round(tot_len / n, 4)).otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(has_words, F.array_max(F.transform(ws, F.length))).otherwise(F.lit(0)).alias("max_word_len"),
        F.when(has_words, F.round(F.size(F.array_distinct(ws)) / n, 4)).otherwise(F.lit(0.0)).alias("distinct_ratio"),
        F.when(has_words, F.round(alpha_words / n, 4)).otherwise(F.lit(0.0)).alias("alpha_word_ratio"),
        F.when(has_words, stop_hits).otherwise(F.lit(0)).alias("stop_hits"),
    )


def gopher_gate(col: Column | None = None, min_words: int = 50,
                max_words: int = 100_000,
                min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                min_distinct: float = 0.2, min_alpha_words: float = 0.8,
                min_stop_hits: int = 2,
                signals: Column | None = None) -> Column:
    """Boolean Gopher filter over gopher_signals with the published-style
    thresholds as parameters (defaults per the Gopher rules, scaled to
    this corpus' short docs via min_words=50). Pass ``signals`` (an
    already-projected gopher_signals struct) to gate without recomputing."""
    s = signals if signals is not None else gopher_signals(col)
    return (
        s["n_words"].between(min_words, max_words)
        & s["mean_word_len"].between(min_mean_wl, max_mean_wl)
        & (s["distinct_ratio"] >= min_distinct)
        & (s["alpha_word_ratio"] >= min_alpha_words)
        & (s["stop_hits"] >= min_stop_hits)
    )


def lang_id_from_tokens(lowered_tokens: Column) -> Column:
    """Stopword-marker language ID over an ALREADY-tokenized, lowercased
    token array. Callers that have (or can project) the token array once
    should prefer this over lang_id(text): the text form re-tokenizes per
    language profile (4 regexp_extract_all passes — Catalyst does not CSE
    the repeated subtree across the marker-hit expressions; measured 4.3 s
    vs 2.4 s at sf1.0/50k docs when the array is projected first).
    Deterministic tie-break by LANG_MARKERS order; 'und' when no marker
    hits at all."""
    def _hits(ms: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(m) for m in ms])
        return F.size(F.filter(lowered_tokens, lambda t: F.array_contains(arr, t)))

    hits = {lang: _hits(ms) for lang, ms in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lowered_tokens(col: Column) -> Column:
    """The token array lang_id is defined over: [A-Za-z0-9]+ runs,
    lowercased."""
    return F.transform(tokens(col), lambda t: F.lower(t))


def lang_id(col: Column) -> Column:
    """Stopword-marker language ID. Deterministic tie-break by LANG_MARKERS
    order; 'und' when no marker hits at all. (Single-expression form; when
    you can project the token array once, use lowered_tokens +
    lang_id_from_tokens — see the latter's docstring.)"""
    return lang_id_from_tokens(lowered_tokens(col))


# Distinctive character trigrams per language (n-gram profile method,
# Cavnar & Trenkle '94 lineage, minimal profiles).
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "ing", "and", " of"),
    "de": ("der", "sch", "ein", "ich", "und"),
    "es": ("que", " de", "ión", "los", " la"),
    "fr": ("les", " le", "ent", "des", "une"),
}


def _trigram_count(col: Column, tri: str) -> Column:
    lower = F.lower(col)
    return (
        (F.length(lower) - F.length(F.replace(lower, F.lit(tri), F.lit(""))))
        / len(tri)
    ).cast("long")


def lang_id_ngram(col: Column) -> Column:
    """Character-trigram language ID: count profile trigrams by substring
    occurrence (pure string built-ins — no tokenization, robust to scripts
    without word separators). Tie-break by LANG_TRIGRAMS order; 'und' when
    nothing matches."""
    scores = {
        lang: sum(
            (_trigram_count(col, t) for t in tris), F.lit(0).cast("long")
        )
        for lang, tris in LANG_TRIGRAMS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_TRIGRAMS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (Content-addressed identity, the analog of the reference's SHA-1 cache
    keys, parallel.py:63-66.)"""
    norm = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(norm.cast("binary"))
