"""Per-document feature extraction (training-data pipeline signals).

Computed in the SAME kernel pass as extraction — one scan, one Arrow
round-trip (the reference similarly computes its quality gate inline with
extraction rather than as a second job, utils.py:107-138 called from
parallel.py:295-307). Features are derived from the first FEATURE_CAP chars
of the extracted text: quality signals saturate long before that, and the
cap keeps giant documents O(1) here.

Fields:
    n_chars       total extracted length (uncapped)
    n_tokens      whitespace tokens in the capped prefix
    alpha_ratio   alphabetic char share, 4dp
    stop_ratio    stopword share of tokens, 4dp
    lang_pred     stopword-marker language guess (functions/text.py analog)
    simhash       64-bit near-dup fingerprint (crc32-pair per token, +-1
                  bit votes) — deterministic, mergeable only pre-vote, so
                  it is computed on the capped prefix of the FINAL text
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

FEATURE_CAP = 50_000


def _round4(x: float) -> float:
    """Round half UP at 4dp — matching SQL engines (Spark/DuckDB round),
    not Python's banker's rounding; ratios of small integers hit exact
    halves (e.g. 1/32) where the two modes differ."""
    import math

    return math.floor(x * 10_000 + 0.5) / 10_000

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_NON_ALPHA_RE = re.compile(r"[^A-Za-z]")

_STOPWORDS = frozenset(
    "the a an and or not of to in on at for with from by as is are was were".split()
)

LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is that for it with".split()),
    "de": frozenset("der die das und ist nicht mit ein zu den".split()),
    "es": frozenset("el la los que y un por con las del".split()),
    "fr": frozenset("le les et des une du dans est pour sur".split()),
}
_LANG_ORDER = list(LANG_MARKERS)

FEATURE_FIELDS = [
    ("n_chars", "long"),
    ("n_tokens", "long"),
    ("alpha_ratio", "double"),
    ("stop_ratio", "double"),
    ("lang_pred", "string"),
    ("simhash", "long"),
    ("rolling_hash", "long"),
]

# Karp-Rabin polynomial fingerprint over the token-hash stream:
# rolling_hash = sum(h_i * B^i) mod P — order-sensitive (unlike simhash/md5
# of the normalized text), so block reorderings change it; the standard
# rolling-hash document fingerprint built on the same token hashes.
_RK_P = (1 << 61) - 1
_RK_B = 1_000_003
_RK_POWERS: list[int] = [1]


def _rk_fingerprint(hashes: list) -> int:
    """sum(h_i * B^i) mod P over python-int token hashes. The mod is taken
    ONCE at the end: each term is < 2^122, so the accumulator stays a
    2-3 limb bigint — one final C-level mod instead of 2n modmuls
    (measured ~2x on the per-doc loop), with an identical result."""
    powers = _RK_POWERS
    P = _RK_P
    while len(powers) < len(hashes):
        powers.append((powers[-1] * _RK_B) % P)
    acc = 0
    for h, p in zip(hashes, powers):
        acc += (h % P) * p
    return acc % P
FEATURES_DDL = "struct<" + ",".join(f"{n}:{t}" for n, t in FEATURE_FIELDS) + ">"


# token -> 64-bit hash memo, shared across documents in a worker process
# (token distributions are Zipfian: most crc32 work repeats otherwise)
_HASH_MEMO: dict[str, int] = {}
_HASH_MEMO_CAP = 1_000_000


def _token_hash_list(uniq: list) -> list:
    """64-bit crc32-pair hash per distinct token, as python ints (feeds
    both the numpy simhash matrix and the bigint rolling hash)."""
    memo = _HASH_MEMO
    out = []
    append = out.append
    for t in uniq:
        h = memo.get(t)
        if h is None:
            b = t.encode("utf-8")
            h = (zlib.crc32(b) << 32) | zlib.crc32(b, 0xDEADBEEF)
            if len(memo) < _HASH_MEMO_CAP:
                memo[t] = h
        append(h)
    return out


def _simhash64_counted(hs: list, counts: list) -> int:
    """SimHash from unique-token hashes + multiplicities. Identical to the
    per-token formulation: votes are linear in token counts."""
    if not hs:
        return 0
    ha = np.fromiter(hs, dtype=np.uint64, count=len(hs))
    ca = np.fromiter(counts, dtype=np.int64, count=len(hs))
    bits = ((ha[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = ((2 * bits - 1) * ca[:, None]).sum(axis=0)
    out = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out  # to signed int64


def _simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    from collections import Counter

    counter = Counter(tokens)
    uniq = list(counter.keys())
    return _simhash64_counted(_token_hash_list(uniq), list(counter.values()))


def compute_features(text: str | None) -> dict:
    """Serial oracle — must match the vectorized kernel exactly."""
    from collections import Counter

    if text is None:
        return {"n_chars": 0, "n_tokens": 0, "alpha_ratio": 0.0,
                "stop_ratio": 0.0, "lang_pred": "und", "simhash": 0,
                "rolling_hash": 0}
    cap = text[:FEATURE_CAP]
    lower = cap.lower()
    tokens = _TOKEN_RE.findall(lower)
    n_tok = len(tokens)
    # one C pass (sub of the complement class) instead of materializing a
    # list of single-char matches — same count, ~3x faster
    alpha = len(_NON_ALPHA_RE.sub("", cap))
    alpha_ratio = _round4(alpha / len(cap)) if cap else 0.0
    if n_tok:
        # Counter = O(n) hashing; np.unique object-sorts the token array
        # (O(n log n) string compares) for an order nothing downstream needs
        counter = Counter(tokens)
        stop = sum(c for t, c in counter.items() if t in _STOPWORDS)
        stop_ratio = _round4(stop / n_tok)
        scores = [
            sum(c for t, c in counter.items() if t in LANG_MARKERS[l])
            for l in _LANG_ORDER
        ]
        best = max(scores)
        lang_pred = "und" if best == 0 else _LANG_ORDER[scores.index(best)]
        uniq = list(counter.keys())
        hs = _token_hash_list(uniq)
        simhash = _simhash64_counted(hs, list(counter.values()))
        hd = dict(zip(uniq, hs))  # reuse the uniq hashes: no 2nd memo pass
        rolling = _rk_fingerprint([hd[t] for t in tokens])
    else:
        stop_ratio, lang_pred, simhash, rolling = 0.0, "und", 0, 0
    return {
        "n_chars": len(text),
        "n_tokens": n_tok,
        "alpha_ratio": alpha_ratio,
        "stop_ratio": stop_ratio,
        "lang_pred": lang_pred,
        "simhash": simhash,
        "rolling_hash": rolling,
    }


def compute_features_batch(texts: "pd.Series | list") -> list[dict]:
    """Batch variant used inside the Arrow kernel (token loops stay per-doc
    python — like every simhash implementation — but regex scans and ratio
    math are single C calls per doc)."""
    return [compute_features(t) for t in texts]
