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


def _rk_fingerprint(hashes: "np.ndarray") -> int:
    powers = _RK_POWERS
    while len(powers) < len(hashes):
        powers.append((powers[-1] * _RK_B) % _RK_P)
    acc = 0
    for h, p in zip(hashes.tolist(), powers):
        acc = (acc + (int(h) % _RK_P) * p) % _RK_P
    return acc
FEATURES_DDL = "struct<" + ",".join(f"{n}:{t}" for n, t in FEATURE_FIELDS) + ">"


# token -> 64-bit hash memo, shared across documents in a worker process
# (token distributions are Zipfian: most crc32 work repeats otherwise)
_HASH_MEMO: dict[str, int] = {}
_HASH_MEMO_CAP = 1_000_000


def _token_hashes(uniq: np.ndarray) -> np.ndarray:
    hs = np.empty(len(uniq), dtype=np.uint64)
    memo = _HASH_MEMO
    for i, t in enumerate(uniq):
        h = memo.get(t)
        if h is None:
            b = t.encode("utf-8")
            h = (zlib.crc32(b) << 32) | zlib.crc32(b, 0xDEADBEEF)
            if len(memo) < _HASH_MEMO_CAP:
                memo[t] = h
        hs[i] = h
    return hs


def _simhash64_counted(uniq: np.ndarray, counts: np.ndarray) -> int:
    """SimHash from unique tokens + multiplicities. Identical to the
    per-token formulation: votes are linear in token counts."""
    if not len(uniq):
        return 0
    hs = _token_hashes(uniq)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out  # to signed int64


def _simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    return _simhash64_counted(uniq, counts)


def compute_features(text: str | None) -> dict:
    """Serial oracle — must match the vectorized kernel exactly."""
    if text is None:
        return {"n_chars": 0, "n_tokens": 0, "alpha_ratio": 0.0,
                "stop_ratio": 0.0, "lang_pred": "und", "simhash": 0,
                "rolling_hash": 0}
    cap = text[:FEATURE_CAP]
    lower = cap.lower()
    tokens = _TOKEN_RE.findall(lower)
    n_tok = len(tokens)
    alpha = len(_ALPHA_RE.findall(cap))
    alpha_ratio = _round4(alpha / len(cap)) if cap else 0.0
    if n_tok:
        uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
        uset = {t: int(c) for t, c in zip(uniq, counts)}
        stop = sum(c for t, c in uset.items() if t in _STOPWORDS)
        stop_ratio = _round4(stop / n_tok)
        scores = [
            sum(c for t, c in uset.items() if t in LANG_MARKERS[l])
            for l in _LANG_ORDER
        ]
        best = max(scores)
        lang_pred = "und" if best == 0 else _LANG_ORDER[scores.index(best)]
        simhash = _simhash64_counted(uniq, counts)
        rolling = _rk_fingerprint(
            _token_hashes(np.asarray(tokens, dtype=object))
        )
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
