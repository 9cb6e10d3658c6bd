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
# alpha counting: delete every non-[A-Za-z] byte and take the length.
# UTF-8 bytes of non-ASCII chars are all >= 0x80, so they land in the
# delete set and the result length equals the regex-[A-Za-z] char count —
# one memchr-speed C pass, ~3x faster than regex-sub of the complement.
_NON_ALPHA_BYTES = bytes(
    i for i in range(256) if not (65 <= i <= 90 or 97 <= i <= 122)
)

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
# token -> tuple of lang indexes it marks (handles any overlap), so the
# stop/lang scoring is ONE pass over counter.items() instead of five
_MARKER_LANGS: dict[str, tuple] = {}
for _li, _lang in enumerate(_LANG_ORDER):
    for _t in LANG_MARKERS[_lang]:
        _MARKER_LANGS[_t] = _MARKER_LANGS.get(_t, ()) + (_li,)

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
    """sum(h_i * B^i) mod P over python-int token hashes (reference form;
    the kernel uses _rk_fingerprint_premod with memoized h % P)."""
    return _rk_fingerprint_premod([h % _RK_P for h in hashes])


def _rk_fingerprint_premod(hmods: list) -> int:
    """sum(hm_i * B^i) mod P over PREMODDED token hashes (hm = h % P).

    The mod is taken ONCE at the end: each term is < 2^122, so the
    accumulator stays a 2-3 limb bigint — one final C-level mod instead of
    2n modmuls; and the sum-of-products runs as sum(map(mul, ...)), a
    C-driven loop with no per-iteration interpreter frame (r4: ~2x on the
    per-doc loop vs the explicit zip loop, identical result)."""
    import operator

    powers = _RK_POWERS
    while len(powers) < len(hmods):
        powers.append((powers[-1] * _RK_B) % _RK_P)
    return sum(map(operator.mul, hmods, powers)) % _RK_P
FEATURES_DDL = "struct<" + ",".join(f"{n}:{t}" for n, t in FEATURE_FIELDS) + ">"


# token -> (hash, hash % P) memo, shared across documents in a worker
# process (token distributions are Zipfian: most crc32 work repeats
# otherwise). The premodded value feeds the rolling hash so the % P runs
# once per DISTINCT token ever seen, not once per token occurrence.
_HASH_MEMO: dict[str, tuple] = {}
_HASH_MEMO_CAP = 1_000_000


def _token_hash_pairs(uniq: list) -> tuple:
    """(hashes, hashes % P) per distinct token, as python ints — the full
    64-bit hash feeds the numpy simhash matrix, the premod the rolling
    hash."""
    memo = _HASH_MEMO
    hs, hm = [], []
    ah, am = hs.append, hm.append
    for t in uniq:
        pair = memo.get(t)
        if pair is None:
            b = t.encode("utf-8")
            h = (zlib.crc32(b) << 32) | zlib.crc32(b, 0xDEADBEEF)
            pair = (h, h % _RK_P)
            if len(memo) < _HASH_MEMO_CAP:
                memo[t] = pair
        ah(pair[0])
        am(pair[1])
    return hs, hm


def _token_hash_list(uniq: list) -> list:
    return _token_hash_pairs(uniq)[0]


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
    # delete non-alpha BYTES and count what's left — one memchr-speed C
    # pass; equals the [A-Za-z] char count (non-ASCII utf-8 bytes are all
    # >= 0x80, inside the delete set)
    alpha = len(cap.encode("utf-8").translate(None, _NON_ALPHA_BYTES))
    alpha_ratio = _round4(alpha / len(cap)) if cap else 0.0
    if n_tok:
        # Counter = O(n) hashing; np.unique object-sorts the token array
        # (O(n log n) string compares) for an order nothing downstream needs
        counter = Counter(tokens)
        # ONE pass over distinct tokens scores stopwords + all languages
        stop = 0
        scores = [0] * len(_LANG_ORDER)
        markers = _MARKER_LANGS
        stopwords = _STOPWORDS
        for t, c in counter.items():
            if t in stopwords:
                stop += c
            ls = markers.get(t)
            if ls is not None:
                for li in ls:
                    scores[li] += c
        stop_ratio = _round4(stop / n_tok)
        best = max(scores)
        lang_pred = "und" if best == 0 else _LANG_ORDER[scores.index(best)]
        uniq = list(counter.keys())
        hs, hm = _token_hash_pairs(uniq)
        simhash = _simhash64_counted(hs, list(counter.values()))
        hdm = dict(zip(uniq, hm))  # reuse the uniq premods: no 2nd memo pass
        rolling = _rk_fingerprint_premod([hdm[t] for t in tokens])
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


# numpy mirror of _RK_POWERS (B^i mod P as uint64), grown lazily
_RK_POW_NP = np.array([1], dtype=np.uint64)
_SH64 = np.arange(64, dtype=np.uint64)
_ZERO_FEATURES = {"n_chars": 0, "n_tokens": 0, "alpha_ratio": 0.0,
                  "stop_ratio": 0.0, "lang_pred": "und", "simhash": 0,
                  "rolling_hash": 0}


def _rk_powers_np(n: int) -> np.ndarray:
    global _RK_POW_NP
    if len(_RK_POW_NP) < n:
        powers = _RK_POWERS
        while len(powers) < n:
            powers.append((powers[-1] * _RK_B) % _RK_P)
        _RK_POW_NP = np.array(powers, dtype=np.uint64)
    return _RK_POW_NP


def _modmul61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise (a * b) mod (2^61 - 1) on uint64, exact for a, b < P.

    Schoolbook 31-bit split; 2^61 ≡ 1 (mod P) folds every partial product
    back under 64 bits — the standard Mersenne-prime modmul, vectorized.
    """
    m31 = np.uint64((1 << 31) - 1)
    p = np.uint64(_RK_P)
    a_hi, a_lo = a >> np.uint64(31), a & m31
    b_hi, b_lo = b >> np.uint64(31), b & m31
    hh = a_hi * b_hi                                    # < 2^60
    mid = a_hi * b_lo + a_lo * b_hi                     # < 2^62
    ll = a_lo * b_lo                                    # < 2^62
    # a*b = hh*2^62 + mid*2^31 + ll;  2^62 ≡ 2, mid*2^31 folded via 2^61 ≡ 1
    t = ((hh << np.uint64(1)) + (mid >> np.uint64(30))
         + ((mid & np.uint64((1 << 30) - 1)) << np.uint64(31)) + ll)  # < 2^64
    t = (t & p) + (t >> np.uint64(61))
    t = (t & p) + (t >> np.uint64(61))
    return np.where(t >= p, t - p, t)


def compute_features_batch(texts: "pd.Series | list") -> list[dict]:
    """Batch variant used inside the Arrow kernel. Per-doc work is only
    what genuinely needs Python (regex tokenize, Counter, one pass over
    distinct tokens for stop/lang scores); the two numeric kernels run as
    ONE numpy pass over the concatenated batch:

      * simhash — all docs' (uniq-hash, count) pairs stack into one bit
        matrix; per-doc votes come from np.add.reduceat segment sums
        (r4's per-doc matrix paid numpy call overhead ~128x per batch);
      * rolling_hash — per-occurrence h*B^pos runs through the vectorized
        Mersenne-61 modmul; per-doc sums split into 32-bit halves so
        reduceat never overflows, with one final % P per doc.

    Bit-for-bit equal to [compute_features(t) for t in texts] (the serial
    oracle) — pinned by tests/test_core.py property tests.
    """
    from collections import Counter

    n_docs = len(texts)
    out: list = [None] * n_docs
    live: list[int] = []          # out-index of docs with >= 1 token
    hs_parts: list = []           # per-doc uniq-hash lists (python ints)
    cnt_parts: list = []          # per-doc counts (aligned with hs_parts)
    occ_parts: list = []          # per-doc per-occurrence premods
    max_tok = 0

    for i, text in enumerate(texts):
        if text is None:
            out[i] = dict(_ZERO_FEATURES)
            continue
        cap = text[:FEATURE_CAP]
        lower = cap.lower()
        tokens = _TOKEN_RE.findall(lower)
        n_tok = len(tokens)
        alpha = len(cap.encode("utf-8").translate(None, _NON_ALPHA_BYTES))
        alpha_ratio = _round4(alpha / len(cap)) if cap else 0.0
        if not n_tok:
            out[i] = {**_ZERO_FEATURES, "n_chars": len(text),
                      "alpha_ratio": alpha_ratio}
            continue
        counter = Counter(tokens)
        stop = 0
        scores = [0] * len(_LANG_ORDER)
        markers = _MARKER_LANGS
        stopwords = _STOPWORDS
        for t, c in counter.items():
            if t in stopwords:
                stop += c
            ls = markers.get(t)
            if ls is not None:
                for li in ls:
                    scores[li] += c
        best = max(scores)
        uniq = list(counter.keys())
        hs, hm = _token_hash_pairs(uniq)
        hdm = dict(zip(uniq, hm))
        out[i] = {
            "n_chars": len(text),
            "n_tokens": n_tok,
            "alpha_ratio": alpha_ratio,
            "stop_ratio": _round4(stop / n_tok),
            "lang_pred": "und" if best == 0 else _LANG_ORDER[scores.index(best)],
            "simhash": 0,        # filled by the batched pass below
            "rolling_hash": 0,
        }
        live.append(i)
        hs_parts.append(hs)
        cnt_parts.append(list(counter.values()))
        occ_parts.append(np.fromiter(
            map(hdm.__getitem__, tokens), dtype=np.uint64, count=n_tok,
        ))
        max_tok = max(max_tok, n_tok)

    if not live:
        return out

    # ---- batched simhash over all docs' distinct tokens
    seg_u = np.fromiter((len(h) for h in hs_parts), dtype=np.int64,
                        count=len(live))
    starts_u = np.zeros(len(live), dtype=np.int64)
    np.cumsum(seg_u[:-1], out=starts_u[1:])
    H = np.fromiter(
        (h for part in hs_parts for h in part), dtype=np.uint64,
        count=int(seg_u.sum()),
    )
    C = np.fromiter(
        (c for part in cnt_parts for c in part), dtype=np.int32,
        count=len(H),
    )
    # bit matrix via unpackbits on the little-endian byte view: (n, 64)
    # uint8, and votes in int32 — ~8x less temporary memory than an int64
    # shift chain. Peak allocation size matters here: at 8 concurrent
    # workers per host, tens of MB of per-batch temporaries hit the
    # munmap/TLB-shootdown wall documented in BENCH/BASELINE.md (measured:
    # kernel wall inflated +28% at the 4N scaling level with the int64
    # form vs +7% kernel conservation without it).
    bits = np.unpackbits(
        H.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    # in-place weight: one (n,64) int32 temp instead of two (astype +
    # product) — per-batch peak matters at 8+ concurrent workers (the
    # munmap/TLB wall), and this pass is the batch's largest allocation
    weighted = bits.astype(np.int32)
    weighted *= C[:, None]
    pos_votes = np.add.reduceat(weighted, starts_u, axis=0)
    del weighted
    tot = np.add.reduceat(C, starts_u)
    votes = 2 * pos_votes - tot[:, None]  # == sum((2*bit - 1) * count)
    sigs = ((votes > 0).astype(np.uint64) << _SH64).sum(
        axis=1, dtype=np.uint64
    ).astype(np.int64)  # wraps to signed, same as the serial 2^64 fold

    # ---- batched Karp-Rabin over all docs' token occurrences
    seg_o = np.fromiter((len(o) for o in occ_parts), dtype=np.int64,
                        count=len(live))
    starts_o = np.zeros(len(live), dtype=np.int64)
    np.cumsum(seg_o[:-1], out=starts_o[1:])
    occ = np.concatenate(occ_parts)
    pow_np = _rk_powers_np(max_tok)
    pos = np.arange(len(occ), dtype=np.int64) - np.repeat(starts_o, seg_o)
    terms = _modmul61(occ, pow_np[pos])
    lo = np.add.reduceat(terms & np.uint64(0xFFFFFFFF), starts_o)
    hi = np.add.reduceat(terms >> np.uint64(32), starts_o)

    for k, i in enumerate(live):
        out[i]["simhash"] = int(sigs[k])
        out[i]["rolling_hash"] = ((int(hi[k]) << 32) + int(lo[k])) % _RK_P
    return out
