"""Real byte-pair-encoding tokenization (Sennrich, Haddow & Birch, ACL 2016
— the public BPE algorithm behind GPT-2-style tokenizers).

``token_count_bpe`` in functions/text.py is a cheap regex APPROXIMATION of a
BPE token count; this module is the real thing: an ordered merges table
(the fixture ``bpe_merges.txt``, trained deterministically by
``train_bpe``) applied greedily by merge rank, exactly the reference
algorithm. For a 100 TB corpus the merges table is tiny (KBs) and is
broadcast once; the per-word encoding is memoized per Python worker, so the
cost is O(distinct words per batch), not O(tokens) — Zipf makes that ~1-2%
of token count on web text.

Counting happens in a vectorized pandas UDF (Arrow batches); tokenization
to words stays a C-level regex. There is no JVM twin on purpose — BPE's
merge loop is inherently iterative — but the fixture makes a deterministic
oracle possible: any engine (the DuckDB correctness twin included) can
precompute each word's token count from the same merges file.
"""

from __future__ import annotations

import re
from functools import lru_cache
from importlib import resources

_WORD_RE = re.compile(r"[a-z0-9]+")
_END = "</w>"  # end-of-word marker, as in the original BPE formulation


def train_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn an ordered merge list from word frequencies (deterministic:
    ties broken lexicographically). Offline tool — used once to produce the
    bundled fixture, and in tests to prove encode() inverts training."""
    vocab = {tuple(w) + (_END,): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def load_merges() -> dict[tuple[str, str], int]:
    """Bundled merges fixture -> {pair: rank} (lower rank merges first)."""
    text = (
        resources.files("paraocr_spark.functions")
        .joinpath("bpe_merges.txt")
        .read_text(encoding="utf-8")
    )
    ranks: dict[tuple[str, str], int] = {}
    for i, line in enumerate(text.splitlines()):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        a, b = line.split(" ")
        ranks[(a, b)] = i
    return ranks


_RANKS: dict[tuple[str, str], int] | None = None


def _ranks() -> dict[tuple[str, str], int]:
    global _RANKS
    if _RANKS is None:
        _RANKS = load_merges()
    return _RANKS


@lru_cache(maxsize=65536)
def encode_word(word: str) -> tuple[str, ...]:
    """Greedy lowest-rank-first merge loop — the standard BPE apply step."""
    ranks = _ranks()
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def count_tokens(text: str | None) -> int:
    """BPE token count of a document (lowercased [a-z0-9]+ words)."""
    if not text:
        return 0
    return sum(len(encode_word(w)) for w in _WORD_RE.findall(text.lower()))


def token_count_bpe_vocab(col):
    """Spark column: real-BPE token count via a vectorized pandas UDF.

    The merges table rides the closure (KBs); encode_word's lru_cache makes
    the per-batch cost proportional to DISTINCT words, not tokens."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def _count(s):
        return s.map(count_tokens)

    return _count(col)
