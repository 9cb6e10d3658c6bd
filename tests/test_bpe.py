"""Real-BPE tokenization: training determinism, encode correctness, and the
Spark UDF vs the serial count."""

from pyspark.sql import functions as F

from paraocr_spark.functions import bpe

SF_DIR = "/root/testdata/sf0.001"


def test_train_is_deterministic_and_merges_frequent_words():
    freqs = {"banana": 50, "bandana": 30, "ban": 90, "nab": 2}
    m1 = bpe.train_bpe(freqs, 64)
    m2 = bpe.train_bpe(freqs, 64)
    assert m1 == m2 and m1
    # apply: the most frequent word compresses to few tokens under its own
    # merge table
    ranks = {p: i for i, p in enumerate(m1)}
    orig = bpe._RANKS
    bpe._RANKS = ranks
    try:
        bpe.encode_word.cache_clear()
        assert len(bpe.encode_word("ban")) == 1  # fully merged
        assert len(bpe.encode_word("banana")) <= 3
        # unseen word with no applicable pairs: chars + end marker
        assert bpe.encode_word("xyz") == ("x", "y", "z", "</w>")
    finally:
        bpe._RANKS = orig
        bpe.encode_word.cache_clear()


def test_bundled_fixture_covers_corpus_vocab():
    from importlib import resources

    vocab = [
        line.split()[0]
        for line in resources.files("paraocr_spark.functions")
        .joinpath("bpe_train_vocab.txt").read_text().splitlines()
        if line.strip() and not line.startswith("#")
    ]
    assert len(vocab) >= 30
    for w in vocab:
        toks = bpe.encode_word(w)
        assert 1 <= len(toks) <= len(w) + 1
        assert "".join(toks).replace("</w>", "") == w  # lossless


def test_count_tokens_edges():
    assert bpe.count_tokens(None) == 0
    assert bpe.count_tokens("") == 0
    assert bpe.count_tokens("DATA data") == 2 * bpe.count_tokens("data")


def test_spark_udf_matches_serial(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    got = docs.select(
        "doc_id", bpe.token_count_bpe_vocab(F.col("text")).alias("n")
    ).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert got and all(r.n == bpe.count_tokens(texts[r.doc_id]) for r in got)
