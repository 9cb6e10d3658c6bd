"""Corpus-management operators: decontamination, stratified sampling, TF-IDF."""

from pyspark.sql import functions as F

from paraocr_spark.operators.corpus import (
    decontaminate,
    stratified_sample,
    tfidf_top_terms,
)

SF_DIR = "/root/testdata/sf0.001"


def test_decontaminate_finds_planted_overlap(spark):
    docs = spark.createDataFrame(
        [
            (3, "alpha beta gamma delta epsilon zeta"),       # train
            (5, "unrelated words entirely different tokens"),  # train
            (97, "alpha beta gamma delta other tail words"),   # test: 4-gram hit
            (194, "nothing shared with any training doc"),     # test: clean
        ],
        schema="doc_id long, text string",
    )
    out = decontaminate(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        n=4,
    ).collect()
    got = {r.test_id: (r.n_hits, r.n_train_docs) for r in out}
    assert got == {97: (1, 1)}  # exactly one shared 4-gram, one train doc


def test_stratified_sample_deterministic_and_bounded(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s1 = stratified_sample(docs, quotas={"en": 300}, default_quota=100)
    s2 = stratified_sample(docs, quotas={"en": 300}, default_quota=100)
    a = sorted(r.doc_id for r in s1.collect())
    assert a == sorted(r.doc_id for r in s2.collect())  # no RNG state
    # rates land near quota/denom (binomial tolerance on a small corpus)
    n_en = docs.where("lang = 'en'").count()
    k_en = s1.where("lang = 'en'").count()
    assert 0.15 < k_en / n_en < 0.45


def test_tfidf_ranks_rare_terms_over_common(spark):
    docs = spark.createDataFrame(
        [(0, "common common rareword"), (1, "common other"), (2, "common more")],
        schema="doc_id long, text string",
    )
    top = tfidf_top_terms(docs, k=1)
    r0 = {r.id: r.term for r in top.collect()}
    assert r0[0] == "rareword"  # df=1 beats the corpus-wide term
    # ubiquitous term has idf = ln(1) = 0 -> never ranks above a unique term
