"""Dump .explain('formatted') plans for the round-6 optimization report.

Usage: python tools/dump_plans_r06.py <repo_root> <out_dir> <suffix>
  e.g. python tools/dump_plans_r06.py /root/repo plans/r06 after
       python tools/dump_plans_r06.py /tmp/r5tree plans/r06 before

Eager queries (dedup_ngram_jaccard, dedup_minhash_lsh, clean_corpus) are
re-built LAZILY through the same operator entry points the query functions
use, so the dumped plan is the distributed pipeline — not the
LocalTableScan of their materialized result. streaming_extract has no
single batch plan to dump (its kernel plan is extract_pages', which IS
dumped via the extract_* queries).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
SF = "/root/testdata/sf0.001"

sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    import __spark_entry__ as entrymod

    lazy_queries = [
        "extract_html_roundtrip", "extract_fastpath_gate", "extract_features",
        "dedup_exact", "dedup_simhash", "neardup_lsh", "ann_topk",
        "ann_topk_ivf", "ann_topk_lsh", "ann_topk_ivf_recall",
        "decontaminate", "tfidf_top_terms", "span_dedup", "media_stats",
        "lang_id",
    ]
    qs = entrymod.queries()
    done = []
    for name in lazy_queries:
        try:
            p = plan_of(qs[name](spark, SF))
            with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
                f.write(p)
            done.append(name)
        except Exception as e:  # a query absent in the old tree: skip
            print(f"SKIP {name}: {e}", file=sys.stderr)

    # eager queries: dump the inner distributed pipeline lazily
    from paraocr_spark.operators.dedup import (dedup_minhash_lsh,
                                               dedup_ngram_jaccard,
                                               with_shingles)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = with_shingles(docs).repartition(F.col("id"))
    for name, df in [
        ("dedup_ngram_jaccard", dedup_ngram_jaccard(docs, threshold=0.5, sh=sh)),
        ("dedup_minhash_lsh", dedup_minhash_lsh(docs, threshold=0.9, sh=sh)),
    ]:
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(plan_of(df))
        done.append(name)

    from paraocr_spark.operators.corpus import clean_corpus
    from paraocr_spark.operators.extract import extract_pages
    from paraocr_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(docs, "html")
    extracted = extract_pages(pages, salt=False).select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "lang",
        F.col("extracted_text").alias("text"),
    )
    with clean_corpus(extracted, w=5, threshold=0.9,
                      quotas={"en": 300, "zh": 200}, default_quota=100) as res:
        with open(os.path.join(OUT, f"clean_corpus_{SUFFIX}.txt"), "w") as f:
            f.write(plan_of(res))
    done.append("clean_corpus")
    print(f"dumped {len(done)} plans ({SUFFIX}): {', '.join(done)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
