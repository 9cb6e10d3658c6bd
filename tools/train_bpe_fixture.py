"""Regenerate the bundled BPE fixtures (merges + training vocab) from the
sf0.01 corpus word frequencies. Deterministic: same corpus -> same files."""
import duckdb

from paraocr_spark.functions.bpe import train_bpe

SF = "/root/testdata/sf0.01/documents.parquet"

rows = duckdb.sql(
    "select t, count(*) f from (select unnest(regexp_extract_all(lower(text),"
    f"'[a-z0-9]+')) t from read_parquet('{SF}')) group by t order by t"
).fetchall()
freqs = dict(rows)
merges = train_bpe(freqs, 200)
with open("paraocr_spark/functions/bpe_merges.txt", "w") as f:
    f.write("# BPE merges fixture: trained deterministically by bpe.train_bpe\n")
    f.write("# (Sennrich'16) on the sf0.01 documents word frequencies; ties\n")
    f.write("# broken lexicographically. Regenerate: tools/train_bpe_fixture.py\n")
    for a, b in merges:
        f.write(f"{a} {b}\n")
with open("paraocr_spark/functions/bpe_train_vocab.txt", "w") as f:
    f.write("# training vocabulary (word frequency), one per line\n")
    for w in sorted(freqs):
        f.write(f"{w} {freqs[w]}\n")
print(f"wrote {len(merges)} merges, {len(freqs)} vocab words")
