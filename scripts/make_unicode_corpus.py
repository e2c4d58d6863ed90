#!/usr/bin/env python3
"""Multi-byte-text oracle-gate corpus (VERDICT r13 "Next round" #6).

Copies the sf0.001 tables to <out>, injecting non-ASCII text into
documents.text deterministically (by doc_id residue — reruns identical),
so the text family and the tokenizer kernels are exercised on every
unicode shape a crawl corpus is guaranteed to contain:

  doc_id % 11 == 0 : Latin-1 accents prefixed  ("café naïve déjà ...")
  doc_id %  7 == 0 : CJK words appended        ("中文 分词 测试")
  doc_id %  5 == 0 : astral emoji appended     ("👍 🚀😀x" — surrogate
                     pairs in UTF-16 engines, 4-byte UTF-8)
  doc_id % 13 == 0 : combining mark + Greek/Cyrillic/ß appended
                     ("éxposé" spelled e+U+0301, "Ελλάδα Москва ß")

Residues overlap on purpose (e.g. doc_id % 35 == 0 gets CJK AND emoji).
Everything else copies verbatim. The gate then runs graft.Verify +
the null_gate compare over this corpus: both engines see identical
UTF-8 bytes, so any FAIL is a genuine cross-engine unicode-semantics
divergence (code-point vs grapheme splitting, ascii()/length() width
conventions, case folding), not a data artifact.

Usage: python3 scripts/make_unicode_corpus.py [srcDir] [outDir]
"""
import os
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_unidata"

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# e + COMBINING ACUTE (U+0301): two code points that render as one
# grapheme — the split('')-vs-grapheme trap, pinned to code points
COMBINING = "e" + "́" + "xpose" + "́"

REWRITE = {
    "documents": f"""
        SELECT * REPLACE (
          CASE WHEN doc_id % 11 = 0 THEN 'café naïve déjà ' || text
               ELSE text END
          || CASE WHEN doc_id % 7 = 0 THEN ' 中文 分词 测试' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN ' 👍 🚀😀x' ELSE '' END
          || CASE WHEN doc_id % 13 = 0
                  THEN ' {COMBINING} Ελλάδα Москва ß' ELSE '' END
          AS text)
        FROM read_parquet('{{src}}/documents.parquet')""",
}

for t in TABLES:
    q = REWRITE.get(t, "SELECT * FROM read_parquet('{src}/" + t + ".parquet')")
    sql = q.format(src=src)
    con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"wrote {t}: {n} rows")

# sanity: every injection class actually landed
for label, frag in [
    ("accents", "café"),
    ("cjk", "中文"),
    ("astral emoji", "👍"),
    ("combining mark", COMBINING),
]:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        f"WHERE text LIKE '%{frag}%'").fetchone()[0]
    print(f"injected {label}: {n}")
    assert n > 0, f"injection missed: {label}"
print("OK")
