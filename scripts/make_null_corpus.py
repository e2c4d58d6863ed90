#!/usr/bin/env python3
"""Null/zero-injected oracle-gate corpus (VERDICT r8 item 8).

Copies the sf0.001 tables to <out>, injecting the degenerate shapes a
100 TB corpus is guaranteed to contain somewhere, deterministically (by
id residue, so reruns produce the identical corpus):

  events.value      -> NULL on event_id % 19 == 0 (~5%)
  documents.text    -> NULL on doc_id % 41 == 0, '' on doc_id % 43 == 0
  embeddings.embedding -> all-zero vector (zero norm) on vec_id % 97 == 0

Everything else copies verbatim. The driver-mimic gate then runs
graft.Verify + scripts/check.py against this corpus: both engines see
the same nulls, so any FAIL is a genuine cross-engine null-semantics
divergence (Spark NULLS FIRST vs DuckDB NULLS LAST ordering, null
arithmetic, NaN-vs-null from zero norms), not a data artifact.

Usage: python3 scripts/make_null_corpus.py [srcDir] [outDir]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_nulldata"

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

REWRITE = {
    "events": """
        SELECT * REPLACE (
          CASE WHEN event_id % 19 = 0 THEN NULL ELSE value END AS value)
        FROM read_parquet('{src}/events.parquet')""",
    "documents": """
        SELECT * REPLACE (
          CASE WHEN doc_id % 41 = 0 THEN NULL
               WHEN doc_id % 43 = 0 THEN ''
               ELSE text END AS text)
        FROM read_parquet('{src}/documents.parquet')""",
    "embeddings": """
        SELECT * REPLACE (
          CASE WHEN vec_id % 97 = 0
               THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
               ELSE embedding END AS embedding)
        FROM read_parquet('{src}/embeddings.parquet')""",
}

for t in TABLES:
    q = REWRITE.get(t, "SELECT * FROM read_parquet('{src}/" + t + ".parquet')")
    sql = q.format(src=src)
    con.execute(
        f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"wrote {t}: {n} rows")

# sanity: the injections actually landed
for label, q in [
    ("null events.value", f"SELECT count(*) FROM read_parquet('{out}/events.parquet') WHERE value IS NULL"),
    ("null documents.text", f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') WHERE text IS NULL"),
    ("empty documents.text", f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') WHERE text = ''"),
    ("zero embeddings", f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet') WHERE NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x <> 0)"),
]:
    n = con.execute(q).fetchone()[0]
    print(f"injected {label}: {n}")
    assert n > 0, f"injection missed: {label}"
print("OK")
