#!/usr/bin/env python3
"""Unicode-corpus correctness gate -> committed artifact (VERDICT r13
"Next round" #6).

Thin wrapper over null_gate.run_gate (one compare protocol, two
corpora — the harness-duplication lesson): runs the same Verify-vs-
DuckDB compare over the make_unicode_corpus.py corpus and writes
CORRECTNESS_unicode_r{N}.json.

Usage:
  python3 scripts/make_unicode_corpus.py            # /tmp/graft_unidata
  sbt "runMain graft.Verify /tmp/graft_unidata <outDir>"
  python3 scripts/unicode_gate.py /tmp/graft_unidata <outDir> <round>
"""
import sys

from null_gate import run_gate


def main():
    corpus_dir, out_dir, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    src = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"
    desc = (f"scripts/make_unicode_corpus.py over {src} -> {corpus_dir} "
            "(deterministic multi-byte injection into documents.text: "
            "Latin-1 accents, CJK, astral emoji/surrogate pairs, "
            "combining marks, Greek/Cyrillic/ß)")
    fails = run_gate(corpus_dir, out_dir, rnd,
                     artifact_prefix="CORRECTNESS_unicode",
                     corpus_desc=desc)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
