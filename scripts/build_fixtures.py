#!/usr/bin/env python
"""Precompute the expected flagship output as a parquet fixture so q30
gets a driver-green CORRECTNESS row (round-2 item 3).

The flagship is not SQL-expressible (engine semantics live in Python),
but it IS deterministic: this script re-derives the interleaved corpus
from documents.parquet with the exact chunking corpus_from_documents
performs (ASCII \\s tokenization, 7-word chunks, every 3rd slot a media
span), runs the pure-Python oracle (shared semantics: classifier + mask
composite + pixel decode), and writes the expected (doc_id, kind, text,
media_ref, "order") rows to fixtures/expected_flagship_<sf>.parquet.
q30's oracle_sql is then a trivial DuckDB SELECT over the fixture.

Usage: python scripts/build_fixtures.py [sf_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xhs_ocr_spark.extraction.semantics import (  # noqa: E402
    classify_text_span,
    extract_media_span,
)

CHUNK_WORDS = 7
_WS = re.compile(r"\s+", re.ASCII)


def corpus_spans(doc_id: str, text: str) -> list[dict]:
    """Python twin of datagen.corpus_from_documents for one document."""
    words = [w for w in _WS.split(text.strip()) if w]
    n_chunks = (len(words) + CHUNK_WORDS - 1) // CHUNK_WORDS
    spans = []
    for j in range(n_chunks):
        if j % 3 == 2:
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"mem://{doc_id}/{j}", "offset": j}
            )
        else:
            chunk = " ".join(words[j * CHUNK_WORDS : (j + 1) * CHUNK_WORDS])
            spans.append({"kind": "text", "text": chunk, "media_ref": "", "offset": j})
    return spans


def expected_rows(sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT CAST(doc_id AS VARCHAR), text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    out = []
    for doc_id, text in docs:
        for s in corpus_spans(doc_id, text or ""):
            if s["kind"] == "media":
                # == the bytes path: extract_from_bytes(render(ref)) is
                # differential-tested equal to extract_media_span(ref)
                t = extract_media_span(s["media_ref"])
                if t is not None:
                    out.append((doc_id, "media", t, s["media_ref"], s["offset"]))
            else:
                t = classify_text_span(s["text"])
                if t is not None:
                    out.append((doc_id, "text", t, "", s["offset"]))
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs(os.path.join(REPO, "fixtures"), exist_ok=True)
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        rows = expected_rows(sf_dir)
        con = duckdb.connect()
        con.execute(
            'CREATE TABLE t (doc_id VARCHAR, kind VARCHAR, text VARCHAR, '
            'media_ref VARCHAR, "order" BIGINT)'
        )
        con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
        path = os.path.join(REPO, "fixtures", f"expected_flagship_{tag}.parquet")
        con.execute(f"COPY t TO '{path}' (FORMAT PARQUET)")
        print(f"{path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
