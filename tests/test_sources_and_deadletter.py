"""Partitioned docs table (S1/S2 pruning) + F10 dead-letter routing."""

import pyspark.sql.functions as F

from xhs_ocr_spark.extraction import datagen, oracle, semantics
from xhs_ocr_spark.extraction.pipeline import extract_spans_with_deadletter
from xhs_ocr_spark.sources import read_docs, read_recent, write_docs_table


def test_partition_pruning(spark, tmp_path):
    docs = datagen.generate_corpus(spark, 200, partitions=4)
    path = str(tmp_path / "docs_table")
    write_docs_table(docs, path, n_buckets=4)

    full = read_docs(spark, path)
    recent = read_recent(spark, path, since="2024-01-25")
    assert 0 < recent.count() < full.count()

    # physical evidence: the pruned scan reads fewer files/partitions
    def files_read(df):
        return df.select(F.input_file_name()).distinct().count()

    assert files_read(recent) < files_read(full)
    # and the predicate shows as a partition filter, not a data filter
    plan = recent._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "collect_date" in plan


def test_deadletter_matches_oracle(spark):
    n = 200
    docs = datagen.generate_corpus(spark, n, partitions=4)
    ok, dead = extract_spans_with_deadletter(docs)

    # expected dead letters: media refs where the oracle extractor fails
    exp_dead = set()
    for i in range(n):
        doc_id, spans = datagen.corpus_rows(i)
        for s in spans:
            if s["kind"] == "media" and semantics.extract_media_span(s["media_ref"]) is None:
                exp_dead.add((doc_id, s["media_ref"], s["offset"]))
    got_dead = {(r["doc_id"], r["media_ref"], r["order"]) for r in dead.collect()}
    assert got_dead == exp_dead
    assert exp_dead, "corpus must exercise the dead-letter path"
    assert dead.select("reason").distinct().collect()[0]["reason"] == "all_masks_failed"

    # ok rows + dead rows partition the media spans exactly
    exp_ok = {
        (d, k, t, m, o)
        for d, seq in oracle.extract_corpus(
            [datagen.corpus_rows(i) for i in range(n)]
        ).items()
        for (k, t, m, o) in seq
    }
    got_ok = {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"]) for r in ok.collect()
    }
    assert got_ok == exp_ok


def test_null_media_ref_dead_letter_has_reason(spark):
    """No-bytes fallback: a NULL media_ref maps to NaN under
    na_action='ignore'; the reason must still be 'all_masks_failed', not
    NULL (ADVICE r3 — `t is not None` was True for NaN)."""
    docs = spark.createDataFrame(
        [
            (
                "d0",
                [
                    {"kind": "media", "text": None, "media_ref": None, "offset": 0},
                    {"kind": "text", "text": "plain words here", "media_ref": None,
                     "offset": 1},
                ],
            )
        ],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
    ok, dead = extract_spans_with_deadletter(docs, spread_partitions=2)
    rows = dead.collect()
    assert len(rows) == 1
    assert rows[0]["reason"] == "all_masks_failed"
    assert [r["kind"] for r in ok.collect()] == ["text"]


# ---------------------------------------------------------------------------
# JSONL / CSV ingestion with dead-letter routing (sources/text_formats.py)
# ---------------------------------------------------------------------------


def test_jsonl_deadletter_split(spark, tmp_path):
    from xhs_ocr_spark.sources.text_formats import read_jsonl_with_deadletter

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
        '{"doc_id": 2, "text": "guten tag", "lang": "de", "source": "web"}\n'
        "{not json at all\n"
        '{"unrelated_shape": true}\n'
        '{"doc_id": 3, "text": "partial ok"}\n'
    )
    good, dead = read_jsonl_with_deadletter(spark, str(p))
    got = {(r["doc_id"], r["text"], r["lang"]) for r in good.collect()}
    # partial rows (some nulls) are GOOD — only corrupt / all-null die
    assert got == {
        (1, "hello world", "en"),
        (2, "guten tag", "de"),
        (3, "partial ok", None),
    }
    dl = dead.collect()
    assert len(dl) == 2
    by_reason = {r["reason"]: r["raw_line"] for r in dl}
    # malformed JSON and valid-JSON-wrong-shape are distinct classes,
    # and BOTH keep the original input line verbatim for replay
    # (round-5 ADVICE: the old reader degraded wrong-shape raw_line
    # to an all-null '{}')
    assert set(by_reason) == {"jsonl_parse", "jsonl_shape"}
    assert "not json" in by_reason["jsonl_parse"]
    assert by_reason["jsonl_shape"] == '{"unrelated_shape": true}'


def test_csv_deadletter_split(spark, tmp_path):
    from pyspark.sql import types as T

    from xhs_ocr_spark.sources.text_formats import read_csv_with_deadletter

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    p = tmp_path / "in.csv"
    p.write_text("doc_id,text\n1,alpha\nnot_a_number,beta\n2,gamma\n")
    good, dead = read_csv_with_deadletter(spark, str(p), schema)
    assert {(r["doc_id"], r["text"]) for r in good.collect()} == {
        (1, "alpha"),
        (2, "gamma"),
    }
    dl = dead.collect()
    assert len(dl) == 1 and "not_a_number" in dl[0]["raw_line"]


def test_jsonl_schema_must_declare_corrupt_col(spark):
    import pytest as _pytest
    from pyspark.sql import types as T

    from xhs_ocr_spark.sources.text_formats import read_jsonl_with_deadletter

    s = T.StructType([T.StructField("doc_id", T.LongType())])
    with _pytest.raises(ValueError):
        read_jsonl_with_deadletter(spark, "/nonexistent", schema=s)
