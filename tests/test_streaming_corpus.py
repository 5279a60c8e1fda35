"""Streaming incremental corpus funnel (streaming/incremental.py:
streaming_corpus_funnel): micro-batches dedup against the ACCUMULATED
probe indexes, so the final survivor set matches a full batch re-run
over everything ingested — the streaming form of the batch parity
contract in test_incremental_pipeline."""

from __future__ import annotations

import os

from pyspark.sql import Row

from test_incremental_pipeline import _ids, _mk, planted_corpus_and_batch
from xhs_ocr_spark.plans.corpus_pipeline import EVAL_MOD, corpus_stages
from xhs_ocr_spark.streaming.incremental import streaming_corpus_funnel


def test_streaming_funnel_matches_batch_rerun(spark, tmp_path):
    corpus, batch = planted_corpus_and_batch()
    both = {**corpus, **batch}

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # two arrival files; file-source ordering follows modification time,
    # pinned explicitly so batch-1 (the "corpus") processes first
    _mk(spark, corpus).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "f1")
    )
    _mk(spark, batch).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "f2")
    )
    for i, src in enumerate(("f1", "f2")):
        parts = [
            f
            for f in os.listdir(str(tmp_path / src))
            if f.endswith(".parquet")
        ]
        assert len(parts) == 1
        dst = os.path.join(in_dir, f"batch{i}.parquet")
        os.rename(os.path.join(str(tmp_path / src), parts[0]), dst)
        os.utime(dst, (1000000 + i, 1000000 + i))

    # the FIXED external benchmark stand-in: same set the batch funnel
    # derives (every EVAL_MOD-th doc of everything ever ingested)
    eval_df = _mk(
        spark, {k: v for k, v in both.items() if int(k) % EVAL_MOD == 0}
    )

    state = str(tmp_path / "state")
    q = streaming_corpus_funnel(
        spark, in_dir, state, str(tmp_path / "ck"), eval_df
    ).trigger(availableNow=True).start()
    q.awaitTermination(600)

    got = _ids(spark.read.parquet(f"{state}/survivors"))

    # ground truth: the full batch re-run over everything, at the same
    # (decontam ∩ stratified-sample) stage
    full = corpus_stages(_mk(spark, both))
    want = _ids(
        full["decontam"].join(
            full["stratified_sample"].select("doc_id"), "doc_id", "left_semi"
        )
    )
    assert got == want

    # the probe indexes accumulated across batches (fp index covers both
    # arrival files' exact-dedup survivors)
    n_fp = spark.read.parquet(f"{state}/fp").count()
    assert n_fp == len(_ids(full["exact_dedup"]))

    # second ingest of the SAME content under new ids: everything dies
    # against the accumulated indexes, survivors unchanged
    replay = {str(int(k) + 200): v for k, v in batch.items() if k != "111"}
    _mk(spark, replay).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "f3")
    )
    parts = [
        f for f in os.listdir(str(tmp_path / "f3")) if f.endswith(".parquet")
    ]
    dst = os.path.join(in_dir, "batch2.parquet")
    os.rename(os.path.join(str(tmp_path / "f3"), parts[0]), dst)
    os.utime(dst, (1000002, 1000002))

    q2 = streaming_corpus_funnel(
        spark, in_dir, state, str(tmp_path / "ck"), eval_df
    ).trigger(availableNow=True).start()
    q2.awaitTermination(600)

    got2 = _ids(spark.read.parquet(f"{state}/survivors"))
    # every re-collected doc is an exact dup of an indexed fp -> no new
    # survivors EXCEPT docs that earlier died to within-batch ordering
    # or sampling... which are exact dups of indexed content too, so:
    assert got2 == want
