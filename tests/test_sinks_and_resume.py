"""MERGE-semantics sinks + resumable checkpointed extraction."""

import pytest
from pyspark.sql import Row

from xhs_ocr_spark.extraction import datagen, oracle
from xhs_ocr_spark.extraction.checkpointed import CheckpointedExtraction
from xhs_ocr_spark.sinks import ParquetMergeTable


def test_insert_ignore_first_write_wins(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "t1"))
    t.insert_ignore(spark.createDataFrame([Row(k="a", v="first")]), ["k"])
    t.insert_ignore(
        spark.createDataFrame([Row(k="a", v="second"), Row(k="b", v="new")]), ["k"]
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {"a": "first", "b": "new"}


def test_upsert_last_write_wins_with_schema_evolution(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "t2"))
    t.upsert(spark.createDataFrame([Row(k="a", v="old")]), ["k"])
    t.upsert(spark.createDataFrame([Row(k="a", v="new", extra="42")]), ["k"])
    got = {r["k"]: r.asDict() for r in t.read().collect()}
    assert got["a"]["v"] == "new"
    assert got["a"]["extra"] == "42"  # K5: new column added on write


def test_snapshot_isolation(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "t3"))
    assert t.read() is None
    t.overwrite(spark.createDataFrame([Row(k="a")]))
    first = t.read()
    t.overwrite(spark.createDataFrame([Row(k="b")]))
    # old snapshot still readable (reader isolation), new one is LATEST
    assert first.count() == 1
    assert [r["k"] for r in t.read().collect()] == ["b"]


N_DOCS = 80


def _expected_flat():
    exp = oracle.extract_corpus([datagen.corpus_rows(i) for i in range(N_DOCS)])
    return {
        (d, k, t, m, o) for d, seq in exp.items() for (k, t, m, o) in seq
    }


def test_resume_after_crash(spark, tmp_path):
    docs = datagen.generate_corpus(spark, N_DOCS, partitions=4)
    ck = CheckpointedExtraction(spark, str(tmp_path / "run"), n_buckets=8, waves=2)

    with pytest.raises(RuntimeError, match="simulated crash"):
        ck.run(docs, fail_after_waves=1)

    done_before = ck.completed_buckets()
    assert 0 < len(done_before) < 8  # partial progress persisted

    out = ck.run(docs)  # resume
    got = {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"])
        for r in out.select("doc_id", "kind", "text", "media_ref", "order").collect()
    }
    assert got == _expected_flat()  # complete, no duplicates, no gaps

    # second resume is a no-op: all buckets checkpointed
    assert ck.completed_buckets() == set(range(8))
    lineage = ck.lineage()
    assert lineage.where("status = 'ok'").count() >= 8
    # metrics present per bucket
    assert lineage.where("rows_out >= 0 and wall_ms >= 0").count() == lineage.count()

    # dead letters recorded and consistent with the oracle's failure set
    from xhs_ocr_spark.extraction import semantics

    exp_dead = set()
    for i in range(N_DOCS):
        doc_id, spans = datagen.corpus_rows(i)
        for s in spans:
            if s["kind"] == "media" and semantics.extract_media_span(s["media_ref"]) is None:
                exp_dead.add((doc_id, s["media_ref"], s["offset"]))
    dead = ck.dead_letter()
    got_dead = {(r["doc_id"], r["media_ref"], r["order"]) for r in dead.collect()}
    assert got_dead == exp_dead
    assert lineage.groupBy().sum("dead_out").collect()[0][0] == len(exp_dead)

    # round-3 verdict item 4: the input is staged ONCE partitioned by
    # bucket, and every wave's scan prunes to its own bucket partitions
    # (PartitionFilters) — total input bytes read across waves ~= 1x.
    import os
    import re

    assert os.path.exists(os.path.join(ck.stage_dir, "_SUCCESS"))
    assert ck.wave_plans, "run() must record per-wave plans"
    for plan in ck.wave_plans:
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "bucket" in m.group(1), "wave scan must prune on bucket"
        # and the pruned filter must NOT ship to the data filter level as
        # a full-scan predicate: the scan's partition count is decided by
        # the pruned directories, which we can't see here, but the staged
        # path must be the scan target (not the raw docs frame)
        assert "staged_input" in plan


# -- BucketedMergeTable: copy-on-write at bucket granularity ------------------


def _rows(table):
    return sorted(tuple(r) for r in table.read().select("k", "v").collect())


def test_bucketed_semantics_match_flat(spark, tmp_path):
    """Same op sequence on the flat and bucketed tables -> same rows."""
    from xhs_ocr_spark.sinks import BucketedMergeTable

    flat = ParquetMergeTable(spark, str(tmp_path / "flat"))
    buck = BucketedMergeTable(spark, str(tmp_path / "buck"), keys=["k"], n_buckets=8)
    batches = [
        ("upsert", [("a", "1"), ("b", "1")]),
        ("insert_ignore", [("a", "2"), ("c", "1")]),
        ("upsert", [("b", "2"), ("d", "1")]),
        ("append", [("e", "1")]),
        ("insert_ignore", [("e", "9"), ("f", "1")]),
    ]
    for op, rows in batches:
        df = spark.createDataFrame([Row(k=k, v=v) for k, v in rows])
        getattr(flat, op)(df, ["k"]) if op != "append" else flat.append(df)
        getattr(buck, op)(df, ["k"]) if op != "append" else buck.append(df)
    assert _rows(buck) == _rows(flat)
    assert _rows(buck) == [
        ("a", "1"), ("b", "2"), ("c", "1"), ("d", "1"), ("e", "1"), ("f", "1"),
    ]


def test_bucketed_merge_is_copy_on_write(spark, tmp_path):
    """A merge touching one key rewrites only that key's bucket: every
    other bucket's parquet files in the new snapshot are HARD LINKS to
    the previous snapshot's files (same inode — no data copied), which is
    the file-level reuse Iceberg's copy-on-write MERGE gets via manifests."""
    import os as _os

    from xhs_ocr_spark.sinks import BucketedMergeTable

    t = BucketedMergeTable(spark, str(tmp_path / "cow"), keys=["k"], n_buckets=8)
    seed = spark.createDataFrame([Row(k=f"k{i}", v="old") for i in range(200)])
    t.upsert(seed)
    t.upsert(spark.createDataFrame([Row(k="k0", v="new")]))

    snaps = t.snapshot_ids()
    assert len(snaps) == 2
    prev_dir = _os.path.join(str(tmp_path / "cow"), "snapshots", f"{snaps[0]:06d}")
    new_dir = _os.path.join(str(tmp_path / "cow"), "snapshots", f"{snaps[1]:06d}")

    def inodes(snap_dir):
        out = {}
        for d in _os.listdir(snap_dir):
            if d.startswith("_mt_bucket="):
                b = int(d.split("=")[1])
                out[b] = {
                    _os.stat(_os.path.join(snap_dir, d, f)).st_ino
                    for f in _os.listdir(_os.path.join(snap_dir, d))
                    if f.endswith(".parquet")
                }
        return out

    prev_i, new_i = inodes(prev_dir), inodes(new_dir)
    linked = [b for b in new_i if b in prev_i and new_i[b] and new_i[b] <= prev_i[b]]
    rewritten = [b for b in new_i if b not in linked]
    assert len(rewritten) == 1  # exactly the bucket containing k0
    assert len(linked) == len(prev_i) - 1  # everything else carried forward
    # and the data is right
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["k0"] == "new" and got["k1"] == "old" and len(got) == 200


def test_bucketed_lookup_partition_prunes(spark, tmp_path):
    """Point lookup folds the bucket hash of the literal key into a
    partition filter — the scan reads 1 of n_buckets partitions."""
    from xhs_ocr_spark.sinks import BucketedMergeTable

    t = BucketedMergeTable(spark, str(tmp_path / "pt"), keys=["k"], n_buckets=8)
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v=str(i)) for i in range(100)]))
    hit = t.lookup(k="k7")
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_mt_bucket" in plan
    assert [(r["k"], r["v"]) for r in hit.collect()] == [("k7", "7")]


def test_bucketed_schema_evolution_falls_back_correctly(spark, tmp_path):
    from xhs_ocr_spark.sinks import BucketedMergeTable

    t = BucketedMergeTable(spark, str(tmp_path / "ev"), keys=["k"], n_buckets=4)
    t.upsert(spark.createDataFrame([Row(k="a", v="old"), Row(k="b", v="keep")]))
    t.upsert(spark.createDataFrame([Row(k="a", v="new", extra="42")]))
    got = {r["k"]: r.asDict() for r in t.read().collect()}
    assert got["a"]["v"] == "new" and got["a"]["extra"] == "42"
    assert got["b"]["v"] == "keep" and got["b"]["extra"] == ""
    # layout survives the fallback: next merge is copy-on-write again
    t.upsert(spark.createDataFrame([Row(k="b", v="touch", extra="x")]))
    assert {r["v"] for r in t.lookup(k="b").collect()} == {"touch"}


# -- round-4 ADVICE fixes -----------------------------------------------------


def test_crashed_commit_retry(spark, tmp_path):
    """A crash between the snapshot write and the LATEST pointer flip
    leaves a stale snapshots/<sid> directory; the next merge recomputes
    the same sid and must overwrite it instead of wedging on
    PATH_ALREADY_EXISTS (ADVICE r3, reproduced there)."""
    import os as _os

    from xhs_ocr_spark.sinks import BucketedMergeTable

    t = BucketedMergeTable(spark, str(tmp_path / "crash"), keys=["k"], n_buckets=4)
    t.upsert(spark.createDataFrame([Row(k="a", v="1"), Row(k="b", v="1")]))
    # simulate the crashed commit: sid 2 written (partially), pointer not flipped
    stale = _os.path.join(str(tmp_path / "crash"), "snapshots", "000002")
    _os.makedirs(_os.path.join(stale, "_mt_bucket=0"))
    with open(_os.path.join(stale, "_mt_bucket=0", "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    # retry of the merge must succeed and produce the right rows
    t.upsert(spark.createDataFrame([Row(k="a", v="2")]))
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {"a": "2", "b": "1"}


def test_lookup_typed_keys_prune_to_right_bucket(spark, tmp_path):
    """lookup() must hash the literal through Spark's cast of the STORED
    column type — Python str() disagrees with Spark for bool/float keys
    ('True' vs 'true'), silently pruning to an empty bucket (ADVICE r3)."""
    from pyspark.sql import types as T

    from xhs_ocr_spark.sinks import BucketedMergeTable

    schema = T.StructType(
        [
            T.StructField("k_bool", T.BooleanType()),
            T.StructField("k_float", T.DoubleType()),
            T.StructField("v", T.StringType()),
        ]
    )
    t = BucketedMergeTable(
        spark, str(tmp_path / "typed"), keys=["k_bool", "k_float"], n_buckets=8
    )
    rows = [(i % 2 == 0, float(i) + 0.5, f"v{i}") for i in range(40)]
    t.upsert(spark.createDataFrame(rows, schema=schema))
    hit = t.lookup(k_bool=True, k_float=2.5)
    assert [(r["k_bool"], r["k_float"], r["v"]) for r in hit.collect()] == [
        (True, 2.5, "v2")
    ]
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_mt_bucket" in plan


def test_staged_input_guard_rejects_stale_stage(spark, tmp_path):
    """Resuming against the same out_dir with different n_buckets (or a
    different corpus) must fail loudly, not silently process the stale
    staged input (ADVICE r3)."""
    import pytest as _pytest

    docs = datagen.generate_corpus(spark, 16, partitions=2)
    out = str(tmp_path / "guard")
    CheckpointedExtraction(spark, out, n_buckets=4, waves=1).run(docs)

    # different bucketing, same out_dir -> loud failure
    with _pytest.raises(RuntimeError, match="n_buckets"):
        CheckpointedExtraction(spark, out, n_buckets=8, waves=1).run(docs)

    # different corpus, same out_dir -> loud failure
    other = datagen.generate_corpus(spark, 20, partitions=2)
    with _pytest.raises(RuntimeError, match="refusing to resume"):
        CheckpointedExtraction(spark, out, n_buckets=4, waves=1).run(other)

    # matching resume still a clean no-op
    CheckpointedExtraction(spark, out, n_buckets=4, waves=1).run(docs)


# -- merge-on-read for scattered batches (round-3 verdict item 1) -------------


def _snap_inodes_and_bytes(snap_dir):
    import os as _os

    inodes, total = set(), 0
    for root, _d, files in _os.walk(snap_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                st = _os.stat(_os.path.join(root, fn))
                inodes.add(st.st_ino)
                total += st.st_size
    return inodes, total


def _new_bytes(prev_dir, new_dir):
    """Bytes in new_dir's parquet files that are NOT hard links into
    prev_dir — the write amplification of the commit."""
    import os as _os

    prev_i, _ = _snap_inodes_and_bytes(prev_dir)
    out = 0
    for root, _d, files in _os.walk(new_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                st = _os.stat(_os.path.join(root, fn))
                if st.st_ino not in prev_i:
                    out += st.st_size
    return out


def test_mor_scattered_upsert_writes_o_batch(spark, tmp_path):
    """A batch scattered across >= half the buckets must commit via
    merge-on-read: O(batch) new bytes (delta + equality-delete files),
    base buckets hard-linked forward — not the old full-bucket rewrite."""
    import os as _os

    from xhs_ocr_spark.sinks import BucketedMergeTable

    path = str(tmp_path / "mor")
    t = BucketedMergeTable(spark, path, keys=["k"], n_buckets=16)
    # pads vary per row so parquet can't dictionary-collapse them — the
    # assertion compares data volume, not per-file footer overhead
    seed = spark.createDataFrame(
        [Row(k=f"k{i}", v="old", pad=f"{i:07d}" * 30) for i in range(40000)]
    )
    t.upsert(seed)
    # every 8th key: scatters over all buckets, but is 1/8 of the rows
    batch = spark.createDataFrame(
        [Row(k=f"k{i}", v="new", pad=f"{i:07d}" * 30) for i in range(0, 40000, 8)]
    )
    t.upsert(batch)

    assert t.in_mor_state()
    snaps = t.snapshot_ids()
    prev_dir = _os.path.join(path, "snapshots", f"{snaps[-2]:06d}")
    new_dir = _os.path.join(path, "snapshots", f"{snaps[-1]:06d}")
    _, base_bytes = _snap_inodes_and_bytes(prev_dir)
    fresh = _new_bytes(prev_dir, new_dir)
    # the old scattered regime rewrote ~base_bytes; MOR writes ~batch size
    assert fresh < base_bytes / 3, (fresh, base_bytes)

    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 40000
    assert got["k0"] == "new" and got["k8"] == "new"
    assert got["k1"] == "old" and got["k39999"] == "old"

    # point lookup still partition-prunes on the resolved MOR view
    hit = t.lookup(k="k16")
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_mt_bucket" in plan
    assert [(r["k"], r["v"]) for r in hit.select("k", "v").collect()] == [("k16", "new")]


def test_mor_semantics_match_flat_and_compact(spark, tmp_path):
    """While in MOR state every merge shape (upsert / insert_ignore /
    append) must match the flat reference table row-for-row; compact()
    folds the deltas into a clean base with identical rows and restores
    copy-on-write for subsequent point merges."""
    import os as _os

    from xhs_ocr_spark.sinks import BucketedMergeTable

    path = str(tmp_path / "mor_sem")
    flat = ParquetMergeTable(spark, str(tmp_path / "mor_flat"))
    t = BucketedMergeTable(spark, path, keys=["k"], n_buckets=4)

    def both(op, rows):
        df = spark.createDataFrame([Row(k=k, v=v) for k, v in rows])
        (getattr(flat, op)(df, ["k"]) if op != "append" else flat.append(df))
        (getattr(t, op)(df, ["k"]) if op != "append" else t.append(df))

    both("upsert", [(f"k{i}", "0") for i in range(40)])  # initial commit
    both("upsert", [(f"k{i}", "1") for i in range(0, 40, 2)])  # scattered -> MOR
    assert t.in_mor_state()
    both("insert_ignore", [("k0", "X"), ("zz", "fresh")])  # stays MOR
    both("upsert", [("k0", "2"), ("k1", "2")])  # point batch, but MOR state
    both("append", [("k0", "dup")])  # duplicate-key row must survive reads

    def rows(table):
        return sorted(tuple(r) for r in table.read().select("k", "v").collect())

    assert rows(t) == rows(flat)
    before = rows(t)

    t.compact()
    assert not t.in_mor_state()
    assert rows(t) == before
    snap = _os.path.join(path, "snapshots", f"{t.snapshot_ids()[-1]:06d}")
    assert not _os.path.isdir(_os.path.join(snap, "_deltas"))

    # post-compaction point merge is copy-on-write again (hard links back)
    t.upsert(spark.createDataFrame([Row(k="k3", v="9")]))
    flat.upsert(spark.createDataFrame([Row(k="k3", v="9")]), ["k"])
    assert rows(t) == rows(flat)
    snaps = t.snapshot_ids()
    prev_dir = _os.path.join(path, "snapshots", f"{snaps[-2]:06d}")
    new_dir = _os.path.join(path, "snapshots", f"{snaps[-1]:06d}")
    prev_i, _ = _snap_inodes_and_bytes(prev_dir)
    new_i, _ = _snap_inodes_and_bytes(new_dir)
    assert prev_i & new_i, "untouched buckets must be hard-linked forward"


def test_mor_auto_compact(spark, tmp_path):
    from xhs_ocr_spark.sinks import BucketedMergeTable

    t = BucketedMergeTable(
        spark, str(tmp_path / "ac"), keys=["k"], n_buckets=4,
        auto_compact_deltas=2,
    )
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="0") for i in range(40)]))
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="1") for i in range(0, 40, 2)]))
    assert t.in_mor_state()  # one delta: below threshold
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="2") for i in range(0, 40, 3)]))
    assert not t.in_mor_state()  # second delta hit the threshold -> compacted
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["k0"] == "2" and got["k2"] == "1" and got["k5"] == "0"


def test_mor_crashed_commit_retry(spark, tmp_path):
    """Same crash contract as COW: a stale MOR snapshot dir (written but
    never pointed at) is wiped and the retried merge succeeds."""
    import os as _os

    from xhs_ocr_spark.sinks import BucketedMergeTable

    path = str(tmp_path / "mor_crash")
    t = BucketedMergeTable(spark, path, keys=["k"], n_buckets=4)
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="0") for i in range(40)]))
    stale = _os.path.join(path, "snapshots", "000002")
    _os.makedirs(_os.path.join(stale, "_deltas", "000002", "_mt_bucket=0"))
    with open(
        _os.path.join(stale, "_deltas", "000002", "_mt_bucket=0", "junk.parquet"), "wb"
    ) as f:
        f.write(b"junk")
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="1") for i in range(0, 40, 2)]))
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["k0"] == "1" and got["k1"] == "0" and len(got) == 40


# -- checkpointed extraction through the MERGE sink (round-3 verdict item 5) --


def test_checkpoint_into_merge_sink_resume_no_dups(spark, tmp_path):
    """One resumable end-to-end job: extraction waves land in a
    BucketedMergeTable via insert_ignore on (doc_id, order) — the
    reference's idempotent INSERT OR IGNORE re-run (db/__init__.py:
    110-116) fused with checkpoint resume. After a crash: re-running
    produces ZERO duplicate rows through the sink; re-merging
    already-committed data is a no-op; wave commits are copy-on-write
    touching only the wave's buckets (inode check); doc lookups prune."""
    import os as _os

    from xhs_ocr_spark.extraction.checkpointed import make_span_sink

    docs = datagen.generate_corpus(spark, N_DOCS, partitions=4)
    sink = make_span_sink(spark, str(tmp_path / "table"), n_buckets=8)
    ck = CheckpointedExtraction(
        spark, str(tmp_path / "run"), n_buckets=8, waves=4, span_sink=sink
    )

    with pytest.raises(RuntimeError, match="simulated crash"):
        ck.run(docs, fail_after_waves=2)
    partial = sink.read().count()
    assert 0 < partial < len(_expected_flat())

    # "wave committed, lineage lost": re-merging the same rows adds none
    sink.insert_ignore(sink.read())
    assert sink.read().count() == partial

    out = ck.run(docs)  # resume
    got = {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"])
        for r in out.collect()
    }
    assert got == _expected_flat()
    assert out.count() == len(_expected_flat())  # set AND multiset equal: no dups

    # wave commits are copy-on-write: the last commit hard-links every
    # bucket it did not touch from the previous snapshot
    snaps = sink.snapshot_ids()
    # 2 commits before the crash + 4 on resume (the 4 remaining buckets
    # re-plan into 4 single-bucket waves); the no-op re-merge added none
    assert len(snaps) == 6
    prev_dir = _os.path.join(sink.path, "snapshots", f"{snaps[-2]:06d}")
    new_dir = _os.path.join(sink.path, "snapshots", f"{snaps[-1]:06d}")
    prev_i, _ = _snap_inodes_and_bytes(prev_dir)
    new_rewritten_buckets = set()
    for root, _d, files in _os.walk(new_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                st = _os.stat(_os.path.join(root, fn))
                if st.st_ino not in prev_i:
                    new_rewritten_buckets.add(root.split("_mt_bucket=")[-1])
    assert 1 <= len(new_rewritten_buckets) <= 2  # exactly the wave's buckets
    assert prev_i & _snap_inodes_and_bytes(new_dir)[0]  # links carried forward

    # doc-level point lookup partition-prunes on the bucket_keys subset
    some_doc = next(iter(got))[0]
    hit = sink.lookup(doc_id=some_doc)
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_mt_bucket" in plan
    exp_rows = {t for t in _expected_flat() if t[0] == some_doc}
    assert {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"])
        for r in hit.collect()
    } == exp_rows


# -- DELETE: the fourth MERGE shape -------------------------------------------


def test_delete_semantics_match_flat(spark, tmp_path):
    from xhs_ocr_spark.sinks import BucketedMergeTable

    flat = ParquetMergeTable(spark, str(tmp_path / "df"))
    buck = BucketedMergeTable(spark, str(tmp_path / "db"), keys=["k"], n_buckets=8)
    seed = spark.createDataFrame([Row(k=f"k{i}", v="0") for i in range(40)])
    flat.upsert(seed, ["k"]); buck.upsert(seed)
    dels = spark.createDataFrame([Row(k="k3"), Row(k="k7"), Row(k="nope")])
    flat.delete(dels, ["k"]); buck.delete(dels)
    assert _rows(buck) == _rows(flat)
    assert len(_rows(buck)) == 38  # 'nope' was a no-op
    assert buck.lookup(k="k3").count() == 0
    # point delete in clean state stays copy-on-write (no MOR trees)
    assert not buck.in_mor_state()
    # delete-then-upsert re-inserts the key
    flat.upsert(spark.createDataFrame([Row(k="k3", v="back")]), ["k"])
    buck.upsert(spark.createDataFrame([Row(k="k3", v="back")]))
    assert _rows(buck) == _rows(flat)
    assert {r["v"] for r in buck.lookup(k="k3").collect()} == {"back"}


def test_scattered_delete_is_mor_and_obatch(spark, tmp_path):
    """A delete scattering across >= half the buckets writes ONLY an
    equality-delete key file (O(batch) bytes); reads mask it; a later
    upsert re-inserts; compact() folds everything clean."""
    import os as _os

    from xhs_ocr_spark.sinks import BucketedMergeTable

    path = str(tmp_path / "sd")
    t = BucketedMergeTable(spark, path, keys=["k"], n_buckets=16)
    t.upsert(
        spark.createDataFrame(
            [Row(k=f"k{i}", v=f"{i:05d}" * 20) for i in range(8000)]
        )
    )
    t.delete(spark.createDataFrame([Row(k=f"k{i}") for i in range(0, 8000, 4)]))
    assert t.in_mor_state()
    snaps = t.snapshot_ids()
    prev_dir = _os.path.join(path, "snapshots", f"{snaps[-2]:06d}")
    new_dir = _os.path.join(path, "snapshots", f"{snaps[-1]:06d}")
    _, base_bytes = _snap_inodes_and_bytes(prev_dir)
    assert _new_bytes(prev_dir, new_dir) < base_bytes / 10  # key file only
    assert t.read().count() == 6000
    assert t.lookup(k="k4").count() == 0 and t.lookup(k="k5").count() == 1
    t.upsert(spark.createDataFrame([Row(k="k4", v="revived")]))
    assert {r["v"] for r in t.lookup(k="k4").collect()} == {"revived"}
    t.compact()
    assert not t.in_mor_state()
    assert t.read().count() == 6001


def test_expire_snapshots_in_mor_state_keeps_data(spark, tmp_path):
    """K7 retention while merge-on-read trees are hard-linked forward:
    expiring old snapshots only unlinks THEIR names — the latest
    snapshot's links keep every base, delta and delete file alive, and
    the resolved view is unchanged."""
    from xhs_ocr_spark.sinks import BucketedMergeTable

    t = BucketedMergeTable(spark, str(tmp_path / "exp"), keys=["k"], n_buckets=4)
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="0") for i in range(40)]))
    t.upsert(spark.createDataFrame([Row(k=f"k{i}", v="1") for i in range(0, 40, 2)]))
    t.delete(spark.createDataFrame([Row(k="k1"), Row(k="k3")]))
    assert t.in_mor_state()
    before = sorted(tuple(r) for r in t.read().select("k", "v").collect())

    expired = t.expire_snapshots(keep_n=1)
    assert expired  # something actually got expired
    after = sorted(tuple(r) for r in t.read().select("k", "v").collect())
    assert after == before
    assert {r["v"] for r in t.lookup(k="k2").collect()} == {"1"}
