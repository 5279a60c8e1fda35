"""Property tests (SURVEY §5.2-5): invariants under permutation/shuffle.

Kept light: pure-Python properties run many examples; Spark-backed
properties use a handful of deterministic permutations instead of
hypothesis-driving the JVM (session-per-example would be too slow).
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from xhs_ocr_spark.extraction import oracle, semantics
from xhs_ocr_spark.extraction.datagen import corpus_rows


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=5000), st.randoms())
def test_oracle_invariant_under_span_permutation(i, rnd):
    """O7: extraction output depends only on offsets, not input order."""
    doc_id, spans = corpus_rows(i)
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    assert oracle.extract_document(doc_id, shuffled) == oracle.extract_document(doc_id, spans)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abo <>秒万0123456789.一二三中文 s%", min_size=0, max_size=40),
       st.sampled_from(sorted(semantics.TAG_FIELDS)), st.sampled_from(["xhs", "tiktok"]))
def test_normalization_idempotent_on_output_charset(text, tag, app):
    """Normalizing twice == normalizing once (the replace chain's output
    never reintroduces removed characters)."""
    once = semantics.normalize_ocr_text(text, tag, app)
    assert semantics.normalize_ocr_text(once, tag, app) == once


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 500)), min_size=1, max_size=20),
       st.randoms())
def test_reading_order_permutation_invariant(positions, rnd):
    """The reading-order sort is a function of geometry only — any input
    permutation yields the same sequence (ties broken by position, which
    the generator keeps unique)."""
    blocks = [
        {"box": [[x, y], [x + 40, y], [x + 40, y + 18], [x, y + 18]],
         "score": 1.0, "text": f"t{j}"}
        for j, (x, y) in enumerate(dict.fromkeys(positions))
    ]
    base = [b["text"] for b in semantics.reading_order(list(blocks))]
    shuffled = list(blocks)
    rnd.shuffle(shuffled)
    assert [b["text"] for b in semantics.reading_order(shuffled)] == base


def test_related_merge_last_nonempty_invariant(spark):
    """J1: for any cell, result == last non-empty value in table order
    (or '' if none) — checked against a driver-side reference fold over
    randomized small tables."""
    rnd = random.Random(7)
    keys = [f"k{i}" for i in range(12)]
    tables_py = []
    for _ in range(3):
        rows = {}
        for k in rnd.sample(keys, rnd.randint(4, 12)):
            rows[k] = {c: rnd.choice(["", f"v{rnd.randint(0, 9)}"]) for c in ("a", "b")}
        tables_py.append(rows)

    expected = {}
    for t in tables_py:
        for k, cols in t.items():
            cur = expected.setdefault(k, {"a": "", "b": ""})
            for c, v in cols.items():
                if cur[c] == "" or v != "":
                    cur[c] = v

    from pyspark.sql import Row

    from xhs_ocr_spark.operators import related_merge

    dfs = [
        spark.createDataFrame([Row(k=k, a=v["a"], b=v["b"]) for k, v in t.items()])
        for t in tables_py
    ]
    got = {r["k"]: {"a": r["a"], "b": r["b"]} for r in related_merge(dfs, ["k"]).collect()}
    assert got == expected
