"""BPE stand-in tokenizer (operators/bpe.py, q62/q63): semantics parity
across the three replays (Arrow engine / pure Python / DuckDB SQL), the
replacement-scan contract both engines' replace() must share, the
once-per-worker engine lifecycle, and counter-agnostic selection/packing.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import Row

from xhs_ocr_spark.operators.bpe import (
    BPE_MERGES,
    _BpeEngine,
    bpe_count_sql,
    bpe_text_token_count,
    bpe_token_counts,
    bpe_word_token_count,
)

STRESS_WORDS = [
    "the",
    "theater",
    "thththe",  # consecutive identical pairs (documented alternation)
    "aaaa",
    "and",
    "standing",
    "antidisestablishmentarianism",
    "x",
    "",
    "是中文",  # multi-byte chars survive the char split on both engines
    "don't",
    "e2e4",
    "tion",
    "rationalization",
]


def _manual_replace(s: str, old: str, new: str) -> str:
    """Index-walking leftmost non-overlapping replace — the semantics
    Python str.replace AND DuckDB replace() must both implement (scan
    resumes after the replacement) for the cross-engine replay to hold."""
    out, i = [], 0
    while i < len(s):
        if s.startswith(old, i):
            out.append(new)
            i += len(old)
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _manual_word_count(word: str) -> int:
    s = " " + " ".join(word) + " "
    for a, b in BPE_MERGES:
        s = _manual_replace(s, f" {a} {b} ", f" {a}{b} ")
    return len(s.split())


def test_word_count_matches_manual_scan():
    for w in STRESS_WORDS:
        assert bpe_word_token_count(w) == _manual_word_count(w), w


def test_adjacent_pair_alternation_is_pinned():
    # the documented deviation: runs of identical pairs merge alternately
    assert bpe_word_token_count("thth") == 3  # th, t, h — not th, th
    assert bpe_word_token_count("the") == 1
    assert bpe_word_token_count("tion") == 1  # t+i, ti+on compose


def test_duckdb_replay_matches_python():
    con = duckdb.connect()
    got = con.execute(
        f"SELECT w, {bpe_count_sql('[w]')} FROM (SELECT unnest(?) AS w)",
        [[w for w in STRESS_WORDS if w]],
    ).fetchall()
    for w, n in got:
        assert n == bpe_text_token_count(w), w


def test_text_count_sums_words():
    t = "the standing theater"
    assert bpe_text_token_count(t) == sum(
        bpe_word_token_count(w) for w in t.split()
    )
    assert bpe_text_token_count(None) == 0
    assert bpe_text_token_count("   ") == 0


def test_engine_initializes_once_per_worker(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"the theater number {i}") for i in range(4000)]
    ).repartition(16)
    out = bpe_token_counts(df, "doc_id", "text")
    # engine init happens on executors; count inits via an accumulator-
    # style probe: add a mapInPandas that reports init_count per worker
    rows = out.collect()
    assert len(rows) == 4000
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in rows}
    for i in (0, 7, 3999):
        assert got[i] == bpe_text_token_count(f"the theater number {i}")
    # lifecycle probe: same pattern as test_model_scoring — run a stage
    # that yields each python worker's init_count after processing
    from collections.abc import Iterator

    import pandas as pd

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        eng = _BpeEngine.get()
        n = 0
        for pdf in batches:
            eng.count_batch(pdf["text"])
            n += len(pdf)
        yield pd.DataFrame({"inits": [_BpeEngine.init_count], "rows": [n]})

    stats = (
        df.select(F.col("text"))
        .repartition(16)
        .mapInPandas(probe, "inits int, rows int")
        .collect()
    )
    assert sum(r["rows"] for r in stats) == 4000
    assert all(r["inits"] == 1 for r in stats)  # once per WORKER, not per batch


def test_selection_and_packing_accept_bpe_counter(spark):
    """token_budget_select / pack_sequences are counter-agnostic: feed
    them BPE counts and verify against a pure-Python replay."""
    from xhs_ocr_spark.operators.selection import (
        pack_sequences,
        token_budget_select,
    )

    texts = {i: ("the rational theater " * (1 + i % 4)).strip() for i in range(60)}
    df = spark.createDataFrame(
        [Row(doc_id=str(i), text=t) for i, t in texts.items()]
    )
    counts = bpe_token_counts(df, "doc_id", "text").withColumnRenamed(
        "n_bpe_tokens", "n_tokens"
    )
    scored = counts.selectExpr("doc_id", "CAST(1 AS BIGINT) AS score", "n_tokens")
    budget = 150
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_select(
            scored, "doc_id", "score", "n_tokens", budget=budget
        ).collect()
    }
    # python replay: same order (score desc, md5-shard, id), same budget
    import hashlib

    def shard(i: str) -> int:
        return (int(hashlib.md5(i.encode()).hexdigest()[:6], 16) % 1000) % 64

    order = sorted(texts, key=lambda i: (shard(str(i)), str(i)))
    cum, expect = 0, {}
    for i in order:
        n = bpe_text_token_count(texts[i])
        cum += n
        if cum <= budget:
            expect[str(i)] = cum
    assert got == expect

    packed = {
        r["doc_id"]: (r["seq_id"], r["offset_in_seq"])
        for r in pack_sequences(counts, "doc_id", "n_tokens", seq_len=16).collect()
    }

    def key(i: str) -> str:
        return hashlib.md5(f"epoch-0|{i}".encode()).hexdigest()

    cum, expect_p = 0, {}
    for i in sorted(texts, key=lambda i: key(str(i))):
        n = bpe_text_token_count(texts[i])
        expect_p[str(i)] = (cum // 16, cum % 16)
        cum += n
    assert packed == expect_p
