"""Hot-bucket guards for the fuzzy-dedup operators (round-2 item 4).

The round-1 verdict flagged pair_expansion's O(|bucket|^2)-elements-in-one-
row blowup: a degenerate LSH band or a Zipfian-hot shingle posting would
build a multi-billion-element array in a single task. These tests pin the
guarded behavior:
- route equivalence: tiny cap (forces the streamed path) == huge cap
  (pure in-expression path) on the same corpus;
- a 10k-duplicate hot key COMPLETES through the streamed path;
- ngram max_df drops are observable, never silent.
"""

import pyspark.sql.functions as F
import pytest

from xhs_ocr_spark.operators import dedup_fuzzy as DF


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


@pytest.fixture(scope="module")
def mixed_corpus(spark):
    # 40 docs in 8 near-duplicate families (same band) + 20 unique docs
    texts = []
    for fam in range(8):
        base = f"family {fam} shares almost all of its words " + " ".join(
            f"w{fam}{j}" for j in range(10)
        )
        for v in range(5):
            texts.append(base + f" tail{v}")
    for u in range(20):
        texts.append(" ".join(f"unique{u}x{j}" for j in range(12)))
    return _corpus(spark, texts)


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.collect())


def test_lsh_cap_invariance(spark, mixed_corpus):
    hi = DF.lsh_candidate_pairs(mixed_corpus, "id", "text", bucket_cap=10**6)
    lo = DF.lsh_candidate_pairs(mixed_corpus, "id", "text", bucket_cap=2)
    got_hi, got_lo = _pairs(hi), _pairs(lo)
    assert got_hi == got_lo
    assert len(got_hi) > 0  # the families must actually collide


def test_ngram_cap_invariance(spark, mixed_corpus):
    hi = DF.ngram_jaccard_pairs(
        mixed_corpus, "id", "text", threshold=0.3, bucket_cap=10**6
    )
    lo = DF.ngram_jaccard_pairs(
        mixed_corpus, "id", "text", threshold=0.3, bucket_cap=2
    )
    a = sorted(map(tuple, hi.collect()))
    b = sorted(map(tuple, lo.collect()))
    assert a == b and len(a) > 0


def test_expand_bucket_pairs_exact(spark):
    # one bucket of 9 ids with cap 4 -> streamed path; expect C(9,2) pairs
    ids = list(range(9))
    buckets = spark.createDataFrame([(ids,)], "ids array<bigint>")
    got = _pairs(DF.expand_bucket_pairs(buckets, cap=4))
    want = [(i, j) for i in ids for j in ids if i < j]
    assert got == sorted(want)


def test_hot_key_completes(spark):
    """10k docs all landing in ONE lsh band: the old in-expression path
    would build a ~5*10^7-element struct array in one row; the guarded
    path must stream it. We only count pairs (C(10k,2) rows is fine to
    aggregate, silly to collect)."""
    n = 10_000
    docs = spark.range(n).select(
        F.col("id"),
        F.lit("identical boilerplate text repeated across the corpus").alias(
            "text"
        ),
    )
    cnt = DF.lsh_candidate_pairs(docs, "id", "text").count()
    assert cnt == n * (n - 1) // 2


def test_ngram_max_df_drop_is_audited(spark, mixed_corpus):
    # every family shingle has df=5; max_df=4 drops them all -> no pairs,
    # and the audit query reports the drop count (not silent).
    out = DF.ngram_jaccard_pairs(
        mixed_corpus, "id", "text", threshold=0.3, max_df=4
    )
    assert out.count() == 0
    stats = DF.ngram_df_drop_stats(
        mixed_corpus, "id", "text", max_df=4
    ).collect()[0]
    assert stats["dropped_postings"] > 0
    assert stats["max_posting"] == 40  # "shares almost all..." spans all 8 families x 5 variants
    assert stats["total_postings"] >= stats["dropped_postings"]


def test_ngram_max_df_none_disables_policy(spark, mixed_corpus):
    out = DF.ngram_jaccard_pairs(
        mixed_corpus, "id", "text", threshold=0.3, max_df=None
    )
    assert out.count() > 0
