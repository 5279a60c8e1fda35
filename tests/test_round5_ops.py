"""Round-5 operators: hash-mode fast path, MOR read-amp bounds,
reliable-checkpoint components, substring dedup, model-based scoring,
the composed corpus pipeline."""

import pyspark.sql.functions as F
from pyspark.sql import Row

from xhs_ocr_spark.operators import dedup_fuzzy as DF


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t, lang="en") for i, t in rows])


def test_ngram_jaccard_hash_modes_same_pairs(spark):
    """xxhash64 (engine default) and raw (oracle-portable) inverted-index
    keys must yield the identical pair set — the fast path is a pure
    shuffle-width optimization (round-4 verdict item 2)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
        (4, "one two three four five six seven nine"),
        (5, "totally different words nothing shared here at all"),
    ]
    d = _docs(spark, rows)
    fast = {
        tuple(r)
        for r in DF.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=0.1, hash_mode="xxhash64"
        ).collect()
    }
    raw = {
        tuple(r)
        for r in DF.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=0.1, hash_mode="raw"
        ).collect()
    }
    assert fast == raw and fast  # same pairs, and some pairs exist


def test_ngram_jaccard_bad_hash_mode_rejected(spark):
    import pytest

    d = _docs(spark, [(1, "a b c d")])
    with pytest.raises(ValueError, match="hash_mode"):
        DF.ngram_jaccard_pairs(d, "doc_id", "text", hash_mode="md5")
