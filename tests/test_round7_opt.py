"""Round-7 optimization equivalence pins.

The optimization round rewrites hot per-pair expressions into
codegen-friendly forms; every rewrite here must be BIT-identical, not
approximately equal — the DuckDB oracle compares hashes and the >=
threshold predicates are data-dependent at double precision.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from xhs_ocr_spark.operators import simsearch as SS


@pytest.fixture(scope="module")
def rand_vecs(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(scale=3.0, size=64).astype(np.float32)])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_norm_hoist_bit_identical(spark, rand_vecs):
    """The r7 per-pair rewrite — dot(a,b) / (nrm_a * nrm_b) with each
    norm computed in a separate per-vector projection — must equal the
    inline cosine(a,b) EXACTLY (same sqrt values, same multiply/divide),
    not approximately: >= threshold predicates flip on 1-ulp drift."""
    a, b = F.col("embedding"), F.reverse(F.col("embedding"))
    staged = rand_vecs.select(
        F.col("vec_id"),
        F.col("embedding"),
        SS.norm(a).alias("nrm_a"),
        SS.norm(b).alias("nrm_b"),
    )
    got = staged.select(
        SS.cosine(a, b).alias("inline"),
        (SS.dot(a, b) / (F.col("nrm_a") * F.col("nrm_b"))).alias("hoisted"),
    ).collect()
    for r in got:
        # exact equality — bit-identical doubles, not approx
        assert r["inline"] == r["hoisted"]


def test_lsh_near_neighbors_matches_hof_verify(spark, rand_vecs):
    """The norm-precompute + unrolled-dot verify must reproduce the old
    per-pair cosine() filter's pair set exactly (threshold chosen low so
    many pairs sit near it)."""
    from xhs_ocr_spark.operators.dedup_fuzzy import sharded_bucket_pairs

    new = sorted(
        (r["id_a"], r["id_b"])
        for r in SS.lsh_near_neighbors(
            rand_vecs, dim=64, n_planes=4, min_cos=0.05
        ).collect()
    )
    # the pre-r7 shape: pairs joined to raw vectors, HOF cosine per pair
    v = rand_vecs.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    b = v.select("id", SS.lsh_bucket(F.col("vec"), 64, 4).alias("bucket"))
    pairs = sharded_bucket_pairs(b, ["bucket"])
    old = sorted(
        (r["id_a"], r["id_b"])
        for r in pairs.join(
            v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a")), "id_a"
        )
        .join(v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b")), "id_b")
        .where(SS.cosine(F.col("vec_a"), F.col("vec_b")) >= 0.05)
        .select("id_a", "id_b")
        .collect()
    )
    assert new == old
    assert len(new) > 0
