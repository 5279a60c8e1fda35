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


def test_union_find_matches_iterative_components(spark, monkeypatch):
    """The r7 driver-side union-find route (edge count under the cap)
    must produce the exact labels of the distributed min-label
    propagation — including multi-hop chains, where comp = min id is
    only reachable transitively."""
    import numpy as np

    from xhs_ocr_spark.operators import dedup_fuzzy as DF

    rng = np.random.default_rng(23)
    edges = set()
    for start in range(0, 400, 20):  # chains of 20 (diameter > 1 hop)
        for i in range(start, start + 19):
            edges.add((i, i + 1))
    for _ in range(150):  # random extra edges
        a, b = rng.integers(0, 600, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    pairs = spark.createDataFrame(
        [(f"d{a:04d}", f"d{b:04d}") for a, b in sorted(edges)],
        "id_a string, id_b string",
    )
    fast = {
        (r["id"], r["comp"]) for r in DF.neardup_components(pairs).collect()
    }
    monkeypatch.setattr(DF, "NEARDUP_DRIVER_MAX_EDGES", -1)  # force iterative
    # random bridges chain the 20-node paths into larger-diameter
    # components; propagation needs diameter rounds (union-find doesn't)
    slow = {
        (r["id"], r["comp"])
        for r in DF.neardup_components(pairs, max_iter=120).collect()
    }
    assert fast == slow
    assert len(fast) > 0


def test_ngram_hot_route_matches_window_route(spark, monkeypatch):
    """q27's two guard routes must drop identically: a planted hot
    shingle (df > max_df) is excluded by both, and all surviving pairs
    agree. The hot route's plan must contain no Window node (the r6
    straggler shape: every row of the hottest posting through one
    task's sort) — round-6 verdict item 3."""
    from xhs_ocr_spark.operators import dedup_fuzzy as DF

    rows = []
    # 40 docs all sharing the hot trigram "zz zz zz" (df 40 > max_df 10),
    # plus paired near-dups that must still be found without it
    for i in range(40):
        extra = f"alpha{i % 4} beta{i % 4} gamma{i % 4} delta{i % 4}"
        rows.append((f"d{i:03d}", f"zz zz zz {extra}", "en"))
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")

    def run():
        return sorted(
            (r["id_a"], r["id_b"], r["jacc_x1000"])
            for r in DF.ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.3, scope_col="lang", max_df=10
            ).collect()
        )

    monkeypatch.setattr(DF, "_SKETCH_SKIP_BYTES", 1 << 60)  # force window route
    monkeypatch.setattr(DF, "_HOT_ROUTE_MIN_DF", 1 << 60)
    window_route = run()
    monkeypatch.setattr(DF, "_SKETCH_SKIP_BYTES", 0)  # force the sketch
    monkeypatch.setattr(DF, "_DF_SKETCH_MOD", 1)  # sample everything
    monkeypatch.setattr(DF, "_HOT_ROUTE_MIN_DF", 10)  # est 40 > 10 -> hot route
    hot_df = DF.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, scope_col="lang", max_df=10
    )
    plan = hot_df._sc._jvm.PythonSQLUtils.explainString(
        hot_df._jdf.queryExecution(), "formatted"
    )
    import re

    assert not re.search(r"\(\d+\) Window", plan), "hot route must not window"
    hot_route = sorted(
        (r["id_a"], r["id_b"], r["jacc_x1000"]) for r in hot_df.collect()
    )
    assert hot_route == window_route
    assert len(hot_route) > 0  # the near-dup pairs survive the drop


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
