"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: correctness baseline; the query side is tiny
  and broadcast, the corpus side streams — one pass, no shuffle besides
  the final top-k window.
- random-hyperplane LSH: the scale path; sign-bit bucket key per vector,
  candidates only within buckets. Hyperplanes are deterministic rationals
  so the DuckDB oracle reproduces them exactly.

All dot products via F.zip_with + F.aggregate (JVM-side); no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

N_PLANES = 8
PLANE_MOD = 997


def hyperplane(dim: int, p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane p: component j =
    ((2654435761*(p*dim+j+1)) % 997)/997 - 0.5 (Knuth multiplicative)."""
    return [((2654435761 * (p * dim + j + 1)) % PLANE_MOD) / PLANE_MOD - 0.5 for j in range(dim)]


def dot(a, b, dim: int | None = None):
    """Dot product of two array columns in double precision (HOF left
    fold: products via zip_with, sequential sum from 0.0).

    ``dim`` is accepted for API stability but does not change the
    evaluation: an r7 A/B unrolled the fold into a fixed-width
    ``((0.0 + a[1]*b[1]) + a[2]*b[2]) + ...`` element_at chain expecting
    whole-stage codegen to beat the CodegenFallback HOF — measured the
    OPPOSITE at the driver's sf1.0 scale (19M-pair verify stage: HOF
    22s, unrolled 85-93s; the 128-element_at tree blows the generated
    method past the JIT's huge-method limit, so it runs as interpreted
    bytecode over a much deeper expression tree). The fold stays HOF;
    the per-PAIR cost is instead cut by hoisting per-VECTOR work (norms)
    out of the pair predicate — see lsh_near_neighbors/cosine_topk."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a, dim: int | None = None):
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int | None = None):
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine (self
    excluded). Query side is broadcast; ranking via window.

    Per-pair work is ONE dot fold: each side's norm — a per-VECTOR
    quantity — is computed once in its own projection and the pair
    cosine divides by the product of the two precomputed norms, which
    multiplies the SAME two sqrt values the inline cosine() did
    (bit-identical; r7, same hoist as lsh_near_neighbors)."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    parts = corpus.sparkSession.sparkContext.defaultParallelism * 2
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).repartition(parts, "n_id")  # scan is 1 file; spread the scoring
    cn = c.select("n_id", "n_vec", norm(F.col("n_vec")).alias("n_nrm"))
    scored = (
        cn.crossJoin(F.broadcast(q))
        .where(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            (
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_nrm") * F.col("n_nrm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    )


def lsh_bucket(vec_col, dim: int, n_planes: int = N_PLANES):
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0."""
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array([F.lit(v) for v in hyperplane(dim, p)])
        out = out + F.when(
            dot(vec_col, plane, dim) > 0, F.lit(2**p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


N_CELLS = 8


def centroid(dim: int, c: int) -> list[float]:
    """Deterministic pseudo-random IVF centroid (same Knuth scheme as the
    hyperplanes, offset so the two families differ), L2-NORMALIZED: with
    unit centroids, argmax dot == argmax cosine for any vector, so the
    coarse quantizer agrees with the cosine ranking metric (round-2
    verdict item 3). The DuckDB oracle embeds these exact literals, so
    both engines assign identically."""
    raw = [
        ((2654435761 * ((c + 100) * dim + j + 1)) % PLANE_MOD) / PLANE_MOD - 0.5
        for j in range(dim)
    ]
    n = sum(v * v for v in raw) ** 0.5
    return [v / n for v in raw]


def ivf_cell(vec_col, dim: int, n_cells: int = N_CELLS):
    """Index of the max-dot-product centroid (coarse quantizer assign).

    At real scale centroids come from k-means over a sample; here they are
    deterministic so the DuckDB oracle reproduces the assignment exactly."""
    dots = F.array(
        *[
            dot(vec_col, F.array([F.lit(v) for v in centroid(dim, c)]), dim)
            for c in range(n_cells)
        ]
    )
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 3,
    n_cells: int = N_CELLS,
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors in the query's
    cell (nprobe=1). The cell assignment prunes ~ (n_cells-1)/n_cells of
    the corpus before any pairwise scoring — the scale path when LSH
    recall is insufficient."""
    parts = corpus.sparkSession.sparkContext.defaultParallelism * 2
    # spread on n_id only: the query side is BROADCAST, so the join needs
    # no corpus distribution — repartitioning on `cell` (n_cells distinct
    # values) would collapse scoring to <= n_cells tasks and pin hot
    # cells on single cores (review finding, round 2).
    c = (
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
        .repartition(parts, "n_id")
        .select(
            "n_id",
            "n_vec",
            ivf_cell(F.col("n_vec"), dim, n_cells).alias("cell"),
            norm(F.col("n_vec")).alias("n_nrm"),  # per-vector, not per-pair (r7)
        )
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        ivf_cell(F.col(vec_col), dim, n_cells).alias("cell"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            (
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_nrm") * F.col("n_nrm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    )


SAMPLE_MOD = 7  # minimum sample modulus (small corpora sample 1/7)
KMEANS_ITERS = 8
IVF_SAMPLE_TARGET = 100_000  # cap on vectors collected for the k-means fit


def ivf_sample_mod(n_rows: int, target: int = IVF_SAMPLE_TARGET) -> int:
    """Deterministic sample modulus for the k-means fit: ceil(n/target),
    floored at SAMPLE_MOD. A fixed modulus would collect a constant
    FRACTION of the corpus to the driver — at the 100 TB / 10^12-row
    design point that's an OOM, not a sample (ADVICE r2). Derived from
    the row count (exact, engine-agnostic), so the DuckDB refit oracle
    computes the identical modulus and stays bit-identical."""
    return max(SAMPLE_MOD, -(-n_rows // target))


def kmeans_centroids(X, k: int, iters: int = KMEANS_ITERS) -> list[list[float]]:
    """Deterministic SPHERICAL Lloyd k-means over a sample matrix (numpy,
    driver side). Init = k rows evenly strided through the (vec_id-sorted)
    sample, L2-normalized; each iteration assigns by max dot product and
    re-normalizes the mean, so every centroid is a unit vector. With unit
    centroids, argmax dot(x, c) == argmax cos(x, c) for ANY x — the coarse
    quantizer agrees with the cosine ranking metric (round-2 verdict item
    3: the unnormalized fit let vector MAGNITUDE drive cell assignment,
    capping recall@3 at 0.40-0.47). Empty cells keep their previous
    centroid. No RNG, no wall clock — the DuckDB oracle refits from the
    same hash-defined sample and gets bit-identical centroids."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = X / np.where(norms == 0, 1.0, norms)
    idx = [int(i * len(Xn) / k) for i in range(k)]
    C = Xn[idx].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(k):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = float(np.linalg.norm(m))
                if n > 0:
                    C[c] = m / n
    return [[float(v) for v in row] for row in C]


def fit_centroids_spark(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_CELLS,
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Sampled k-means fit, Spark path: hash-defined sample (vec_id %
    sample_mod == 0 — deterministic and partitioning-independent, unlike
    df.sample), collected ordered to the driver, fitted with
    kmeans_centroids. When ``sample_mod`` is None it is derived from the
    corpus row count via ivf_sample_mod, so the collected sample is capped
    at ~IVF_SAMPLE_TARGET vectors regardless of corpus size (the count is
    a cheap parquet-footer aggregate; a fixed modulus would collect a
    constant fraction of a 10^12-row corpus to the driver)."""
    if sample_mod is None:
        sample_mod = ivf_sample_mod(df.count())
    rows = (
        df.where(F.col(id_col) % sample_mod == 0)
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    return kmeans_centroids([r[0] for r in rows], n_cells)


def cell_assign(vec_col, centroids: list[list[float]]):
    """argmax-dot cell over explicit centroid literals (first max wins —
    same tie rule as numpy argmax and DuckDB list_position). Centroids
    are unit vectors (spherical fit), so this is argmax-cosine without
    needing to normalize the corpus vectors."""
    dots = F.array(
        *[dot(vec_col, F.array([F.lit(v) for v in c]), len(c)) for c in centroids]
    )
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def probe_cells(vec_col, centroids: list[list[float]], nprobe: int):
    """The nprobe nearest cells for a query (by dot, descending; ties by
    cell index). array<int> of length min(nprobe, n_cells)."""
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(
                    (-dot(vec_col, F.array([F.lit(v) for v in c]), len(c))).alias(
                        "nd"
                    ),
                    F.lit(i).cast("int").alias("cell"),
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 1,
    assign_cells: int = 2,
) -> DataFrame:
    """IVF top-k with fitted centroids and multi-cell probing: each corpus
    vector is indexed under its ``assign_cells`` nearest cells (redundant
    assignment — the standard recall booster for boundary vectors: a true
    neighbor sitting just across a Voronoi edge from the query's probed
    cells is still found via its second-nearest cell; measured on the
    bench corpus it lifts recall@3 at nprobe=4 from 0.73 to 0.92 for a 2x
    index size); each query probes its ``nprobe`` nearest cells and scores
    only those inverted lists. Raising nprobe trades compute for recall —
    the standard IVF knob. Query side stays broadcast; duplicate
    candidates (pairs sharing >1 probed cell) are collapsed by a (q_id,
    n_id) aggregate before the ranking window."""
    parts = corpus.sparkSession.sparkContext.defaultParallelism * 2
    # n_id spread only — no `cell` exchange; see ivf_topk's comment.
    c = (
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
        .repartition(parts, "n_id")
        .select(
            "n_id",
            "n_vec",
            F.explode(
                probe_cells(F.col("n_vec"), centroids, assign_cells)
            ).alias("cell"),
            norm(F.col("n_vec")).alias("n_nrm"),  # per-vector, not per-pair (r7)
        )
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            (
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_nrm") * F.col("n_nrm"))
            ).alias("cos"),
        )
        .groupBy("q_id", "n_id")
        .agg(F.max("cos").alias("cos"))  # dedupe multi-cell matches
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    )


N_VERIFY_SHARDS = 16  # shard width of the grouped verify (memory knob)


def lsh_near_neighbors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = N_PLANES,
    min_cos: float = 0.6,
    bucket_cap: int = 64,
    n_shards: int = N_VERIFY_SHARDS,
) -> DataFrame:
    """Candidate pairs sharing an LSH bucket, verified by exact cosine.
    Returns (id_a, id_b) with cosine >= min_cos, id_a < id_b.

    r7 shape (guide §8: decide with small groups, never stream the
    payload per PAIR). With few sign-bit buckets the candidate set is
    ~N^2/2^n_planes pairs; the pre-r7 route expanded those pairs as ROWS
    and attached both vectors to every pair (two joins), then folded an
    interpreted HOF dot per pair — at the driver's sf1.0 scale that is
    19M pair rows and 22s (r6), still 8.4s after hoisting the norms.
    Now vectors aggregate once at (bucket, shard) granularity — sorted
    (id, vec, nrm) structs, no aggregate row ever holding more than
    O(|bucket|/n_shards) vectors (the round-2/4 hot-bucket invariant,
    unchanged; ``n_shards`` is the memory/placement knob) — the
    aggregated shard rows self-join on the bucket (<= S^2/2 rows per
    bucket, metadata-scale), an exchange spreads the shard pairs, and
    ONE mapInArrow stage emits the verified pairs per shard-pair from a
    numpy accumulation. Shuffle bytes are O(n_shards x vectors), never
    O(pairs x vectors).

    Bit-identity (pinned by tests/test_round7_opt.py and full-output
    hashes at sf0.1/sf1.0): the per-pair cosine is accumulated as
    ``acc += A[:, i] * B[:, i]`` over i — for each pair exactly the
    float64 product-then-add left fold the HOF/zip_with form evaluates,
    elementwise-vectorized across the pair matrix (IEEE ops in the same
    order); norms are the same JVM-side sqrt(dot(v,v)) column as before,
    and the same-shard upper-triangle / cross-shard min-max emission
    reproduces sharded_bucket_pairs' slice semantics over the sorted id
    arrays. Null-vector rows are dropped up front — their pairs could
    never pass the verify (null cosine) in the old route.

    Each vector lands in exactly ONE bucket, so emitted pairs are
    already distinct. ``bucket_cap`` is retained for API compatibility;
    since r7 there is no in-expression-vs-streamed expansion regime for
    it to select (the grouped verify has a single shape).
    Measured sf1.0: 22.2s (r6) -> 2.0-2.7s; output equality checked
    pair-for-pair (1.67M pairs)."""
    import numpy as np
    import pyarrow as pa

    parts = df.sparkSession.sparkContext.defaultParallelism * 2
    # spread before the bucket expression (the testdata parquet is a
    # single scan partition)
    v = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .where(F.col("vec").isNotNull())
        .repartition(parts, "id")
    )
    vb = v.select(
        "id",
        "vec",
        norm(F.col("vec"), dim).alias("nrm"),
        lsh_bucket(F.col("vec"), dim, n_planes).alias("bucket"),
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_shards)).alias(
            "_shard"
        ),
    )
    g = vb.groupBy("bucket", "_shard").agg(
        F.sort_array(F.collect_list(F.struct("id", "vec", "nrm"))).alias("items")
    )
    g1 = g.select("bucket", F.col("_shard").alias("_s1"), F.col("items").alias("_i1"))
    g2 = g.select("bucket", F.col("_shard").alias("_s2"), F.col("items").alias("_i2"))
    rows = (
        g1.join(g2, "bucket")
        .where(F.col("_s1") <= F.col("_s2"))
        .repartition(parts)
        .select("_s1", "_s2", "_i1", "_i2")
    )

    def verify(batches):
        def unpack(col, row):
            lo, hi = col.offsets[row].as_py(), col.offsets[row + 1].as_py()
            s = col.values.slice(lo, hi - lo)
            ids = s.field("id").to_pylist()
            vec = s.field("vec")
            vlo = vec.offsets[0].as_py()
            vhi = vec.offsets[len(vec)].as_py()
            mat = (
                np.asarray(vec.values.slice(vlo, vhi - vlo), dtype=np.float32)
                .reshape(len(ids), -1)
                .astype(np.float64)
            )
            nrm = np.asarray(s.field("nrm"), dtype=np.float64)
            return ids, mat, nrm

        id_type = None
        for batch in batches:
            out_a, out_b = [], []
            s1c, s2c = batch.column("_s1"), batch.column("_s2")
            i1c, i2c = batch.column("_i1"), batch.column("_i2")
            if id_type is None:
                id_type = i1c.values.field("id").type
            for r in range(batch.num_rows):
                ids_a, A, na = unpack(i1c, r)
                ids_b, B, nb = unpack(i2c, r)
                if not ids_a or not ids_b:
                    continue
                acc = np.zeros((len(ids_a), len(ids_b)), dtype=np.float64)
                for i in range(A.shape[1]):
                    # exact left fold per pair, vectorized across pairs
                    acc += A[:, i][:, None] * B[:, i][None, :]
                keep = (acc / (na[:, None] * nb[None, :])) >= min_cos
                if s1c[r].as_py() == s2c[r].as_py():
                    keep = np.triu(keep, k=1)  # sorted ids: i<j == id order
                    for x, y in zip(*np.nonzero(keep)):
                        out_a.append(ids_a[x])
                        out_b.append(ids_b[y])
                else:
                    for x, y in zip(*np.nonzero(keep)):
                        a_, b_ = ids_a[x], ids_b[y]
                        if a_ <= b_:
                            out_a.append(a_)
                            out_b.append(b_)
                        else:
                            out_a.append(b_)
                            out_b.append(a_)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_a, type=id_type),
                    pa.array(out_b, type=id_type),
                ],
                names=["id_a", "id_b"],
            )

    id_dt = df.schema[id_col].dataType.simpleString()
    return rows.mapInArrow(verify, f"id_a {id_dt}, id_b {id_dt}")
