"""Similarity search over an embedding column (array<float>).

Two paths:
  cosine_topk        — brute-force exact top-k: query×corpus join with a
                       JVM-native unrolled dot product, ranked by window.
                       The correctness baseline; at scale use for small
                       query batches (cost |Q|×|N|×dim, all codegen, no
                       Python).
  ivf_topk           — IVF-style two-stage ANN: coarse centroids → assign
                       corpus vectors to nearest centroid (one pass) →
                       probe only the nprobe nearest centroid buckets per
                       query. At 100 TB the corpus is bucketed/partitioned
                       by centroid id, so a query touches nprobe partitions
                       instead of the full corpus.

Float discipline: embeddings cast to double FIRST, then an explicitly
left-associative unrolled sum — the same op order any engine uses for the
generated SQL mirror, so cosine values are bit-identical across engines
(no parallel-reduction nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _elem(col: str, i: int) -> Column:
    # element_at is 1-based; embeddings are fixed-length arrays
    return F.element_at(F.col(col), i + 1).cast("double")


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """Left-associative unrolled dot product — deterministic fp order."""
    s = _elem(a, 0) * _elem(b, 0)
    for i in range(1, dim):
        s = s + _elem(a, i) * _elem(b, i)
    return s


def norm_unrolled(a: str, dim: int) -> Column:
    s = _elem(a, 0) * _elem(a, 0)
    for i in range(1, dim):
        s = s + _elem(a, i) * _elem(a, i)
    return F.sqrt(s)


def cosine_expr(a: str, b: str, dim: int) -> Column:
    return dot_unrolled(a, b, dim) / (norm_unrolled(a, dim) * norm_unrolled(b, dim))


def cosine_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    query_filter: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    Returns (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor_id ASC for determinism."""
    q = emb.filter(query_filter) if query_filter is not None else emb
    q = q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr("qv", "cv", dim))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def assign_centroids(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties → lowest
    centroid id). Output (vec_id, centroid_id) — at scale, write the corpus
    bucketed by centroid_id so probes prune partitions."""
    c = centroids.select(F.col("cid"), F.col("cvec"))
    scored = emb.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(c)).withColumn(
        "cos_c", cosine_expr(vec_col, "cvec", dim)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cid")
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroid_mod: int = 97,
    nprobe: int = 2,
    query_filter: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """IVF-bucketed ANN: deterministic seed centroids (vec_id % mod == 0 —
    a stand-in for k-means; the bucketing mechanics are identical), corpus
    assigned once, queries probe their nprobe nearest buckets only.

    Returns (query_id, neighbor_id, cosine, rank) — approximate: recall
    measured against cosine_topk in tests."""
    cent = emb.filter((F.col(id_col) % centroid_mod) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    assigned = assign_centroids(emb, cent, id_col, vec_col, dim)
    corpus = emb.join(assigned, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cid"
    )

    q = emb.filter(query_filter) if query_filter is not None else emb
    q = q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qprobe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", cosine_expr("qv", "cvec", dim))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    probes = (
        qprobe.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cid")
    )

    scored = (
        corpus.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr("qv", "cv", dim))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine ≥ threshold).

    Brute-force all-pairs at test scale; production path buckets by IVF
    centroid first (pairs across far buckets can't be near-dups)."""
    a = emb.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", cosine_expr("va", "vb", dim))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
