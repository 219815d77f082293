"""Similarity search over embedding columns (array<float>).

Scale design:
- **cosine()** is a pure higher-order-function fold (zip_with + aggregate)
  — JVM-side, sequential left-fold in doubles, so the arithmetic is
  bit-reproducible across engines (the DuckDB oracle folds in the same
  order).
- **brute_force_topk** is the exact baseline: queries x corpus cross join.
  Correct at any scale only when |queries| is small; the corpus side stays
  partitioned and the query side is broadcast, so it is one narrow scan of
  the corpus (no shuffle of the big side) + a per-partition top-k
  (window) — at 10^12 rows the global top-k per query is a
  groupBy(query) of per-partition candidates, which AQE coalesces.
- **sign-LSH (random hyperplanes)** is the approximate scale path: b
  deterministic pseudo-random hyperplanes (xxhash64-derived coefficients,
  no RNG state to ship) → b-bit signature per vector → bucket join on
  signature prefix; only same-bucket pairs are scored. One narrow scan to
  sign, one bucket-balanced shuffle.
- **ivf_topk** (IVF-flat): k-means-lite centroids picked deterministically,
  vectors assigned to nearest centroid once (narrow), queries probe the
  n_probe nearest centroid partitions only — the classic trade of recall
  for a corpus-fraction scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in doubles (oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cos). The small query
    side is broadcast so the corpus scan is shuffle-free; ranking uses the
    cosine rounded to 6 dp with neighbor-id tie-break, making the result set
    deterministic across engines and partitionings."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs (cos >= threshold) — O(n^2) oracle /
    verification stage; pair discovery at scale goes through sign-LSH."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplanes)
# ---------------------------------------------------------------------------


def _plane_coeff(plane: Column, dim_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    derived from xxhash64(plane, dim) so every executor regenerates the same
    planes with zero driver state shipped."""
    h = F.pmod(F.xxhash64(plane, dim_idx), F.lit(100_000))
    return h.cast("double") / F.lit(100_000.0) - F.lit(0.5)


def sign_lsh_signature(vec_col: Column, n_planes: int = 16) -> Column:
    """n_planes-bit signature as an int Column; bit p = sign of the
    projection of the vector on pseudo-random plane p. Pure higher-order
    functions — one pass over the array per plane, no explode, no shuffle."""
    def _proj_term(p: int):
        # closure (not default-arg capture): pyspark HOFs inspect lambda
        # signatures, so extra default params break arity detection
        return lambda x, i: x.cast("double") * _plane_coeff(F.lit(p), i)

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                _proj_term(p),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose LSH signature
    matches the query's. Recall < 1 by design; multiply recall by probing
    neighboring buckets (not implemented — single-probe keeps the plan to
    one bucket-hash join)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_lsh_signature(F.col(vec_col), n_planes).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_lsh_signature(F.col(vec_col), n_planes).alias("sig"),
    )
    scored = c.join(F.broadcast(q), on="sig").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-flat
# ---------------------------------------------------------------------------


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Pick n_centroids deterministic seed vectors (lowest ids) as
    centroids; assign every vector to its nearest centroid by cosine.
    Returns (centroids(centroid_id, c_vec), assigned(corpus + centroid_id)).
    One broadcast join — the corpus is scanned once, never shuffled."""
    centroids = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            # deterministic centroid ids regardless of partitioning
            (F.row_number().over(Window.orderBy(F.col(id_col))) - 1).alias(
                "centroid_id"
            ),
            F.col(vec_col).alias("c_vec"),
        )
    )
    scored = corpus.join(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        "centroid_id",
        cosine(F.col(vec_col), F.col("c_vec")).alias("c_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .drop("r", "c_cos")
    )
    return centroids, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: per query, score only vectors assigned to the n_probe
    nearest centroids — scans ~n_probe/n_centroids of the corpus."""
    centroids, assigned = ivf_assign(corpus, n_centroids, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_scores = q.join(F.broadcast(centroids)).select(
        "query_id",
        "q_vec",
        "centroid_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    probes = (
        probe_scores.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = assigned.join(F.broadcast(probes), on="centroid_id").where(
        F.col("query_id") != F.col(id_col)
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
