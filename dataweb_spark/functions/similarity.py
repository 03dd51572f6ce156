"""Similarity search over embedding columns (beyond-reference).

Three tiers, all DataFrame-native:

* :func:`brute_force_topk` — exact cosine top-k. The corpus×query product is
  expressed as a broadcast join (queries are the small side); the per-pair
  dot product is `F.zip_with` + `F.aggregate` (JVM codegen, no Python).
  Exact baseline; cost O(|corpus|·|queries|) — fine when queries are
  bounded, the standard pattern for eval sets.
* :func:`hyperplane_signature` / :func:`lsh_topk` — random-hyperplane LSH:
  one bucket join instead of a full product; recall < 1, cost ~O(n).
* :func:`ivf_topk` — IVF: KMeans coarse quantizer (pyspark.ml), corpus
  partitioned by nearest centroid, queries probe ``nprobe`` cells. The
  100 TB path: the corpus shuffle is one-time, queries touch a fraction.

All cosines are computed on l2-normalized copies so dot == cosine.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def normalize(v: Column) -> Column:
    n = l2_norm(v)
    return F.transform(v, lambda x: x / n)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast; ties broken by
    neighbor id for full determinism. Self-matches excluded."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_qv"))
    scored = (c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
               .withColumn("cos", cosine(F.col("_cv"), F.col("_qv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank",
                          F.round("cos", 6).alias("cos")))


def _random_planes(dim: int, planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(planes, dim).tolist()


def hyperplane_signature(vec_col, planes: int = 12, seed: int = 7,
                         dim: int = 64) -> Column:
    """Random-hyperplane LSH signature (bigint bucket id). Deterministic:
    plane matrix is seeded numpy, embedded as literal arrays (broadcast by
    the plan — a few KB)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    mat = _random_planes(dim, planes, seed)
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(mat):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(1).cast("bigint")) \
               .otherwise(F.lit(0).cast("bigint"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", planes: int = 8,
             seed: int = 7, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket, then exact
    cosine rank within candidates. One shuffle keyed by bucket."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("_cv"),
                      hyperplane_signature(vec_col, planes, seed, dim)
                      .alias("_bkt"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_qv"),
                       hyperplane_signature(vec_col, planes, seed, dim)
                       .alias("_bkt"))
    scored = (c.join(F.broadcast(q), on="_bkt")
               .where(F.col("neighbor_id") != F.col("query_id"))
               .withColumn("cos", cosine(F.col("_cv"), F.col("_qv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank",
                          F.round("cos", 6).alias("cos")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_cells: int = 16,
             nprobe: int = 3, seed: int = 7) -> DataFrame:
    """IVF approximate top-k: KMeans cells + multi-probe.

    Corpus rows are assigned to their nearest centroid once (one shuffle);
    each query probes its ``nprobe`` nearest cells. At 100 TB the KMeans fit
    runs on a sample and the cell assignment is a map-only pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    norm_corpus = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        normalize(F.col(vec_col).cast("array<double>")).alias("_cv"))
    ml_df = norm_corpus.withColumn("features", array_to_vector("_cv"))
    km = KMeans(k=n_cells, seed=seed, maxIter=10).fit(ml_df)
    centers = [list(map(float, c)) for c in km.clusterCenters()]

    def nearest_cells(vcol: Column, n: int) -> Column:
        """Array of the n nearest cell ids (by dot on normalized vecs)."""
        scored = F.array(*[
            F.struct(dot(vcol, F.array(*[F.lit(float(x)) for x in c]))
                     .alias("s"), F.lit(i).alias("cell"))
            for i, c in enumerate(centers)])
        return F.slice(F.reverse(F.array_sort(scored)), 1, n) \
                .getField("cell")

    c_assigned = ml_df.select(
        "neighbor_id", "_cv",
        F.element_at(nearest_cells(F.col("_cv"), 1), 1).alias("_cell"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        normalize(F.col(vec_col).cast("array<double>")).alias("_qv"))
    q_probed = q.select(
        "query_id", "_qv",
        F.explode(nearest_cells(F.col("_qv"), nprobe)).alias("_cell"))

    scored = (c_assigned.join(F.broadcast(q_probed), on="_cell")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos", dot(F.col("_cv"), F.col("_qv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank",
                          F.round("cos", 6).alias("cos")))
