"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_knn``: exact cosine top-k — broadcast the (small) query
  side, JVM-side dot products via ``F.zip_with`` + ``F.aggregate`` (no
  Python in the hot path), window top-k.  The baseline and the oracle.
- ``lsh_knn``: random-hyperplane LSH — deterministic planes (seeded
  NumPy, driver-side, broadcast), sign-bit bucketing with multi-probe;
  candidates are re-scored exactly.  The scale path: the corpus-side
  shuffle key is the bucket, so each query touches a sliver of the data.
- ``cosine_near_duplicates``: all pairs with cosine ≥ threshold via the
  same bucketing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


def _dot(a, b):
    # double precision end-to-end (float32 products would diverge from
    # any double-computing oracle)
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a.cast("array<double>"), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ac, bc = F.col(a), F.col(b)
    return df.withColumn(out, _dot(ac, bc) / (_norm(ac) * _norm(bc)))


def brute_force_knn(
    emb_df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, vec_id, cosine).

    The query side is broadcast; the corpus scan is embarrassingly
    parallel and the only shuffle is the per-query top-k (bounded by
    queries × k after partial windowing)."""
    q = query_df.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    c = emb_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("vec_id").isNotNull())
        .withColumn(
            "cosine",
            (_dot(F.col("qvec"), F.col("cvec"))
             / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_arrays_udf(planes_all: np.ndarray):
    """``planes_all``: (n_tables, n_planes, dim) float64 → pandas UDF
    mapping an embedding column to the ``n_tables`` sign-bit bucket ids.

    One Arrow-batched ``X @ planes.T`` matmul per batch against the
    closure-shipped NumPy plane matrix.  The earlier version inlined
    dim × n_planes × n_tables ``F.lit`` nodes into the Catalyst plan —
    fine at 64 dims, a multi-MB plan (minutes of analysis) at a 768-dim
    production embedding column.  The plane matrix is a few hundred KB
    at worst, well inside task-closure budget.
    """
    n_tables, n_planes, _dim = planes_all.shape
    flat = planes_all.reshape(n_tables * n_planes, -1)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def compute(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            if len(s) == 0:
                yield pd.Series([], dtype=object)
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in s])
            bits = (x @ flat.T) >= 0.0
            b = bits.reshape(len(s), n_tables, n_planes).astype(np.int64) @ weights
            yield pd.Series(list(b.astype(np.int32)))

    return F.pandas_udf(compute, ArrayType(IntegerType()))


def lsh_knn(
    emb_df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent sign-bit hash
    tables (the standard recall lever — one table's bucketing is too
    selective on unclustered data); each query probes its bucket in every
    table plus all single-bit flips (``multiprobe=1``).  Candidates from
    any table are unioned and re-scored exactly.  Deterministic for a
    fixed seed.  Scale: corpus is hashed once per table (narrow), the
    join key is (table, bucket) and each probe touches ~corpus/2^planes
    rows."""
    dim = len(emb_df.select(vec_col).first()[0])
    c = emb_df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    )
    q0 = query_df.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    planes_all = np.stack(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )
    udf = _bucket_arrays_udf(planes_all)
    # one corpus pass hashes all tables at once (the per-table union of
    # the literal-plane version rescanned the corpus n_tables times)
    c_all = c.withColumn("bkts", udf(F.col("cvec"))).select(
        "vec_id", "cvec", F.posexplode("bkts").alias("table", "bucket")
    )
    qt = q0.withColumn("bkts", udf(F.col("qvec"))).select(
        "query_id", "qvec", F.posexplode("bkts").alias("table", "bucket0")
    )
    probes = [F.col("bucket0")]
    if multiprobe >= 1:
        probes += [
            F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
    q_all = qt.select(
        "query_id", "qvec", "table",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    cand = (
        F.broadcast(q_all).join(c_all, ["table", "bucket"])
        .select("query_id", "qvec", "vec_id", "cvec")
        .dropDuplicates(["query_id", "vec_id"])  # pairs can collide in several tables
        .withColumn(
            "cosine",
            (_dot(F.col("qvec"), F.col("cvec"))
             / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _kmeans_centroids(sample: np.ndarray, n_centroids: int, seed: int,
                      iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (Lloyd
    iterations over L2-normalized vectors; empty clusters re-seeded from
    the farthest points).  The sample is bounded (driver-safe); the
    resulting centroid matrix is what gets broadcast."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n = x.shape[0]
    k = min(n_centroids, n)
    cent = x[rng.permutation(n)[:k]].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members) == 0:
                # re-seed from the point worst-served by its centroid
                worst = int(np.argmin(sims[np.arange(n), assign]))
                cent[c] = x[worst]
            else:
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _centroid_assign_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: embedding → the ``n_probe`` nearest centroid ids
    (cosine), via one Arrow-batched matmul against the broadcast
    centroid matrix."""
    cent = centroids.astype(np.float64)

    def assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            if len(s) == 0:
                yield pd.Series([], dtype=object)
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in s])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cent.T
            p = min(n_probe, cent.shape[0])
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            # order probes best-first (stable output)
            rows = []
            for i in range(top.shape[0]):
                t = top[i]
                rows.append(t[np.argsort(-sims[i, t])].astype(np.int32))
            yield pd.Series(rows)

    return F.pandas_udf(assign, ArrayType(IntegerType()))


def ivf_knn(
    emb_df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the classic coarse
    quantizer: k-means centroids partition the corpus into cells; each
    query probes its ``n_probe`` nearest cells and re-scores candidates
    exactly.

    Scale shape: training is a bounded driver-side sample; assignment is
    one Arrow matmul pass over the corpus (the cell id is a perfect
    write-partition / cluster-key for the corpus table, so at 100 TB the
    probe join prunes partitions instead of scanning); the probe join
    key is the cell id, so each query touches ~``n_probe/n_centroids``
    of the data.  Deterministic for a fixed seed.
    """
    c = emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    q0 = query_df.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    sample_rows = (
        c.orderBy("vec_id").limit(train_sample).select("cvec").collect()
    )
    if not sample_rows:
        # empty corpus → empty result with the same schema as the
        # non-empty case (types derived from the inputs)
        return (
            q0.join(c, F.lit(False))
            .select(
                "query_id",
                F.lit(1).cast("int").alias("rank"),
                "vec_id",
                F.lit(0.0).cast("double").alias("cosine"),
            )
        )
    sample = np.array([np.asarray(r["cvec"], dtype=np.float64) for r in sample_rows])
    cent = _kmeans_centroids(sample, n_centroids, seed)

    c_cells = c.withColumn(
        "cell", F.element_at(_centroid_assign_udf(cent, 1)(F.col("cvec")), 1)
    )
    q_cells = q0.withColumn(
        "cells", _centroid_assign_udf(cent, n_probe)(F.col("qvec"))
    ).select("query_id", "qvec", F.explode("cells").alias("cell"))

    cand = (
        F.broadcast(q_cells).join(c_cells, "cell")
        .select("query_id", "qvec", "vec_id", "cvec")
        .withColumn(
            "cosine",
            (_dot(F.col("qvec"), F.col("cvec"))
             / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def cosine_near_duplicates(
    emb_df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, candidate-generated by shared
    LSH bucket (vectors this similar collide with high probability)."""
    planes_df = emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    dim = len(emb_df.select(vec_col).first()[0])
    udf = _bucket_arrays_udf(_hyperplanes(dim, n_planes, seed)[None, :, :])
    bucketed = planes_df.withColumn(
        "bucket", F.element_at(udf(F.col("v")), 1)
    )
    pairs = (
        bucketed.alias("a").join(bucketed.alias("b"), "bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .distinct()
        .withColumn(
            "cosine",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).cast("double"),
        )
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
    return pairs
