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

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from fixed hyperplanes, as a column expression."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, arr) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


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
    c_tables, q_tables = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        c_tables.append(
            c.withColumn("bucket", _bucket_expr(F.col("cvec"), planes))
            .withColumn("table", F.lit(t))
        )
        qt = q0.withColumn("bucket0", _bucket_expr(F.col("qvec"), planes))
        probes = [F.col("bucket0")]
        if multiprobe >= 1:
            probes += [
                F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
            ]
        q_tables.append(
            qt.select(
                "query_id", "qvec",
                F.explode(F.array(*probes)).alias("bucket"),
            ).withColumn("table", F.lit(t))
        )
    c_all = c_tables[0]
    for x in c_tables[1:]:
        c_all = c_all.unionByName(x)
    q_all = q_tables[0]
    for x in q_tables[1:]:
        q_all = q_all.unionByName(x)
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
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = planes_df.withColumn("bucket", _bucket_expr(F.col("v"), planes))
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
