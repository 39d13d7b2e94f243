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

import logging
from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from bm25s_spark.util import eager_checkpoint as _eager_checkpoint


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


def _rescore_topk(cand: DataFrame, k: int,
                  round_to: int | None = None) -> DataFrame:
    """Shared exact-rescore tail of every kNN variant: candidates
    carrying (query_id, qvec, vec_id, cvec) → exact double cosine →
    per-query window top-k with the (cosine desc, vec_id asc) tie
    contract.  One definition so a tie/cast fix applies everywhere.

    ``round_to`` (gate-stability convention, as in ``retrieve``):
    round the cosine BEFORE ranking so a rounded tie group spanning the
    k boundary resolves by vec_id asc — exactly the order an oracle
    ranking on rounded scores produces.  Without it, two docs whose
    exact cosines differ in the last ULPs but round equal can be cut
    differently by engines that rank at different precision."""
    scored = cand.withColumn(
        "cosine",
        (_dot(F.col("qvec"), F.col("cvec"))
         / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).cast("double"),
    )
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def brute_force_knn(
    emb_df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, vec_id, cosine).

    The query side is broadcast; the corpus scan is embarrassingly
    parallel and the only shuffle is the per-query top-k (bounded by
    queries × k after partial windowing)."""
    from bm25s_spark.util import spread_small_scan

    q = query_df.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    # queries × dim multiply-adds per corpus row: spread a
    # low-parallelism input (small single-file tables scan as one split)
    c = spread_small_scan(emb_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
    ))
    cand = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("vec_id").isNotNull())
    )
    return _rescore_topk(cand, k, round_to)


def mean_pool_embeddings(
    emb_df: DataFrame,
    group_col,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_group: str = "group_id",
    out_vec: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Element-wise mean of embeddings per group →
    ``(out_group, out_vec:array<double>, n_members)``.

    The granularity-rollup twin of ``transcripts.conversation_rollup``
    for the dense side: per-turn embeddings pool into one conversation
    vector (mean pooling — the standard sentence-embedding aggregate).
    ``group_col`` may be a column name or a Column expression (e.g.
    ``F.col("vec_id") / 4``).  ``normalize=True`` L2-normalizes the
    pooled vector, after which dot product IS cosine.

    Deterministic: members are collected per group and summed in
    ``id_col`` order (sort_array on the leading struct field), so the
    float64 sum is reproducible run-to-run regardless of partitioning —
    the property every gate/checkpoint comparison relies on.

    Scale shape: ONE shuffle on the group key; groups are
    conversation-sized (tens of members), so the collected list per row
    is tiny and the element-wise reduce is a narrow JVM expression —
    no Python, no per-position explode (which would shuffle
    dim × corpus rows instead of corpus rows).
    """
    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    rows = emb_df.select(
        gcol.alias("_g"),
        F.struct(
            F.col(id_col).alias("k"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).alias("_s"),
    )
    grouped = rows.groupBy("_g").agg(
        F.sort_array(F.collect_list("_s")).alias("_ss"),
        F.count(F.lit(1)).alias("n_members"),
    )
    head = F.element_at(F.col("_ss"), 1)["v"]
    tail = F.slice(
        F.col("_ss"), 2, F.greatest(F.size("_ss") - 1, F.lit(0))
    )
    summed = F.aggregate(
        tail, head,
        lambda acc, s: F.zip_with(acc, s["v"], lambda x, y: x + y),
    )
    mean = F.transform(summed, lambda x: x / F.col("n_members"))
    if normalize:
        mean = F.transform(mean, lambda x: x / _norm(mean))
    return grouped.select(
        F.col("_g").alias(out_group), mean.alias(out_vec), "n_members"
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
    round_to: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent sign-bit hash
    tables (the standard recall lever — one table's bucketing is too
    selective on unclustered data); each query probes its bucket in every
    table plus every bucket within Hamming radius ``multiprobe`` of it.
    Candidates from any table are unioned and re-scored exactly.
    Deterministic for a fixed seed.  Scale: corpus is hashed once per
    table (narrow), the join key is (table, bucket) and each probe
    touches ~corpus/2^planes rows; probe count per (query, table) is
    ``Σ_r C(n_planes, r)`` for r ≤ multiprobe — keep the radius small at
    scale.

    ``multiprobe >= n_planes`` probes *every* bucket, making the
    candidate set provably complete and the result exactly the
    brute-force top-k — the configuration the correctness gate
    hash-checks end-to-end against a SQL oracle (recall at non-trivial
    radii is pytest-asserted against ``brute_force_knn`` instead)."""
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
    # XOR masks of popcount ≤ multiprobe, enumerated driver-side (the
    # probe set is per-plan metadata, not data)
    masks = [0]
    for r in range(1, min(multiprobe, n_planes) + 1):
        masks += [
            sum(1 << b for b in bits)
            for bits in combinations(range(n_planes), r)
        ]
    probes = [F.col("bucket0").bitwiseXOR(F.lit(m)) for m in masks]
    q_all = qt.select(
        "query_id", "qvec", "table",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    cand = (
        F.broadcast(q_all).join(c_all, ["table", "bucket"])
        .select("query_id", "qvec", "vec_id", "cvec")
        .dropDuplicates(["query_id", "vec_id"])  # pairs can collide in several tables
    )
    return _rescore_topk(cand, k, round_to)


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


def _assign_cells(x: np.ndarray, cent: np.ndarray,
                  n_probe: int) -> list[np.ndarray]:
    """Nearest-``n_probe`` centroid ids (cosine) per row of ``x`` —
    the ONE assignment kernel, shared by the distributed UDF and the
    driver-local query path so both produce identical cells."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    sims = x @ cent.T
    p = min(n_probe, cent.shape[0])
    top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
    # order probes best-first (stable output)
    rows = []
    for i in range(top.shape[0]):
        t = top[i]
        rows.append(t[np.argsort(-sims[i, t])].astype(np.int32))
    return rows


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
            yield pd.Series(_assign_cells(x, cent, n_probe))

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
    round_to: int | None = None,
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
    cent = _train_ivf_centroids(c, n_centroids, seed, train_sample)
    if cent is None:
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

    c_cells = c.withColumn(
        "cell", F.element_at(_centroid_assign_udf(cent, 1)(F.col("cvec")), 1)
    )
    q_cells = q0.withColumn(
        "cells", _centroid_assign_udf(cent, n_probe)(F.col("qvec"))
    ).select("query_id", "qvec", F.explode("cells").alias("cell"))

    cand = F.broadcast(q_cells).join(c_cells, "cell").select(
        "query_id", "qvec", "vec_id", "cvec"
    )
    return _rescore_topk(cand, k, round_to)


def _arith_planes(dim: int, n_planes: int) -> np.ndarray:
    """SQL-expressible deterministic hyperplanes: plane[p][d] derives
    from small-prime integer arithmetic (no RNG), so a SQL engine can
    regenerate the identical matrix from ``range()`` — which is what
    makes the banded near-duplicate pipeline fully oracle-checkable.
    Values are uniform-ish in [-1, 1); all intermediates stay well under
    2^63 (no overflow under ANSI semantics)."""
    p = np.arange(n_planes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    return (((p * 73856093 + d * 19349663) % 1000003) / 1000003.0) * 2.0 - 1.0


_log = logging.getLogger(__name__)


def _train_ivf_centroids(c: DataFrame, n_centroids: int, seed: int,
                         train_sample: int) -> np.ndarray | None:
    """Deterministic *uniform* training sample + k-means: TakeOrdered on
    a seeded content hash of the id, not first-N by id (on time-ordered
    or source-clustered corpora the head of the id range is a biased
    sample and the centroids would only cover it); vec_id breaks the
    (practically impossible) hash-collision tie so the sample is
    order-free and reproducible.  Returns None on an empty corpus."""
    sample_rows = (
        c.orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(train_sample)
        .select("cvec")
        .collect()
    )
    if not sample_rows:
        return None
    sample = np.array([np.asarray(r["cvec"], dtype=np.float64) for r in sample_rows])
    return _kmeans_centroids(sample, n_centroids, seed)


def ivf_build_partitioned(
    emb_df: DataFrame,
    path: str,
    n_centroids: int = 64,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the IVF layout as a **cell-partitioned table**: the
    corpus is written ``partitionBy("cell")`` (one directory per coarse
    cell) with the trained centroids alongside at ``<path>/centroids``.

    This is the 100 TB story made concrete: a probe for ``n_probe``
    cells becomes a *partition filter* on the read — the scan touches
    ``n_probe/n_centroids`` of the files instead of the whole corpus
    (``ivf_knn_partitioned`` + the plan test assert the pruning).  The
    write itself is one Arrow-matmul assignment pass, no shuffle beyond
    the partitioned-write file routing."""
    c = emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    cent = _train_ivf_centroids(c, n_centroids, seed, train_sample)
    if cent is None:
        raise ValueError("cannot build an IVF layout over an empty corpus")
    spark = emb_df.sparkSession
    c_cells = c.withColumn(
        "cell", F.element_at(_centroid_assign_udf(cent, 1)(F.col("cvec")), 1)
    )
    c_cells.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/corpus")
    # Arrow path (pandas), NOT createDataFrame(rows): a pickled local
    # relation executes through a Python-worker scan, which costs a flat
    # ~3 s per consuming WRITE job in this runtime; the Arrow conversion
    # yields a pure-JVM LocalTableScan (measured 0.14 s for this write)
    cent_pdf = pd.DataFrame({
        "cell": np.arange(cent.shape[0], dtype=np.int32),
        "centroid": [cent[i].astype(np.float64) for i in range(cent.shape[0])],
    })
    spark.createDataFrame(cent_pdf).select(
        F.col("cell").cast("int"), F.col("centroid").cast("array<double>")
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return cent


def ivf_knn_partitioned(
    spark,
    path: str,
    query_df: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    probe_info: dict | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k over an ``ivf_build_partitioned`` layout with **partition
    pruning**: the union of all queries' probe cells (bounded:
    |queries| × n_probe ints, collected driver-side) becomes a static
    ``cell IN (...)`` filter that Spark turns into PartitionFilters on
    the parquet scan — only the probed cell directories are read.  The
    per-query cell equi-join then restricts each query to its own
    probes.  Semantically identical to ``ivf_knn`` with the same
    centroids (asserted in tests).  ``probe_info``, if given, is filled
    with {"probe_cells", "n_centroids"} so callers can report the scan
    fraction."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    cent = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    q0 = query_df.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    probe_pdf = q0.limit(4097).toPandas()
    if len(probe_pdf) <= 4096:
        # driver-local query assignment: the batch is already bounded
        # (one Arrow pull) and the SAME numpy kernel the UDF wraps
        # (_assign_cells) computes the probe cells — identical by
        # construction.  This replaces three jobs (assignment persist,
        # probe-cell collect, checkpoint) with zero: q_cells becomes a
        # local relation the candidate join broadcasts directly.
        if len(probe_pdf):
            x = np.array([np.asarray(v, dtype=np.float64)
                          for v in probe_pdf["qvec"]])
            cell_lists = _assign_cells(x, cent, n_probe)
        else:
            cell_lists = []
        probe_cells = sorted({int(c) for cs in cell_lists for c in cs})
        from pyspark.sql.types import IntegerType as _Int, StructField, StructType

        q_schema = StructType([
            q0.schema["query_id"],
            q0.schema["qvec"],
            StructField("cell", _Int(), False),
        ])
        exploded = pd.DataFrame({
            "query_id": [qid for qid, cs in
                         zip(probe_pdf["query_id"], cell_lists)
                         for _ in cs],
            "qvec": [qv for qv, cs in
                     zip(probe_pdf["qvec"], cell_lists) for _ in cs],
            "cell": [int(c) for cs in cell_lists for c in cs],
        })
        q_cells = spark.createDataFrame(exploded, q_schema)
    else:
        # big batches keep the distributed assignment; materialize it
        # once — the probe-cell collect AND the candidate join both
        # consume it.  The cache is released before returning
        # (checkpoint, then unpersist): a long-lived session calling
        # this per batch must not accumulate one pinned dataset per
        # call (the GC-overhead failure mode duplicate_components hit)
        q_cells_cached = q0.withColumn(
            "cells", _centroid_assign_udf(cent, n_probe)(F.col("qvec"))
        ).select("query_id", "qvec", F.explode("cells").alias("cell")).persist()
        probe_cells = sorted(
            {r["cell"]
             for r in q_cells_cached.select("cell").distinct().collect()}
        )
        q_cells = _eager_checkpoint(q_cells_cached)
        q_cells_cached.unpersist()
    if probe_info is not None:
        probe_info["probe_cells"] = probe_cells
        probe_info["n_centroids"] = int(cent.shape[0])
    corpus = (
        spark.read.parquet(f"{path}/corpus")
        .where(F.col("cell").isin(probe_cells))
        .select("cell", "vec_id", "cvec")
    )
    cand = F.broadcast(q_cells).join(corpus, "cell").select(
        "query_id", "qvec", "vec_id", "cvec"
    )
    return _rescore_topk(cand, k, round_to)


def quantize_embeddings(
    emb_df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: append
    ``out_col`` (``array<tinyint>``, 4× smaller than float32 / 8× than
    float64) and ``scale_col`` (the per-vector dequantization factor).

    ``scale = max(|v|) / 127``; ``q[d] = clamp(floor(v[d]/scale + 0.5),
    -127, 127)`` — explicit ``floor(x + 0.5)`` (round-half-up) instead of
    an engine ``round()`` so the arithmetic is bit-reproducible across
    engines (Spark HALF_UP vs others' HALF_EVEN), which is what lets the
    correctness gate replay the quantizer in SQL.  A zero vector gets
    scale 1 and an all-zero code.

    Pure column expressions — no UDF, whole-stage codegen, one narrow
    pass at any corpus size.  The scale factor is materialized as a
    column BEFORE the per-element lambda uses it (an inline ``array_max``
    inside the lambda would re-evaluate per element — O(dim²))."""
    v = F.col(vec_col).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    df = emb_df.withColumn(
        scale_col,
        F.when(absmax > 0.0, absmax / F.lit(127.0)).otherwise(F.lit(1.0)),
    )
    s = F.col(scale_col)
    return df.withColumn(
        out_col,
        F.transform(
            v,
            lambda x: F.greatest(
                F.least(F.floor(x / s + F.lit(0.5)), F.lit(127.0)),
                F.lit(-127.0),
            ).cast("tinyint"),
        ),
    )


def _int_cosine(a, b):
    """Exact cosine over two integer-code arrays: products and partial
    sums are small integers (≤ 127²·dim ≪ 2⁵³), so the double arithmetic
    is exact and any engine computing the same formula agrees bitwise."""
    al, bl = a.cast("array<long>"), b.cast("array<long>")
    dot = F.aggregate(
        F.zip_with(al, bl, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).cast("double")
    na = F.aggregate(al, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    nb = F.aggregate(bl, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    return F.when(
        (na > 0) & (nb > 0),
        dot / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))),
    ).otherwise(F.lit(0.0))


def quantized_knn(
    emb_df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    rescore: bool = False,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over int8-quantized embeddings — the memory-bound
    scale path: the corpus scan moves 4× fewer bytes than float32 (8×
    vs float64) and the dot products are small-integer arithmetic.

    ``rescore=False`` ranks by the quantized cosine directly
    (deterministic, SQL-reproducible — the gate mode).  ``rescore=True``
    takes the top ``k × rescore_factor`` quantized candidates per query
    and re-scores them with the exact float cosine — the standard
    two-stage ANN refinement (recall asserted in tests).

    Scale shape: identical to :func:`brute_force_knn` (broadcast query
    side, narrow corpus scan, per-query window top-k) with the scan
    reading ``array<tinyint>`` instead of floats; at 100 TB the
    quantized corpus table is the one you keep hot."""
    qq = quantize_embeddings(
        query_df.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        ),
        vec_col="qvec", out_col="qcode", scale_col="qs",
    ).select("query_id", "qvec", "qcode")
    cc = quantize_embeddings(
        emb_df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
        ),
        vec_col="cvec", out_col="ccode", scale_col="cs",
    ).select("vec_id", "cvec", "ccode")

    cand = F.broadcast(qq).crossJoin(cc).where(F.col("vec_id").isNotNull())
    scored = cand.withColumn(
        "qcosine", _int_cosine(F.col("qcode"), F.col("ccode"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("vec_id").asc()
    )
    if not rescore:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", F.col("qcosine").alias("cosine"))
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k * rescore_factor)
        .select("query_id", "qvec", "vec_id", "cvec")
    )
    return _rescore_topk(shortlist, k)


def cosine_near_duplicates(
    emb_df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All candidate pairs with cosine ≥ threshold, candidate-generated
    by *banded* sign-bit LSH: the ``n_planes``-bit signature is split
    into ``bands`` chunks and a pair becomes a candidate when it agrees
    on ≥1 whole chunk (the classic LSH banding curve — near-identical
    vectors agree on most bits, so they collide in some band with high
    probability, while random pairs rarely match all bits of any chunk).

    Scale shape: the join key is (band, chunk) with 2^(n_planes/bands)
    buckets per band — an earlier version joined on the *full* signature
    of a single table, whose within-bucket candidate generation is
    quadratic in bucket size (one clustered bucket holding 1% of 10^9
    vectors → 10^12 candidate pairs).  Banding keeps each band's bucket
    key coarse and recall multi-banded; for degenerate corpora where one
    bucket still explodes (a million *true* near-dups must collide —
    their pair set is inherently quadratic), ``max_bucket_size`` drops
    oversized (band, chunk) buckets from candidate generation and LOGS
    the number of dropped buckets/rows (never a silent cap).

    Planes are deterministic integer-arithmetic hyperplanes (no RNG), so
    the whole pipeline is reproducible in SQL — the correctness gate runs
    a DuckDB twin of the banding + exact-cosine filter.
    """
    if n_planes % bands != 0:
        raise ValueError(f"bands={bands} must divide n_planes={n_planes}")
    per = n_planes // bands
    base = emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    dim = len(emb_df.select(vec_col).first()[0])
    # reuse the multi-table bucketing matmul: each band is a "table"
    # whose bucket int packs that band's sign bits
    planes = _arith_planes(dim, n_planes).reshape(bands, per, dim)
    udf = _bucket_arrays_udf(planes)
    chunks = base.withColumn("bkts", udf(F.col("v"))).select(
        "vec_id", "v", F.posexplode("bkts").alias("band", "chunk")
    )
    # materialize the hashed chunks once: the pair self-join scans them
    # twice (both aliases), and the bucket-size scan a third time when
    # capped — unmaterialized, the matmul UDF pass would repeat per
    # consumer.  The cache is released via the eager checkpoint so
    # repeated calls in a long-lived session don't accumulate.
    if max_bucket_size is not None:
        chunks_cached = chunks.persist()
        # bucket count is bounded by bands × 2^(n_planes/bands) (1024 at
        # the defaults), so collecting the oversized keys is driver-safe
        big_rows = (
            chunks_cached.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket_size)
            .collect()
        )
        chunks = chunks_cached
        if big_rows:
            _log.warning(
                "cosine_near_duplicates: dropping %d oversized (band, chunk) "
                "buckets (> %d members, %d rows total) from candidate "
                "generation; pairs confined to those buckets are NOT "
                "reported",
                len(big_rows), max_bucket_size,
                sum(r["_n"] for r in big_rows),
            )
            from bm25s_spark.util import local_relation

            big_df = local_relation(
                chunks_cached.sparkSession,
                [(r["band"], r["chunk"]) for r in big_rows],
                "band int, chunk int",
            )
            chunks = chunks_cached.join(
                F.broadcast(big_df), ["band", "chunk"], "left_anti"
            )
        # release the cache before returning: checkpoint the (filtered)
        # chunks eagerly so the returned plan no longer references the
        # persisted dataset — repeated calls in a long-lived session
        # must not accumulate pinned caches
        chunks = _eager_checkpoint(chunks)
        chunks_cached.unpersist()
    else:
        chunks = _eager_checkpoint(chunks)
    pairs = (
        chunks.alias("a").join(chunks.alias("b"), ["band", "chunk"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .withColumn(
            "cosine",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).cast("double"),
        )
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
    return pairs
