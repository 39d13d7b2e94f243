"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and
dense (embedding-cosine) rankings.

The standard RAG-stack composition: run BM25 top-k and ANN top-k
independently, then fuse with RRF (Cormack, Clarke & Buettcher, SIGIR
2009): ``fused(d) = Σ_systems w_s / (rrf_k + rank_s(d))``, summing only
over the systems that ranked *d*.  RRF is rank-based, so the two
systems' incomparable score scales never need calibration.

Scale shape: the inputs are already per-query top-k (≤ k rows per query
per system — the corpus-sized work happened inside each retriever), so
the fusion is one hash aggregation keyed ``(query_id, doc_id)`` over
``O(Q · k · systems)`` rows with map-side partial aggregation, followed
by a per-query window top-k over ≤ k·systems candidates.  No
corpus-sized shuffle; broadcast nothing; fine at any corpus size because
the fused relation's size is query-bounded, not corpus-bounded.

Reference scope: the reference engine is lexical-only
(``reference/bm25s/__init__.py``); hybrid fusion implements the
beyond-reference training/RAG-pipeline mandate using the engine's own
BM25 (`retrieval.score_all`) and ANN (`operators.similarity`) surfaces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    weights: Sequence[float] | None = None,
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Fuse per-system rankings with reciprocal-rank fusion.

    Each input DataFrame must carry ``(query_id, <id_col>, rank)`` with
    ``rank`` 1-based within its query.  Returns
    ``(query_id, rank, <id_col>, rrf_score)`` — the fused top-``k`` per
    query, ordered by (rrf_score desc, id asc); the id tiebreak makes
    the output deterministic when two documents tie (e.g. appear in a
    single system at the same rank).

    ``weights`` (default: all 1.0) scales each system's contribution —
    the weighted-RRF variant used when one retriever is trusted more.
    ``round_to`` rounds the fused score *before* ranking, pinning the
    order against sub-rounding FP noise for cross-engine comparison.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"weights ({len(weights)}) must match rankings ({len(rankings)})"
        )
    contribs = [
        r.select(
            "query_id",
            F.col(id_col).alias("_id"),
            (F.lit(float(w)) / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))
             ).alias("_c"),
        )
        for r, w in zip(rankings, weights)
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = allc.groupBy("query_id", "_id").agg(F.sum("_c").alias("rrf_score"))
    if round_to is not None:
        fused = fused.withColumn("rrf_score", F.round("rrf_score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("_id").alias(id_col), "rrf_score")
    )


def linear_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    weights: Sequence[float] | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
    round_to: int | None = None,
) -> DataFrame:
    """Fuse per-system rankings by weighted min-max-normalized scores —
    the score-based alternative to :func:`rrf_fuse` (Elasticsearch's
    ``normalizer: min_max`` hybrid mode; "convex combination" in the
    fusion literature).

    Each input carries ``(query_id, <id_col>, <score_col>)``.  Within
    each (system, query) the scores are rescaled to [0, 1] with
    ``(s − min) / (max − min)``; a degenerate slate (``max == min``,
    e.g. a single hit) normalizes to 1.0 — every doc in it is equally
    the best that system found.  The fused score sums ``weight ×
    normalized`` over the systems that ranked the doc (missing system →
    0 contribution, the standard convention), then the top-``k`` per
    query is returned as ``(query_id, rank, <id_col>, fused_score)``
    ordered (fused_score desc, id asc).

    Unlike RRF this preserves score *magnitudes* (a dominant BM25 hit
    stays dominant), at the cost of needing the per-query min/max —
    still only a window over the ≤ k·systems candidate rows, nothing
    corpus-sized.  ``round_to`` rounds the fused score before ranking
    (cross-engine stability).
    """
    if not rankings:
        raise ValueError("linear_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"weights ({len(weights)}) must match rankings ({len(rankings)})"
        )
    qw = Window.partitionBy("query_id")
    contribs = []
    for r, wgt in zip(rankings, weights):
        base = r.select(
            "query_id",
            F.col(id_col).alias("_id"),
            F.col(score_col).cast("double").alias("_s"),
        )
        mn, mx = F.min("_s").over(qw), F.max("_s").over(qw)
        norm = F.when(mx == mn, F.lit(1.0)).otherwise((F.col("_s") - mn) / (mx - mn))
        contribs.append(
            base.select(
                "query_id", "_id", (F.lit(float(wgt)) * norm).alias("_c")
            )
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = allc.groupBy("query_id", "_id").agg(F.sum("_c").alias("fused_score"))
    if round_to is not None:
        fused = fused.withColumn("fused_score", F.round("fused_score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("fused_score").desc(), F.col("_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("_id").alias(id_col), "fused_score")
    )


def hybrid_retrieve(
    index,
    emb_df: DataFrame,
    queries_df: DataFrame,
    query_vecs: DataFrame,
    k: int = 10,
    depth: int | None = None,
    method: str = "lucene",
    idf_method: str | None = None,
    rrf_k: int = 60,
    weights: Sequence[float] | None = None,
    knn=None,
    ivf_path: str | None = None,
    **knn_kwargs,
) -> DataFrame:
    """End-to-end hybrid retrieval over one corpus keyed by ``doc_id``.

    - ``index``: a built :class:`~bm25s_spark.indexer.BM25Index`.
    - ``emb_df``: ``(vec_id, embedding)`` where ``vec_id`` is the same
      id space as the index's ``doc_id``.  May be ``None`` when
      ``ivf_path`` supplies the vectors.
    - ``queries_df``: ``(query_id, text)``; ``query_vecs``:
      ``(query_id, embedding)`` — the same queries, both modalities.
    - ``depth``: per-system candidate depth before fusion (default
      ``4·k`` — RRF can promote a doc ranked below k in both systems).
    - dense side — exactly one of:

      * ``ivf_path``: an ``ivf_build_partitioned`` layout; the dense
        candidates come from
        :func:`~bm25s_spark.operators.similarity.ivf_knn_partitioned`
        (partition-pruned probe scan — the 100 TB path).
      * ``knn``: an explicit ANN callable with the
        ``(emb_df, query_vecs, k=...)`` shape —
        ``brute_force_knn`` / ``lsh_knn`` / ``ivf_knn``, with
        ``**knn_kwargs`` forwarded.

      There is deliberately NO implicit default: brute-force cosine is
      the wrong recommendation at corpus scale, so a caller must either
      hand over the partitioned IVF layout or name their ANN choice.

    Returns the fused ``(query_id, rank, doc_id, rrf_score)`` top-k.
    """
    from bm25s_spark.retrieval import retrieve

    if (knn is None) == (ivf_path is None):
        raise ValueError(
            "pass exactly one dense-side source: ivf_path=<partitioned "
            "IVF layout> (the scale path) or knn=<ANN callable> (e.g. "
            "brute_force_knn — explicit, because a silent brute-force "
            "default is wrong at corpus scale)"
        )

    # clamp: retrieve() raises on k > num_docs, and fusing deeper than
    # the corpus is meaningless anyway
    depth = min(depth or 4 * k, index.num_docs)

    # the engine's own top-k path (MaxScore pruning, sharded strategy
    # available, (score desc, doc_id asc) tie contract) — not a full
    # score_all + window, which would rank every matched doc per query.
    # pad=False: padded null doc_ids must not enter the fusion
    bm25 = retrieve(
        index, queries_df, k=depth, method=method, idf_method=idf_method,
        pad=False,
    ).select("query_id", "doc_id", "rank")
    if ivf_path is not None:
        from bm25s_spark.operators.similarity import ivf_knn_partitioned

        dense = ivf_knn_partitioned(
            index.spark, ivf_path, query_vecs, k=depth, **knn_kwargs
        )
    else:
        dense = knn(emb_df, query_vecs, k=depth, **knn_kwargs)
    dense = dense.select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([bm25, dense], k=k, rrf_k=rrf_k, weights=weights)
