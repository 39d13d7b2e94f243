"""Metadata-filtered retrieval: restrict BM25 ranking to an allowed
document set.

The "filtered search" every production engine exposes (Lucene filter
query, Elasticsearch bool.filter): rank only documents matching a
metadata predicate — here "only user turns", "only this conversation",
"only docs after T".  The filter must apply BEFORE the rank cut (a
post-filtered top-k silently returns fewer than k hits whenever the
filter bites inside the top-k — the classic correctness bug this
operator exists to avoid), and it must not perturb scores: BM25
statistics stay corpus-wide, exactly like the tombstone view
(operators/deletes.py) — the filter narrows *candidates*, not the
*model*.

Scale shape: the allowed set arrives either as a DataFrame of doc_ids
(semi-join — broadcast when small, shuffle otherwise; never collected)
or as a Column predicate over ``doc_map`` columns (pushed into the
doc_map scan, then semi-joined).  One extra join on the candidate set;
no new corpus-sized shuffle and no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import _matched_scores, tokenize_queries
from bm25s_spark.scoring import METHODS


def retrieve_filtered(
    index: BM25Index,
    queries_df: DataFrame,
    allowed: DataFrame | Column,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k over the allowed document subset →
    ``(query_id, rank, doc_id, score)``.

    ``allowed``: a DataFrame with a ``doc_id`` column (the whitelist), or
    a Column predicate evaluated against ``index.doc_map`` (requires the
    index to have been built with ``keep_doc_map=True``).  Scores equal
    the unfiltered engine's scores on the surviving docs bit-for-bit;
    no padding (padding would inject docs outside the filter).
    """
    if method not in METHODS:
        raise ValueError(f"Invalid method {method!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idf_method = idf_method or method
    if isinstance(allowed, Column):
        if index.doc_map is None:
            raise ValueError(
                "a Column filter needs doc_map; build with keep_doc_map=True"
            )
        allowed_df = index.doc_map.where(allowed).select("doc_id")
    else:
        allowed_df = allowed.select("doc_id")
    qterms = tokenize_queries(index, queries_df)
    scores = _matched_scores(index, qterms, method, idf_method, None)
    scores = scores.join(allowed_df, "doc_id", "left_semi")
    if round_to is not None:
        scores = scores.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
