"""Keyset pagination (``search_after``): fetch the next page of hits
after a per-query cursor, without re-shipping earlier pages.

Deep pagination by offset re-ranks everything a page skips; every
production engine instead paginates by a *sort key cursor*
(Elasticsearch ``search_after``, the classic keyset-pagination
pattern).  The engine's total order is (score desc, doc_id asc) — a
strict total order once scores are rounded to the gate granularity —
so "after (s, d)" is the pure predicate
``score < s OR (score = s AND doc_id > d)`` and page N+1 is one
filtered window, not an offset scan.

Scale shape: cursors are one row per query (broadcast); the predicate
filters the scored candidate set BEFORE the top-k window, so each page
costs the same single pass — no accumulated offset work, no state
between pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import _matched_scores, tokenize_queries
from bm25s_spark.scoring import METHODS


def retrieve_after(
    index: BM25Index,
    queries_df: DataFrame,
    cursors_df: DataFrame | None = None,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """The next ``k`` hits strictly after each query's cursor →
    ``(query_id, rank, doc_id, score)`` with ``rank`` restarting at 1
    per page.

    ``cursors_df``: (query_id, score, doc_id) — typically the LAST row
    of the previous page.  A query absent from ``cursors_df`` (or
    ``cursors_df=None``) gets page 1.  With ``round_to`` the cursor
    comparison happens on rounded scores — page boundaries are then
    identical to rank-offset slices of the rounded total order (pinned
    by the ``bm25_topk_page2`` gate, whose oracle is literally ranks
    k+1..2k).
    """
    if method not in METHODS:
        raise ValueError(f"Invalid method {method!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idf_method = idf_method or method
    qterms = tokenize_queries(index, queries_df)
    scores = _matched_scores(index, qterms, method, idf_method, None)
    if round_to is not None:
        scores = scores.withColumn("score", F.round("score", round_to))
    if cursors_df is not None:
        cur = cursors_df.select(
            "query_id",
            F.col("score").cast("double").alias("_cs"),
            F.col("doc_id").cast("long").alias("_cd"),
        )
        scores = (
            scores.join(F.broadcast(cur), "query_id", "left")
            .where(
                F.col("_cs").isNull()
                | (F.col("score") < F.col("_cs"))
                | ((F.col("score") == F.col("_cs"))
                   & (F.col("doc_id") > F.col("_cd")))
            )
            .drop("_cs", "_cd")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
