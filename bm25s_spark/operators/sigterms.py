"""Significant terms: which vocabulary terms are OVER-represented in a
query's result set relative to the whole corpus (the Elasticsearch
``significant_terms`` aggregation; Lucene's JLH scoring).

Given a retrieval result (query_id, doc_id) and the index's own
statistics, compare each term's *foreground* document frequency (how
many hit docs contain it) against its *background* frequency (corpus
``df`` / ``num_docs``) and score the lift with JLH:

    fg_pct = fg_df / fg_size          bg_pct = df / N
    jlh    = (fg_pct − bg_pct) · (fg_pct / bg_pct)

— the absolute-change × relative-change product that rewards terms both
common in the hits and rare in the corpus.  The reference engine stops
at (doc, score) arrays (``reference/bm25s/__init__.py:759-803``); this
is the "why did these match / what do they share" analytics layer a
transcript-search pipeline adds on top.

Scale shape: the result set is queries × k rows — **broadcast** it into
the join against the corpus-sized ``postings`` table (pruned by
Catalyst to its (term, doc_id) columns), so the foreground counts cost
one map-side pass over postings plus a hash aggregation whose
cardinality is bounded by hits × distinct-terms-per-doc.  The term
statistics join then broadcasts the (tiny) foreground aggregate into
one pass over ``term_stats``.  Nothing shuffles at corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index


def significant_terms(
    index: BM25Index,
    results: DataFrame,
    top_n: int = 10,
    round_to: int | None = None,
    min_fg_df: int = 1,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query significant terms → (query_id, term, fg_df, df, score,
    rank).

    ``results`` carries one row per (query, hit doc) — any retrieval
    output with ``pad=False`` (padded null doc_ids would poison the
    foreground counts).  ``top_n`` keeps the n highest-JLH terms per
    query; ties break term-ascending.  ``round_to`` rounds the score
    *before* the rank cut (the cross-engine gate convention).
    ``min_fg_df`` drops terms seen in fewer than that many hit docs
    (noise floor; 1 = keep all).  Queries with no hits yield no rows.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if min_fg_df < 1:
        raise ValueError(f"min_fg_df must be >= 1, got {min_fg_df}")
    hits = results.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("doc_id")
    ).distinct()
    # foreground sizes (rows per query) ride along via a window over the
    # small aggregate rather than a second corpus-side pass
    fg = (
        F.broadcast(hits)
        .join(index.postings.select("term", "doc_id"), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("fg_df"))
    )
    fg_sizes = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("fg_size")
    )
    stats = index.term_stats.select("term", F.col("df").cast("double").alias("df"))
    n = F.lit(float(index.num_docs))
    fg_pct = F.col("fg_df") / F.col("fg_size")
    bg_pct = F.col("df") / n
    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    scored = (
        F.broadcast(fg.join(F.broadcast(fg_sizes), "query_id"))
        .join(stats, "term")
        .where(F.col("fg_df") >= float(min_fg_df))
        .withColumn("score", score)
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_n)
        .select(
            "query_id",
            "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("df").cast("long").alias("df"),
            "score",
            "rank",
        )
    )
