"""Query-coverage analytics: the search-ops report for a fulltext index.

Given a query log, report per query how well the index can serve it:
token volume, out-of-vocabulary terms (the spell-correction /
synonym-mining feed), candidate-document counts, and a zero-hit flag —
the numbers a search dashboard tracks to find vocabulary gaps and dead
queries BEFORE users do.  The reference engine surfaces none of this
(queries that match nothing just return zeros); the operator composes
the engine's own query-tokenization path with one postings pass.

Scale shape: the tokenized query batch is BROADCAST into the postings
table (the retrieval join shape — one postings scan, LeftSemi-prunable
on term); per-query aggregations are map-side-combinable distincts
bounded by the candidate sets, the same bound retrieval itself has.
Queries whose tokenization is empty (stopword-only, the reference's
empty-query quirk) are kept via a left join from the input log — a
search-ops report that silently drops the worst queries would be
useless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark.index_io import BM25Index
from bm25s_spark.retrieval import tokenize_queries


def query_coverage(
    index: BM25Index,
    queries_df: DataFrame,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-query index-coverage report → (query_id, n_tokens,
    n_unique_terms, n_oov_terms, oov_terms, n_candidate_docs, zero_hit).

    - ``n_tokens`` / ``n_unique_terms`` — post-tokenizer token and
      term-type counts (the index's own tokenizer configuration).
    - ``oov_terms`` — comma-joined sorted terms that match NO posting
      (out of vocabulary); ``n_oov_terms`` their count.
    - ``n_candidate_docs`` — distinct documents sharing ≥1 term with
      the query (the retrieval candidate-set size).
    - ``zero_hit`` — 1 if no document matches at all (int, not boolean,
      for cross-engine hash stability).
    """
    qt = tokenize_queries(index, queries_df, query_id_col, text_col)
    qstats = qt.groupBy("query_id").agg(
        F.sum("mult").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_unique_terms"),
    )
    hits = F.broadcast(qt.select("query_id", "term")).join(
        index.postings.select("term", "doc_id"), "term"
    )
    per_query = hits.groupBy("query_id").agg(
        F.countDistinct("doc_id").cast("long").alias("n_candidate_docs")
    )
    # OOV membership comes from the vocab-sized term_stats table, NOT a
    # second pass over `hits` — this keeps the postings scan at exactly
    # ONE execution per report.  df > 0 makes the sets identical: the
    # '' vocab-patch row (indexer B9) carries df=0 and NO postings, so
    # without the guard an empty-fallback query token would silently
    # stop counting as OOV.  The broadcast query batch streams against
    # term_stats; the matched set is query-bounded and re-broadcastable.
    matched_terms = index.term_stats.where(F.col("df") > 0).select("term").join(
        F.broadcast(qt.select("term").distinct()), "term", "left_semi"
    )
    oov_agg = (
        qt.select("query_id", "term")
        .join(F.broadcast(matched_terms), "term", "left_anti")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_oov_terms"),
            F.array_join(F.array_sort(F.collect_list("term")), ",").alias(
                "oov_terms"
            ),
        )
    )
    base = queries_df.select(F.col(query_id_col).alias("query_id"))
    # the assembly frames are all query-batch-bounded aggregations —
    # broadcast them so the report never plans a sort-merge shuffle
    return (
        base.join(F.broadcast(qstats), "query_id", "left")
        .join(F.broadcast(oov_agg), "query_id", "left")
        .join(F.broadcast(per_query), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_unique_terms", F.lit(0)).cast("long").alias(
                "n_unique_terms"
            ),
            F.coalesce("n_oov_terms", F.lit(0)).cast("long").alias(
                "n_oov_terms"
            ),
            F.coalesce("oov_terms", F.lit("")).alias("oov_terms"),
            F.coalesce("n_candidate_docs", F.lit(0)).cast("long").alias(
                "n_candidate_docs"
            ),
            (F.coalesce("n_candidate_docs", F.lit(0)) == 0)
            .cast("int")
            .alias("zero_hit"),
        )
    )
