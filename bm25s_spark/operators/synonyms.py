"""Query-time synonym expansion: thesaurus-weighted term bags.

The reference scores whatever token bag it is handed
(``reference/bm25s/__init__.py:572-618``) — expansion is a pre-scoring
rewrite, like the PRF / wildcard / fuzzy operators.  This module adds
the classic search-engine thesaurus: each query token contributes
itself at full weight plus each of its synonyms at a fractional weight,
and the weighted bag enters the standard scorer (fractional
multiplicities are exact: the scorer computes ``Σ mult·impact`` in
float64).

Expansion applies to the *post-tokenizer* query tokens (lowercased,
stopword-filtered, stemmed if the index stems) — so the thesaurus must
be keyed in index-term space.  A source token absent from the corpus
vocabulary still expands (its synonyms match; the token itself just
joins nothing) — typo-adjacent thesaurus entries keep working.

Scale shape: the thesaurus is vocabulary-sized at worst → broadcast
join against the tiny query-term table (never against the postings);
scoring itself is the unchanged one-broadcast-join-one-agg plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import _matched_scores, tokenize_queries
from bm25s_spark.scoring import METHODS


def expand_query_terms(
    index: BM25Index,
    queries_df: DataFrame,
    synonyms_df: DataFrame,
    term_col: str = "term",
    synonym_col: str = "synonym",
    weight_col: str = "weight",
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize queries and apply the thesaurus →
    ``(query_id, term, mult:double)``.

    A token occurring ``m`` times contributes ``(token, m)`` plus
    ``(synonym, m·weight)`` per thesaurus row; weights for the same
    expanded term accumulate (e.g. two different query tokens sharing a
    synonym).
    """
    base = tokenize_queries(index, queries_df, query_id_col, text_col)
    syn = synonyms_df.select(
        F.col(term_col).alias("_src"),
        F.col(synonym_col).alias("term"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    expanded = (
        base.join(F.broadcast(syn), base["term"] == syn["_src"])
        .select(
            "query_id",
            syn["term"],
            (F.col("mult").cast("double") * F.col("_w")).alias("mult"),
        )
    )
    return (
        base.select("query_id", "term", F.col("mult").cast("double").alias("mult"))
        .unionByName(expanded)
        .groupBy("query_id", "term")
        .agg(F.sum("mult").alias("mult"))
    )


def retrieve_with_synonyms(
    index: BM25Index,
    queries_df: DataFrame,
    synonyms_df: DataFrame,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    **expand_kw,
) -> DataFrame:
    """Synonym-expanded top-k → ``(query_id, rank, doc_id, score)``.

    No padding: expansion already widens recall; padding would inject
    unmatched docs with thesaurus-independent scores.
    """
    if method not in METHODS:
        raise ValueError(f"Invalid method {method!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idf_method = idf_method or method
    qterms = expand_query_terms(index, queries_df, synonyms_df, **expand_kw)
    scores = _matched_scores(index, qterms, method, idf_method, None)
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
