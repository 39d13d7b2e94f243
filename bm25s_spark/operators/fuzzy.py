"""Fuzzy (edit-distance) term expansion and retrieval.

Typo tolerance — ``mrege sort`` still finds ``merge sort``: each query
term expands to every vocabulary term within ``max_edits`` Levenshtein
distance, and the expanded bag re-enters standard BM25 scoring (Lucene
``FuzzyQuery`` semantics; the reference engine drops any token not in
the vocabulary verbatim, ``reference/bm25s/__init__.py:572-579``).

Semantics (deterministic, SQL-replayable):

- query tokens come from the engine's tokenizer configuration (the
  same lowercase/regex/stopword path an exact query takes);
- a vocabulary term's multiplicity is the number of query TOKEN
  OCCURRENCES within distance (so a repeated query term counts twice,
  matching the reference's duplicate-term scoring);
- an exact hit is just distance 0 — no special-casing, and a query
  with no near terms simply returns nothing;
- both engines compute the same classic Levenshtein, so the expansion
  sets are identical by construction (Spark ``levenshtein`` ==
  DuckDB ``levenshtein``).

Scale shape: the query-token side is batch-sized and **broadcast**;
matching is one pass over the vocab-sized ``term_stats`` table with the
distance predicate (the term-dictionary scan Lucene's fuzzy automaton
performs).  Spark 3.5+'s bounded ``levenshtein(l, r, threshold)``
short-circuits per pair, and a length-difference band
(``abs(len(a) − len(b)) <= max_edits``) prunes most of the dictionary
before any distance is computed.  The corpus-side cost is then
identical to a plain query with that many terms.  (The classic indexed
alternative — a SymSpell deletion-neighborhood equi-join — trades this
scan for a ~len·max_edits× larger term index; at vocab ≪ corpus the
scan is the right default.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import _matched_scores, tokenize_queries


def expand_fuzzy(
    index: BM25Index,
    queries_df: DataFrame,
    max_edits: int = 1,
    min_token_len: int = 3,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, term, mult): the fuzzy-expanded in-vocabulary bag.

    ``min_token_len`` exempts very short query tokens from fuzzing
    (they still match exactly) — ``cat`` ↛ ``car``-class false friends
    at distance 1 dominate below ~3 chars, the standard Lucene
    ``prefixLength``-style guard."""
    if max_edits < 0:
        raise ValueError(f"max_edits must be >= 0, got {max_edits}")
    qtok = tokenize_queries(index, queries_df, query_id_col, text_col)
    vocab = index.term_stats.select("term").where(F.col("term") != "")
    vterm = F.col("term")
    qterm = F.col("qterm")
    qt = qtok.select(
        "query_id", F.col("term").alias("qterm"), "mult"
    )
    fuzzy_ok = (
        (F.length(qterm) >= min_token_len)
        & ((F.length(vterm) - F.length(qterm)).between(-max_edits, max_edits))
        & (F.levenshtein(vterm, qterm, max_edits) >= 0)
    )
    cond = (vterm == qterm) | fuzzy_ok
    pairs = F.broadcast(qt).join(vocab, cond).select(
        "query_id", "term", "mult"
    )
    return pairs.groupBy("query_id", "term").agg(
        F.sum("mult").alias("mult")
    )


def fuzzy_retrieve(
    index: BM25Index,
    queries_df: DataFrame,
    k: int = 10,
    max_edits: int = 1,
    min_token_len: int = 3,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 over fuzzy-expanded queries → (query_id, rank,
    doc_id, score).  ``round_to`` rounds scores before the rank cut
    (ties break doc_id-ascending), the gate-stability convention."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > index.num_docs:
        raise ValueError(
            f"k={k} is larger than the number of documents ({index.num_docs})"
        )
    idf_method = idf_method or method
    qterms = expand_fuzzy(
        index, queries_df, max_edits, min_token_len, query_id_col, text_col
    )
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
