"""Wildcard (prefix) term expansion and retrieval.

``merg* sort`` — the classic search-engine prefix query: every vocab
term starting with ``merg`` joins the query alongside the literal
``sort``, then standard BM25 scoring runs over the expanded bag.  The
reference engine matches exact vocabulary terms only
(``reference/bm25s/__init__.py:572-579``); prefix expansion is the
multi-term query surface its users reach for next (Lucene
``PrefixQuery`` semantics: each expanded term scores independently).

Semantics (deterministic, SQL-replayable):

- the query string is lowercased and parsed with
  ``regexp_extract_all('\\w\\w+\\*?')`` — a token optionally ending in
  ``*`` is a prefix pattern, anything else is a literal term;
- literals match the index vocabulary exactly — stopwords and OOV
  tokens never entered the vocabulary, so they vanish in the join (no
  separate stopword pass needed);
- a term's multiplicity is the number of query patterns that match it
  (a term matched by both a literal and a prefix scores twice, exactly
  like a repeated query term in the reference);
- expansion matches the RAW vocabulary: on a stemmed index, prefixes
  match stems — use wildcard retrieval with unstemmed indexes (the
  usual wildcard configuration) or pass pre-stemmed patterns.

Scale shape: the pattern side is batch-sized and **broadcast**; prefix
matching is one pass over the vocab-sized ``term_stats`` table (a
broadcast nested-loop with a ``startswith`` predicate — the same term-
dictionary scan Lucene does; a term-sorted table layout turns the
prefix into a ``[p, p+1)`` range with parquet min/max skipping).  The
expanded term set then re-enters the engine's standard broadcast-query
scoring plan, so corpus-side cost is identical to a plain query with
that many terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import _matched_scores


def expand_terms(
    index: BM25Index,
    queries_df: DataFrame,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, term, mult): the expanded in-vocabulary term bag for
    each query, with ``mult`` = how many query patterns matched the
    term."""
    pats = queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.expr(
                rf"regexp_extract_all(lower({text_col}), '\\w\\w+\\*?', 0)"
            )
        ).alias("pat"),
    )
    vocab = index.term_stats.select("term").where(F.col("term") != "")
    lits = (
        F.broadcast(pats.where(~F.col("pat").endswith("*")))
        .join(vocab, F.col("term") == F.col("pat"))
        .select("query_id", "term")
    )
    pre = pats.where(F.col("pat").endswith("*")).select(
        "query_id",
        # NOT rtrim(pat, '*'): Spark's two-arg rtrim is (trimStr, src) —
        # reversed vs DuckDB/Postgres — so the standard-SQL TRIM form is
        # the only spelling both engines agree on
        F.expr("trim(TRAILING '*' FROM pat)").alias("prefix"),
    ).where(F.col("prefix") != "")
    pres = (
        F.broadcast(pre)
        .join(vocab, F.col("term").startswith(F.col("prefix")))
        .select("query_id", "term")
    )
    return lits.unionByName(pres).groupBy("query_id", "term").agg(
        F.count(F.lit(1)).alias("mult")
    )


def expand_regexp(
    index: BM25Index,
    patterns_df: DataFrame,
    query_id_col: str = "query_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """(query_id, term, mult): vocabulary terms fully matching each
    query's regular expression(s) — Lucene ``RegexpQuery`` semantics
    (the pattern must match the WHOLE term, so ``sc.n`` matches
    ``scan`` but not ``scanning``).  ``patterns_df`` may carry several
    rows per query; ``mult`` is the number of that query's patterns
    matching the term (the wildcard-expansion multiplicity contract).

    Stick to the regex intersection both the JVM and RE2-family engines
    agree on (character classes, alternation, quantifiers) — patterns
    are anchored with ``^(?:…)$`` before matching.
    """
    pats = patterns_df.select(
        F.col(query_id_col).alias("query_id"),
        F.concat(F.lit("^(?:"), F.col(pattern_col), F.lit(")$")).alias("_re"),
    )
    vocab = index.term_stats.select("term").where(F.col("term") != "")
    matched = (
        F.broadcast(pats)
        .join(vocab, F.expr("term RLIKE _re"))
        .select("query_id", "term")
    )
    return matched.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).alias("mult")
    )


def regexp_retrieve(
    index: BM25Index,
    patterns_df: DataFrame,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    query_id_col: str = "query_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """Top-k BM25 over regexp-expanded queries → (query_id, rank,
    doc_id, score).  Same scale shape as prefix retrieval: the pattern
    side broadcasts, expansion is one pass over the vocab-sized
    ``term_stats`` (Lucene's term-dictionary automaton walk, as a
    scan), and the expanded bag re-enters standard scoring.  Queries
    whose patterns match nothing return no rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > index.num_docs:
        raise ValueError(
            f"k={k} is larger than the number of documents ({index.num_docs})"
        )
    idf_method = idf_method or method
    qterms = expand_regexp(index, patterns_df, query_id_col, pattern_col)
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


def wildcard_retrieve(
    index: BM25Index,
    queries_df: DataFrame,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 over prefix-expanded queries → (query_id, rank,
    doc_id, score).  Queries whose patterns expand to nothing return no
    rows.  ``round_to`` rounds scores before the rank cut (ties then
    break doc_id-ascending), the gate-stability convention."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > index.num_docs:
        raise ValueError(
            f"k={k} is larger than the number of documents ({index.num_docs})"
        )
    idf_method = idf_method or method
    qterms = expand_terms(index, queries_df, query_id_col, text_col)
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
