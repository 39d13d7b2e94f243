"""Pseudo-relevance-feedback (PRF) query expansion.

Classic two-stage retrieval (Rocchio / RM-style blind feedback): run
the query, take the top-``m`` documents as presumed-relevant, mine
their highest tf-idf terms that the query does not already contain,
append them to the query, and retrieve again.  The reference engine is
single-stage (``reference/bm25s/__init__.py:759-935`` retrieve only);
PRF is the standard recall-boosting composition layered on top of any
BM25 engine, and here it exercises the engine's own composability —
the expanded queries re-enter ``retrieve`` as pre-tokenized term
arrays, exactly the reference's token-list query path.

Scale shape (batch of Q queries over a 100 TB index):

- Round 1 is the existing join-strategy scoring plan (broadcast query
  terms into the postings scan).
- The feedback join is (Q × m) hit rows — batch-sized, **broadcast**
  into the postings table on doc_id, so only the postings of feedback
  documents flow into the per-(query, term) aggregation.
- Expansion selection is a per-query window over ≤ (Q × m × dl) mined
  terms; the expanded-query frame is Q rows again.  Nothing is
  collected to the driver.

Determinism: round-1 ranks can be rounded before the cut
(``round_to``, the gate contract) and expansion scores are rounded
before ranking with a term-ascending tiebreak, so the feedback set —
and therefore the final ranking — is stable across partition counts
and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.index_io import BM25Index
from bm25s_spark.retrieval import (
    _matched_scores,
    retrieve,
    tokenize_queries,
)


def prf_expand(
    index: BM25Index,
    queries_df: DataFrame,
    feedback_docs: int = 5,
    expansion_terms: int = 3,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    expansion_round_to: int | None = 6,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, text) — each query rewritten as a pre-tokenized term
    array: its original tokens (multiplicity preserved) plus the top
    ``expansion_terms`` new terms mined from its top ``feedback_docs``
    round-1 documents by summed tf-idf (``tf · ln(N/df)``, the atire
    idf, matching ``keywords.top_terms_per_doc``).

    ``round_to`` rounds round-1 scores before the feedback cut (ties
    then break on doc_id asc) and ``expansion_round_to`` rounds the
    mined term scores before the expansion cut (ties break on term
    asc) — both make the two ranking boundaries FP-stable across
    engines.  Queries with no in-vocabulary tokens pass through with
    an empty token array (round 1 finds nothing to feed back).
    """
    if feedback_docs < 1 or expansion_terms < 0:
        raise ValueError(
            f"need feedback_docs >= 1 and expansion_terms >= 0, got "
            f"{feedback_docs}/{expansion_terms}"
        )
    idf_method = idf_method or method
    qterms = tokenize_queries(index, queries_df, query_id_col, text_col)

    scores = _matched_scores(index, qterms, method, idf_method, None)
    if round_to is not None:
        scores = scores.withColumn("score", F.round("score", round_to))
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    hits = (
        scores.withColumn("r", F.row_number().over(w1))
        .where(F.col("r") <= feedback_docs)
        .select("query_id", "doc_id")
    )

    escore = F.sum(
        F.col("tf").cast("double")
        * F.log(F.lit(float(index.num_docs)) / F.col("df").cast("double"))
    ).alias("escore")
    mined = (
        F.broadcast(hits)
        .join(index.postings.select("doc_id", "term", "tf", "df"), "doc_id")
        .groupBy("query_id", "term")
        .agg(escore)
        .join(
            F.broadcast(qterms.select("query_id", "term")),
            ["query_id", "term"],
            "left_anti",
        )
    )
    if expansion_round_to is not None:
        mined = mined.withColumn(
            "escore", F.round("escore", expansion_round_to)
        )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("escore").desc(), F.col("term").asc()
    )
    exp = (
        mined.withColumn("r", F.row_number().over(w2))
        .where(F.col("r") <= expansion_terms)
        .groupBy("query_id")
        .agg(F.sort_array(F.collect_list("term")).alias("etoks"))
    )

    orig = qterms.groupBy("query_id").agg(
        F.flatten(
            F.collect_list(
                F.array_repeat(F.col("term"), F.col("mult").cast("int"))
            )
        ).alias("toks")
    )
    empty = F.array().cast("array<string>")
    # every frame here is batch-sized (≤ Q rows) — broadcast them so the
    # assembly never sort-merge-shuffles on query_id
    return (
        queries_df.select(F.col(query_id_col).alias("query_id"))
        .distinct()
        .join(F.broadcast(orig), "query_id", "left")
        .join(F.broadcast(exp), "query_id", "left")
        .select(
            "query_id",
            F.concat(
                F.coalesce(F.col("toks"), empty),
                F.coalesce(F.col("etoks"), empty),
            ).alias("text"),
        )
    )


def prf_retrieve(
    index: BM25Index,
    queries_df: DataFrame,
    k: int = 10,
    feedback_docs: int = 5,
    expansion_terms: int = 3,
    method: str = "lucene",
    idf_method: str | None = None,
    query_id_col: str = "query_id",
    text_col: str = "text",
    **retrieve_kwargs,
) -> DataFrame:
    """Two-stage PRF retrieval → (query_id, rank, doc_id, score):
    ``prf_expand`` then a normal ``retrieve`` over the expanded
    pre-tokenized queries (any strategy / extra flags pass through)."""
    expanded = prf_expand(
        index, queries_df, feedback_docs=feedback_docs,
        expansion_terms=expansion_terms, method=method,
        idf_method=idf_method, query_id_col=query_id_col,
        text_col=text_col,
    )
    return retrieve(
        index, expanded, k=k, method=method, idf_method=idf_method,
        query_id_col="query_id", text_col="text", **retrieve_kwargs,
    )
