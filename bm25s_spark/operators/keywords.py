"""Keyword extraction over the index tables: top-k terms per document
by tf-idf.

This is pure relational reuse of the eager index — ``postings`` already
carries (term, doc_id, tf, df), so the classic tf-idf score
``tf · ln(N/df)`` is one column expression and the per-doc top-k is one
window.  No re-tokenization, no UDF.

Reference scope: the reference engine exposes no keyword extraction
(its vocab/df live inside the CSC matrix); this implements the
beyond-reference corpus-analytics mandate over the same statistics the
BM25 build already materializes (reference df semantics:
``reference/bm25s/scoring.py:28-57``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_terms_per_doc(
    index, k: int = 5, round_to: int | None = 6
) -> DataFrame:
    """(doc_id, rank, term, tf, tfidf) — each document's ``k`` highest
    tf-idf terms, ``tfidf = tf · ln(num_docs / df)`` (the atire idf; df>0
    for every posting so the log is finite).  Ties break on term asc so
    the output is deterministic; ``round_to`` rounds the score *before*
    ranking so FP noise cannot flip cross-engine comparisons (pass None
    to rank on the raw double).

    Scale shape: one narrow column expression over the postings table
    plus one hash shuffle on doc_id for the window top-k — the same
    partitioning any per-doc analytics pass needs; nothing is collected
    and no side is corpus-sized beyond the postings themselves."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    score = F.col("tf").cast("double") * F.log(
        F.lit(float(index.num_docs)) / F.col("df").cast("double")
    )
    if round_to is not None:
        score = F.round(score, round_to)
    scored = index.postings.select(
        "doc_id", "term", "tf", score.alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "tfidf")
    )
