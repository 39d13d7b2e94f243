"""Percolation: reverse search — match incoming documents against a
table of STORED queries.

The alerting primitive (Elasticsearch percolator, Lucene Monitor):
users register standing queries ("notify me when a transcript mentions
X and Y"); each newly ingested document is matched against every
stored query.  The reference engine has no such surface — but its
tokenizer and scoring tables give it to us for free: percolation is
the scoring join TRANSPOSED (documents stream through; the query table
is the small broadcast side).

Semantics: a document matches a stored query when it contains EVERY
distinct post-tokenizer query term (boolean-AND — the alerting
default; an OOV-free contract: a stored query with a term the document
lacks does not fire).  ``min_should_match`` relaxes to "at least m
distinct terms" (m=1 ⇒ boolean-OR).  Empty/stopword-only stored
queries never fire (nothing to match on).

Scale shape: documents tokenize once (the same Arrow UDF as indexing)
and explode to (doc, term) pairs; the stored-query term table —
thousands of alerts, vocabulary-sized at worst — broadcasts; one
aggregation counts matched distinct terms per (doc, query).  Per
micro-batch this is exactly the index build's narrow shape, so the
same operator percolates a stream inside ``foreachBatch`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark.tokenization import tokenize


def percolate(
    docs_df: DataFrame,
    stored_queries_df: DataFrame,
    min_should_match: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    tokenizer_kwargs: dict | None = None,
) -> DataFrame:
    """Match documents against stored queries →
    ``(doc_id, query_id, n_matched, n_terms)``.

    ``n_terms`` is the stored query's distinct post-tokenizer term
    count, ``n_matched`` how many of those the document contains.
    Default (``min_should_match=None``): only full matches
    (``n_matched == n_terms``) are returned; pass an integer m to relax
    to ≥ m.  Both documents and stored queries run the SAME tokenizer
    configuration (pass the index's ``tokenizer_kwargs`` to keep
    percolation consistent with retrieval).
    """
    tok_kwargs = tokenizer_kwargs or {}
    dtoks = tokenize(
        docs_df.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col=text_col, **tok_kwargs,
    ).select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qtoks = (
        tokenize(
            stored_queries_df.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_text_col).alias("_qt"),
            ),
            text_col="_qt", **tok_kwargs,
        )
        .select("query_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .distinct()
    )
    qlen = qtoks.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    matched = (
        dtoks.join(F.broadcast(qtoks), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .join(F.broadcast(qlen), "query_id")
    )
    need = (
        F.col("n_terms") if min_should_match is None
        else F.lit(int(min_should_match))
    )
    return matched.where(F.col("n_matched") >= need).select(
        "doc_id", "query_id", "n_matched", "n_terms"
    )
