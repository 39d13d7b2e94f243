"""More-like-this: related-document retrieval through the index itself.

The classic "find documents similar to this one" primitive (Lucene's
MoreLikeThis): mine each seed document's most characteristic terms from
the index's own (tf, df) statistics, use them as a bag-of-words query,
and BM25-rank the corpus against it.  The reference engine retrieves
only from free-text queries (``reference/bm25s/__init__.py:759-935``);
this composes its statistics tables into the doc→docs operator a
recommendation / dedup-triage pipeline actually calls.

Scale shape: the seed side is batch-sized and **broadcast** into the
postings scan (semi-join) — term mining touches only the seeds'
postings, never the corpus; the expanded queries are |seeds| rows that
re-enter the engine's standard broadcast-query scoring plan.  Nothing
is collected to the driver.

Determinism: mined-term scores are ``tf · ln(N / df)`` (the atire idf,
matching :func:`bm25s_spark.operators.keywords.top_terms_per_doc` and
the PRF expansion convention) rounded before ranking with a
term-ascending tiebreak; final scores can be rounded before ranking
(``round_to``) for cross-engine-stable cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import score_all


def mine_seed_terms(
    index: BM25Index,
    seeds_df: DataFrame,
    m_terms: int = 10,
    id_col: str = "doc_id",
    term_round_to: int | None = 6,
) -> DataFrame:
    """(seed_doc_id, trank, term) — each seed document's ``m_terms``
    highest-tf-idf terms, mined from the postings of the seeds only
    (broadcast semi-join; the corpus is never re-tokenized)."""
    if m_terms < 1:
        raise ValueError(f"m_terms must be >= 1, got {m_terms}")
    seeds = seeds_df.select(F.col(id_col).cast("long").alias("seed_doc_id"))
    sp = index.postings.join(
        F.broadcast(seeds),
        index.postings["doc_id"] == seeds["seed_doc_id"],
    ).select("seed_doc_id", "term", "tf", "df")
    score = F.col("tf").cast("double") * F.log(
        F.lit(float(index.num_docs)) / F.col("df").cast("double")
    )
    if term_round_to is not None:
        score = F.round(score, term_round_to)
    w = Window.partitionBy("seed_doc_id").orderBy(
        score.desc(), F.col("term").asc()
    )
    return (
        sp.withColumn("trank", F.row_number().over(w).cast("int"))
        .where(F.col("trank") <= m_terms)
        .select("seed_doc_id", "trank", "term")
    )


def more_like_this(
    index: BM25Index,
    seeds_df: DataFrame,
    m_terms: int = 10,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    term_round_to: int | None = 6,
    include_self: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """(seed_doc_id, rank, doc_id, score): for every seed document, the
    top-``k`` most similar corpus documents under BM25 over the seed's
    ``m_terms`` mined terms (each with multiplicity 1).

    The seed itself is excluded unless ``include_self=True`` (it is
    otherwise almost always rank 1 — it contains all its own terms).
    ``round_to`` rounds scores before the rank cut (ties then break
    doc_id-ascending), the engine's gate-stability convention."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    mined = mine_seed_terms(index, seeds_df, m_terms, id_col, term_round_to)
    qdf = mined.groupBy("seed_doc_id").agg(
        F.collect_list("term").alias("text")
    ).select(F.col("seed_doc_id").alias("query_id"), "text")
    scores = score_all(index, qdf, method=method, idf_method=idf_method)
    if not include_self:
        scores = scores.where(F.col("doc_id") != F.col("query_id"))
    if round_to is not None:
        scores = scores.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("seed_doc_id"), "rank", "doc_id", "score"
        )
    )
