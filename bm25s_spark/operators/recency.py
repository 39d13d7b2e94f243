"""Recency-boosted retrieval: exponential time decay on BM25 scores.

Transcript search wants fresh conversations first: a hit from an hour
ago should outrank an equal-text hit from last year.  The standard
treatment (Elasticsearch ``function_score`` exp decay, Solr recip boost)
multiplies the text score by ``2^(-age / half_life)`` — age measured
from a reference instant to the document's event time.

The reference engine has no document metadata at all (doc ids are bare
positions, ``reference/bm25s/__init__.py:919-932``); here the timestamp
rides in ``doc_map`` / any (doc_id, ts) table, so the boost is one join
and one column expression on top of the unchanged scorer.

Scale shape: the scorer's candidate set (queries × matched docs) joins
the (doc_id, ts) table on doc_id — candidates are top-heavy and tiny
relative to the corpus, so AQE picks a broadcast of the candidate side
against the corpus-partitioned timestamp table; no new corpus-sized
shuffle.  The decay itself is a JVM column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import _matched_scores, tokenize_queries
from bm25s_spark.scoring import METHODS


def decay_factor(ts_col: Column, now: str, half_life_hours: float) -> Column:
    """``2^(-age_hours / half_life_hours)`` with age clamped at 0 (docs
    timestamped after ``now`` get no boost above 1.0 — a clock-skewed
    future doc must not dominate)."""
    age_h = (
        F.lit(now).cast("timestamp").cast("double") - ts_col.cast("double")
    ) / 3600.0
    return F.pow(F.lit(2.0), -F.greatest(age_h, F.lit(0.0)) / half_life_hours)


def retrieve_with_decay(
    index: BM25Index,
    queries_df: DataFrame,
    doc_ts_df: DataFrame,
    now: str,
    half_life_hours: float = 24.0 * 7,
    k: int = 10,
    method: str = "lucene",
    idf_method: str | None = None,
    round_to: int | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Recency-boosted top-k →
    ``(query_id, rank, doc_id, score, decayed_score)``.

    ``doc_ts_df`` is any (doc_id, ts) mapping — typically the indexed
    transcripts table itself.  Ranking is by ``decayed_score``
    (= text score × decay); the undecayed ``score`` stays in the output
    so callers can see how much recency moved each hit.  A doc missing
    from ``doc_ts_df`` decays to the half-life floor of the oldest doc?
    No — it keeps factor 1.0 (no timestamp ⇒ no penalty), the
    conservative choice for partially-dated corpora.
    """
    if method not in METHODS:
        raise ValueError(f"Invalid method {method!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idf_method = idf_method or method
    qterms = tokenize_queries(index, queries_df)
    scores = _matched_scores(index, qterms, method, idf_method, None)
    ts = doc_ts_df.select("doc_id", F.col(ts_col).alias("_ts"))
    boosted = (
        scores.join(ts, "doc_id", "left")
        .withColumn(
            "_decay",
            F.when(
                F.col("_ts").isNotNull(),
                decay_factor(F.col("_ts"), now, half_life_hours),
            ).otherwise(F.lit(1.0)),
        )
        .withColumn("decayed_score", F.col("score") * F.col("_decay"))
        .drop("_ts", "_decay")
    )
    if round_to is not None:
        boosted = boosted.withColumn(
            "score", F.round("score", round_to)
        ).withColumn("decayed_score", F.round("decayed_score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("decayed_score").desc(), F.col("doc_id").asc()
    )
    return (
        boosted.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "decayed_score")
    )
