"""Dirichlet-smoothed query-likelihood ranking (the LM alternative to
BM25).

The reference engine scores exclusively with the BM25 family
(``reference/bm25s/scoring.py:13-136``: robertson/lucene/atire/bm25l/
bm25+); classic full-text engines ship a language-model similarity next
to BM25 (Lucene's ``LMDirichletSimilarity``), and this module adds that
ranking family over the SAME index tables — no rebuild, no extra stored
columns: collection frequencies are one vocab-sized aggregate away from
the postings the BM25 path already keeps.

Scoring (rank-equivalent Lucene form — the query-constant
``Σ mult·ln p(t|C)`` term is dropped since it cannot reorder docs):

    score(q, d) = Σ_{t ∈ q∩d} mult(t,q) · ln(1 + tf(t,d) / (μ·p(t|C)))
                  + qlen(q) · ln(μ / (μ + dl(d)))

with ``p(t|C) = cf(t) / T`` (collection frequency over total corpus
tokens) and ``qlen`` the number of *in-vocabulary* query token
occurrences — OOV terms drop entirely, mirroring the BM25 path's
token→id OOV drop so the two rankers see the same effective query.
Only documents matching ≥1 query term are candidates (the second term
alone never promotes a no-match doc into a top-k that contains matches,
and the dense all-docs variant would be corpus-sized for no ranking
benefit).

Scale shape (designed for 10^12-doc postings):

- ``cf`` is ONE hash aggregation over the postings with map-side
  partial combine — the shuffle is vocab-bounded, not postings-bounded.
- ``T`` is a single scalar (driver collect of one row).
- Query terms (tiny) join cf and then BROADCAST onto the postings scan:
  the only corpus-sized shuffle is the (query_id, doc_id) aggregation
  over matched postings — identical shape to the BM25 join path, so
  everything proven there (LeftSemi pruning potential, AQE sizing)
  carries over.
- ``dl`` rides the postings rows (denormalized at build), so no extra
  doc_lens join on the corpus side; the qlen/prior joins are
  query-count-sized broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import tokenize_queries

DEFAULT_MU = 2000.0


def collection_frequencies(index: BM25Index) -> tuple[DataFrame, float]:
    """(cf table, total token count) for ``index`` — the language-model
    collection statistics, memoized ON the index object.

    cf is one hash aggregation over the postings with map-side partial
    combine (vocab-bounded shuffle), eagerly checkpointed so both its
    consumers (the totals collect and each query batch's term join) read
    the materialized table.  It is STATIC for a given index, so the
    postings pass runs once per index, not once per ``retrieve_qld``
    call — on a long-lived service over 10^12 postings, re-aggregating
    per batch would dominate query cost.  (Mirrors ``ensure_sharded``'s
    build-once-on-the-index convention.)
    """
    cached = getattr(index, "_qld_cf", None)
    if cached is not None:
        return cached
    from bm25s_spark.util import eager_checkpoint as _eager_checkpoint

    cf = _eager_checkpoint(
        index.postings.groupBy("term").agg(
            F.sum("tf").cast("double").alias("cf")
        ),
        reliable=True,
    )
    total = cf.agg(F.sum("cf").alias("t")).collect()[0]["t"]
    if not total:
        raise ValueError("empty index: no postings to score against")
    index._qld_cf = (cf, float(total))
    return index._qld_cf


def score_qld(
    index: BM25Index,
    queries_df: DataFrame,
    mu: float = DEFAULT_MU,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score) for every doc matching ≥1 query term,
    scored by Dirichlet query likelihood at smoothing ``mu``."""
    if mu <= 0:
        raise ValueError(f"mu must be positive, got {mu}")
    cf, total = collection_frequencies(index)

    qterms = tokenize_queries(index, queries_df, query_id_col, text_col)
    # in-vocab query terms with their collection stats (tiny × vocab
    # join, result query-sized → broadcastable onto the postings)
    qv = F.broadcast(qterms).join(cf, "term").select(
        "query_id", "term", F.col("mult").cast("double").alias("mult"), "cf"
    )
    qlen = qv.groupBy("query_id").agg(F.sum("mult").alias("qlen"))

    # ln(1 + tf/(μ·cf/T)) written as ln(1 + tf·T/(μ·cf)); plain
    # log(1 + x) — not log1p — so the DuckDB oracle's ln(1 + x) is the
    # bit-identical expression on both engines
    contrib = F.log(
        F.lit(1.0)
        + F.col("tf").cast("double") * F.lit(float(total))
        / (F.lit(float(mu)) * F.col("cf"))
    )
    matched = (
        F.broadcast(qv)
        .join(index.postings.select("term", "doc_id", "tf", "dl"), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("mult") * contrib).alias("msum"),
            F.min("dl").cast("double").alias("dl"),
        )
    )
    prior = F.col("qlen") * F.log(
        F.lit(float(mu)) / (F.lit(float(mu)) + F.col("dl"))
    )
    return (
        matched.join(F.broadcast(qlen), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("msum") + prior).alias("score"),
        )
    )


def retrieve_qld(
    index: BM25Index,
    queries_df: DataFrame,
    k: int = 10,
    mu: float = DEFAULT_MU,
    round_to: int | None = None,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` per query → (query_id, rank, doc_id, score), ranked by
    (score desc, doc_id asc).  ``round_to`` rounds scores BEFORE ranking
    (the gate's FP-stability contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scores = score_qld(index, queries_df, mu=mu,
                       query_id_col=query_id_col, text_col=text_col)
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
