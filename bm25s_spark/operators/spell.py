"""Did-you-mean spelling correction against the index vocabulary.

For each query token, the closest vocabulary term by Levenshtein
distance, ties broken by corpus document frequency — the Elasticsearch
``term`` suggester / Lucene ``DirectSpellChecker``, grounded in the
corpus's OWN vocabulary rather than an external dictionary (the
reference engine silently drops out-of-vocabulary tokens,
``reference/bm25s/__init__.py:572-579``; this is the "did you mean"
layer a search box puts in front of that behavior).

Selection contract (deterministic, SQL-replayable):

- query tokens go through the engine's tokenizer configuration (the
  same lowercase / regex / stopword path a query takes);
- an in-vocabulary token suggests itself at distance 0;
- otherwise the candidate set is every vocabulary term within
  ``max_edits``, and the winner minimizes (distance asc, df desc,
  term asc) — closest first, then most common, then alphabetical;
- tokens shorter than ``min_token_len`` only match exactly (the Lucene
  short-token guard — distance-1 false friends dominate below ~3
  chars);
- a token with no candidate yields (suggestion NULL, distance NULL) —
  the caller decides whether to drop or keep it verbatim.

Scale shape: the distinct query-token side is batch-sized and
**broadcast**; matching is one map-side pass over the vocab-sized
``term_stats`` table with a length-difference band and Spark's bounded
``levenshtein(l, r, threshold)`` pruning the distance work, exactly the
``operators/fuzzy.py`` expansion shape.  The argmin is a window over
the (small) candidate set, not the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index
from bm25s_spark.retrieval import tokenize_queries


def did_you_mean(
    index: BM25Index,
    queries_df: DataFrame,
    max_edits: int = 2,
    min_token_len: int = 3,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Best vocabulary correction per query token → (query_id, token,
    suggestion, distance, df).

    ``distance`` is the Levenshtein distance token→suggestion (0 for an
    in-vocabulary token); ``df`` is the suggestion's corpus document
    frequency.  Tokens with no vocabulary term within ``max_edits``
    keep their row with NULL suggestion/distance/df.
    """
    if max_edits < 1:
        raise ValueError(f"max_edits must be >= 1, got {max_edits}")
    qtok = tokenize_queries(index, queries_df, query_id_col, text_col)
    tokens = qtok.select("query_id", F.col("term").alias("token")).distinct()
    vocab = index.term_stats.select(
        F.col("term").alias("cand"), F.col("df").cast("long").alias("df")
    ).where((F.col("cand") != "") & (F.col("df") > 0))
    tok, cand = F.col("token"), F.col("cand")
    fuzzy_ok = (
        (F.length(tok) >= min_token_len)
        & ((F.length(cand) - F.length(tok)).between(-max_edits, max_edits))
        & (F.levenshtein(cand, tok, max_edits) >= 0)
    )
    matched = F.broadcast(tokens).join(vocab, (cand == tok) | fuzzy_ok).select(
        "query_id",
        "token",
        cand.alias("suggestion"),
        F.when(cand == tok, F.lit(0))
        .otherwise(F.levenshtein(cand, tok))
        .cast("int")
        .alias("distance"),
        "df",
    )
    w = Window.partitionBy("query_id", "token").orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc()
    )
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # keep no-candidate tokens visible (NULL suggestion) — a search box
    # needs to know "unfixable" vs "already correct"
    return (
        tokens.join(F.broadcast(best), ["query_id", "token"], "left")
        .select("query_id", "token", "suggestion", "distance", "df")
    )
