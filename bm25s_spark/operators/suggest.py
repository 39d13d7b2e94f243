"""Prefix autocomplete over the index vocabulary.

The search-box "suggest-as-you-type" operator: given a prefix, return
the top-n corpus terms ranked by document frequency.  The reference
exposes its vocabulary as a plain dict (``reference/bm25s/
tokenization.py:39-47``); here the vocabulary IS the ``term_stats``
table, so suggestion is a filtered scan of a vocab-sized DataFrame —
no postings touched.

Scale shape: prefixes (one per keystroke/user batch) broadcast against
the vocabulary; ``startswith`` is a JVM-side predicate, and the per-
prefix top-n is a window over the matching slice.  The vocabulary is
the *small* table of the engine (10^6–10^7 terms even at 10^12 turns —
vocab grows sub-linearly), so this stays interactive.  A trie/FST
(Lucene's suggester) would beat it per-lookup on a single node; on a
cluster the broadcast-scan wins by not needing a built side-structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index


def suggest_terms(
    index: BM25Index,
    prefixes_df: DataFrame,
    n: int = 5,
    min_df: int = 1,
    prefix_col: str = "prefix",
) -> DataFrame:
    """Top-``n`` vocabulary completions per prefix →
    ``(prefix, rank, term, df)``, ranked by (df desc, term asc).

    Prefixes are matched against index-term space (lowercased/stemmed
    exactly as the corpus was), so lowercase the user input first when
    the index lowercases.  ``min_df`` drops noise terms; the ``""``
    vocab patch row (df=0) never matches a non-empty prefix and is
    excluded for the empty one.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    prefixes = prefixes_df.select(
        F.col(prefix_col).cast("string").alias("prefix")
    ).distinct()
    vocab = index.term_stats.select("term", "df").where(
        (F.col("df") >= min_df) & (F.col("term") != "")
    )
    matched = vocab.join(
        F.broadcast(prefixes),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        matched.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= n)
        .select("prefix", "rank", "term", "df")
    )
