"""Trending terms: top-n token counts per event-time window.

The transcript/events analytics companion to the index build: "what were
the most frequent query terms each hour" over a corpus with timestamps.
Tokenization is the engine's own pipeline (same regex + stopword +
optional stemmer configuration as ``build_index``), so trends and the
search index agree on what a term is.

Scale shape: one tokenizer pass, one partial-aggregated ``groupBy
(window, term)`` (hot boilerplate terms combine map-side), then a
TWO-PHASE top-n: ranking directly ``PARTITION BY window`` would ship
every (window, term) row of a window — vocabulary-sized — to a single
task; instead a salted pre-rank takes the per-(window, salt) top-n
(any global top-n term must lead its own salt group — pigeonhole) and
the final rank runs over ≤ salt_partitions × top_n rows per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.tokenization import make_tokenizer_udf


def trending_terms(
    df: DataFrame,
    window: str = "1 hour",
    top_n: int = 10,
    ts_col: str = "ts",
    text_col: str = "text",
    stopwords="en",
    stemmer: str | None = None,
    min_count: int = 1,
    salt_partitions: int = 32,
    with_previous: bool = False,
) -> DataFrame:
    """Top-``top_n`` terms per tumbling ``window`` → (window_start,
    term, n, rank); ties break term-ascending.  Rows with a null
    timestamp are skipped.  ``with_previous=True`` adds ``prev_n`` —
    the same term's count in the immediately preceding window (0 when
    absent), the raw material for growth/trend ratios — via a
    window-shifted self-join of the full counts (computed BEFORE the
    top-n cut, so a term surging from nothing still shows prev_n=0
    rather than a missing row).
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    udf = make_tokenizer_udf(stopwords=stopwords, stemmer=stemmer)
    toks = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.window(F.col(ts_col), window)["start"].alias("window_start"),
            F.explode(udf(F.col(text_col))).alias("term"),
        )
    )
    counts = (
        toks.groupBy("window_start", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    if with_previous:
        # both the top-n cut and the shifted self-join consume the full
        # counts; eager-checkpoint (not persist) so the tokenizer pass
        # runs once and no cache stays pinned to the returned plan
        from bm25s_spark.util import eager_checkpoint

        counts = eager_checkpoint(counts)
    order = (F.col("n").desc(), F.col("term").asc())
    pre = Window.partitionBy(
        "window_start", F.pmod(F.xxhash64("term"), F.lit(salt_partitions))
    ).orderBy(*order)
    final = Window.partitionBy("window_start").orderBy(*order)
    top = (
        counts.withColumn("_pr", F.row_number().over(pre))
        .where(F.col("_pr") <= top_n)
        .withColumn("rank", F.row_number().over(final).cast("int"))
        .where(F.col("rank") <= top_n)
        .select("window_start", "term", "n", "rank")
    )
    if not with_previous:
        return top
    prev = counts.select(
        (F.col("window_start") + F.expr(f"INTERVAL {window}")).alias("window_start"),
        "term",
        F.col("n").alias("prev_n"),
    )
    return (
        top.join(prev, ["window_start", "term"], "left")
        .withColumn("prev_n", F.coalesce(F.col("prev_n"), F.lit(0)))
        .select("window_start", "term", "n", "prev_n", "rank")
    )
