"""Corpus drift detection: compare the term distributions of two corpus
snapshots (crawl N vs crawl N+1, candidate mix vs production mix) — the
monitoring primitive a training-data pipeline runs before promoting a
new data drop.

Both operators tokenize with the ENGINE tokenizer (lowercase →
``\\w\\w+`` → stopword filter — the same replay the clustering-keyword
and BM25 oracles already pin cross-engine), Laplace-smooth the two
unigram distributions over the UNION vocabulary, and compare:

- :func:`term_drift` — per-term top movers ranked by the Jeffreys
  (symmetric KL) contribution ``(p_a − p_b) · ln(p_a / p_b)``, which is
  non-negative, zero iff the term's probability is unchanged, and —
  unlike a raw log-ratio — weights the shift by how much probability
  mass actually moved (a rare term doubling matters less than a common
  term halving).
- :func:`distribution_divergence` — a one-row corpus summary with both
  directed KLs and their Jeffreys sum, plus the token/vocab volumes.

Determinism contract: every probability is one IEEE division of exact
integers (count + 1) / (total + vocab), so the unrounded doubles are
bit-identical in any engine; only ``ln`` can differ in the last ulp,
which the output rounding absorbs (the established oracle convention).

Scale shape: one ``groupBy(term)`` per corpus (map-side combinable,
vocab-bounded output), one full-outer vocab join, and one crossJoin
against a broadcast 1-row totals aggregate.  Nothing corpus-sized is
shuffled twice, nothing reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _term_counts(
    df: DataFrame, text_col: str, id_col: str, stopwords
) -> DataFrame:
    """(term, cnt) — token OCCURRENCE counts via the engine tokenizer."""
    from bm25s_spark.tokenization import tokenize

    toks = tokenize(
        df.select(F.col(id_col).alias("doc_id"), text_col),
        text_col,
        stopwords=stopwords,
    )
    return (
        toks.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _joined_distributions(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    id_col: str,
    stopwords,
) -> DataFrame:
    """Union-vocab rows with smoothed probabilities:
    (term, cnt_a, cnt_b, n_a, n_b, v, p_a, p_b)."""
    ca = _term_counts(df_a, text_col, id_col, stopwords).withColumnRenamed(
        "cnt", "cnt_a"
    )
    cb = _term_counts(df_b, text_col, id_col, stopwords).withColumnRenamed(
        "cnt", "cnt_b"
    )
    from bm25s_spark.util import eager_checkpoint as _eager_checkpoint

    # vocab-bounded, but downstream of BOTH corpus tokenizations — the
    # totals broadcast and the main plan each consume it, so without a
    # checkpoint every corpus would be tokenized twice
    joined = _eager_checkpoint(
        ca.join(cb, "term", "full_outer")
        .select(
            "term",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        ),
        reliable=True,
    )
    totals = joined.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
        F.sum((F.col("cnt_a") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("cnt_b") > 0).cast("long")).alias("vocab_b"),
    )
    per = joined.crossJoin(F.broadcast(totals))
    return per.withColumn(
        "p_a", (F.col("cnt_a") + F.lit(1.0)) / (F.col("n_a") + F.col("v"))
    ).withColumn(
        "p_b", (F.col("cnt_b") + F.lit(1.0)) / (F.col("n_b") + F.col("v"))
    )


def term_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    top_t: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords="en",
    round_to: int = 9,
) -> DataFrame:
    """Top term movers between two corpus snapshots →
    (rank, term, cnt_a, cnt_b, p_a, p_b, log_ratio, score) with
    ``score = (p_a − p_b) · ln(p_a / p_b)`` (the per-term Jeffreys
    divergence contribution) ranked (score desc, term asc), top
    ``top_t``.  ``p_a``/``p_b`` are the Laplace-smoothed union-vocab
    unigram probabilities; ``log_ratio = ln(p_a / p_b)`` is positive for
    terms losing mass in B (vanishing) and negative for terms gaining
    (emerging).  Ranking happens on the ROUNDED score so a last-ulp
    ``ln`` difference can never flip the cross-engine order."""
    per = _joined_distributions(df_a, df_b, text_col, id_col, stopwords)
    scored = per.select(
        "term",
        "cnt_a",
        "cnt_b",
        F.round("p_a", round_to).alias("p_a"),
        F.round("p_b", round_to).alias("p_b"),
        F.round(F.log(F.col("p_a") / F.col("p_b")), round_to).alias("log_ratio"),
        F.round(
            (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b")),
            round_to,
        ).alias("score"),
    )
    # orderBy().limit() plans a distributed TakeOrdered (per-partition
    # top-t, then a t-row merge) — a global row_number window would
    # instead sort the entire vocabulary into ONE task; the rank window
    # then only ever sees the ``top_t`` surviving rows
    top = scored.orderBy(F.col("score").desc(), F.col("term").asc()).limit(top_t)
    w = Window.orderBy(F.col("score").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "term", "cnt_a", "cnt_b", "p_a", "p_b", "log_ratio", "score"
    )


def distribution_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords="en",
    round_to: int = 6,
) -> DataFrame:
    """One-row drift summary between two corpus snapshots:
    (n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_union, kl_ab,
    kl_ba, jeffreys) — directed KL divergences of the Laplace-smoothed
    unigram distributions over the union vocabulary, and their sum (the
    symmetric Jeffreys divergence, the number a drift monitor alerts
    on).  Sums of per-term double contributions are order-dependent at
    ~1e-15; ``round_to=6`` absorbs that (the ``corpus_stats`` oracle
    convention)."""
    per = _joined_distributions(df_a, df_b, text_col, id_col, stopwords)
    lr = F.log(F.col("p_a") / F.col("p_b"))
    return per.groupBy().agg(
        F.max("n_a").alias("n_tokens_a"),
        F.max("n_b").alias("n_tokens_b"),
        F.max("vocab_a").alias("vocab_a"),
        F.max("vocab_b").alias("vocab_b"),
        F.max("v").alias("vocab_union"),
        F.round(F.sum(F.col("p_a") * lr), round_to).alias("kl_ab"),
        F.round(F.sum(-F.col("p_b") * lr), round_to).alias("kl_ba"),
        F.round(F.sum((F.col("p_a") - F.col("p_b")) * lr), round_to).alias(
            "jeffreys"
        ),
    )
