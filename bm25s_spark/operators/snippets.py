"""Snippet (keyword-in-context) extraction for search results.

Given queries and documents, pick each document's best ``window``-token
span — the anchored window covering the most distinct query terms,
earliest-anchor tiebreak — and render it with the matched terms
highlighted (``**term**``).  The reference engine returns whole
documents (``reference/bm25s/__init__.py:919-932``); snippets are the
presentation-layer operator every search UI layers on top, and the
anchored-window convention (windows start at hit positions only) makes
the choice fully deterministic and exactly replayable in SQL.

Scale shape: snippets are meant to run on the RESULT set, not the
corpus — join ``docs`` down to the retrieved (query, doc) pairs first
(``for_results``), so the scan is k × batch-sized.  The query side is
broadcast; the best-anchor argmax is a bounded window over hit
positions of query terms only.  The snippet render is pure column
expressions (slice / transform / array_join) on the token array — no
Python beyond the shared Arrow tokenizer.

Tokens are the lowercased regex stream (stopwords kept, the positional
convention of :mod:`bm25s_spark.operators.phrase`), so the rendered
snippet is the normalized token text — the right input for a UI that
re-maps to raw offsets, and the only representation two engines can
agree on byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.operators.phrase import _query_offsets
from bm25s_spark.tokenization import make_tokenizer_udf


def snippets(
    docs: DataFrame,
    queries_df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    phrase_col: str = "text",
    stopwords=None,
    stemmer: str | None = None,
    token_pattern: str | None = None,
    mark: str = "**",
) -> DataFrame:
    """(query_id, doc_id, n_hit_terms, anchor, snippet) — one row per
    (query, doc) with ≥1 query-term hit.

    ``n_hit_terms`` is the number of distinct query terms inside the
    chosen window; ``anchor`` its 0-based token offset; ``snippet`` the
    window's tokens space-joined with hit terms wrapped in ``mark``.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    kw = dict(stopwords=stopwords, stemmer=stemmer)
    if token_pattern is not None:
        kw["token_pattern"] = token_pattern
    udf = make_tokenizer_udf(**kw)
    base = docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("_toks")
    )
    pos = base.select(
        "doc_id", F.posexplode(F.col("_toks")).alias("pos", "term")
    )
    qterms = _query_offsets(queries_df, query_id_col, phrase_col, kw).select(
        "query_id", "term"
    ).distinct()
    hits = F.broadcast(qterms).join(pos, "term").select(
        "query_id", "doc_id", "term", "pos"
    )
    a = hits.alias("a")
    b = hits.alias("b")
    spans = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") >= F.col("a.pos"))
            & (F.col("b.pos") < F.col("a.pos") + window),
        )
        .groupBy(
            F.col("a.query_id").alias("query_id"),
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.pos").alias("anchor"),
        )
        .agg(F.count_distinct(F.col("b.term")).alias("_seen"))
    )
    w = Window.partitionBy("query_id", "doc_id").orderBy(
        F.col("_seen").desc(), F.col("anchor").asc()
    )
    best = (
        spans.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_id", "doc_id", "_seen", "anchor")
    )
    # per-query term arrays for the highlight membership test (batch-sized)
    qarr = qterms.groupBy("query_id").agg(
        F.collect_set("term").alias("_qarr")
    )
    toks = F.slice(F.col("_toks"), F.col("anchor") + 1, window)
    marked = F.transform(
        toks,
        lambda t: F.when(
            F.array_contains(F.col("_qarr"), t),
            F.concat(F.lit(mark), t, F.lit(mark)),
        ).otherwise(t),
    )
    return (
        best.join(base, "doc_id")
        .join(F.broadcast(qarr), "query_id")
        .select(
            "query_id",
            "doc_id",
            F.col("_seen").cast("int").alias("n_hit_terms"),
            F.col("anchor").cast("int").alias("anchor"),
            F.array_join(marked, " ").alias("snippet"),
        )
    )


def snippets_for_results(
    index,
    results: DataFrame,
    queries_df: DataFrame,
    window: int = 8,
    query_id_col: str = "query_id",
    phrase_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Snippets restricted to a retrieval result set: joins the index's
    ``doc_map`` payload down to the (query, doc) pairs in ``results``
    first, so only k × batch documents are ever tokenized — the 100 TB
    usage pattern.  Returns (query_id, rank, doc_id, score, n_hit_terms,
    anchor, snippet); result rows whose doc has no query-term hit keep
    null snippet columns (outer join)."""
    if index.doc_map is None:
        raise ValueError("index was built with keep_doc_map=False")
    pairs = results.select(query_id_col, "rank", "doc_id", "score")
    docs = index.doc_map.join(
        F.broadcast(pairs.select("doc_id").distinct()), "doc_id"
    )
    snips = snippets(
        docs, queries_df, window=window,
        query_id_col=query_id_col, phrase_col=phrase_col, **kwargs,
    )
    return pairs.join(snips, [query_id_col, "doc_id"], "left")
