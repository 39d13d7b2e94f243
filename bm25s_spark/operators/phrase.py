"""Phrase and proximity search over positional token streams.

The reference engine is bag-of-words only — its index stores (term,
doc) impacts with no positions (``reference/bm25s/__init__.py:432-438``),
so exact-phrase and within-window queries are inexpressible there.
This module adds the classic positional-index operators a full-text
engine's users expect, Spark-first:

- :func:`positional_postings` — (doc_id, pos, term): the positional
  index, one ``posexplode`` over the same Arrow tokenizer the BM25
  build uses.
- :func:`phrase_match` — exact-adjacency phrase occurrences.  The
  match is pure relational algebra: explode the phrase to (j, term)
  offsets, broadcast-join it into the positional postings on ``term``,
  and group by the implied start position ``pos - j`` — a start where
  the offset-hit count equals the phrase length is a full occurrence
  (each offset j can contribute at most one row per (doc, start), so
  the count test is exact even when the phrase repeats a term).
- :func:`phrase_topk` — rank docs per query by occurrence count.
- :func:`proximity_match` — unordered within-``window`` co-occurrence:
  a doc qualifies when some ``window``-token span contains ALL the
  query's distinct terms; anchored at hit positions so the result is
  deterministic and exactly replayable in SQL.

Scale shape (100 TB corpus): the positional explode is a narrow map of
the corpus scan; the query side is batch-sized and **broadcast**; the
phrase aggregation keys on (query, doc, start) with map-side combine,
so shuffle volume is bounded by hit-position counts of the query's
terms — the positional analog of "postings of query terms", never the
corpus.  The proximity self-join is restricted to hit positions of
query terms within one doc and a ``window``-bounded range predicate.
All counts are integers — no float noise in ranking or comparison.

Tokenization note: phrases are positional, so the default keeps
stopwords (``stopwords=None``) — removing them would silently change
adjacency.  Pass the index's tokenizer kwargs to match BM25-side
vocabularies when mixing the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.tokenization import make_tokenizer_udf


def positional_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords=None,
    stemmer: str | None = None,
    token_pattern: str | None = None,
) -> DataFrame:
    """(doc_id, pos, term) — the positional index rows.

    ``pos`` is the 0-based offset in the post-filter token stream (with
    the stopword-keeping default, the raw regex-findall stream, which
    DuckDB's ``regexp_extract_all`` reproduces for the oracle)."""
    kw = dict(stopwords=stopwords, stemmer=stemmer)
    if token_pattern is not None:
        kw["token_pattern"] = token_pattern
    udf = make_tokenizer_udf(**kw)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(udf(F.col(text_col))).alias("pos", "term"),
    )


def _query_offsets(
    queries_df: DataFrame,
    query_id_col: str,
    phrase_col: str,
    tok_kwargs: dict,
) -> DataFrame:
    """(query_id, j, term): the phrase exploded to 0-based offsets.

    Accepts pre-tokenized ``array<string>`` phrase columns verbatim
    (the engine's token-list query convention)."""
    from pyspark.sql.types import ArrayType

    if isinstance(queries_df.schema[phrase_col].dataType, ArrayType):
        token_col = F.col(phrase_col)
    else:
        token_col = make_tokenizer_udf(**tok_kwargs)(F.col(phrase_col))
    return queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(token_col).alias("j", "term"),
    )


def _prefilter_candidate_docs(
    docs: DataFrame,
    queries_df: DataFrame,
    text_col: str,
    query_id_col: str,
    phrase_col: str,
    tok_kwargs: dict,
    require_all: bool,
    max_queries: int = 256,
) -> DataFrame:
    """Cheap JVM substring prefilter ahead of the positional tokenize.

    ``positional_postings`` runs the Python tokenizer over EVERY corpus
    row, but only docs containing the batch's query terms can survive
    the downstream term join — a token present in the post-tokenize
    stream is necessarily a substring of the lowercased raw text, so
    ``instr(lower(text), term) > 0`` is a provable superset filter.
    For a small driver-tokenizable batch this builds
    OR_query(AND_term(contains)) (``require_all``: a phrase needs every
    offset, so AND per query; proximity likewise) as pure codegen'd
    column expressions, cutting the Python-boundary pass to candidate
    rows.  Falls back to no filtering (returns ``docs``) for big/
    non-local batches, a JVM-engine tokenizer spec, or ``lower=False``.
    """
    from pyspark.sql.types import ArrayType

    from bm25s_spark.tokenization import make_local_tokenizer

    if not tok_kwargs.get("lower", True):
        return docs
    pretok = isinstance(queries_df.schema[phrase_col].dataType, ArrayType)
    local_tok = None
    if not pretok:
        try:
            local_tok = make_local_tokenizer(**tok_kwargs)
        except Exception:
            return docs
        if local_tok is None:  # stemmer-less JVM engine: stay distributed
            return docs
        # stemming maps tokens away from their surface form — a stemmed
        # query token need not be a substring of the raw text
        if tok_kwargs.get("stemmer") is not None:
            return docs
    elif tok_kwargs.get("stemmer") is not None:
        return docs
    import pandas as pd

    probe = (
        queries_df.select(phrase_col).limit(max_queries + 1).toPandas()
    )
    if len(probe) > max_queries:
        return docs
    if pretok:
        token_lists = probe[phrase_col]
    else:
        token_lists = local_tok(probe[phrase_col])
    per_query: list[list[str]] = []
    for toks in token_lists:
        terms = sorted({t for t in (toks if toks is not None else [])
                        if t})
        per_query.append(terms)
    lowered = F.lower(F.col(text_col))
    clauses = []
    for terms in per_query:
        if not terms:
            continue  # empty phrase matches nothing — no clause needed
        hits = [F.instr(lowered, F.lit(t)) > 0 for t in terms]
        if require_all:
            clause = hits[0]
            for h in hits[1:]:
                clause = clause & h
        else:
            clause = hits[0]
            for h in hits[1:]:
                clause = clause | h
        clauses.append(clause)
    if not clauses:
        # no query carries any term: nothing can match downstream
        return docs.where(F.lit(False))
    cond = clauses[0]
    for cl in clauses[1:]:
        cond = cond | cl
    return docs.where(cond)


def phrase_match(
    docs: DataFrame,
    queries_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    phrase_col: str = "text",
    stopwords=None,
    stemmer: str | None = None,
    token_pattern: str | None = None,
) -> DataFrame:
    """Exact-adjacency phrase search → (query_id, doc_id, n_matches,
    first_pos) for every doc containing the phrase at least once.

    ``n_matches`` counts distinct start positions (overlapping
    occurrences each count — "big big big" contains "big big" twice);
    ``first_pos`` is the earliest start.  Queries whose phrase
    tokenizes to nothing yield no rows.  Single-term phrases degrade
    to plain occurrence counting, exactly as a positional index does.
    """
    kw = dict(stopwords=stopwords, stemmer=stemmer)
    if token_pattern is not None:
        kw["token_pattern"] = token_pattern
    docs = _prefilter_candidate_docs(docs, queries_df, text_col,
                                     query_id_col, phrase_col, kw,
                                     require_all=True)
    pos = positional_postings(
        docs, text_col, id_col, stopwords, stemmer, token_pattern
    )
    qtok = _query_offsets(queries_df, query_id_col, phrase_col, kw)
    qlen = qtok.groupBy("query_id").agg(F.count(F.lit(1)).alias("_qlen"))
    # each (query_id, j) matches ≤1 position per (doc, start) — positions
    # are unique within a doc — so n_off == qlen ⇔ every offset matched
    starts = (
        F.broadcast(qtok)
        .join(pos, "term")
        .groupBy(
            "query_id", "doc_id", (F.col("pos") - F.col("j")).alias("start")
        )
        .agg(F.count(F.lit(1)).alias("_n_off"))
    )
    full = starts.join(F.broadcast(qlen), "query_id").where(
        F.col("_n_off") == F.col("_qlen")
    )
    return full.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_matches"),
        F.min("start").cast("int").alias("first_pos"),
    )


def phrase_topk(
    docs: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Per-query top-``k`` docs by phrase occurrence count →
    (query_id, rank, doc_id, n_matches, first_pos); ties break
    doc_id-ascending (integer scores — no FP rounding needed)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = phrase_match(docs, queries_df, **kwargs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_matches").desc(), F.col("doc_id").asc()
    )
    return (
        m.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "n_matches", "first_pos")
    )


def proximity_match(
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
) -> DataFrame:
    """Unordered proximity search → (query_id, doc_id, n_windows,
    first_window): docs where ALL the query's distinct terms co-occur
    inside some ``window``-token span.

    Semantics (anchored windows, fully deterministic): for every hit
    position ``p`` of any query term, the span ``[p, p + window)`` is a
    qualifying window iff it contains every distinct query term;
    ``n_windows`` counts qualifying anchors, ``first_window`` is the
    earliest.  The anchor convention makes the operator exactly
    replayable in SQL (and any two engines agree bit-for-bit) while
    "some window contains all terms" ⇔ ``n_windows >= 1``.

    Scale: hits are positions of query terms only (broadcast query
    side); the self-join is per (query, doc) with a range predicate, so
    its output is bounded by hits × window, not positions².
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    kw = dict(stopwords=stopwords, stemmer=stemmer)
    if token_pattern is not None:
        kw["token_pattern"] = token_pattern
    docs = _prefilter_candidate_docs(docs, queries_df, text_col,
                                     query_id_col, phrase_col, kw,
                                     require_all=True)
    pos = positional_postings(
        docs, text_col, id_col, stopwords, stemmer, token_pattern
    )
    qterms = _query_offsets(
        queries_df, query_id_col, phrase_col, kw
    ).select("query_id", "term").distinct()
    nterms = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("_nt"))
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
    full = spans.join(F.broadcast(nterms), "query_id").where(
        F.col("_seen") == F.col("_nt")
    )
    return full.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_windows"),
        F.min("anchor").cast("int").alias("first_window"),
    )
