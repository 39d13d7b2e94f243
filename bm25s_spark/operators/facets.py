"""Faceted search: per-query aggregation of retrieval results over a
document metadata dimension (role, language, source, date bucket, …).

The reference returns flat (doc, score) arrays and leaves slicing to the
caller (``reference/bm25s/__init__.py:919-932`` materializes corpus
payloads positionally); a search UI or analytics pipeline over
transcripts wants "of my top 50 hits, how many are user turns vs tool
output" — one aggregation over the (tiny) result set joined to the doc
metadata.

Scale shape: the result set is queries × k rows — broadcast it into the
metadata join (the corpus-sized side streams map-side, no shuffle), then
one hash aggregation on (query, facet) whose cardinality is bounded by
queries × distinct-facets.  Nothing here scales with corpus size except
the single metadata scan, and when the metadata side is an index
``doc_map`` stored as parquet, Catalyst prunes the scan to
(id, facet) columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame,
    docs: DataFrame,
    facet_col: str,
    top_n: int | None = None,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    score_col: str | None = None,
) -> DataFrame:
    """Count retrieval hits per (query, facet value) → (query_id, facet,
    n_docs[, sum_score], rank).

    ``results`` is any retrieval output carrying (query_id, doc_id);
    ``docs`` maps ``id_col`` → ``facet_col`` (extra columns ignored).  A
    null facet value counts under facet NULL; a hit whose doc has no
    metadata row at all is dropped (retrieval hits come from the index,
    so the doc_map/metadata side covers them by construction — keeping
    the join INNER is what lets the tiny result set broadcast while the
    corpus-sized metadata streams map-side; a left join would force the
    big side into the broadcast).  ``top_n`` keeps the n most-populated
    facets per query (ties break facet-ascending, nulls last);
    ``score_col`` additionally sums that result column per facet.
    """
    if top_n is not None and top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    sel = [F.col(query_id_col).alias("query_id"), F.col(id_col).alias("doc_id")]
    if score_col is not None:
        sel.append(F.col(score_col).cast("double").alias("_score"))
    hits = results.select(*sel)
    meta = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    if score_col is not None:
        aggs.append(F.sum("_score").alias("sum_score"))
    counts = (
        F.broadcast(hits)
        .join(meta, "doc_id")
        .groupBy("query_id", "facet")
        .agg(*aggs)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_docs").desc(), F.col("facet").asc_nulls_last()
    )
    ranked = counts.withColumn("rank", F.row_number().over(w).cast("int"))
    if top_n is not None:
        ranked = ranked.where(F.col("rank") <= top_n)
    cols = ["query_id", "facet", "n_docs"]
    if score_col is not None:
        cols.append("sum_score")
    return ranked.select(*cols, "rank")


def stats_facet(
    results: DataFrame,
    docs: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    round_to: int | None = None,
) -> DataFrame:
    """Numeric summary of a metadata column over each query's hits →
    (query_id, n_docs, min, max, sum, avg) — the Elasticsearch
    ``stats`` aggregation ("how long are the turns this query surfaces",
    "what value range do the matching events span").

    Same shape and inner-join contract as :func:`facet_counts`: the
    query-bounded hit set broadcasts into the metadata join, one
    map-side pass over the corpus-sized side, one hash aggregation
    bounded by query count.  Hits whose doc has a NULL value still
    count in ``n_docs`` but are ignored by min/max/sum/avg (SQL
    aggregate semantics, identical in both engines).  ``round_to``
    rounds sum and avg (cross-engine float stability).
    """
    hits = results.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("doc_id")
    )
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("_v"),
    )
    out = (
        F.broadcast(hits)
        .join(meta, "doc_id")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("_v").alias("min"),
            F.max("_v").alias("max"),
            F.sum("_v").alias("sum"),
            F.avg("_v").alias("avg"),
        )
    )
    if round_to is not None:
        out = out.withColumn("sum", F.round("sum", round_to)).withColumn(
            "avg", F.round("avg", round_to)
        )
    return out


def date_histogram(
    results: DataFrame,
    docs: DataFrame,
    ts_col: str = "ts",
    interval: str = "hour",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query hit counts over time buckets → (query_id, bucket,
    n_docs) — the Elasticsearch ``date_histogram`` aggregation ("when
    did the conversations matching this query happen").

    ``docs`` maps ``id_col`` → ``ts_col`` (a timestamp); ``interval``
    is any ``date_trunc`` unit (``hour``, ``day``, ``week``, ``month``,
    ``quarter``, ``year``, …).  Buckets are truncation-aligned calendar
    buckets; only non-empty buckets are returned (a plotting layer
    zero-fills gaps — keeping the relation sparse is what scales).
    Same scale shape and inner-join contract as :func:`facet_counts`:
    the query-bounded hit set broadcasts into the metadata join, one
    map-side pass over the corpus-sized side, then a hash aggregation
    bounded by queries × buckets.
    """
    hits = results.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("doc_id")
    )
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.date_trunc(interval, F.col(ts_col)).alias("bucket"),
    )
    return (
        F.broadcast(hits)
        .join(meta, "doc_id")
        .groupBy("query_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
