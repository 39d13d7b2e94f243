"""Streaming percolation: continuous alerting over a document stream.

The streaming twin of :func:`~bm25s_spark.operators.percolate.percolate`
— standing queries are registered once, every arriving micro-batch of
documents is matched against them inside ``foreachBatch``, and the hits
are appended to a durable alerts table.  This is the deployment shape
of the Elasticsearch percolator / Lucene Monitor: ingestion keeps
flowing, alerts accrue.

Percolation is stateless per document (a doc either fires a stored
query or it doesn't — no cross-batch state at all), so unlike streaming
dedup there is no state store to bound: the per-batch work is exactly
the batch operator (tokenize once, broadcast the stored-query term
table, one aggregation), and batch/stream parity holds by construction
because the SAME function body runs in both.

Scale shape per micro-batch: documents tokenize in one Arrow-UDF pass
and explode to (doc, term); the stored-query side — thousands of
alerts, vocabulary-sized at worst — is computed ONCE at construction,
persisted, and broadcast into every batch, so a stream of any length
pays the query-tokenization cost exactly once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingPercolator:
    """Match a document stream against stored queries, appending hits
    (doc_id, query_id, n_matched, n_terms, batch_id) to
    ``<root>/alerts``.

    ``stored_queries_df`` carries (query_id, text); it is resolved to
    its distinct post-tokenizer term table eagerly so micro-batches
    never re-tokenize the queries.  ``min_should_match`` follows the
    batch operator's contract (None = all terms must match; integer m =
    at least m).  ``tokenizer_kwargs`` should be the index's own, so
    alerts stay consistent with retrieval.
    """

    def __init__(
        self,
        spark: SparkSession,
        stored_queries_df: DataFrame,
        root: str,
        min_should_match: int | None = None,
        tokenizer_kwargs: dict | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        query_id_col: str = "query_id",
        query_text_col: str = "text",
    ):
        self.spark = spark
        self.root = root
        self.min_should_match = min_should_match
        self.tokenizer_kwargs = tokenizer_kwargs or {}
        self.text_col = text_col
        self.id_col = id_col
        # tokenize the stored queries ONCE; persist the tiny term table
        from bm25s_spark.tokenization import tokenize

        self._qtoks = (
            tokenize(
                stored_queries_df.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(query_text_col).alias("_qt"),
                ),
                text_col="_qt", **self.tokenizer_kwargs,
            )
            .select(
                "query_id", F.explode(F.array_distinct("tokens")).alias("term")
            )
            .distinct()
            .persist()
        )
        self._qlen = (
            self._qtoks.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_terms"))
            .persist()
        )

    def close(self) -> None:
        """Release the persisted stored-query tables."""
        for df in (self._qtoks, self._qlen):
            try:
                df.unpersist()
            except Exception:
                pass

    def alerts(self) -> DataFrame | None:
        p = os.path.join(self.root, "alerts")
        return self.spark.read.parquet(p) if os.path.isdir(p) else None

    def process_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        from bm25s_spark.tokenization import tokenize

        dtoks = tokenize(
            batch_df.select(
                F.col(self.id_col).alias("doc_id"), F.col(self.text_col)
            ),
            text_col=self.text_col, **self.tokenizer_kwargs,
        ).select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
        matched = (
            dtoks.join(F.broadcast(self._qtoks), "term")
            .groupBy("doc_id", "query_id")
            .agg(F.count(F.lit(1)).alias("n_matched"))
            .join(F.broadcast(self._qlen), "query_id")
        )
        need = (
            F.col("n_terms") if self.min_should_match is None
            else F.lit(int(self.min_should_match))
        )
        hits = matched.where(F.col("n_matched") >= need).select(
            "doc_id", "query_id", "n_matched", "n_terms",
            F.lit(int(batch_id)).alias("batch_id"),
        )
        hits.write.mode("append").parquet(os.path.join(self.root, "alerts"))

    def attach(self, stream_df: DataFrame, checkpoint: str,
               trigger_once: bool = True):
        """Wire onto a streaming DataFrame of documents."""
        writer = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
