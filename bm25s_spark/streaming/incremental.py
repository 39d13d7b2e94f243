"""Incremental indexing via Structured Streaming ``foreachBatch``.

The reference's ``streaming_tokenize`` (a Python generator with
``update_vocab`` modes True/False/"never"/"if_empty",
``reference/bm25s/tokenization.py:273-365``) maps onto micro-batch
ingestion: each batch of new transcript turns is tokenized with the same
UDF, assigned doc_ids *after* the current high-water mark, and appended
to the postings/doc_lens tables; the vocab table grows (or not)
according to ``update_vocab``.

Impact staleness: BM25 impacts depend on the global ``avg_doc_len``/
``df``/``num_docs``, so appended postings store (tf, dl) and the
*stats epoch* they were scored under; a ``reindex_impacts`` pass
(cheap column arithmetic, no re-tokenization) refreshes impacts when
drift exceeds a threshold.  The reference has the same limitation —
its index is immutable after ``index()`` (SURVEY.md §7 hard-part 5);
we document and manage the drift instead of silently ignoring it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25s_spark.tokenization import make_tokenizer_udf


class IncrementalIndexer:
    """Append-only micro-batch index maintenance over parquet dirs
    (Iceberg tables on a cluster — same calls modulo format).

    Directory layout:
        <root>/raw_postings/   (doc_id, term, tf, dl)  — append per batch
        <root>/doc_lens/       (doc_id, dl)            — append per batch
        <root>/vocab/          (term)                  — union per batch
    """

    def __init__(self, spark: SparkSession, root: str,
                 update_vocab: str | bool = True, **tokenizer_kwargs):
        if update_vocab not in (True, False, "never", "if_empty"):
            raise ValueError(f"invalid update_vocab {update_vocab!r}")
        self.spark = spark
        self.root = root
        self.update_vocab = update_vocab
        self.tokenizer_kwargs = tokenizer_kwargs
        self._udf = make_tokenizer_udf(**tokenizer_kwargs)

    # paths -----------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _exists(self, name: str) -> bool:
        return os.path.isdir(self._p(name))

    def _high_water(self) -> int:
        if not self._exists("doc_lens"):
            return 0
        row = self.spark.read.parquet(self._p("doc_lens")).agg(
            F.max("doc_id").alias("m")
        ).collect()[0]
        return (row["m"] + 1) if row["m"] is not None else 0

    def vocab(self) -> DataFrame | None:
        return (
            self.spark.read.parquet(self._p("vocab"))
            if self._exists("vocab") else None
        )

    # ingestion --------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch sink: tokenize, id-assign past the high-water
        mark, append postings/doc_lens, maintain vocab per update_vocab."""
        from bm25s_spark.ids import assign_dense_ids

        base = assign_dense_ids(batch_df, ["conv_id", "turn_idx"], "_rank")
        offset = self._high_water()
        toks = base.select(
            (F.col("_rank") + offset).alias("doc_id"),
            self._udf(F.col("text")).alias("tokens"),
        ).withColumn("dl", F.size("tokens")).persist()

        from bm25s_spark.indexer import narrow_tf

        known_vocab = self.vocab()
        # one tiny agg on the persisted batch: lets narrow_tf skip the
        # megadoc union branch for turn-sized micro-batches
        mx = toks.agg(F.max("dl").alias("m")).collect()[0]["m"]
        tf = narrow_tf(toks, max_doc_len=int(mx or 0))
        uv = self.update_vocab
        # reference semantics (reference/bm25s/tokenization.py:273-365):
        # a batch that does not update the vocab drops every out-of-vocab
        # term — including the degenerate "never with an empty vocab"
        # case, where everything is dropped
        updates_vocab = uv is True or (uv == "if_empty" and known_vocab is None)
        if not updates_vocab:
            vocab_df = known_vocab if known_vocab is not None else (
                self.spark.createDataFrame([], "term string")
            )
            tf = tf.join(F.broadcast(vocab_df), "term", "left_semi")
        tf.write.mode("append").parquet(self._p("raw_postings"))
        toks.select("doc_id", "dl").write.mode("append").parquet(self._p("doc_lens"))

        if updates_vocab:
            new_terms = tf.select("term").distinct()
            if known_vocab is not None:
                new_terms = new_terms.join(known_vocab, "term", "left_anti")
            new_terms.write.mode("append").parquet(self._p("vocab"))
        toks.unpersist()

    def attach(self, stream_df: DataFrame, checkpoint: str, trigger_once: bool = True):
        """Wire onto a streaming DataFrame of transcript turns."""
        writer = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # finalize ---------------------------------------------------------
    def to_index(self, k1: float = 1.5, b: float = 0.75, delta: float = 0.5):
        """Score the accumulated raw postings under the *current* global
        stats → a queryable BM25Index (the epoch-refresh pass)."""
        from bm25s_spark import scoring
        from bm25s_spark.ids import assign_dense_ids
        from bm25s_spark.indexer import BM25Index, IMPACT_COLS, NNOC_COLS
        from bm25s_spark.scoring import METHODS

        spark = self.spark
        doc_lens = spark.read.parquet(self._p("doc_lens"))
        agg = doc_lens.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        num_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)
        tf = spark.read.parquet(self._p("raw_postings"))
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        empty_row = spark.range(1).select(
        F.lit("").alias("term"), F.lit(0).cast("long").alias("df")
    )  # JVM-native one-row relation: createDataFrame(rows) would put a
    # Python-worker scan into every downstream postings/save plan
        vocab = dfreq.unionByName(empty_row).groupBy("term").agg(F.max("df").alias("df"))
        term_stats = assign_dense_ids(vocab, ["term"], "term_id")
        for m, col in NNOC_COLS.items():
            term_stats = term_stats.withColumn(
                col,
                F.when(
                    F.col("df") > 0,
                    scoring.nnoc_expr(m, m, F.col("df"), num_docs, avgdl, k1, b, delta),
                ).otherwise(F.lit(0.0)),
            )
        postings = tf.join(term_stats.select("term", "term_id", "df"), "term")
        for m in METHODS:
            postings = postings.withColumn(
                IMPACT_COLS[m],
                scoring.impact_expr(
                    m, m, F.col("tf"), F.col("dl"), F.col("df"),
                    num_docs, avgdl, k1, b, delta,
                ).cast("double"),
            )
        from bm25s_spark.indexer import auto_docs_per_shard

        return BM25Index(
            spark=spark, postings=postings, term_stats=term_stats,
            doc_lens=doc_lens, doc_map=None,
            num_docs=num_docs, avg_doc_len=avgdl,
            k1=k1, b=b, delta=delta,
            tokenizer_kwargs=self.tokenizer_kwargs,
            docs_per_shard=auto_docs_per_shard(
                num_docs, spark.sparkContext.defaultParallelism
            ),
        )
