"""Streaming exact deduplication with bounded state.

The streaming twin of :func:`~bm25s_spark.operators.dedup.exact_duplicates`:
a training-data ingest stream must drop repeated documents *as they
arrive*, without ever holding the full corpus key set in memory.  The
engine primitive is ``dropDuplicatesWithinWatermark`` — state for a key
is kept only until the event-time watermark passes that key's recorded
timestamp + delay, so state size is bounded by (unique keys per
watermark window), not by stream length.

Contract: a duplicate arriving *within* the watermark delay of its
first occurrence is dropped; one arriving after the first occurrence's
state expired is emitted again (re-dedup across long horizons is the
batch operator's job — the standard lambda split).  Which physical row
survives a same-key tie is arrival-order-dependent in a stream and
partition-order-dependent in batch; downstream must key on the emitted
``dedup_key``, not row identity.

The same function body serves batch DataFrames (plain
``dropDuplicates`` on the key, no watermark), so batch/stream parity —
same kept-key set on the same input — is testable by construction.

Scale shape: one shuffle on the dedup key; the md5 content key is a
pure JVM expression computed before the shuffle, so payload bytes
cross the wire once and state stores only key + timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25s_spark.functions.text import content_md5


def content_key(text_col: str = "text") -> F.Column:
    """md5 of whitespace-normalized, lowercased text — the SAME
    expression as :func:`~bm25s_spark.functions.text.with_fingerprint`'s
    ``fp_md5`` (both call :func:`~bm25s_spark.functions.text.content_md5`,
    so batch fingerprints and streaming dedup keys cannot drift)."""
    return content_md5(F.col(text_col))


def streaming_deduplicate(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] | None = None,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    key_out_col: str = "dedup_key",
) -> DataFrame:
    """Drop rows whose dedup key was already seen.

    ``key_cols`` dedups on existing columns; otherwise the normalized
    md5 of ``text_col`` is appended as ``key_out_col`` and used.  For a
    streaming ``df``, ``ts_col``/``watermark`` bound the key state
    (within-watermark duplicates are dropped, state is evicted after);
    for a batch ``df`` the watermark is irrelevant and the key set is
    exact.
    """
    if key_cols:
        keys = list(key_cols)
    else:
        df = df.withColumn(key_out_col, content_key(text_col))
        keys = [key_out_col]
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


class StreamingNearDeduplicator:
    """Streaming NEAR-duplicate filtering via an accumulated MinHash
    bucket store — the streaming twin of
    :func:`~bm25s_spark.operators.dedup.deduplicate_near`.

    A training-data ingest stream must drop near-copies of *anything it
    has ever admitted*, which no bounded in-memory state can hold — so
    the state lives as a (band, bucket) table on disk (parquet here;
    an Iceberg table on a cluster, where appends are atomic), exactly
    how production minhash pipelines persist signatures.  Per batch:

    1. docs sharing any LSH band-bucket with a PRIOR batch are dropped
       (cross-batch near-dups of already-admitted content);
    2. the remainder runs the full batch near-dedup
       (pairs → connected components → keep component minimum) WITHIN
       the batch;
    3. the band buckets of every *arriving* doc (kept or dropped) are
       appended to the store — a dropped doc's buckets still poison
       future copies of it, which keeps the filter monotone;
    4. survivors are appended to ``<root>/kept``.

    Determinism: signatures and band digests are pure md5 arithmetic
    (``minhash_band_buckets``), so replaying the same batches yields the
    same kept set — pinned by the batch-parity test, which replays the
    identical rule with the batch operators.

    Scale shape: the per-batch work is (batch × store) joined on
    (band, bucket) — a shuffle bounded by the batch's bucket rows on
    one side; the store side prunes to matching buckets only.  No
    executor-memory state; disk state grows one row per (doc, band).
    """

    def __init__(self, spark: SparkSession, root: str,
                 num_hashes: int = 16, bands: int = 4, n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.spark = spark
        self.root = root
        self.num_hashes = num_hashes
        self.bands = bands
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def _p(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _store(self) -> DataFrame | None:
        p = self._p("buckets")
        return self.spark.read.parquet(p) if os.path.isdir(p) else None

    def kept(self) -> DataFrame | None:
        p = self._p("kept")
        return self.spark.read.parquet(p) if os.path.isdir(p) else None

    def process_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        from bm25s_spark.operators.dedup import (
            deduplicate_near,
            minhash_band_buckets,
        )

        batch_df = batch_df.persist()
        buckets = minhash_band_buckets(
            batch_df, self.num_hashes, self.bands, self.n,
            self.text_col, self.id_col,
        ).persist()
        store = self._store()
        if store is not None:
            hit = (
                buckets.join(store, ["band", "bucket"], "left_semi")
                .select("doc_id").distinct()
            )
            fresh = batch_df.join(
                hit.withColumnRenamed("doc_id", self.id_col),
                self.id_col, "left_anti",
            )
        else:
            fresh = batch_df
        survivors = deduplicate_near(
            fresh, num_hashes=self.num_hashes, bands=self.bands, n=self.n,
            text_col=self.text_col, id_col=self.id_col,
        )
        survivors.write.mode("append").parquet(self._p("kept"))
        # append AFTER the semi-join above has been consumed (the write
        # of `kept` forces it), so this batch never matches itself
        buckets.write.mode("append").parquet(self._p("buckets"))
        buckets.unpersist()
        batch_df.unpersist()

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
