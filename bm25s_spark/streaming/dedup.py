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

from pyspark.sql import DataFrame
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
