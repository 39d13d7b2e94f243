"""Dense-ID assignment: rank correctness + cache lifecycle.

The distributed path persists its input (when the caller has not) so
the range partitioner's sampling pass and the exchange's map stage —
two traversals inside one job — evaluate the source once.  The persist
deliberately lands on the CALLER's DataFrame object and is retained:
later consumers of the same input frame (multiple index builds over
one corpus, metadata pulls, analytics passes) read the cache instead of
recomputing the source.  Releasing it early was tried and measured a
4×-corpus regression on corpus-rescanning steps, so retention is pinned
here as a contract.
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel

from bm25s_spark.ids import assign_dense_ids


def _corpus(spark, n=500):
    from pyspark.sql import functions as F

    # non-trivial order key, deliberately generated out of order
    return spark.range(n).select(
        F.format_string("c-%03d", (F.lit(n - 1) - F.col("id")) % 97).alias("ka"),
        (F.col("id") * 7 % 1013).alias("kb"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("payload"),
    )


def test_dense_ids_equal_global_rank(spark):
    df = _corpus(spark)
    out = assign_dense_ids(df, ["ka", "kb"], "rid")
    rows = out.orderBy("ka", "kb").collect()
    assert [r["rid"] for r in rows] == list(range(len(rows)))
    df.unpersist()


def test_input_cache_retained_and_tracked(spark):
    df = _corpus(spark)
    assert df.storageLevel == StorageLevel.NONE
    tracked: list = []
    out = assign_dense_ids(df, ["ka", "kb"], "rid", persisted_out=tracked)
    out.count()
    # the helper's persist lands on the caller's frame and STAYS: later
    # consumers of the same df reuse the cache (releasing it early was a
    # measured 4x-corpus regression); the tracking list carries it so an
    # owning lifecycle (e.g. BM25Index.unpersist) can release it
    assert df.storageLevel != StorageLevel.NONE
    assert any(t is df for t in tracked)
    for t in tracked:
        t.unpersist()
    assert df.storageLevel == StorageLevel.NONE


def test_caller_persisted_input_left_alone(spark):
    df = _corpus(spark).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        assert df.storageLevel != StorageLevel.NONE
        tracked: list = []
        out = assign_dense_ids(df, ["ka", "kb"], "rid", persisted_out=tracked)
        out.count()
        # a cache the caller owns is never re-persisted or torn down by
        # the helper, and never enters the helper's tracking list
        assert df.storageLevel != StorageLevel.NONE
        assert not any(t is df for t in tracked)
    finally:
        df.unpersist()
