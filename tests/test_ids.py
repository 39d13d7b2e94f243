"""Dense-ID assignment: rank correctness + cache lifecycle.

The distributed path persists its input only to keep the range
partitioner's sampling pass and the exchange's map stage (two traversals
inside one job) from evaluating the source twice; once the post-exchange
stage is materialized every recompute path reads the reused shuffle map
output, so the input cache must be released immediately — not held for
the caller's (or the index's) lifetime.
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
    ).distinct()


def test_dense_ids_equal_global_rank(spark):
    df = _corpus(spark)
    out = assign_dense_ids(df, ["ka", "kb"], "rid")
    rows = out.orderBy("ka", "kb").collect()
    assert [r["rid"] for r in rows] == list(range(len(rows)))


def test_input_cache_released_after_assignment(spark):
    df = _corpus(spark)
    assert df.storageLevel == StorageLevel.NONE
    out = assign_dense_ids(df, ["ka", "kb"], "rid")
    # assign_dense_ids materializes its counts job internally; by the
    # time it returns, the input persist it created must be gone while
    # the result still computes correctly from the shuffle output
    assert df.storageLevel == StorageLevel.NONE
    rows = out.orderBy("rid").collect()
    assert [r["rid"] for r in rows] == list(range(len(rows)))
    out.unpersist()


def test_caller_persisted_input_left_alone(spark):
    df = _corpus(spark).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        assert df.storageLevel != StorageLevel.NONE
        out = assign_dense_ids(df, ["ka", "kb"], "rid")
        out.count()
        # a cache the caller owns is never torn down by the helper
        assert df.storageLevel != StorageLevel.NONE
    finally:
        df.unpersist()
