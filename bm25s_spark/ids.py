"""Scalable dense-ID assignment (0-based ranks under a total order).

``row_number() OVER (ORDER BY ...)`` collapses to a single-partition
window — a non-starter at 10^12 rows.  The scalable equivalent: range
repartition on the order key, sort within partitions, ``zipWithIndex``
(which computes per-partition counts in one lightweight job, then assigns
globally contiguous offsets).  Ids are deterministic because the order is
total (keys are unique), regardless of partition boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def assign_dense_ids(df: DataFrame, order_cols: list[str], id_col: str) -> DataFrame:
    """Append ``id_col`` = rank of the row in the global ``order_cols``
    order (0-based, contiguous). Requires ``order_cols`` to be a unique key."""
    spark = df.sparkSession
    sorted_df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    schema = sorted_df.schema
    rdd = sorted_df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    out_schema = StructType(list(schema.fields) + [StructField(id_col, LongType(), False)])
    return spark.createDataFrame(rdd, out_schema)


def assign_doc_ids(df: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """Doc identity rule for transcripts (FIXTURES.md §1): one document per
    turn, ``doc_id`` = rank under ``(conv_id, turn_idx)`` — the positional
    doc id of the reference's stably-ordered corpus (SURVEY.md §1.3)."""
    if order_cols is None:
        order_cols = ["conv_id", "turn_idx"]
    return assign_dense_ids(df, order_cols, "doc_id")
