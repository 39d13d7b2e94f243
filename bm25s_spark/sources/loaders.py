"""Corpus loaders: files → the canonical transcripts shape.

The reference's high-level loader accepts TXT (one doc per line), CSV,
JSON and JSONL with a selectable text column
(``reference/bm25s/high_level/__init__.py:177-252``).  Here each becomes
a Spark reader producing the canonical transcripts schema — every loaded
document is a single-turn conversation, so the whole engine (doc
identity, indexing, retrieval) applies uniformly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _to_transcripts(df: DataFrame, text_col: str) -> DataFrame:
    """Wrap arbitrary rows as single-turn transcripts; conv ids follow
    file order via a scalable dense rank on a monotonic id."""
    from bm25s_spark.ids import assign_dense_ids

    base = df.withColumn("_mid", F.monotonically_increasing_id())
    ranked = assign_dense_ids(base, ["_mid"], "_rank")
    return ranked.select(
        F.format_string("conv-%09d", F.col("_rank")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col(text_col).cast("string").alias("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def load_txt(spark: SparkSession, path: str) -> DataFrame:
    """One document per line (reference: ``high_level/__init__.py:214-222``)."""
    return _to_transcripts(spark.read.text(path), "value")


def load_csv(spark: SparkSession, path: str, text_col: str = "text",
             header: bool = True) -> DataFrame:
    return _to_transcripts(
        spark.read.option("header", str(header).lower()).csv(path), text_col
    )


def load_json(spark: SparkSession, path: str, text_col: str = "text") -> DataFrame:
    """JSON / JSONL (Spark's json reader handles both line-delimited and
    multiline with the option)."""
    return _to_transcripts(spark.read.json(path), text_col)


def load_any(spark: SparkSession, path: str, text_col: str = "text") -> DataFrame:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".txt", ".text"):
        return load_txt(spark, path)
    if ext == ".csv":
        return load_csv(spark, path, text_col)
    if ext in (".json", ".jsonl", ".ndjson"):
        return load_json(spark, path, text_col)
    if ext == ".parquet":
        return _to_transcripts(spark.read.parquet(path), text_col)
    raise ValueError(f"unsupported corpus extension {ext!r} for {path}")
