"""Document chunking for context-window preparation.

Training and retrieval pipelines slice long documents into
fixed-token-budget windows with overlap (RAG passage chunking, LLM
pre-training sequence prep).  ``chunk_documents`` is the deterministic
sliding-window version:

- chunks start every ``chunk_size - overlap`` tokens (the *stride*),
  each chunk is up to ``chunk_size`` whitespace tokens, consecutive
  chunks share ``overlap`` tokens, and every token of the document is
  covered (the last chunk may be shorter);
- ``n_chunks = max(1, ceil((n_tokens - overlap) / stride))`` — one
  chunk for any document that fits the budget, zero rows for
  zero-token documents.

Scale shape: a narrow projection + per-row index ``explode`` — no
shuffle, no UDF, whole-stage codegen; output cardinality is
``Σ n_chunks`` which downstream operators (indexing, embedding)
repartition as they need.  The token array is materialized to a column
before slicing (an inline split-expression inside the per-chunk lambda
would re-evaluate the split per chunk — O(n·chunks) per doc).

The reference engine indexes documents whole; chunking is part of the
beyond-reference training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into ``(doc_id, chunk_id, n_chunks,
    n_tokens, chunk_text)`` sliding windows (see module docstring).
    Original non-``text_col`` columns are dropped — join them back on
    ``id_col`` if needed (keeping them through the explode would
    duplicate every payload column per chunk)."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be > 0, got {chunk_size}")
    if not (0 <= overlap < chunk_size):
        raise ValueError(
            f"overlap must be in [0, chunk_size), got {overlap}"
        )
    stride = chunk_size - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("_toks"),
    ).where(F.size("_toks") > 0)
    n = F.size(F.col("_toks"))
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    out = base.withColumn("_n_chunks", n_chunks).select(
        "doc_id",
        F.col("_n_chunks").alias("n_chunks"),
        "_toks",
        F.explode(
            F.sequence(F.lit(0), F.col("_n_chunks") - F.lit(1))
        ).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * F.lit(stride) + F.lit(1),
        F.lit(chunk_size),
    )
    return out.select(
        "doc_id",
        "chunk_id",
        "n_chunks",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
