"""Benchmark decontamination for training-data pipelines.

A training document is *contaminated* when it shares at least
``min_hits`` distinct word n-grams with any example of an evaluation
benchmark — the standard n-gram-collision decontamination rule used by
the GPT-3 (13-gram), PaLM, and Llama data pipelines.  The reference
engine (a retrieval library) has no decontamination surface; this
module implements the beyond-reference training-data-pipeline mandate.

Scale shape (designed for a 100 TB corpus vs kilobyte–megabyte eval
sets):

- The *benchmark* side is exploded to its distinct n-grams once and
  **broadcast** — eval sets are thousands of examples, so the n-gram
  set is a few MB and the join is a broadcast hash join (no shuffle of
  the corpus side, no skew exposure).
- The *corpus* side is a narrow projection + per-doc n-gram explode.
  Only n-grams that hit the broadcast set survive the join, so the
  ``groupBy(doc_id)`` aggregation shuffles contaminated hits only —
  a vanishing fraction of corpus rows — with map-side partial
  aggregation.
- ``decontaminate`` finishes with a single ``left_anti`` join against
  the (small) contaminated-id set, which AQE turns into a broadcast.

Determinism: n-grams are plain normalized-text word windows (no
hashing, no RNG), so results are stable across runs, partitions, and
engines — the DuckDB correctness oracle replays the identical logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark.operators.dedup import word_shingles


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """One row per contaminated document: ``(doc_id, n_shared_ngrams,
    n_bench_docs)`` — the number of distinct word ``n``-grams the
    document shares with the benchmark, and how many distinct benchmark
    examples it collides with.  Only documents with
    ``n_shared_ngrams >= min_hits`` are returned.

    ``broadcast_benchmark=False`` falls back to a shuffle join for the
    (unusual) case of a benchmark too large to broadcast.
    """
    doc_sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    bench_sh = word_shingles(
        benchmark, n=n, text_col=bench_text_col, id_col=bench_id_col
    ).withColumnRenamed("doc_id", "_bench_id")
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    return (
        doc_sh.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct("_bench_id").alias("n_bench_docs"),
        )
        .where(F.col("n_shared_ngrams") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Drop every contaminated document (same schema as ``docs``)."""
    rep = contamination_report(
        docs, benchmark, n=n, min_hits=min_hits,
        text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col, bench_id_col=bench_id_col,
        broadcast_benchmark=broadcast_benchmark,
    )
    return docs.join(
        rep.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_anti"
    )
