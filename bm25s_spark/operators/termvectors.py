"""Term vectors: the per-document view of the inverted index — for a
requested set of documents, every indexed term with its in-doc
frequency, corpus document frequency, and IDF (the Elasticsearch
``_termvectors`` API / Lucene ``TermVectors`` reader).

The reference stores this information only term-major (CSC posting
arrays, ``reference/bm25s/scoring.py:238-309``); a debugging / feature-
extraction workflow wants it doc-major: "what terms does THIS doc
contribute to the index, and how discriminative are they".

Scale shape: the requested doc set is user-query-sized — **broadcast**
it into one join against the corpus-sized ``postings`` table (Catalyst
prunes the scan to the (doc_id, term, tf, df) columns; the impact
columns are never read).  No shuffle at corpus size; output cardinality
is Σ distinct-terms-per-requested-doc.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark import scoring
from bm25s_spark.indexer import BM25Index


def term_vectors(
    index: BM25Index,
    doc_ids: DataFrame | Sequence[int],
    idf_method: str = "lucene",
    round_to: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, term) statistics → (doc_id, term, tf, df, idf).

    ``doc_ids`` is a DataFrame carrying ``id_col`` or a plain sequence
    of ids.  ``idf_method`` picks the IDF variant reported (any of the
    engine's five); ``round_to`` rounds it for cross-engine comparison.
    Unknown doc ids simply yield no rows (inner-join contract).
    """
    if idf_method not in scoring.METHODS:
        raise ValueError(f"unknown idf_method {idf_method!r}")
    if isinstance(doc_ids, DataFrame):
        wanted = doc_ids.select(F.col(id_col).alias("doc_id")).distinct()
    else:
        wanted = index.spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long"
        ).distinct()
    idf = scoring.idf_expr(idf_method, F.col("df"), index.num_docs)
    if round_to is not None:
        idf = F.round(idf, round_to)
    return (
        F.broadcast(wanted)
        .join(index.postings.select("doc_id", "term", "tf", "df"), "doc_id")
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            idf.cast("double").alias("idf"),
        )
    )
