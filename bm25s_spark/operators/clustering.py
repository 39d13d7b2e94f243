"""Document clustering over an embedding column + cluster labeling —
the corpus-taxonomy tool for a training-data pipeline (what topics are
in this 100 TB crawl, in what proportions, and which labels describe
each cluster).

The pieces compose from machinery that is already oracle-proven
elsewhere: the deterministic driver-side spherical k-means trainer and
its hash-uniform corpus sample (``operators/similarity.py``, IVF), one
Arrow-batched matmul per partition for assignment (LSH/IVF pattern),
and inverted-index-style doc-frequency aggregation for labels.

Determinism contract (mirrors ``operators/mmr.py``): similarities are
rounded to ``round_to`` BEFORE the argmax, ties broken by lowest
cluster id — so FP noise below the rounding granularity can never flip
an assignment, and a SQL twin computing cosine in a different
summation order agrees exactly.

Scale shape: centroids are a (k × dim) broadcast (k is small by
definition of a taxonomy); assignment is one narrow map pass over the
corpus — no shuffle; labeling shuffles (doc_id → cluster) once and
aggregates (cluster, term) with map-side combine, vocab-bounded
output.  Nothing corpus-sized reaches the driver; the k-means sample
is hash-uniform and bounded (``train_sample``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_cluster_centroids(
    emb_df: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 4096,
) -> np.ndarray:
    """Deterministic spherical k-means centroids from a hash-uniform
    bounded sample of the corpus (reuses the IVF trainer —
    ``similarity._train_ivf_centroids`` — including its
    content-hash-ordered sample, so time-ordered or source-clustered
    corpora don't bias the centroids).  Returns a unit-row (k × dim)
    float64 matrix."""
    from bm25s_spark.operators.similarity import _train_ivf_centroids

    c = emb_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    cent = _train_ivf_centroids(c, n_clusters, seed, train_sample)
    if cent is None:
        raise ValueError("cannot train centroids on an empty corpus")
    return cent


def cluster_assign(
    emb_df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Assign every embedding to its nearest centroid by cosine →
    (``id_col``, cluster, sim).

    ``centroids``: (k × dim) array-like — learned
    (:func:`train_cluster_centroids`) or fixed/externally-provided (the
    "apply a trained quantizer" path).  Cosine is computed as
    dot/(‖x‖·‖c‖) in one Arrow-batched matmul per partition against the
    broadcast centroid matrix; a zero vector has similarity 0.0 to
    every centroid and lands in cluster 0 via the tie rule.  ``sim`` is
    the rounded value the argmax saw (the determinism contract above).
    """
    cent = np.asarray(centroids, dtype=np.float64)
    if cent.ndim != 2 or cent.shape[0] < 1:
        raise ValueError(f"centroids must be a (k, dim) matrix, got {cent.shape}")
    cnorm = np.maximum(np.linalg.norm(cent, axis=1), 1e-12)
    out_schema = f"{id_col} long, cluster int, sim double"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            xn = np.maximum(np.linalg.norm(x, axis=1), 1e-12)
            sims = np.round(
                (x @ cent.T) / (xn[:, None] * cnorm[None, :]), round_to
            )
            best = np.argmax(sims, axis=1)  # first max == lowest cluster id
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "cluster": best.astype(np.int32),
                "sim": sims[np.arange(len(best)), best],
            })

    return emb_df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def cluster_summary(assign_df: DataFrame, round_to: int = 6) -> DataFrame:
    """Per-cluster size and cohesion → (cluster, n_docs, avg_sim,
    min_sim): the corpus-mix report (which topics dominate, which
    clusters are tight vs ragged).  One map-side-combined aggregation.
    """
    return (
        assign_df.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("sim"), round_to).alias("avg_sim"),
            F.round(F.min("sim"), round_to).alias("min_sim"),
        )
    )


def cluster_keywords(
    assign_df: DataFrame,
    docs_df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    top_t: int = 10,
    min_cluster_df: int = 2,
    stopwords="en",
    round_to: int = 6,
) -> DataFrame:
    """Label each cluster with its most characteristic terms →
    (cluster, rank, term, cluster_df, score).

    Per (cluster, term): ``score = (cluster_df / n_c) ·
    ln((N + 1) / (df + 1))`` — the in-cluster doc-coverage rate times a
    smoothed corpus IDF, i.e. tf-idf lift at document granularity
    (terms that are common inside the cluster but rare overall).
    ``assign_df`` joins on ``doc_id_col`` = the assignment id column's
    values, so the embedding ids must be the document ids.  Terms come
    from the engine tokenizer (lowercase → ``\\w\\w+`` → stopword
    filter), distinct per document; ``min_cluster_df`` drops one-off
    terms.  Ranking is (score desc, term asc), top ``top_t`` per
    cluster.

    All inputs to the score are integer counts, so the double
    arithmetic is identical in any engine that spells the same
    ``ln`` — the same exactness trick as the JLH significant-terms
    oracle."""
    from bm25s_spark.tokenization import tokenize

    toks = tokenize(
        docs_df.select(doc_id_col, text_col), text_col, stopwords=stopwords
    )
    doc_terms = (
        toks.select(
            F.col(doc_id_col).alias("doc_id"),
            F.explode(F.array_distinct("tokens")).alias("term"),
        )
    )
    n_docs = docs_df.count()
    # one-row-per-doc contract: the corpus-wide df below is computed
    # THROUGH this left join, so a duplicate doc_id here would fan out
    # doc_terms and silently inflate df / deflate IDF — enforce it
    # DETERMINISTICALLY (min cluster per doc; dropDuplicates keeps a
    # partition-order-dependent row, so reruns could disagree)
    a = assign_df.select(
        F.col(assign_df.columns[0]).alias("doc_id"), "cluster"
    ).groupBy("doc_id").agg(F.min("cluster").alias("cluster"))
    sizes = a.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_c"))
    # ONE tokenizer pass: left-join the assignment (unassigned docs keep
    # a NULL cluster) and aggregate once to a (term, cluster)-bounded
    # table; the corpus-wide df is its per-term sum and the per-cluster
    # df its non-NULL rows — previously the pandas-UDF tokenization ran
    # twice, once per consumer (the collocations one-scan pattern)
    from bm25s_spark.util import eager_checkpoint as _eager_checkpoint

    term_cluster = _eager_checkpoint(
        doc_terms.join(a, "doc_id", "left")
        .groupBy("term", "cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n")),
        reliable=True,
    )
    dfreq = term_cluster.groupBy("term").agg(
        F.sum("n").cast("long").alias("df")
    )
    cdf = (
        term_cluster.where(F.col("cluster").isNotNull())
        .select("cluster", "term", F.col("n").alias("cluster_df"))
        .where(F.col("cluster_df") >= min_cluster_df)
    )
    scored = (
        cdf.join(F.broadcast(sizes), "cluster")
        .join(dfreq, "term")
        .withColumn(
            "score",
            F.round(
                (F.col("cluster_df") / F.col("n_c"))
                * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_t)
        .select("cluster", "rank", "term", "cluster_df", "score")
    )


def cluster_documents(
    emb_df: DataFrame,
    n_clusters: int = 16,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """Train (unless ``centroids`` given) + assign in one call →
    (``id_col``, cluster, sim)."""
    if centroids is None:
        centroids = train_cluster_centroids(
            emb_df, n_clusters, id_col=id_col, vec_col=vec_col,
            seed=seed, train_sample=train_sample,
        )
    return cluster_assign(
        emb_df, centroids, id_col=id_col, vec_col=vec_col, round_to=round_to
    )
