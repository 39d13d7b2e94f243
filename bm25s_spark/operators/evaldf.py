"""Distributed retrieval evaluation: per-query NDCG / recall /
precision / AP / reciprocal-rank as a DataFrame — no collect.

``eval.evaluate`` (driver-side, matching pytrec_eval's denominators,
``reference/bm25s/utils/beir.py:334-401``) is fine for a BEIR-sized
query set; evaluating a production run — millions of queries against
editorial or click qrels — cannot round-trip through the driver.  This
operator computes the SAME per-query metrics relationally and leaves
them distributed (aggregate or join downstream at will).

Metric contract (identical arithmetic to ``eval.evaluate``):

- only queries with ≥ 1 positive (grade > 0) judgment are emitted
  (pytrec_eval's rule); a judged query missing from the run scores 0
  on every metric;
- DCG uses the linear-gain form Σ gain / log2(rank + 1) over the
  top-``k``; IDCG ranks the query's OWN judgments (grade desc) and
  truncates at ``k``;
- AP divides by the FULL positive count (trec_eval ``map_cut_k``),
  not min(n_rel, k);
- reciprocal rank uses the first positive hit over the WHOLE provided
  run (pytrec_eval ``recip_rank``), not the k-truncated prefix.

Scale shape: everything is keyed by query_id — one shuffle of the
(≤ run-depth) result rows joined against the qrels rows, window
prefix-scans within each query, one final per-query aggregation.
Nothing corpus-sized, nothing collected; cardinality out = judged
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def evaluate_per_query(
    results_df: DataFrame,
    qrels_df: DataFrame,
    k: int = 10,
    round_to: int | None = None,
    grade_col: str = "grade",
) -> DataFrame:
    """→ (query_id, n_rel, hits, ndcg, recall, precision, ap, rr).

    ``results_df``: (query_id, rank, doc_id, …) with ``rank`` 1-based;
    ``qrels_df``: (query_id, doc_id, <grade_col>) — graded judgments,
    grade > 0 means relevant.  ``round_to`` rounds every metric column
    (cross-engine comparison).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qrels = qrels_df.select(
        "query_id", "doc_id", F.col(grade_col).cast("double").alias("grade")
    )
    # judged queries and their positive counts + ideal DCG
    pos = qrels.where(F.col("grade") > 0)
    base = pos.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    ideal = (
        pos.withColumn("_ipos", F.row_number().over(iw))
        .where(F.col("_ipos") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("grade") / F.log2(F.col("_ipos") + 1)).alias("idcg"))
    )
    # run joined to judgments; the full run feeds RR, the ≤k prefix the
    # rank-cut metrics
    run = (
        results_df.select("query_id", F.col("rank").cast("int").alias("rank"),
                          "doc_id")
        .join(qrels, ["query_id", "doc_id"], "left")
        .withColumn("gain", F.coalesce(F.col("grade"), F.lit(0.0)))
        .withColumn("is_rel", (F.col("gain") > 0).cast("int"))
    )
    sw = Window.partitionBy("query_id").orderBy("rank")
    run = run.withColumn("_seen", F.sum("is_rel").over(sw))
    per_run = run.groupBy("query_id").agg(
        F.sum(
            F.when(F.col("rank") <= k,
                   F.col("gain") / F.log2(F.col("rank") + 1))
            .otherwise(F.lit(0.0))
        ).alias("dcg"),
        F.sum(F.when(F.col("rank") <= k, F.col("is_rel")).otherwise(F.lit(0)))
        .cast("long").alias("hits"),
        F.sum(
            F.when((F.col("rank") <= k) & (F.col("is_rel") == 1),
                   F.col("_seen").cast("double") / F.col("rank"))
            .otherwise(F.lit(0.0))
        ).alias("_ap_num"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("_first_rel"),
    )
    out = (
        base.join(F.broadcast(ideal), "query_id")
        .join(per_run, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg"),
            (F.coalesce(F.col("hits"), F.lit(0)).cast("double")
             / F.col("n_rel")).alias("recall"),
            (F.coalesce(F.col("hits"), F.lit(0)).cast("double")
             / F.lit(float(k))).alias("precision"),
            (F.coalesce(F.col("_ap_num"), F.lit(0.0))
             / F.col("n_rel")).alias("ap"),
            F.coalesce(
                F.lit(1.0) / F.col("_first_rel").cast("double"), F.lit(0.0)
            ).alias("rr"),
        )
    )
    if round_to is not None:
        for c in ("ndcg", "recall", "precision", "ap", "rr"):
            out = out.withColumn(c, F.round(c, round_to))
    return out


def evaluate_macro(
    results_df: DataFrame,
    qrels_df: DataFrame,
    k: int = 10,
    round_to: int | None = None,
    grade_col: str = "grade",
) -> DataFrame:
    """One-row macro average over the judged queries → (n_queries,
    ndcg, recall, precision, map, mrr) — the distributed twin of
    ``eval.evaluate``'s dict for a single ``k`` (same per-query
    arithmetic via :func:`evaluate_per_query`, same unweighted mean
    over queries with ≥ 1 positive judgment).  ``round_to`` rounds the
    averaged metrics; the per-query values stay full-precision
    underneath, matching the driver-side evaluator's round-at-the-end
    behavior."""
    per_q = evaluate_per_query(results_df, qrels_df, k=k, grade_col=grade_col)
    out = per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.avg("ndcg").alias("ndcg"),
        F.avg("recall").alias("recall"),
        F.avg("precision").alias("precision"),
        F.avg("ap").alias("map"),
        F.avg("rr").alias("mrr"),
    )
    if round_to is not None:
        for c in ("ndcg", "recall", "precision", "map", "mrr"):
            out = out.withColumn(c, F.round(c, round_to))
    return out
