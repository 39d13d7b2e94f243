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


def rbo_weights(k: int, p: float = 0.9) -> tuple[list[float], float]:
    """Truncated rank-biased-overlap weight table (Webber/Moffat/Zobel,
    TOIS 2010, eq. 4 truncated at depth ``k`` and normalized so two
    identical length-``k`` lists score exactly 1.0).

    ``W[m-1] = Σ_{d=m..k} p^(d-1) / d`` is the total weight a doc pair
    first co-appearing at depth ``m`` contributes to
    ``Σ_d p^(d-1) · X_d / d`` (X_d = overlap of the two depth-d
    prefixes); the normalizer is ``Σ_{d=1..k} p^(d-1)`` (X_d = d for
    identical lists).  Computed once driver-side and inlined as
    literals, so the Spark plan and any SQL twin share bit-identical
    IEEE weights instead of each re-deriving the geometric series in
    its own summation order."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if not (0.0 < p < 1.0):
        raise ValueError(f"persistence p must be in (0, 1) (got {p})")
    terms = [p ** (d - 1) / d for d in range(1, k + 1)]
    weights = [float(sum(terms[m - 1:])) for m in range(1, k + 1)]
    denom = float(sum(p ** (d - 1) for d in range(1, k + 1)))
    return weights, denom


def compare_runs(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    round_to: int | None = 6,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query rank-agreement metrics between two retrieval runs —
    the A/B harness for ranker changes (method swap, pruning setting,
    index rebuild, hybrid re-weighting): which queries moved, and how
    much → (query_id, n_a, n_b, overlap, jaccard, rbo, tau).

    Inputs are two ``retrieve()``-shaped runs (query_id, rank, doc_id,
    …); rows with rank > ``k`` are ignored so both sides compare at the
    same depth.

    - ``overlap``/``jaccard``: top-k doc-set intersection size and
      Jaccard similarity (set metrics, rank-insensitive);
    - ``rbo``: truncated normalized rank-biased overlap at persistence
      ``p`` (top-weighted: agreement at rank 1 counts most — see
      :func:`rbo_weights`); 1.0 = identical rankings;
    - ``tau``: Kendall's tau-a over the INTERSECTION docs' rank pairs
      (+1 same order, −1 reversed; NULL when the intersection has < 2
      docs — rank order is then vacuous).  Ranks within a run are
      distinct, so no tie correction is needed.

    Queries present in only one run emit a row with overlap 0.

    Scale shape: two shuffles keyed by (query_id, doc_id) for the
    intersection join, one k-bounded per-query self-join for tau
    (≤ k(k−1)/2 pairs per query), per-query aggregations — nothing
    corpus-sized, nothing collected; cardinality out = distinct
    queries.  At a million queries every stage partitions on query_id.
    """
    weights, denom = rbo_weights(k, p)
    a = run_a.where(F.col("rank") <= k).select(
        F.col(query_id_col).alias("query_id"), "doc_id",
        F.col("rank").alias("rank_a"),
    )
    b = run_b.where(F.col("rank") <= k).select(
        F.col(query_id_col).alias("query_id"), "doc_id",
        F.col("rank").alias("rank_b"),
    )
    inter = a.join(b, ["query_id", "doc_id"])

    w_arr = F.array(*[F.lit(w) for w in weights])
    per_match = inter.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("overlap"),
        F.sum(
            F.element_at(w_arr, F.greatest("rank_a", "rank_b").cast("int"))
        ).alias("rbo_raw"),
    )

    x, y = inter.alias("x"), inter.alias("y")
    pairs = x.join(
        y,
        (F.col("x.query_id") == F.col("y.query_id"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    ).select(
        F.col("x.query_id").alias("query_id"),
        F.when(
            (F.col("x.rank_a") - F.col("y.rank_a"))
            * (F.col("x.rank_b") - F.col("y.rank_b")) > 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("s"),
    )
    tau_df = pairs.groupBy("query_id").agg(
        (F.sum("s") / F.count(F.lit(1))).alias("tau")
    )

    n_a = a.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    n_b = b.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    out = (
        n_a.join(n_b, "query_id", "full")
        .withColumn("n_a", F.coalesce("n_a", F.lit(0)))
        .withColumn("n_b", F.coalesce("n_b", F.lit(0)))
        .join(per_match, "query_id", "left")
        .withColumn("overlap", F.coalesce("overlap", F.lit(0)))
        .withColumn(
            "jaccard",
            F.col("overlap")
            / (F.col("n_a") + F.col("n_b") - F.col("overlap")),
        )
        .withColumn("rbo", F.coalesce("rbo_raw", F.lit(0.0)) / F.lit(denom))
        .join(tau_df, "query_id", "left")
        .select("query_id", "n_a", "n_b", "overlap", "jaccard", "rbo", "tau")
    )
    if round_to is not None:
        for c in ("jaccard", "rbo", "tau"):
            out = out.withColumn(c, F.round(c, round_to))
    return out
