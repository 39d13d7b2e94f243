"""Result collapsing (field collapse): one hit per group, groups ranked
by their best member.

Transcript search rarely wants ten turns of the same conversation as
ten separate hits — it wants the top conversations, each represented by
its best-matching turn (Elasticsearch ``collapse``, Lucene grouping,
Google's one-result-per-site).  This is the *post-retrieval* sibling of
the conversation-granularity index (``conversation_rollup`` →
``build_index``): scoring stays per-turn (sharp term statistics), only
the presentation groups.

Deterministic contract: within a group the representative is the
(score desc, doc_id asc) best hit; groups rank by (best score desc,
group_id asc).  Ties can therefore never flip across engines once the
scores themselves agree.

Scale shape: one join of the scored candidate set against the
(doc_id, group) map — candidates are top-heavy and small, the map is
corpus-partitioned, AQE broadcasts the candidate side; then two windows
over the candidate set (per-group best, per-query rank).  No
corpus-sized shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_results(
    results_df: DataFrame,
    groups_df: DataFrame,
    k: int = 10,
    group_col: str = "group_id",
) -> DataFrame:
    """Collapse scored hits to their best-per-group representative →
    ``(query_id, rank, group_id, doc_id, score, n_hits)``.

    ``results_df``: (query_id, doc_id, score) — any scored candidate or
    top-k set (collapse AFTER a generous retrieve: a k-deep turn list
    collapses to ≤k conversations; to guarantee ``k`` groups, retrieve
    deeper or score all candidates).  ``groups_df``: (doc_id, group_col)
    mapping.  ``n_hits`` counts the group's hits present in
    ``results_df`` for that query.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    g = groups_df.select("doc_id", F.col(group_col).alias("group_id"))
    joined = results_df.select("query_id", "doc_id", "score").join(g, "doc_id")
    wg = Window.partitionBy("query_id", "group_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    best = (
        joined.withColumn("_rn", F.row_number().over(wg))
        .withColumn(
            "n_hits",
            F.count(F.lit(1)).over(
                Window.partitionBy("query_id", "group_id")
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("group_id").asc()
    )
    return (
        best.withColumn("rank", F.row_number().over(wq).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "group_id", "doc_id", "score", "n_hits")
    )
