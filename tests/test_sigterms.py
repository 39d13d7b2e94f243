"""Significant terms: hand-checked JLH scores, rank/tie rules, the
min_fg_df floor, empty-result queries, and the broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.sigterms import significant_terms


@pytest.fixture(scope="module")
def index(spark):
    # 6 docs; "zebra" is corpus-common (df=3), "giraffe" rarer (df=2),
    # "savanna" rarer still (df=1 among hits' terms)
    rows = [
        (0, "zebra giraffe savanna"),
        (1, "zebra giraffe watering hole"),
        (2, "quantum spark shuffle partition"),
        (3, "quantum spark executor"),
        (4, "pasta tomato basil"),
        (5, "zebra crossing zebra traffic"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def _jlh(fg_df, fg_size, df, n):
    fgp, bgp = fg_df / fg_size, df / n
    return (fgp - bgp) * (fgp / bgp)


def test_jlh_scores_and_rank(spark, index):
    # q1 hits = docs {0, 1}: giraffe fg 2/2 vs bg 2/6 → strongest lift;
    # zebra fg 2/2 but bg 3/6 → weaker; savanna/watering/hole fg 1/2
    results = spark.createDataFrame(
        [("q1", 0), ("q1", 1)], "query_id string, doc_id long"
    )
    rows = significant_terms(index, results, top_n=10).collect()
    got = {r.term: r for r in rows}
    assert got["giraffe"].rank == 1
    assert got["giraffe"].fg_df == 2 and got["giraffe"].df == 2
    assert got["giraffe"].score == pytest.approx(_jlh(2, 2, 2, 6))
    assert got["zebra"].score == pytest.approx(_jlh(2, 2, 3, 6))
    # equal-score singletons (savanna, watering, hole all fg 1/2, df 1)
    # tie-break term-ascending
    singles = [r.term for r in sorted(rows, key=lambda r: r.rank)
               if r.fg_df == 1 and r.df == 1]
    assert singles == sorted(singles)


def test_min_fg_df_floor_and_top_n(spark, index):
    results = spark.createDataFrame(
        [("q1", 0), ("q1", 1)], "query_id string, doc_id long"
    )
    rows = significant_terms(index, results, min_fg_df=2).collect()
    assert {r.term for r in rows} == {"zebra", "giraffe"}
    top1 = significant_terms(index, results, top_n=1).collect()
    assert [r.term for r in top1] == ["giraffe"]
    with pytest.raises(ValueError):
        significant_terms(index, results, top_n=0)
    with pytest.raises(ValueError):
        significant_terms(index, results, min_fg_df=0)


def test_no_hits_query_yields_no_rows(spark, index):
    results = spark.createDataFrame(
        [("q1", 2)], "query_id string, doc_id long"
    ).where(F.col("doc_id") < 0)
    assert significant_terms(index, results).count() == 0


def test_duplicate_hits_counted_once(spark, index):
    """A (query, doc) repeated in the input (e.g. a fused result) must
    not double-count the foreground."""
    results = spark.createDataFrame(
        [("q1", 0), ("q1", 0), ("q1", 1)], "query_id string, doc_id long"
    )
    rows = significant_terms(index, results).collect()
    got = {r.term: r for r in rows}
    assert got["zebra"].fg_df == 2
    assert got["giraffe"].score == pytest.approx(_jlh(2, 2, 2, 6))


def test_plan_broadcasts_result_side(spark, index):
    results = spark.createDataFrame(
        [("q1", 0), ("q1", 1)], "query_id string, doc_id long"
    )
    plan = significant_terms(index, results)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
